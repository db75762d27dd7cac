"""Procedural terrain generation, fully on-device.

The reference fills its dense grid on the host with vendored FastNoise
simplex-fractal heightmaps (SURVEY.md §3 C2/C4, §4.4). Here the same
capability is a single jitted program: hash-gradient value noise with
fractal octaves evaluated over the whole [X, Y] plane at once (VPU-shaped),
broadcast-compared against the z index to produce occupancy — no host loop,
no host->device copy of the world.

Deterministic: same (seed, dims) -> bitwise-same grid on every backend,
which the golden-image tests rely on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vxtpu.world.grid import VoxelGrid, MATERIAL_RGB


def _hash2(ix: jax.Array, iy: jax.Array, seed: int) -> jax.Array:
    """Integer lattice hash -> uint32. Cheap PCG-style mixing, good enough
    for terrain (not crypto). Inputs int32 [...]."""
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
        ^ iy.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35)
        ^ jnp.uint32(seed * 0x9E3779B9 & 0xFFFFFFFF)
    )
    h = (h ^ (h >> 15)) * jnp.uint32(0x2C1B3C6D)
    h = (h ^ (h >> 12)) * jnp.uint32(0x297A2D39)
    h = h ^ (h >> 15)
    return h


def _grad2(ix, iy, seed):
    """Unit-ish gradient per lattice point: one of 8 directions by hash."""
    h = _hash2(ix, iy, seed) & jnp.uint32(7)
    ang = h.astype(jnp.float32) * (jnp.pi / 4.0)
    return jnp.cos(ang), jnp.sin(ang)


def gradient_noise2(x: jax.Array, y: jax.Array, seed: int) -> jax.Array:
    """Perlin-style gradient noise in roughly [-1, 1]; x, y float32 [...]."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    # quintic fade
    u = fx * fx * fx * (fx * (fx * 6.0 - 15.0) + 10.0)
    v = fy * fy * fy * (fy * (fy * 6.0 - 15.0) + 10.0)

    def dot_corner(ox, oy):
        gx, gy = _grad2(ix0 + ox, iy0 + oy, seed)
        return gx * (fx - ox) + gy * (fy - oy)

    n00 = dot_corner(0, 0)
    n10 = dot_corner(1, 0)
    n01 = dot_corner(0, 1)
    n11 = dot_corner(1, 1)
    nx0 = n00 + u * (n10 - n00)
    nx1 = n01 + u * (n11 - n01)
    return (nx0 + v * (nx1 - nx0)) * 1.4142


def fractal_noise2(x, y, seed: int, octaves: int = 4, lacunarity: float = 2.0, gain: float = 0.5):
    """Fractal Brownian motion over gradient_noise2; output roughly [-1, 1]."""
    total = jnp.zeros_like(x)
    amp = 1.0
    freq = 1.0
    norm = 0.0
    for o in range(octaves):
        total = total + amp * gradient_noise2(x * freq, y * freq, seed + o * 131)
        norm += amp
        amp *= gain
        freq *= lacunarity
    return total / norm


def terrain(dims: tuple[int, int, int], seed: int = 0, feature_scale: float = 0.25,
            water_frac: float = 0.22, with_rgb: bool = False) -> VoxelGrid:
    """Heightmap terrain: columns filled below a fractal-noise height, with
    material bands (water/sand/grass/stone/snow) by altitude — the capability
    of the reference's ``generate_terrain`` re-expressed as one jit.

    feature_scale: noise features per grid width (bigger -> choppier).
    """
    X, Y, Z = dims
    xs = (jnp.arange(X, dtype=jnp.float32) + 0.5) / X
    ys = (jnp.arange(Y, dtype=jnp.float32) + 0.5) / Y
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    k = feature_scale * X
    h = fractal_noise2(gx * k / X * 8.0, gy * k / X * 8.0, seed, octaves=5)
    # normalize to a height in [0.15 Z, 0.85 Z]
    height = (0.5 + 0.35 * h) * Z  # [X, Y]

    z_idx = jnp.arange(Z, dtype=jnp.float32)[None, None, :]
    below = z_idx < height[:, :, None]

    water_level = water_frac * Z
    zi = jnp.broadcast_to(z_idx, (X, Y, Z))
    hcol = jnp.broadcast_to(height[:, :, None], (X, Y, Z))
    # altitude bands (of the column's surface height)
    mat = jnp.where(hcol < water_level + 1.5, 2, 3)           # sand near water else grass
    mat = jnp.where(zi < hcol - 3.0, 4, mat)                  # stone under the surface
    mat = jnp.where(hcol > 0.75 * Z, jnp.where(zi > hcol - 2.0, 5, mat), mat)  # snow caps
    occ = jnp.where(below, mat, 0)
    # flood water up to water_level wherever the column is lower
    is_water = (~below) & (zi < water_level)
    occ = jnp.where(is_water, 1, occ).astype(jnp.uint8)

    rgb = None
    if with_rgb:
        base = MATERIAL_RGB[jnp.minimum(occ.astype(jnp.int32), MATERIAL_RGB.shape[0] - 1)]
        # per-voxel tint so the RGB path is visibly distinct from material ids
        tint = 0.9 + 0.2 * gradient_noise2(
            jnp.broadcast_to(gx[:, :, None], (X, Y, Z)) * 37.0,
            zi * 0.37 + jnp.broadcast_to(gy[:, :, None], (X, Y, Z)) * 37.0,
            seed + 7777,
        )
        rgb = (base * tint[..., None]).astype(jnp.float32)
    return VoxelGrid(occupancy=occ, rgb=rgb)


def shell_sphere(dims: tuple[int, int, int], material: int = 4) -> VoxelGrid:
    """A hollow sphere test scene (deterministic unit-test geometry)."""
    X, Y, Z = dims
    c = jnp.asarray([X / 2, Y / 2, Z / 2], jnp.float32)
    r = 0.35 * min(dims)
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(X, dtype=jnp.float32) + 0.5,
        jnp.arange(Y, dtype=jnp.float32) + 0.5,
        jnp.arange(Z, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    dist = jnp.sqrt((ii - c[0]) ** 2 + (jj - c[1]) ** 2 + (kk - c[2]) ** 2)
    occ = ((dist <= r) & (dist >= r - 2.0)).astype(jnp.uint8) * material
    return VoxelGrid(occupancy=occ)


def solid_box(dims: tuple[int, int, int], lo, hi, material: int = 3) -> VoxelGrid:
    """Axis-aligned solid box [lo, hi) — the simplest analytic test scene."""
    X, Y, Z = dims
    occ = jnp.zeros((X, Y, Z), jnp.uint8)
    occ = occ.at[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]].set(material)
    return VoxelGrid(occupancy=occ)
