"""Differentiable volumetric ("soft") render mode — BASELINE.json config 4.

The reference renderer is hard-surface only; differentiability is a new,
normative capability ("custom VJP that backpropagates pixel-loss gradients
to voxel colors/densities and camera pose"). Design follows the Plenoxels
/ occupancy-grid-NeRF pattern (SURVEY.md §8, PAPERS.md): the scene is a
density grid sigma [X,Y,Z] + color grid rgb [X,Y,Z,3]; a ray accumulates

    alpha_i = 1 - exp(-softplus(sigma_i) * dt_i)
    T_i     = prod_{j<i} (1 - alpha_j)
    C       = sum_i T_i alpha_i c_i + T_end * sky

with trilinearly-interpolated sigma/rgb at S uniform samples on the ray's
grid-clipped segment. Everything is jnp; gradients to sigma, rgb AND the
camera pose (through the sample positions) come from autodiff. This module
is the REFERENCE semantics: the O(N_rays + grid) custom-VJP fast path
(render/vjp.py) must match it to allclose (tests/test_vjp.py).

Voxel-center convention: the value stored at index (i,j,k) lives at world
point (i+.5, j+.5, k+.5) — interpolation is over neighboring centers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vxtpu.render import dda
from vxtpu.render.settings import RenderSettings
from vxtpu.render.shade import sky_color
from vxtpu.utils import pytree_dataclass


@pytree_dataclass
class SoftGrid:
    """Optimizable scene: raw (pre-softplus) densities + rgb logits.

    sigma_raw: float32 [X,Y,Z]   — softplus'd into nonneg density.
    rgb_raw:   float32 [X,Y,Z,3] — sigmoid'd into [0,1] color.
    """

    sigma_raw: jax.Array
    rgb_raw: jax.Array

    @property
    def dims(self) -> tuple[int, int, int]:
        return tuple(self.sigma_raw.shape)  # type: ignore[return-value]

    @staticmethod
    def zeros(dims: tuple[int, int, int]) -> "SoftGrid":
        return SoftGrid(
            sigma_raw=jnp.full(dims, -2.0, jnp.float32),
            rgb_raw=jnp.zeros((*dims, 3), jnp.float32),
        )

    @staticmethod
    def from_hard(grid, sigma_solid: float = 40.0) -> "SoftGrid":
        """Initialize from a hard VoxelGrid (solid voxels -> high density).

        Empty voxels inherit the mean color of neighboring solid voxels
        (two dilation passes): trilinear sampling at a surface mixes the
        solid center with the adjacent empty center, so leaving empties
        black would darken every surface sample.
        """
        occ = (grid.occupancy > 0)
        sigma_raw = jnp.where(occ, sigma_solid, -6.0).astype(jnp.float32)
        albedo = grid.albedo_flat().reshape(*grid.dims, 3)

        col = albedo * occ[..., None]
        w = occ.astype(jnp.float32)
        for _ in range(2):
            csum = jnp.zeros_like(col)
            wsum = jnp.zeros_like(w)
            for ax in range(3):
                for sh in (1, -1):
                    csum = csum + jnp.roll(col, sh, axis=ax)
                    wsum = wsum + jnp.roll(w, sh, axis=ax)
            filled = wsum > 0
            col = jnp.where((w > 0)[..., None], col,
                            jnp.where(filled[..., None], csum / jnp.maximum(wsum, 1)[..., None], col))
            w = jnp.maximum(w, filled.astype(jnp.float32))

        c = jnp.clip(col, 1e-3, 1.0 - 1e-3)
        rgb_raw = jnp.log(c) - jnp.log1p(-c)
        return SoftGrid(sigma_raw=sigma_raw, rgb_raw=rgb_raw)


def trilinear(values: jax.Array, p: jax.Array, dims: tuple[int, int, int]):
    """Trilinearly interpolate ``values`` ([X,Y,Z] or [X,Y,Z,C]) at world
    points p [...,3] (voxel-center convention). Edge-clamped."""
    q = p - 0.5  # center-grid coords
    q0 = jnp.floor(q)
    f = q - q0
    i0 = jnp.clip(q0.astype(jnp.int32), 0, jnp.asarray(dims, jnp.int32) - 1)
    i1 = jnp.clip(i0 + 1, 0, jnp.asarray(dims, jnp.int32) - 1)
    X, Y, Z = dims
    flat = values.reshape(X * Y * Z, -1)

    def g(ix, iy, iz):
        idx = (ix * Y + iy) * Z + iz
        return jnp.take(flat, idx, axis=0)

    fx, fy, fz = f[..., 0:1], f[..., 1:2], f[..., 2:3]
    c000 = g(i0[..., 0], i0[..., 1], i0[..., 2])
    c001 = g(i0[..., 0], i0[..., 1], i1[..., 2])
    c010 = g(i0[..., 0], i1[..., 1], i0[..., 2])
    c011 = g(i0[..., 0], i1[..., 1], i1[..., 2])
    c100 = g(i1[..., 0], i0[..., 1], i0[..., 2])
    c101 = g(i1[..., 0], i0[..., 1], i1[..., 2])
    c110 = g(i1[..., 0], i1[..., 1], i0[..., 2])
    c111 = g(i1[..., 0], i1[..., 1], i1[..., 2])
    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    out = c0 * (1 - fx) + c1 * fx
    if values.ndim == 3:
        return out[..., 0]
    return out


def render_soft_rays(soft: SoftGrid, o: jax.Array, d: jax.Array,
                     settings: RenderSettings, num_samples: int):
    """Volumetric render of rays [N,3] -> (rgb [N,3], aux dict).

    Uniform sampling over each ray's clipped [t_enter, t_exit] segment;
    rays missing the grid get pure sky. Fully differentiable (autodiff) —
    this IS the reference semantics for the custom-VJP fast path.
    """
    dims = soft.dims
    t_enter, t_exit, valid = dda.ray_grid_clip(o, d, dims)
    seg = jnp.maximum(t_exit - t_enter, 0.0)
    dt = seg / num_samples                                   # [N]
    s_idx = jnp.arange(num_samples, dtype=o.dtype) + 0.5     # [S]
    t_s = t_enter[:, None] + dt[:, None] * s_idx[None, :]    # [N,S]
    p = o[:, None, :] + t_s[..., None] * d[:, None, :]       # [N,S,3]

    sigma = jax.nn.softplus(trilinear(soft.sigma_raw, p, dims))     # [N,S]
    rgb = jax.nn.sigmoid(trilinear(soft.rgb_raw, p, dims))          # [N,S,3]

    alpha = 1.0 - jnp.exp(-sigma * dt[:, None])              # [N,S]
    alpha = jnp.where(valid[:, None], alpha, 0.0)
    # exclusive cumprod of (1-alpha): T_i = prod_{j<i}(1-alpha_j)
    one_m = 1.0 - alpha + 1e-10
    T = jnp.cumprod(one_m, axis=1) / one_m                   # exclusive
    w = T * alpha                                            # [N,S]
    color = jnp.sum(w[..., None] * rgb, axis=1)              # [N,3]
    T_end = jnp.prod(one_m, axis=1)
    color = color + T_end[..., None] * sky_color(d, settings)
    aux = dict(weights=w, t=t_s, transmittance_end=T_end, opacity=1.0 - T_end)
    return color, aux


def render_soft_image(soft: SoftGrid, cam, settings: RenderSettings,
                      height: int, width: int, num_samples: int):
    """[H,W,3] differentiable render (grads flow to soft grid AND cam pose)."""
    from vxtpu.camera.rays import generate_rays

    o, d = generate_rays(cam, height, width)
    rgb, _ = render_soft_rays(soft, o, d, settings, num_samples)
    return rgb.reshape(height, width, 3)
