"""Packed coarse-cell acceleration table for the Pallas march kernel.

The reference's SVO packs child-validity masks + traversal data into 64-bit
descriptors (SURVEY.md §3 C3, Laine-Karras style). The TPU-native analog is
a *dense* array of per-coarse-cell words, built so ONE table fetch per march
step yields both the fine hit test and the empty-space jump radius:

    cell c = 2x2x2 fine voxels.
    word[c] = child_bits | (D << 8)

      child_bits  8 bits  — fine-voxel occupancy of the cell's children,
                            bit index (x&1)<<2 | (y&1)<<1 | (z&1).
      D           8 bits  — chessboard (L_inf) distance, in coarse cells,
                            from c to the nearest non-empty coarse cell;
                            0 iff c itself contains any solid voxel.

    Every fine voxel inside any cell c' with ||c' - c||_inf <= D-1 is
    provably empty, so a ray at a fine voxel of c may jump to the exit of
    the fine-space box [2c - 2(D-1), 2c + 2D) without missing a surface —
    the same conservative-skip guarantee as world/distfield.py, one level
    up.

Words are stored as float32 (values < 2^16, exactly representable) in a
[rows, 128] layout because the Pallas kernel's table lookup is a
row-one-hot MXU matmul + lane-one-hot reduce (render/kernel_pallas.py) —
f32 0/1-matmuls reproduce the integer word exactly.

Two linearizations:
  * build_packed        — row-major (v1 kernel: one-hot over ALL rows,
                          O(rows)/step — small grids only).
  * build_packed_morton — Morton (z-order) cell index (v2 kernel): a
                          spatially-local cluster of ray positions maps to
                          a compact row RANGE, so the per-step one-hot can
                          restrict itself to a dynamic W-row window
                          (pl.ds) around the tile's cluster — O(W)/step,
                          unlocking the 512³ flagship table (131072 rows,
                          64 MB, VMEM-resident on v5e).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vxtpu.utils import pytree_dataclass
from vxtpu.world.distfield import build_distance_field

LANES = 128


def part1by2(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of v so they occupy every 3rd bit (the
    classic Morton magic-number sequence); int32 in, int32 out."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton3(x: jax.Array, y: jax.Array, z: jax.Array) -> jax.Array:
    """Interleaved 3D Morton code (x gets bit 0). For a 2^k-sided cube this
    is a bijection onto [0, 2^(3k)) — the v2 table layout."""
    return part1by2(x) | (part1by2(y) << 1) | (part1by2(z) << 2)


@pytree_dataclass
class PackedAccel:
    """words: float32 [rows, 128]; cdims: coarse grid shape (static)."""

    words: jax.Array

    @property
    def rows(self) -> int:
        return self.words.shape[0]


def coarse_dims(dims: tuple[int, int, int]) -> tuple[int, int, int]:
    assert all(d % 2 == 0 for d in dims), "packed accel needs even dims"
    return (dims[0] // 2, dims[1] // 2, dims[2] // 2)


def _packed_words(occupancy: jax.Array, cap: int) -> jax.Array:
    """float32 [cx,cy,cz] word grid: child_bits | (coarse chessboard D << 8)."""
    X, Y, Z = occupancy.shape
    cx, cy, cz = coarse_dims((X, Y, Z))
    solid = (occupancy > 0).reshape(cx, 2, cy, 2, cz, 2)
    child_bits = jnp.zeros((cx, cy, cz), jnp.int32)
    for a in range(2):
        for b in range(2):
            for c in range(2):
                bit = (a << 2) | (b << 1) | c
                child_bits = child_bits | (
                    solid[:, a, :, b, :, c].astype(jnp.int32) << bit
                )
    coarse_occ = (child_bits > 0).astype(jnp.uint8)
    d = build_distance_field(coarse_occ, cap=min(cap, 255)).astype(jnp.int32)
    return (child_bits | (d << 8)).astype(jnp.float32)


def _pad_rows(flat: jax.Array) -> jax.Array:
    n = flat.shape[0]
    rows = -(-n // LANES)
    pad = rows * LANES - n
    if pad:
        # padding cells read as "solid children, D=0" so an (impossible)
        # out-of-range fetch can never certify a skip
        flat = jnp.concatenate([flat, jnp.full((pad,), 255.0, jnp.float32)])
    return flat.reshape(rows, LANES)


def build_packed(occupancy: jax.Array, cap: int = 64) -> PackedAccel:
    """Build the packed word table from a uint8 occupancy grid [X,Y,Z]."""
    word = _packed_words(occupancy, cap)
    return PackedAccel(words=_pad_rows(word.reshape(-1)))


@pytree_dataclass
class PackedMorton:
    """Morton-linearized packed table (v2 kernel): words float32 [rows,128]
    where linear cell index = morton3(cx, cy, cz). Requires a cubic
    power-of-two coarse grid (bijection onto [0, S³)).

    SIGNED ENCODING — the key observation is that a cell's child bits and
    its empty-space distance are MUTUALLY EXCLUSIVE (dist==0 iff the cell
    holds any solid voxel iff child_bits>=1), so one signed small integer
    carries both:

        word =  child_bits   (1..255)  if the cell contains solid voxels
        word = -D            (-1..-64) if empty (D = coarse chessboard dist)

    Every value lies in [-255, 255], exactly representable in bfloat16
    (8-bit significand) — so the kernel may cast its sliced window to bf16
    losslessly and run the one-hot table fetch as a single bf16 MXU matmul
    (several x the f32 rate). Storage stays f32 because Mosaic's dynamic
    sublane slicing (pl.ds on the window base) only supports f32 tiling on
    this toolchain — the bf16 cast happens per-window inside the kernel."""

    words: jax.Array

    @property
    def rows(self) -> int:
        return self.words.shape[0]


def build_packed_morton(occupancy: jax.Array, cap: int = 64) -> PackedMorton:
    """Morton-order signed packed table from a uint8 occupancy grid
    [X,Y,Z] (X == Y == Z, power of two)."""
    X, Y, Z = occupancy.shape
    assert X == Y == Z and (X & (X - 1)) == 0, (
        "morton packed table needs a cubic power-of-two grid")
    word = _packed_words(occupancy, cap).astype(jnp.int32)
    cb = word & 255
    dist = word >> 8
    signed = jnp.where(cb > 0, cb, -dist).astype(jnp.float32)
    S = X // 2
    ii, jj, kk = jnp.meshgrid(jnp.arange(S), jnp.arange(S), jnp.arange(S),
                              indexing="ij")
    mi = morton3(ii, jj, kk).reshape(-1)
    flat = jnp.zeros((S * S * S,), jnp.float32).at[mi].set(signed.reshape(-1))
    return PackedMorton(words=_pad_rows(flat))


def build_material_morton(occupancy: jax.Array) -> jax.Array:
    """Morton-order per-coarse-cell MATERIAL table for the fused in-kernel
    shading epilogue (render/kernel_pallas_v2._shade_epilogue).

    f32 [rows, 128]; word[cell] packs the 8 child material ids, 3 bits per
    child at bit 3*child_index (same child indexing as the occupancy
    table's child_bits). 8 x 3 = 24 bits -> the word is < 2^24 and thus
    EXACTLY representable in float32 (NOT bfloat16 — the epilogue fetches
    this table with an f32 one-hot matmul, which is fine because it runs
    once per tile after the march, not once per step).

    Material ids must be < 8 (the MATERIAL_RGB palette size — the
    reference's voxel-id -> color mapping, SURVEY.md §4.3). Ids are
    clipped to 7 defensively; palette-mode scenes (procgen) satisfy this
    by construction.
    """
    X, Y, Z = occupancy.shape
    assert X == Y == Z and (X & (X - 1)) == 0, (
        "morton material table needs a cubic power-of-two grid")
    cx, cy, cz = coarse_dims((X, Y, Z))
    ids = jnp.minimum(occupancy.astype(jnp.int32), 7)
    # strided slices, NOT a 6-D [cx,2,cy,2,cz,2] reshape: eagerly
    # materializing that layout tile-pads the three minor dims (8,128)
    # and explodes to ~32 GB at 512^3 on TPU
    word = jnp.zeros((cx, cy, cz), jnp.int32)
    for a in range(2):
        for b in range(2):
            for c in range(2):
                ci = (a << 2) | (b << 1) | c
                word = word | (ids[a::2, b::2, c::2] << (3 * ci))
    S = cx
    ii, jj, kk = jnp.meshgrid(jnp.arange(S), jnp.arange(S), jnp.arange(S),
                              indexing="ij")
    mi = morton3(ii, jj, kk).reshape(-1)
    flat = (jnp.zeros((S * S * S,), jnp.float32)
            .at[mi].set(word.reshape(-1).astype(jnp.float32)))
    return _pad_rows(flat)


def build_rgb8_morton(grid) -> jax.Array:
    """FINE-voxel Morton per-voxel RGB table for the fused in-kernel
    shading epilogue — config 2's defining attribute (BASELINE.json:8)
    on the flagship path (VERDICT r4 next-#6).

    f32 [X*Y*Z/128, 128]; word[voxel] = r8 | g8 << 8 | b8 << 16 with each
    channel quantized to 8 bits (the reference's voxel colors are 8-bit
    data — SURVEY.md §3 C2 "char* grid" / C17 atlas; the XLA shade path
    keeps f32 albedo, so fused-vs-XLA parity tests use a 1/255-scale
    tolerance). 24-bit words are exactly representable in f32 and are
    fetched by the same HIGHEST-precision one-hot mini-loop as the
    material table. Channels are built one at a time from strided slices
    — never a device-side [X,Y,Z,3] (minor-dim-3 tile padding, the r4
    layout trap)."""
    assert grid.rgb is not None, "build_rgb8_morton needs per-voxel RGB"
    X, Y, Z = grid.dims
    assert X == Y == Z and (X & (X - 1)) == 0, (
        "morton rgb8 table needs a cubic power-of-two grid")
    word = jnp.zeros((X, Y, Z), jnp.int32)
    for c in range(3):
        q = jnp.clip(jnp.round(grid.rgb[..., c] * 255.0), 0, 255)
        word = word | (q.astype(jnp.int32) << (8 * c))
    ii, jj, kk = jnp.meshgrid(jnp.arange(X), jnp.arange(Y), jnp.arange(Z),
                              indexing="ij")
    mi = morton3(ii, jj, kk).reshape(-1)
    flat = (jnp.zeros((X * Y * Z,), jnp.float32)
            .at[mi].set(word.reshape(-1).astype(jnp.float32)))
    return _pad_rows(flat)
