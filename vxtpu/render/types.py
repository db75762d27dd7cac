"""Shared result types for all march kernels (oracle / XLA / Pallas), so the
shading pipeline is implementation-agnostic and parity tests compare like
with like.
"""

from __future__ import annotations

import jax

from vxtpu.utils import pytree_dataclass


@pytree_dataclass
class HitRecord:
    """Per-ray march result; leading dims are the ray batch.

    hit:    bool   [...]    — ray hit a solid voxel.
    t:      float32 [...]   — ray parameter of the hit (entry t of the hit
                              voxel); undefined (large) on miss.
    voxel:  int32  [..., 3] — hit voxel coords; undefined on miss.
    normal: float32 [..., 3]— outward unit face normal of the entered face.
    steps:  int32  [...]    — DDA steps taken (observability: march cost).
    """

    hit: jax.Array
    t: jax.Array
    voxel: jax.Array
    normal: jax.Array
    steps: jax.Array
