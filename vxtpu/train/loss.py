"""Losses/metrics for the inverse-rendering loop (BASELINE.json config 4:
"optimize voxel colors/densities from target images"). No reference analog —
the reference renderer has no training capability (SURVEY.md §1)."""

from __future__ import annotations

import jax.numpy as jnp


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(mse(pred, target), 1e-12))


def tv_loss(vol: jnp.ndarray) -> jnp.ndarray:
    """Total-variation regularizer over a [X,Y,Z] or channel-major
    [C,X,Y,Z] volume (spatial axes are always the LAST three) — the
    standard Plenoxels-style smoothness prior on voxel grids."""
    dx = jnp.diff(vol, axis=-3)
    dy = jnp.diff(vol, axis=-2)
    dz = jnp.diff(vol, axis=-1)
    return (jnp.mean(dx ** 2) + jnp.mean(dy ** 2) + jnp.mean(dz ** 2)) / 3.0


def tv_loss_morton(table: jnp.ndarray) -> jnp.ndarray:
    """TV-style smoothness prior evaluated directly on a fine-voxel Morton
    table [rows, 128] (or [C, rows, 128]) WITHOUT the ~1.4 s/step
    grid-relayout a full tv_loss would need at 512^3 on this endpoint.

    Uses the even-parity neighbor pairs only: in Morton order, the
    (x, x+1) neighbor with x even differs in lane bit 0 (bit 1 for y,
    bit 2 for z), so half of all axis-neighbor pairs are adjacent lanes of
    the SAME table word group — a pure reshape, no gather. Half the pairs
    of tv_loss at twice the weight is the same smoothness pressure in
    expectation (documented difference: this is a regularizer variant for
    the Morton training path, not a parity-equal reimplementation)."""
    t = table.reshape(table.shape[:-2] + (table.shape[-2], 16, 2, 2, 2))
    dx = t[..., 1] - t[..., 0]                       # lane bit 0 = x
    dy = t[..., 1, :] - t[..., 0, :]                 # lane bit 1 = y
    dz = t[..., 1, :, :] - t[..., 0, :, :]           # lane bit 2 = z
    return 2.0 * (jnp.mean(dx ** 2) + jnp.mean(dy ** 2)
                  + jnp.mean(dz ** 2)) / 3.0
