"""Dynamic point lights as a flat pytree (the reference's ``LightController``
/ ``LightHandle`` packed-float GPU buffer, SURVEY.md §3 C9 — here a struct of
arrays; differentiable for free, no RAII slot management needed because
arrays are immutable values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vxtpu.utils import pytree_dataclass


@pytree_dataclass
class Lights:
    """L point lights. All arrays have leading dim L (L may be 0).

    pos:       float32 [L, 3] world position.
    rgb:       float32 [L, 3] color.
    intensity: float32 [L]    scalar brightness multiplier.
    """

    pos: jax.Array
    rgb: jax.Array
    intensity: jax.Array

    @property
    def count(self) -> int:
        return self.pos.shape[0]

    @staticmethod
    def single(pos, rgb=(1.0, 1.0, 1.0), intensity=1.0) -> "Lights":
        return Lights(
            pos=jnp.asarray([pos], dtype=jnp.float32),
            rgb=jnp.asarray([rgb], dtype=jnp.float32),
            intensity=jnp.asarray([intensity], dtype=jnp.float32),
        )

    @staticmethod
    def none() -> "Lights":
        return Lights(
            pos=jnp.zeros((0, 3), jnp.float32),
            rgb=jnp.zeros((0, 3), jnp.float32),
            intensity=jnp.zeros((0,), jnp.float32),
        )

    @staticmethod
    def make(pos_list, rgb_list, intensity_list) -> "Lights":
        return Lights(
            pos=jnp.asarray(pos_list, dtype=jnp.float32).reshape(-1, 3),
            rgb=jnp.asarray(rgb_list, dtype=jnp.float32).reshape(-1, 3),
            intensity=jnp.asarray(intensity_list, dtype=jnp.float32).reshape(-1),
        )
