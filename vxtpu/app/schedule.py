"""Declarative per-frame animation schedules: pure functions of time.

Replaces the reference's imperative event machinery (SURVEY.md §3 C10/C11:
``Pub_Sub`` publisher/subscriber, SFML ``Input`` pump, held-key synthesis)
with the jit-idiomatic equivalent: the scene state for frame t is a pure
function of t, so a whole animation is one ``lax.scan`` / loop over a
compiled step with zero host->device argument churn (SURVEY.md §4.2 note).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from vxtpu.camera.camera import Camera
from vxtpu.world.lights import Lights


@dataclasses.dataclass(frozen=True)
class Schedule:
    """camera_at(t)->Camera and lights_at(t)->Lights, t in seconds."""

    camera_at: Callable[[jax.Array], Camera]
    lights_at: Callable[[jax.Array], Lights]
    fps: float = 60.0

    def frame_state(self, frame_idx):
        t = jnp.asarray(frame_idx, jnp.float32) / self.fps
        return self.camera_at(t), self.lights_at(t)


def static_lights(lights: Lights) -> Callable[[jax.Array], Lights]:
    return lambda t: lights


def orbiting_light(center, radius: float, height: float, period: float = 4.0,
                   rgb=(1.0, 0.95, 0.85), intensity: float = 2.0):
    """A point light circling the scene — the dynamic-light capability of
    the reference's LightController (C9) as a schedule."""
    center = jnp.asarray(center, jnp.float32)

    def at(t):
        ang = 2.0 * jnp.pi * t / period
        pos = center + jnp.stack(
            [radius * jnp.cos(ang), radius * jnp.sin(ang),
             jnp.asarray(height, jnp.float32)]
        )
        return Lights(
            pos=pos[None, :],
            rgb=jnp.asarray([rgb], jnp.float32),
            intensity=jnp.asarray([intensity], jnp.float32),
        )

    return at
