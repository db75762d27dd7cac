"""Pinhole camera as a differentiable pytree.

The reference's ``Camera`` (SURVEY.md §3 C7) holds position + a 2-angle
spherical direction mutated by input events and impulse/friction physics.
Here the pose is a *value* — position + (yaw, pitch) angles + fov — that
flows through jit and receives gradients (BASELINE.json: "camera-pose ...
gradient descent per frame"). Movement physics lives in camera/paths.py as
pure functions of time.

World frame: Z up. yaw = azimuth around +Z measured from +X; pitch =
inclination above the XY plane. Matches the reference's two-angle scheme.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vxtpu.utils import pytree_dataclass


@pytree_dataclass
class Camera:
    """pos: float32 [3]; yaw, pitch, fov_y: float32 scalars (radians)."""

    pos: jax.Array
    yaw: jax.Array
    pitch: jax.Array
    fov_y: jax.Array

    @staticmethod
    def make(pos, yaw=0.0, pitch=0.0, fov_y_deg=60.0) -> "Camera":
        return Camera(
            pos=jnp.asarray(pos, dtype=jnp.float32),
            yaw=jnp.asarray(yaw, dtype=jnp.float32),
            pitch=jnp.asarray(pitch, dtype=jnp.float32),
            fov_y=jnp.deg2rad(jnp.asarray(fov_y_deg, dtype=jnp.float32)),
        )

    def basis(self):
        """Orthonormal (forward, right, up) world-frame vectors, each [3]."""
        cy, sy = jnp.cos(self.yaw), jnp.sin(self.yaw)
        cp, sp = jnp.cos(self.pitch), jnp.sin(self.pitch)
        forward = jnp.stack([cp * cy, cp * sy, sp])
        # right = normalize(forward x world_up); up = right x forward
        right = jnp.stack([sy, -cy, jnp.zeros_like(sy)])
        up = jnp.cross(right, forward)
        return forward, right, up

    def look_at(self, target) -> "Camera":
        """New camera at same pos, aimed at target (reference: look_at_center)."""
        tv = jnp.asarray(target, dtype=jnp.float32) - self.pos
        yaw = jnp.arctan2(tv[1], tv[0])
        pitch = jnp.arctan2(tv[2], jnp.sqrt(tv[0] ** 2 + tv[1] ** 2))
        return self.replace(yaw=yaw.astype(jnp.float32), pitch=pitch.astype(jnp.float32))
