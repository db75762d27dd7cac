"""Test env: force CPU with 8 virtual devices so sharding tests exercise a
multi-device mesh without TPU hardware (SURVEY.md §5 "Distributed without a
cluster").

Note: this image's ``sitecustomize.py`` pre-imports jax at interpreter
startup with ``JAX_PLATFORMS=axon`` (the TPU tunnel), so setting env vars
here is too late for jax's import-time config read. ``jax.config.update``
still works because backends initialize lazily at the first op — as long as
nothing touched a device before pytest collected us. XLA_FLAGS is read at
CPU-client creation, which is also lazy, so the env write below does land.
"""

import os

import jax

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

jax.config.update("jax_platforms", os.environ.get("VXTPU_TEST_PLATFORM", "cpu"))
