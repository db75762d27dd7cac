"""Platform discovery + startup validation.

The reference's ``CLCaster::init``/``validate`` queries OpenCL platforms,
checks version >= 1.2 and GL-sharing support, and refuses to start on
unsupported devices (SURVEY.md §3 C5, §6 "Failure detection"). The
TPU-native equivalents: enumerate jax devices, check the scene fits HBM,
check mesh shape against available devices, and fail fast with actionable
messages. Also enables the persistent XLA compilation cache — on the axon
remote-compile tunnel a cold Pallas compile can take minutes, so caching is
a correctness-of-workflow feature, not an optimization.
"""

from __future__ import annotations

import dataclasses
import os

import jax

from vxtpu.utils import tree_bytes

# HBM per chip (bytes), by device-kind substring. Conservative defaults.
_HBM_BY_KIND = {
    "v5 lite": 16 * 1024**3,
    "v5e": 16 * 1024**3,
    "v5p": 95 * 1024**3,
    "v4": 32 * 1024**3,
    "v6": 32 * 1024**3,
    "cpu": 8 * 1024**3,
}


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist compiled executables across processes (idempotent)."""
    path = path or os.environ.get("VXTPU_COMPILE_CACHE", os.path.expanduser("~/jaxcache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: cache is best-effort


@dataclasses.dataclass(frozen=True)
class PlatformInfo:
    backend: str
    device_kind: str
    num_devices: int
    num_hosts: int
    hbm_bytes: int


def platform_info() -> PlatformInfo:
    devs = jax.devices()
    kind = devs[0].device_kind.lower()
    hbm = next((v for k, v in _HBM_BY_KIND.items() if k in kind), 16 * 1024**3)
    return PlatformInfo(
        backend=jax.default_backend(),
        device_kind=devs[0].device_kind,
        num_devices=len(devs),
        num_hosts=jax.process_count(),
        hbm_bytes=hbm,
    )


def platform_report() -> dict:
    """JSON-friendly platform summary for the CLI ``info`` subcommand."""
    info = platform_info()
    return dataclasses.asdict(info)


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> PlatformInfo:
    """Join the multi-host SPMD runtime (``jax.distributed.initialize``) —
    the TPU-native analog of the reference having no distribution at all
    (SURVEY.md §3 "Parallelism table": the rebuild adds multi-host).

    With no arguments, jax auto-detects the cluster from the TPU metadata /
    environment (the normal pod-slice path); explicit args support manual
    CPU/GPU clusters. Idempotent: safe to call when already initialized.

    Failure semantics (a silent fallback here would let every host train a
    divergent local-only replica and report success): only two outcomes are
    swallowed — "already initialized" (idempotence) and "no cluster
    detected" when auto-detecting (the legitimate single-process path, and
    then only if the environment really looks single-process). Any other
    initialize() failure re-raises.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        if "already" in msg:  # idempotent re-entry
            return platform_info()
        auto_detect = (coordinator_address is None and num_processes is None
                       and process_id is None)
        no_cluster = ("could not find" in msg or "unable to" in msg
                      or "cannot" in msg or "not set" in msg
                      or "auto-detect" in msg or "autodetect" in msg
                      or isinstance(e, ValueError))
        if auto_detect and no_cluster and jax.process_count() <= 1:
            # genuine single-process run: initialize() has nothing to join
            return platform_info()
        raise RuntimeError(
            "jax.distributed.initialize() failed — refusing to continue "
            "as independent single-host replicas (each would train a "
            f"divergent copy and report success): {e}"
        ) from e
    return platform_info()


def validate_platform(scene_tree=None, mesh_devices: int | None = None,
                      hbm_headroom: float = 0.75) -> PlatformInfo:
    """Fail fast before any compile: scene must fit one chip's HBM (the
    grid is replicated per SURVEY.md §7 sizing), and the requested mesh
    must not exceed available devices."""
    info = platform_info()
    if mesh_devices is not None and mesh_devices > info.num_devices:
        raise RuntimeError(
            f"requested mesh of {mesh_devices} devices but only "
            f"{info.num_devices} present ({info.device_kind})"
        )
    if scene_tree is not None:
        need = tree_bytes(scene_tree)
        budget = int(info.hbm_bytes * hbm_headroom)
        if need > budget:
            raise RuntimeError(
                f"scene needs {need/1e9:.2f} GB but per-chip HBM budget is "
                f"{budget/1e9:.2f} GB ({info.device_kind}); shrink the grid "
                "or drop per-voxel attributes"
            )
    return info
