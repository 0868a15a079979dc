"""Persistent XLA compilation cache — first compiles through the tunneled TPU
backend take minutes; cached executables make reruns (and the driver bench)
start fast."""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "G2VLM_JAX_CACHE", os.path.expanduser("~/.cache/g2vlm_jax")
    )
    # XLA:CPU persistent entries embed host-specific machine features
    # (avx512/amx ISA lists); loading one compiled on a different host warns
    # "could lead to execution errors such as SIGILL" and has produced real
    # SIGSEGVs. Partition the cache per CPU identity; TPU entries are
    # host-independent and keep the shared directory.
    import jax

    if jax.default_backend() == "cpu":
        import hashlib
        import platform

        tag = hashlib.sha1(
            (platform.machine() + ":" + _cpu_flags()).encode()
        ).hexdigest()[:10]
        cache_dir = os.path.join(cache_dir, f"cpu-{tag}")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax versions: silently skip


def _cpu_flags() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return " ".join(sorted(line.split(":", 1)[1].split()))
    except OSError:
        pass
    return "unknown"


def honor_platform_env():
    """The axon TPU plugin force-overrides JAX_PLATFORMS at import; re-apply
    an explicit cpu request (tests/smoke runs) via jax.config."""
    import os

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")
