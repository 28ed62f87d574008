"""Persistent XLA compilation cache shared by every entry point.

First compile of each program shape on the tunneled TPU backend takes
minutes; without a persistent cache each NEW PROCESS (CLI run, bench,
scan, worker, the driver's round-end bench) pays it again.  Enabling
`jax_compilation_cache_dir` serializes compiled executables to disk so
any later process with the same program shape loads in seconds.

Opt out with VDLM2_COMPILE_CACHE=0 (or point it at a different
directory).  If the backend cannot serialize executables JAX logs a
warning and skips caching — enabling is always safe.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache",
                        "vdlm2dec_tpu", "xla")


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a shared directory.

    Call once per process, before the first jit compilation (later calls
    are fine too — JAX picks the config up per-compile).  Returns the
    cache directory, or None when disabled via VDLM2_COMPILE_CACHE=0.
    """
    env = os.environ.get("VDLM2_COMPILE_CACHE")
    if env == "0":
        return None
    p = path or env or _DEFAULT
    os.makedirs(p, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", p)
    # cache everything that took >=1 s to compile, however small the
    # serialized artifact (the default min-entry-size skips tiny probes
    # whose REMOTE compile latency is still seconds)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except AttributeError:        # older jax: knobs absent, defaults fine
        pass
    return p
