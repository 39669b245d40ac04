"""Persistent-compile-cache setup: TPU-only, namespaced by host machine.

Two measured failure modes of jax 0.9.0's persistent cache on XLA:CPU drove
this policy (2026-08-18 session, single-core host, 8 virtual devices):

1. CPU AOT executables are specialized to the *compiling* host's CPU
   features; the cache key does not include them, so a session resuming on
   a different machine reloads foreign code — observed as a hard SIGABRT
   inside ``xla::cpu::ThunkExecutor::Execute``.
2. Even SAME-machine reloads are degraded: jaxlib 0.9.0 stamps compile-time
   tuning pseudo-features (``+prefer-no-scatter``, ``+prefer-no-gather``)
   into the AOT result's machine description, and the loader's host-feature
   check can never list them — so EVERY reload logs ``cpu_aot_loader.cc:
   Machine type ... doesn't match`` and proceeds down the "could lead to
   SIGILL" path.  Small programs survive it; the sharded train step
   (shard_map ring attention + scan + donation) silently aborts the
   process with no XLA error text.

So: the persistent cache is only enabled when the default backend is not
CPU (the TPU path, where first compiles through the tunneled transport cost
minutes and reloads are safe), and the directory is additionally namespaced
by a host fingerprint so a host swap invalidates rather than crashes.
"""

from __future__ import annotations

import hashlib
import os
import platform
from typing import Optional


def _host_fingerprint() -> str:
    parts = [platform.machine()]
    try:
        import jaxlib

        parts.append(getattr(jaxlib, "__version__", "?"))
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(" ".join(sorted(line.split(":", 1)[1]
                                                 .split())))
                    break
    except OSError:
        parts.append(platform.processor())
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def setup_compile_cache(base_dir: str) -> Optional[str]:
    """Point JAX's persistent compile cache at base_dir/<host-fingerprint>.

    No-op (returns None) on the CPU backend — see module docstring for the
    two measured reload-crash modes.  Call before the first compilation;
    this initializes the backend to find out what it is."""
    import jax

    if jax.default_backend() == "cpu":
        return None
    cache_dir = os.path.join(os.path.abspath(base_dir), _host_fingerprint())
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
