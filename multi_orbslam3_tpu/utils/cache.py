"""Persistent XLA compilation cache setup.

The frame pipeline compiles to a large XLA program (8 pyramid levels x
FAST/BRIEF + matching + GN stages); on small hosts a cold compile takes
minutes. Enabling JAX's persistent cache makes every process after the
first start instantly. Call once, early.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    """Key the cache by (jax version, machine, CPU feature flags).

    XLA:CPU caches compiled machine code specialized to the compiling
    host's CPU features; loading an entry produced on a host with
    different features can SIGILL (observed: '+prefer-no-scatter is not
    supported on the host machine' warnings followed by segfaults when a
    cache dir was reused across environments). A per-host subdirectory
    makes cross-host reuse structurally impossible.
    """
    import jax

    parts = [jax.__version__, platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags") or line.startswith("Features"):
                    parts.append(line.strip())
                    break
    except OSError:
        parts.append(platform.processor() or "unknown")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def enable_compilation_cache(path: str = "/tmp/multi_orbslam3_tpu_xla_cache"):
    import jax

    path = os.path.join(path, _host_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:  # older jax
        pass
