"""Persistent XLA compilation cache setup.

The frame pipeline compiles to a large XLA program (8 pyramid levels x
FAST/BRIEF + matching + GN stages); on small hosts a cold compile takes
minutes. Enabling JAX's persistent cache makes every process after the
first start instantly. Call once, early.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/tmp/multi_orbslam3_tpu_xla_cache"):
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:  # older jax
        pass
