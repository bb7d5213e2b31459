"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

NOTE: env vars alone are not enough — a site-installed TPU plugin may set
``jax.config.jax_platforms`` programmatically at interpreter startup,
which overrides JAX_PLATFORMS from the environment. We force the config
back to cpu before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: the suite compiles hundreds of programs;
# re-using them across runs cuts CI time AND avoids re-entering the LLVM
# compile paths that intermittently segfault this 2-core host under load
from multi_orbslam3_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/tmp/multi_orbslam3_tpu_xla_cache_cpu")

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend())
