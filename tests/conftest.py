"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

NOTE: env vars alone are not enough — a site-installed TPU plugin may set
``jax.config.jax_platforms`` programmatically at interpreter startup,
which overrides JAX_PLATFORMS from the environment. We force the config
back to cpu before any backend is initialized.
"""

import os

# XLA:CPU's LLVM backend segfaulted reproducibly while compiling the
# largest fused program (the stereo mapping chain) ~150 tests into a
# full run, yet the same compile succeeds in a fresh process. Two
# mitigations: a much larger main-thread stack (LLVM's recursive passes
# are the prime SIGSEGV suspect on a deep program), and collection
# reordering below so the biggest compiles happen first, while the
# process is small.
try:
    import resource
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        resource.setrlimit(
            resource.RLIMIT_STACK,
            (min(_want, _hard) if _hard != resource.RLIM_INFINITY
             else _want, _hard))
except (ImportError, ValueError, OSError):
    pass

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


# Compile-heavy modules first: their big XLA programs build while the
# process heap/LLVM state is still small (see the SIGSEGV note above).
# Everything else keeps collection order.
_HEAVY_FIRST = (
    "test_stereo.py", "test_stereo_inertial.py", "test_inertial_pipeline.py",
    "test_kb8_pipeline.py", "test_collab_inertial.py",
)


def pytest_collection_modifyitems(config, items):
    def rank(item):
        name = os.path.basename(str(item.fspath))
        return (_HEAVY_FIRST.index(name) if name in _HEAVY_FIRST
                else len(_HEAVY_FIRST))
    items.sort(key=rank)


# Release compiled executables between modules: the roaming SIGSEGVs
# (LLVM compile at 96%, cache-write serialization at 90%) only appear
# once a single process has accumulated hundreds of live XLA
# executables. Dropping them bounds native-heap growth; re-entry is a
# cheap persistent-cache load, not a recompile.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
