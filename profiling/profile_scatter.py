"""Micro-benchmark: the local-BA assembly ops (scatter-add vs one-hot
matmul) at real shapes (Kw=24 window KFs x N=1024 features, Pw=4096
landmarks), plus the per-iteration cost split of bundle_adjust."""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import time
import numpy as np


def timeit(fn, *args, n=20):
    import jax
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from multi_orbslam3_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    Kw, N, Pw = 24, 1024, 4096
    O = Kw * N
    rng = np.random.RandomState(0)
    pt = jnp.asarray(rng.randint(0, Pw, (O,)), jnp.int32)
    kf = jnp.repeat(jnp.arange(Kw, dtype=jnp.int32), N)
    prod_E = jnp.asarray(rng.randn(O, 6, 3), jnp.float32)
    prod_Hpp = jnp.asarray(rng.randn(O, 3, 3), jnp.float32)

    @jax.jit
    def scatter_E(pt, prod):
        return jnp.zeros((Kw, Pw, 6, 3)).at[kf, pt].add(prod)

    @jax.jit
    def scatter_Hpp(pt, prod):
        return jnp.zeros((Pw, 3, 3)).at[pt].add(prod)

    @jax.jit
    def onehot_E(pt, prod):
        # per-KF one-hot matmul via scan (N,Pw bf16 transient each step)
        pt_k = pt.reshape(Kw, N)
        prod_k = prod.reshape(Kw, N, 18)

        def body(_, x):
            p, pr = x
            oh = (p[:, None] == jnp.arange(Pw)[None, :])
            e = jnp.einsum("np,nc->pc", oh.astype(jnp.bfloat16),
                           pr.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return None, e

        _, E = jax.lax.scan(body, None, (pt_k, prod_k))
        return E.reshape(Kw, Pw, 6, 3)

    @jax.jit
    def onehot_Hpp(pt, prod):
        pt_k = pt.reshape(Kw, N)
        prod_k = prod.reshape(Kw, N, 9)

        def body(acc, x):
            p, pr = x
            oh = (p[:, None] == jnp.arange(Pw)[None, :])
            h = jnp.einsum("np,nc->pc", oh.astype(jnp.bfloat16),
                           pr.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return acc + h, None

        acc, _ = jax.lax.scan(body, jnp.zeros((Pw, 9)), (pt_k, prod_k))
        return acc.reshape(Pw, 3, 3)

    print(f"scatter E  (24,4096,6,3): {timeit(scatter_E, pt, prod_E):8.2f} ms")
    print(f"onehot  E                : {timeit(onehot_E, pt, prod_E):8.2f} ms")
    print(f"scatter Hpp (4096,3,3)   : {timeit(scatter_Hpp, pt, prod_Hpp):8.2f} ms")
    print(f"onehot  Hpp              : {timeit(onehot_Hpp, pt, prod_Hpp):8.2f} ms")

    # cost split of one full bundle_adjust iteration
    from multi_orbslam3_tpu.opt import local_ba
    from multi_orbslam3_tpu.geometry import camera, se3
    K = camera.PinholeK(*[jnp.float32(v)
                          for v in (458.0, 457.0, 376.0, 240.0)])
    poses = jnp.tile(jnp.eye(4)[None], (Kw, 1, 1))
    points = jnp.asarray(rng.randn(Pw, 3) + [0, 0, 5], jnp.float32)
    obs = local_ba.BAObservations(
        kf=kf, pt=pt, uv=jnp.asarray(rng.rand(O, 2) * 400, jnp.float32),
        inv_sigma2=jnp.ones(O), valid=jnp.ones(O, bool))
    fixed = jnp.zeros(Kw, bool).at[0].set(True)
    for it in (1, 2, 10):
        t = timeit(lambda: local_ba.bundle_adjust(
            poses, fixed, points, obs, K, iters=it), n=5)
        print(f"bundle_adjust iters={it:2d}  : {t:8.2f} ms")
    for it in (1, 2, 8, 10):
        t = timeit(lambda: local_ba.bundle_adjust(
            poses, fixed, points, obs, K, iters=it, grouped=True), n=5)
        print(f"bundle_adjust GROUPED iters={it:2d}  : {t:8.2f} ms")


if __name__ == "__main__":
    main()
