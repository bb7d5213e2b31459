"""Covisibility-row formulations on TPU at arena shape (512 KF x 1024
feat, 16384 MP): scatter-mask+matvec (r2), bool-gather (r3 draft), f32
gather, and one-hot matmul."""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import time
import numpy as np


def timeit(fn, *a, n=30):
    import jax
    jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from multi_orbslam3_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    K, N, P = 512, 1024, 16384
    rng = np.random.RandomState(0)
    kf_mp = jnp.asarray(
        np.where(rng.rand(K, N) < 0.5, rng.randint(0, P, (K, N)), -1),
        jnp.int32)
    fv = jnp.asarray(rng.rand(K, N) < 0.9)
    kv = jnp.ones(K, bool)
    mv = jnp.ones(P, bool)
    kf = jnp.int32(5)

    @jax.jit
    def mask_matvec(kf):
        valid = (kf_mp >= 0) & fv & kv[:, None]
        slot = jnp.where(valid, kf_mp, 0)
        onehot = jnp.zeros((K, P), bool)
        kfi = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N))
        onehot = onehot.at[kfi.reshape(-1), slot.reshape(-1)].max(
            valid.reshape(-1))
        obs = onehot & mv[None, :]
        row = obs[kf].astype(jnp.float32)
        return (obs.astype(jnp.float32) @ row).astype(jnp.int32)

    @jax.jit
    def gather_bool(kf):
        row_kf = kf_mp[kf]
        row_ok = (row_kf >= 0) & fv[kf]
        member = jnp.zeros(P + 1, bool).at[
            jnp.where(row_ok, row_kf, P)].max(row_ok)
        member = member.at[P].set(False)
        ok = (kf_mp >= 0) & fv & kv[:, None]
        slot = jnp.where(ok, kf_mp, P)
        return jnp.sum(member[slot].astype(jnp.int32), axis=1)

    @jax.jit
    def gather_f32(kf):
        row_kf = kf_mp[kf]
        row_ok = (row_kf >= 0) & fv[kf]
        member = jnp.zeros(P + 1, jnp.float32).at[
            jnp.where(row_ok, row_kf, P)].add(1.0)
        member = jnp.minimum(member, 1.0).at[P].set(0.0)
        ok = (kf_mp >= 0) & fv & kv[:, None]
        slot = jnp.where(ok, kf_mp, P)
        return jnp.sum(member[slot], axis=1).astype(jnp.int32)

    @jax.jit
    def onehot_mm(kf):
        # one-hot of the query row (N, P) then counts = sum over features
        # of (kf_mp one-hot) . member — as a matmul over P
        row_kf = kf_mp[kf]
        row_ok = (row_kf >= 0) & fv[kf]
        member = jnp.zeros(P, jnp.float32).at[
            jnp.where(row_ok, row_kf, 0)].max(row_ok.astype(jnp.float32))
        ok = (kf_mp >= 0) & fv & kv[:, None]
        slot = jnp.where(ok, kf_mp, 0)
        # (K*N, P) one-hot matmul is too big; instead scan over K
        def body(_, x):
            s, o = x
            oh = (s[:, None] == jnp.arange(P)[None, :]) & o[:, None]
            return None, jnp.sum(oh.astype(jnp.float32)
                                 @ member)
        _, out = jax.lax.scan(body, None, (slot, ok))
        return out.astype(jnp.int32)

    print(f"mask+matvec : {timeit(mask_matvec, kf):8.2f} ms")
    print(f"gather bool : {timeit(gather_bool, kf):8.2f} ms")
    print(f"gather f32  : {timeit(gather_f32, kf):8.2f} ms")
    print(f"onehot scan : {timeit(onehot_mm, kf, n=5):8.2f} ms")
    a = np.asarray(mask_matvec(kf))
    b = np.asarray(gather_bool(kf))
    c = np.asarray(gather_f32(kf))
    print("agree:", np.array_equal(a, b), np.abs(a - c).max())


if __name__ == "__main__":
    main()
