"""Distributed global-BA scaling measurement.

BASELINE.json metric: "global BA iters/s at N hosts; >=0.8 scaling
efficiency at 2 hosts". This module builds a geometrically consistent
synthetic server arena (the CollabServer's real state layout), runs
CollabServer.run_global_ba with observations sharded over the available
devices, and reports PCG iterations/s. bench.py sweeps N via
subprocesses with XLA_FLAGS=--xla_force_host_platform_device_count=N
(virtual CPU devices; the driver's multi-chip dryrun exercises the same
path).

Run standalone:
    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python -m multi_orbslam3_tpu.eval.gba_scaling
"""

from __future__ import annotations

import json
import time


def make_server_arena(n_kf: int = 48, n_mp: int = 3072, n_feat: int = 256,
                      n_agents: int = 2, seed: int = 0):
    """A CollabServer whose arena holds a consistent multi-agent map:
    KF poses along a path, landmarks in front, kf_uv = true projections,
    kf_mp associations filled — run_global_ba sees its real data layout."""
    import jax.numpy as jnp
    import numpy as np

    from multi_orbslam3_tpu import config as cfg
    from multi_orbslam3_tpu.collab.server import CollabServer
    from multi_orbslam3_tpu.collab.transport import InProcessTransport
    from multi_orbslam3_tpu.geometry import camera as cam
    from multi_orbslam3_tpu.geometry import se3

    rng = np.random.RandomState(seed)
    c = cfg.synthetic_mono().replace(
        orb=cfg.ORBConfig(n_features=n_feat),
        map=cfg.MapConfig(max_keyframes=n_kf, max_mappoints=n_mp,
                          max_obs_per_kf=n_feat))
    server = CollabServer(c, InProcessTransport(), n_agents=n_agents,
                          arena_kf=n_kf, arena_mp=n_mp)
    K = server.K
    # landmarks spread ALONG the trajectory (cameras advance 0.15/KF in
    # x): a fixed box leaves large arenas with near-zero observation
    # density past the first ~50 keyframes
    # camera CENTER is -R^T t: with t_x = +0.15k the centers march in
    # NEGATIVE x
    x_span = 4.0 + 0.15 * n_kf
    pts = np.stack([rng.uniform(-x_span, 4, n_mp),
                    rng.uniform(-2, 2, n_mp),
                    rng.uniform(4, 10, n_mp)], 1).astype(np.float32)
    # bounded attitude wobble: an unbounded 0.01*k yaw had large arenas
    # pointing away from the landmark field entirely
    poses = np.stack([np.asarray(se3.exp(jnp.asarray(
        [0.0, 0.08 * np.sin(k / 7.0), 0.0,
         0.15 * k, 0.02 * (k % 3), 0.0],
        jnp.float32))) for k in range(n_kf)])
    kf_mp = np.full((n_kf, n_feat), -1, np.int32)
    kf_uv = np.zeros((n_kf, n_feat, 2), np.float32)
    feat_valid = np.zeros((n_kf, n_feat), bool)
    order = np.argsort(pts[:, 0])
    px_sorted = pts[order, 0]
    for k in range(n_kf):
        # candidate landmarks near this camera's x (frustum prefilter —
        # a whole-arena random sample leaves big arenas nearly obs-free)
        xk = -0.15 * k
        lo, hi = np.searchsorted(px_sorted, (xk - 8.0, xk + 8.0))
        cand = order[lo:hi]
        if len(cand) < n_feat:
            cand = order[max(0, lo - n_feat):hi + n_feat]
        vis = rng.choice(cand, min(n_feat, len(cand)), replace=False)
        if len(vis) < n_feat:
            vis = np.concatenate([vis, rng.choice(n_mp, n_feat - len(vis))])
        p_c = pts[vis] @ poses[k][:3, :3].T + poses[k][:3, 3]
        uv = np.stack([float(K.fx) * p_c[:, 0] / p_c[:, 2] + float(K.cx),
                       float(K.fy) * p_c[:, 1] / p_c[:, 2] + float(K.cy)],
                      1)
        ok = (p_c[:, 2] > 0.3) & (uv[:, 0] > 0) & (uv[:, 0] < 640) \
            & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        kf_mp[k, ok] = vis[ok]
        kf_uv[k] = uv + rng.randn(n_feat, 2) * 0.5
        feat_valid[k] = ok
    agents = np.arange(n_kf) % n_agents
    server.m = server.m._replace(
        kf_pose=jnp.asarray(poses), kf_valid=jnp.ones(n_kf, bool),
        kf_agent=jnp.asarray(agents.astype(np.int32)),
        kf_uv=jnp.asarray(kf_uv), kf_mp=jnp.asarray(kf_mp),
        kf_feat_valid=jnp.asarray(feat_valid),
        n_kf=jnp.int32(n_kf),
        mp_pos=jnp.asarray(pts + rng.randn(n_mp, 3).astype(np.float32)
                           * 0.03),
        mp_valid=jnp.ones(n_mp, bool), n_mp=jnp.int32(n_mp))
    server.kf_map[:] = 0
    server.kf_local[:] = np.arange(n_kf)
    return server


def measure_gba(server, iters: int = 4, cg_iters: int = 25,
                reps: int = 3, force_shard: bool = True) -> dict:
    """Time run_global_ba on the arena; returns PCG iterations/s.

    force_shard=True runs the shard_map (landmark-aligned psum) path even
    on ONE device so scaling efficiency compares the SAME implementation
    at every N (rate_N / (N * rate_1) with different code paths would mix
    implementation overheads into the scaling number)."""
    import jax
    m0 = server.m
    server.run_global_ba(iters=iters, cg_iters=cg_iters,
                         force_shard=force_shard)           # compile
    times = []
    for _ in range(reps):
        server.m = m0
        t0 = time.perf_counter()
        server.run_global_ba(iters=iters, cg_iters=cg_iters,
                             force_shard=force_shard)
        jax.block_until_ready(server.m.kf_pose)
        times.append(time.perf_counter() - t0)
    best = min(times)
    total_pcg = iters * cg_iters
    return {"n_devices": len(jax.devices()),
            "gba_iters_per_s": round(total_pcg / best, 2),
            "wall_s": round(best, 4),
            "pcg_iters": total_pcg}


def main() -> None:
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    try:
        jax.config.update("jax_platforms",
                          os.environ.get("JAX_PLATFORMS", "cpu"))
    except Exception:
        pass
    server = make_server_arena()
    out = measure_gba(server, force_shard=True)
    if len(jax.devices()) == 1:
        # reference point: the non-shard_map single-device program
        server2 = make_server_arena()
        single = measure_gba(server2, force_shard=False)
        out["single_path_iters_per_s"] = single["gba_iters_per_s"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
