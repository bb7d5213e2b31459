"""Probe the Sim3 RANSAC on cross-agent landmark matches from the hetero
run: how many matches are geometrically consistent, at what threshold?"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import jax.numpy as jnp
from multi_orbslam3_tpu.collab.client import CollabClient
from multi_orbslam3_tpu.collab.server import CollabServer
from multi_orbslam3_tpu.collab.transport import InProcessTransport
from multi_orbslam3_tpu.dataio import synthetic
from multi_orbslam3_tpu.pipeline import loop_closing
from multi_orbslam3_tpu.opt import sim3_solve

from test_collab_hetero import kb8_config, pinhole_config


def main():
    c_kb8 = kb8_config()
    c_pin = pinhole_config()
    F = 26
    seq0 = synthetic.make_sequence(c_kb8, n_frames=F, n_points=600, seed=11,
                                   trajectory="forward", phase=0.0)
    seq1 = synthetic.make_sequence(c_pin, n_frames=F, n_points=600, seed=11,
                                   trajectory="forward", phase=0.35)
    tr = InProcessTransport()
    c0 = CollabClient(c_kb8, agent_id=0, transport=tr)
    c1 = CollabClient(c_pin, agent_id=1, transport=tr)
    server = CollabServer(c_pin, tr, n_agents=2, arena_kf=192, arena_mp=8192)
    for i in range(F):
        c0.process_frame(seq0.images[i], float(seq0.timestamps[i]))
        c1.process_frame(seq1.images[i], float(seq1.timestamps[i]))
        c0.comm_cycle()
        c1.comm_cycle()
        server.comm_cycle()

    m = server.m
    agents = np.array(m.kf_agent)
    valid = np.array(m.kf_valid)
    a0 = np.nonzero(valid & (agents == 0))[0]
    a1 = np.nonzero(valid & (agents == 1))[0]
    kf_cur, kf_cand = int(a0[-2]), int(a1[-2])
    lm = loop_closing.match_loop_landmarks(m, jnp.int32(kf_cur),
                                           jnp.int32(kf_cand))
    v = np.asarray(lm.valid)
    print(f"kf {kf_cur}(a0) vs {kf_cand}(a1): {v.sum()} matches")
    p_cur = np.asarray(m.mp_pos)[np.asarray(lm.cur_mp)[v]]
    p_cand = np.asarray(m.mp_pos)[np.asarray(lm.cand_mp)[v]]
    # ground-truth check: both agents triangulated the SAME world points
    # (seed 11). In the server frame (no merge yet), each agent's map is in
    # its own gauge. Fit Umeyama on the matches directly:
    from multi_orbslam3_tpu.eval.ate import umeyama_align
    s, R, t = umeyama_align(p_cand, p_cur, with_scale=True)
    res = p_cur - (s * (p_cand @ R.T) + t)
    d = np.linalg.norm(res, axis=1)
    print(f"umeyama on ALL matches: s={s:.3f} residual median={np.median(d):.3f}"
          f" p25={np.percentile(d, 25):.3f} p75={np.percentile(d, 75):.3f}")
    spread = np.sqrt(np.sum(np.var(p_cur, axis=0)))
    print(f"cur spread={spread:.3f} -> ransac th={0.1 * spread:.3f}")
    key = jax.random.PRNGKey(0)
    r = sim3_solve.sim3_ransac(jnp.asarray(np.asarray(m.mp_pos)[
        np.where(np.asarray(lm.valid), np.asarray(lm.cand_mp), 0)]),
        jnp.asarray(np.asarray(m.mp_pos)[
            np.where(np.asarray(lm.valid), np.asarray(lm.cur_mp), 0)]),
        lm.valid, key, n_hyp=128,
        inlier_th=float(max(0.1 * spread, 1e-3)), min_inliers=12)
    print(f"ransac: ok={bool(r.ok)} n_inl={int(jnp.sum(r.inliers))} "
          f"s={float(r.S.s):.3f}")


if __name__ == "__main__":
    main()
