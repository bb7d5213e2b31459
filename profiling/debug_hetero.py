"""Instrumented hetero-camera merge repro: logs the server PR internals
(best BoW score, streak, cascade verdicts) to find where the KB8+pinhole
merge stalls."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

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
from multi_orbslam3_tpu.bow import database as dbm
from multi_orbslam3_tpu.map import mapstate as ms

from test_collab_hetero import kb8_config, pinhole_config


def main():
    c_kb8 = kb8_config()
    c_pin = pinhole_config()
    F = 32
    seq0 = synthetic.make_sequence(c_kb8, n_frames=F, n_points=600, seed=11,
                                   trajectory="forward", phase=0.0)
    seq1 = synthetic.make_sequence(c_pin, n_frames=F, n_points=600, seed=11,
                                   trajectory="forward", phase=0.35)
    tr = InProcessTransport()
    c0 = CollabClient(c_kb8, agent_id=0, transport=tr)
    c1 = CollabClient(c_pin, agent_id=1, transport=tr)
    server = CollabServer(c_pin, tr, n_agents=2, arena_kf=192, arena_mp=8192)

    orig_cascade = loop_closing.verify_candidate_cascade

    def logged_cascade(m, kf_cur, kf_cand, key, K, **kw):
        r = orig_cascade(m, kf_cur, kf_cand, key, K, **kw)
        a_cur = int(m.kf_agent[kf_cur])
        a_cand = int(m.kf_agent[kf_cand])
        lm = r.lm
        n_match = int(np.sum(np.asarray(lm.valid))) if lm is not None else -1
        n_cur = int(np.sum(np.asarray(lm.cur_region))) \
            if lm is not None else -1
        n_cand = int(np.sum(np.asarray(lm.cand_region))) \
            if lm is not None else -1
        n_inl = int(np.sum(np.asarray(r.inliers))) \
            if r.inliers is not None else -1
        print(f"    cascade {kf_cur}(a{a_cur}) vs {kf_cand}(a{a_cand}): "
              f"ok={r.ok} regions={n_cur}/{n_cand} matches={n_match} "
              f"inl={n_inl} n_proj={r.n_proj} "
              f"s={float(r.S.s) if r.S is not None else -1:.3f}")
        return r

    loop_closing.verify_candidate_cascade = logged_cascade

    orig_pr = server._run_place_recognition

    def logged_pr(run_gba=False):
        queue = list(server._pr_queue)
        for agent, kf_slot in queue:
            book = server.agents[agent]
            covis = ms.covisibility_row(server.m, jnp.int32(kf_slot))
            exclude = np.array(covis) > 0
            exclude[kf_slot] = True
            own_recent = (server.kf_local >= 0) & \
                (np.array(server.m.kf_agent) == agent)
            rid = np.nonzero(own_recent)[0]
            exclude[rid[-10:]] = True
            scores = dbm.query(server.db, server.voc,
                               server.m.kf_desc[kf_slot],
                               server.m.kf_feat_valid[kf_slot],
                               jnp.asarray(exclude))
            s = np.array(scores)
            best = int(np.argmax(s))
            if float(s[best]) > 0.005:
                ba = int(server.m.kf_agent[best])
                print(f"  PR a{agent} kf{kf_slot}: best={best}(a{ba}) "
                      f"score={float(s[best]):.4f} streak={book.streak}")
        return orig_pr(run_gba)

    server._run_place_recognition = logged_pr

    for i in range(F):
        c0.process_frame(seq0.images[i], float(seq0.timestamps[i]))
        c1.process_frame(seq1.images[i], float(seq1.timestamps[i]))
        c0.comm_cycle()
        c1.comm_cycle()
        print(f"frame {i}")
        server.comm_cycle()
    print("server:", server.stats)
    print("kf0:", c0.slam.stats)
    print("kf1:", c1.slam.stats)


if __name__ == "__main__":
    main()
