"""Instrumented bench_collab(n_agents=2): per-agent server-arena ATE
after every structural event, to locate which stage moves agent1's
keyframes off ground truth (round-3 VERDICT Weak #4: agent1 final ATE
3.59 m over a 10.8 m span while agent0 sits at 0.086 m)."""
import sys
import time

import numpy as np

from multi_orbslam3_tpu import config as cfg
from multi_orbslam3_tpu.collab.client import CollabClient
from multi_orbslam3_tpu.collab.server import CollabServer
from multi_orbslam3_tpu.collab.transport import InProcessTransport
from multi_orbslam3_tpu.dataio import synthetic
from multi_orbslam3_tpu.eval import ate

N_AGENTS = 2
N_FRAMES = 150
SEED = 31


def main():
    c = cfg.synthetic_mono()
    seqs = [synthetic.make_sequence(c, n_frames=N_FRAMES, n_points=1200,
                                    seed=SEED, trajectory="circle",
                                    phase=1.1 + 0.55 * a)
            for a in range(N_AGENTS)]
    ts_all = np.asarray(seqs[0].timestamps)
    ts_all = ts_all - ts_all[0]

    tr = InProcessTransport()
    clients = [CollabClient(c, a, tr) for a in range(N_AGENTS)]
    server = CollabServer(c, tr, n_agents=N_AGENTS)

    def agent_ate(tag):
        kf_valid = np.array(server.m.kf_valid)
        kf_agent = np.array(server.m.kf_agent)
        kf_ts = np.array(server.m.kf_timestamp)
        kf_pose = np.array(server.m.kf_pose)
        msg = [tag]
        for a in range(N_AGENTS):
            sel = np.nonzero(kf_valid & (kf_agent == a))[0]
            if len(sel) < 8:
                msg.append(f"a{a}: n={len(sel)}")
                continue
            fr = np.asarray([int(np.argmin(np.abs(ts_all - t)))
                             for t in kf_ts[sel]])
            est = ate.camera_centers(kf_pose[sel])
            gt = ate.camera_centers(seqs[a].T_cw[fr])
            r = ate.ate_rmse(est, gt)
            msg.append(f"a{a}: n={len(sel)} ate={r:.4f}")
        print(" | ".join(msg), file=sys.stderr, flush=True)

    # --- hook structural events -----------------------------------
    orig_merge = server._merge_maps

    def merge_hook(kf_cur, kf_cand, S):
        agent_ate("pre-merge")
        import jax.numpy as jnp
        print(f"  merge: kf_cur={kf_cur} kf_cand={kf_cand} "
              f"s={float(S.s):.4f}", file=sys.stderr)
        orig_merge(kf_cur, kf_cand, S)
        agent_ate("post-merge+posegraph")
    server._merge_maps = merge_hook

    orig_gba = server.run_global_ba

    def gba_hook(*a, **k):
        agent_ate("pre-GBA")
        orig_gba(*a, **k)
        agent_ate("post-GBA")
    server.run_global_ba = gba_hook

    orig_cull = server._cull

    def cull_hook():
        orig_cull()
        agent_ate("post-cull")
    server._cull = cull_hook

    from multi_orbslam3_tpu.pipeline import loop_closing as lc
    orig_weld = lc.weld_after_merge

    def weld_hook(m, seam, *a, **k):
        out = orig_weld(m, seam, *a, **k)
        server.m = out
        agent_ate(f"post-weld(seam={int(seam)})")
        return out
    lc.weld_after_merge = weld_hook

    orig_corr = lc.correct_loop

    def corr_hook(m, *a, **k):
        out = orig_corr(m, *a, **k)
        server.m = out
        agent_ate("post-correct_loop")
        return out
    lc.correct_loop = corr_hook

    t0 = time.perf_counter()
    for i in range(N_FRAMES):
        for a, cl in enumerate(clients):
            cl.process_frame(seqs[a].images[i], float(seqs[a].timestamps[i]))
            cl.comm_cycle()
        server.comm_cycle()
        if i % 25 == 0:
            agent_ate(f"frame {i}")
    agent_ate("FINAL")
    print(f"wall={time.perf_counter() - t0:.1f}s stats={server.stats}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
