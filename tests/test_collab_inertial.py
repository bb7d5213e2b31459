"""Inertial collaborative E2E: a mono-inertial agent + a mono agent
share one world through the server. Exercises the full distributed
visual-inertial ladder the reference runs for IMU_MONOCULAR clients:

- uplink gated until VI init stage 1 passes (Atlas::GetInertialBA1,
  reference Atlas.cc:134,155);
- IMU-init re-gauge shipped as scale/Rgw and applied server-side
  (Map::ApplyScaledRotation, Communicator.cc:240-252);
- cross-agent merge between a metric (inertial) and an up-to-scale
  (mono) sub-map;
- pose-locked corrections flowing back to both agents.
"""

import numpy as np
import pytest

from multi_orbslam3_tpu import config as cfg
from multi_orbslam3_tpu.collab.client import CollabClient
from multi_orbslam3_tpu.collab.server import CollabServer
from multi_orbslam3_tpu.collab.transport import InProcessTransport
from multi_orbslam3_tpu.dataio import synthetic
from multi_orbslam3_tpu.eval import ate


def _config():
    c = cfg.synthetic_mono(width=320, height=240)
    return c.replace(
        orb=cfg.ORBConfig(n_features=256, n_levels=4),
        map=cfg.MapConfig(max_keyframes=64, max_mappoints=2048,
                          max_obs=16384, max_obs_per_kf=256),
        local_mapping=cfg.LocalMappingConfig(
            local_ba_kfs=8, local_ba_fixed_kfs=4, local_ba_points=1024,
            local_ba_iters=8),
    )


@pytest.mark.slow
def test_inertial_agent_collaborates():
    c = _config()
    F = 70
    seq_vi = synthetic.make_sequence(c, n_frames=F, n_points=600, seed=31,
                                     trajectory="forward", imu=True,
                                     lateral=0.8, sway_freq=0.15)
    seq_mono = synthetic.make_sequence(c, n_frames=F, n_points=600, seed=31,
                                       trajectory="forward", phase=0.3,
                                       lateral=0.8, sway_freq=0.15)
    tr = InProcessTransport()
    cl_vi = CollabClient(c, 0, tr, inertial=True)
    cl_mono = CollabClient(c, 1, tr)
    server = CollabServer(c, tr, n_agents=2)

    sent_before_init = 0
    for i in range(F):
        dt = np.diff(seq_vi.imu_t[i], prepend=seq_vi.imu_t[i][0] - 1 / 200.0)
        dt = np.where(seq_vi.imu_t[i] > 0, np.maximum(dt, 0), 0)
        cl_vi.process_frame_imu(seq_vi.images[i],
                                float(seq_vi.timestamps[i]),
                                seq_vi.imu_acc[i], seq_vi.imu_gyro[i], dt)
        cl_mono.process_frame(seq_mono.images[i],
                              float(seq_mono.timestamps[i]))
        if not cl_vi.slam.inertial_ready:
            sent_before_init = cl_vi.stats["deltas_sent"]
        cl_vi.comm_cycle()
        cl_mono.comm_cycle()
        # GBA after loop/merge events, like the reference
        # (LoopClosing::RunGlobalBundleAdjustment); with a mixed
        # visual+inertial arena the GBA holds the metric agents' poses
        server.comm_cycle(run_gba_on_events=True)

    # the VIBA1 uplink gate held: nothing published before init
    assert cl_vi.slam.imu_initialized, cl_vi.slam.stats
    assert sent_before_init == 0
    assert cl_vi.stats["deltas_sent"] > 0
    # the server learned the agent is inertial and holds its keyframes
    assert server.agents[0].inertial
    assert server.stats["kf_ingested"] > 8
    n_vi_kf = sum(1 for s in np.asarray(server.m.kf_agent)[
        np.asarray(server.m.kf_valid)] if s == 0)
    assert n_vi_kf > 3
    # cross-agent merge between the inertial and mono sub-maps happened
    assert server.stats["merges"] >= 1, server.stats
    # corrections flowed back to both agents
    assert cl_vi.stats["corrections_applied"] > 0
    assert cl_mono.stats["corrections_applied"] > 0
    # accuracy: both agents near GT (post-init segment for the VI agent)
    init_f = cl_vi.slam.stats["imu_init_frame"] + 2
    est = np.stack([T for _, T in cl_vi.slam.trajectory])[init_f:]
    gt = seq_vi.T_cw[init_f:]
    rmse = ate.ate_rmse(ate.camera_centers(est), ate.camera_centers(gt))
    g = ate.camera_centers(gt)
    span = float(np.linalg.norm(g.max(0) - g.min(0)))
    assert rmse < 0.12 * max(span, 1.0), (rmse, span)
    # the mono agent's per-frame log spans two gauges (its map was pulled
    # to metric scale at the merge and its live frame re-based — the
    # client-side correction propagation), so evaluate the POST-merge
    # segment: it must be clean after the server GBA settles the seam
    est_m = np.stack([T for _, T in cl_mono.slam.trajectory])[50:]
    gt_m = seq_mono.T_cw[50:]
    rmse_m = ate.ate_rmse(ate.camera_centers(est_m),
                          ate.camera_centers(gt_m))
    assert rmse_m < 0.12 * max(span, 1.0), rmse_m
