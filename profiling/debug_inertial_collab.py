"""Instrumented repro of test_inertial_agent_collaborates: tracks the VI
agent's per-frame position error, gravity-direction error, and the
timing of merges/GBA/corrections to locate where the gauge corrupts."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
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


def main():
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

    merges_seen = 0
    gba_seen = 0
    for i in range(F):
        dt = np.diff(seq_vi.imu_t[i], prepend=seq_vi.imu_t[i][0] - 1 / 200.0)
        dt = np.where(seq_vi.imu_t[i] > 0, np.maximum(dt, 0), 0)
        cl_vi.process_frame_imu(seq_vi.images[i],
                                float(seq_vi.timestamps[i]),
                                seq_vi.imu_acc[i], seq_vi.imu_gyro[i], dt)
        cl_mono.process_frame(seq_mono.images[i],
                              float(seq_mono.timestamps[i]))
        cl_vi.comm_cycle()
        cl_mono.comm_cycle()
        server.comm_cycle(run_gba_on_events=True)

        # per-frame error of the VI agent vs GT (rigid per-frame diff)
        T_est = np.asarray(cl_vi.slam.T_cur)
        T_gt = seq_vi.T_cw[i]
        c_est = -T_est[:3, :3].T @ T_est[:3, 3]
        c_gt = -T_gt[:3, :3].T @ T_gt[:3, 3]
        events = []
        if server.stats["merges"] > merges_seen:
            events.append("MERGE")
            merges_seen = server.stats["merges"]
        if server.stats["gba_runs"] > gba_seen:
            events.append(f"GBA x{server.stats['gba_runs'] - gba_seen}")
            gba_seen = server.stats["gba_runs"]
        init = cl_vi.slam.imu_initialized
        # gravity check: world z should be gravity-aligned after init; the
        # synthetic GT world is built with gravity -z, so the estimated
        # map's rotation error vs GT tells the tilt. Use the relative
        # rotation of est vs gt camera:
        R_rel = T_est[:3, :3] @ T_gt[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(R_rel) - 1) / 2,
                                           -1, 1)))
        corr = cl_vi.stats["corrections_applied"]
        st = cl_vi.slam.state.name[:4]
        v = np.linalg.norm(cl_vi.slam.v_cur)
        # GT velocity from consecutive centers
        if i > 0:
            Tg0 = seq_vi.T_cw[i - 1]
            cg0 = -Tg0[:3, :3].T @ Tg0[:3, 3]
            dt_f = float(seq_vi.timestamps[i] - seq_vi.timestamps[i - 1])
            v_gt = np.linalg.norm(c_gt - cg0) / max(dt_f, 1e-6)
        else:
            v_gt = 0.0
        # mono agent error (rigid, no alignment)
        T_me = np.asarray(cl_mono.slam.T_cur)
        T_mg = seq_mono.T_cw[i]
        cm_e = -T_me[:3, :3].T @ T_me[:3, 3]
        cm_g = -T_mg[:3, :3].T @ T_mg[:3, 3]
        R_rel_m = T_me[:3, :3] @ T_mg[:3, :3].T
        ang_m = np.degrees(np.arccos(np.clip(
            (np.trace(R_rel_m) - 1) / 2, -1, 1)))
        mst = cl_mono.slam.state.name[:4]
        print(f"f{i:3d} init={int(init)} {st} "
              f"|dc|={np.linalg.norm(c_est - c_gt):7.4f}"
              f" rot={ang:6.2f}deg |v|={v:6.2f}/{v_gt:5.2f}"
              f" corr={corr:4d} kf={cl_vi.slam.stats['kf_inserted']:3d}"
              f" | m:{mst} |dc|={np.linalg.norm(cm_e - cm_g):7.3f}"
              f" rot={ang_m:5.1f} mcorr={cl_mono.stats['corrections_applied']:3d}"
              f" {' '.join(events)}")

    init_f = cl_vi.slam.stats["imu_init_frame"] + 2
    est = np.stack([T for _, T in cl_vi.slam.trajectory])[init_f:]
    gt = seq_vi.T_cw[init_f:]
    rmse = ate.ate_rmse(ate.camera_centers(est), ate.camera_centers(gt))
    g = ate.camera_centers(gt)
    span = float(np.linalg.norm(g.max(0) - g.min(0)))
    print(f"VI ATE={rmse:.4f} span={span:.3f} gate={0.12 * max(span, 1.0):.4f}"
          f" {'PASS' if rmse < 0.12 * max(span, 1.0) else 'FAIL'}")
    est_m = np.stack([T for _, T in cl_mono.slam.trajectory])[50:]
    gt_m = seq_mono.T_cw[50:]
    rmse_m = ate.ate_rmse(ate.camera_centers(est_m),
                          ate.camera_centers(gt_m))
    print(f"mono tail ATE={rmse_m:.4f} "
          f"{'PASS' if rmse_m < 0.12 * max(span, 1.0) else 'FAIL'}")
    print("server:", server.stats)
    print("vi:", cl_vi.slam.stats)


if __name__ == "__main__":
    main()
