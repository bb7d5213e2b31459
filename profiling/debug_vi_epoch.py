"""Repro: why does VI init not fire on the epoch-timestamped mini-ASL
drill (tests/test_euroc_drill.py::test_mono_inertial_epoch_timestamps)?"""
import os
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from multi_orbslam3_tpu import config as cfg
from multi_orbslam3_tpu.dataio import euroc, mini_asl, synthetic
from multi_orbslam3_tpu.pipeline.inertial_system import MonoInertialSlam


def main():
    c = cfg.synthetic_mono(width=320, height=240)
    seq = synthetic.make_sequence(c, n_frames=60, n_points=700,
                                  seed=13, trajectory="forward", imu=True,
                                  lateral=0.8, sway_freq=0.15)
    tmp = tempfile.mkdtemp()
    root = os.path.join(tmp, "MINI01")
    mini_asl.write_mini_asl(root, seq)
    c = c.replace(
        orb=cfg.ORBConfig(n_features=256, n_levels=4),
        map=cfg.MapConfig(max_keyframes=64, max_mappoints=2048,
                          max_obs=16384, max_obs_per_kf=256),
        local_mapping=cfg.LocalMappingConfig(
            local_ba_kfs=8, local_ba_fixed_kfs=4, local_ba_points=1024,
            local_ba_iters=8))
    slam = MonoInertialSlam(c, enable_loop_closing=False)

    orig = slam._maybe_initialize_imu

    def traced(refine=False):
        n = int(slam.m.n_kf)
        validm = np.asarray(slam.m.kf_valid[:n])
        agentm = np.asarray(slam.m.kf_agent[:n])
        own = [k for k in range(n) if validm[k] and agentm[k] == slam.agent]
        preints = [slam.kf_preint[k] for k in own[1:]]
        missing = [own[1:][i] for i, p in enumerate(preints) if p is None]
        total_t = sum(float(p.dT) for p in preints if p is not None)
        print(f"init attempt: n={n} own={len(own)} missing_preint={missing} "
              f"total_t={total_t:.3f}", file=sys.stderr)
        from multi_orbslam3_tpu.opt import inertial_init
        oi = inertial_init.inertial_init

        def traced_init(*a, **k):
            r = oi(*a, **k)
            print(f"  inertial_init chi2={float(r.chi2):.4g} "
                  f"scale={float(r.scale):.4g}", file=sys.stderr)
            return r
        inertial_init.inertial_init = traced_init
        try:
            return orig(refine)
        finally:
            inertial_init.inertial_init = oi

    slam._maybe_initialize_imu = traced

    it = euroc.EurocSequence(root, imu=True)
    for i, (t, img, acc, gyro, dt) in enumerate(it):
        s = slam.process_frame_imu(img, t, acc, gyro, dt)
        print(f"frame {i}: t={t:.3f} state={s} n_kf={int(slam.m.n_kf)} "
              f"init={slam.imu_initialized}", file=sys.stderr)
    print("FINAL:", slam.imu_initialized, slam.stats, file=sys.stderr)


if __name__ == "__main__":
    main()
