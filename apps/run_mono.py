#!/usr/bin/env python
"""Single-agent monocular SLAM runner.

Replaces the reference's ClientNode + roslaunch (ros/src/ClientNode.cc,
ros/launch/Client0_euroc.launch): feeds a EuRoC directory (if given) or a
synthetic sequence through MonoSlam, writes the TUM keyframe trajectory
(SaveKeyFrameTrajectoryEuRoC semantics) and a map snapshot PNG.

Usage:
    python apps/run_mono.py --out /tmp/run1 [--euroc /path/to/MH_01] \
        [--frames 200] [--inertial]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--euroc", default=None,
                    help="EuRoC sequence root (with mav0/); synthetic if absent")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--inertial", action="store_true")
    ap.add_argument("--no-loop-closing", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import numpy as np

    from multi_orbslam3_tpu import config as cfg
    from multi_orbslam3_tpu.dataio import synthetic, tum
    from multi_orbslam3_tpu.eval import ate, viewer
    from multi_orbslam3_tpu.utils.timing import GLOBAL_TIMER

    t_start = time.perf_counter()
    if args.euroc:
        from multi_orbslam3_tpu.dataio import euroc
        c = cfg.euroc_mono()
        seq_iter = euroc.EurocSequence(args.euroc, imu=args.inertial,
                                       max_frames=args.frames)
        gt = None
    else:
        c = cfg.synthetic_mono()
        seq = synthetic.make_sequence(c, n_frames=args.frames, n_points=800,
                                      seed=1, imu=args.inertial,
                                      lateral=0.8 if args.inertial else 0.4,
                                      sway_freq=0.15 if args.inertial else 0.08)
        gt = seq.T_cw

    if args.inertial:
        from multi_orbslam3_tpu.pipeline.inertial_system import MonoInertialSlam
        slam = MonoInertialSlam(c, enable_loop_closing=not args.no_loop_closing)
    else:
        from multi_orbslam3_tpu.pipeline.system import MonoSlam
        slam = MonoSlam(c, enable_loop_closing=not args.no_loop_closing)

    n = 0
    states = []
    if args.euroc:
        for item in seq_iter:
            with GLOBAL_TIMER.stage("frame"):
                if args.inertial:
                    t, img, acc, gyro, dt = item
                    states.append(slam.process_frame_imu(img, t, acc,
                                                         gyro, dt))
                else:
                    t, img = item
                    states.append(slam.process_frame(img, t))
            n += 1
    else:
        for i in range(seq.images.shape[0]):
            with GLOBAL_TIMER.stage("frame"):
                if args.inertial:
                    dt = np.diff(seq.imu_t[i],
                                 prepend=seq.imu_t[i][0] - 1 / 200.0)
                    dt = np.where(seq.imu_t[i] > 0, np.maximum(dt, 0), 0)
                    states.append(slam.process_frame_imu(
                        seq.images[i], float(seq.timestamps[i]),
                        seq.imu_acc[i], seq.imu_gyro[i], dt))
                else:
                    states.append(slam.process_frame(
                        seq.images[i], float(seq.timestamps[i])))
            n += 1
    wall = time.perf_counter() - t_start

    tum.write_tum(os.path.join(args.out, "KeyFrameTrajectory.txt"),
                  slam.keyframe_trajectory())
    viewer.plot_map(slam.m, os.path.join(args.out, "map.png"),
                    title=f"mono map ({n} frames)",
                    gt_centers=ate.camera_centers(gt) if gt is not None
                    else None)
    report = {"frames": n, "fps": round(n / wall, 2), "stats": slam.stats,
              "timing": GLOBAL_TIMER.summary()}
    if gt is not None:
        # evaluate over OK-tracked frames; for inertial skip the pre-init
        # segment (the IMU-init re-gauge makes pre/post incomparable)
        from multi_orbslam3_tpu.eval.benchmarks import _ate_over_ok
        skip = slam.stats.get("imu_init_frame", -1) + 2 \
            if args.inertial else 0
        acc = _ate_over_ok(slam.trajectory, states, gt, skip_head=skip)
        if acc:
            report.update(acc)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
