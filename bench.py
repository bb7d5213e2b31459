"""Benchmark: tracked frames/s/chip on a synthetic EuRoC-scale sequence.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference runs "real-time on standard CPUs" against a 20 fps
camera (BASELINE.md: camera_fps 20, 1000 ORB features, 8 levels, 752x480)
— so vs_baseline = our_fps / 20. The benchmark exercises the full
per-frame hot path (ORB pyramid extraction + two-round guided tracking
against a populated map + pose optimization) exactly as the pipeline runs
it, at the reference's feature budget.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from multi_orbslam3_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from multi_orbslam3_tpu import config as cfg
    from multi_orbslam3_tpu.dataio import synthetic
    from multi_orbslam3_tpu.frontend import extractor
    from multi_orbslam3_tpu.pipeline import tracking
    from multi_orbslam3_tpu.geometry import camera as cam
    import __graft_entry__ as ge

    # EuRoC-scale configuration (reference envelope: 752x480, 1000 feats)
    c = cfg.SystemConfig(camera=cfg.CameraConfig(width=752, height=480,
                                                 fx=458.654, fy=457.296,
                                                 cx=376.0, cy=240.0))
    seq = synthetic.make_sequence(c, n_frames=12, n_points=1500, seed=5,
                                  trajectory="forward")
    K = cam.intrinsics_from_config(c.camera)

    # populated map at flagship scale for the tracking stage
    m, _, _, _, _, _ = ge._make_example(
        n_feat=c.orb.n_features, max_kf=c.map.max_keyframes,
        max_mp=c.map.max_mappoints, width=c.camera.width,
        height=c.camera.height)

    imgs = [jnp.asarray(seq.images[i]) for i in range(seq.images.shape[0])]

    T0 = jnp.eye(4)
    # warmup / compile (fused extract+track: one program per frame)
    jax.block_until_ready(tracking.extract_and_track(m, imgs[0], T0, c))
    jax.block_until_ready(tracking.extract_and_track(m, imgs[1], T0, c))

    n_iter = 60
    t0 = time.perf_counter()
    for i in range(n_iter):
        feats, res = tracking.extract_and_track(m, imgs[i % len(imgs)],
                                                T0, c)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0
    fps = n_iter / dt

    print(json.dumps({
        "metric": "tracked_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
