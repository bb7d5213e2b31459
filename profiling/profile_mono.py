"""Per-stage profiler for the mono full-system path on the real chip.

Instruments MonoSlam.process_frame with wall-time buckets to locate the
host-side latency the round-2 verdict flagged (5.19 fps vs 20 target).
"""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import time
import numpy as np


def main():
    from multi_orbslam3_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from multi_orbslam3_tpu.eval import benchmarks as B
    from multi_orbslam3_tpu import config as cfg
    from multi_orbslam3_tpu.dataio import synthetic
    from multi_orbslam3_tpu.pipeline.system import MonoSlam
    from multi_orbslam3_tpu.pipeline import tracking, local_mapping
    from multi_orbslam3_tpu.frontend import extractor

    c = B._euroc_scale_config()
    seq = synthetic.make_sequence(c, n_frames=120, n_points=1500,
                                  seed=5, trajectory="forward")

    buckets = {}

    def record(name, dt):
        buckets.setdefault(name, []).append(dt)

    # wrap the jitted entry points with timers (includes host block time)
    orig_extract_and_track = tracking.extract_and_track
    orig_track_decide = MonoSlam._track_decide
    orig_dispatch = MonoSlam._dispatch_mapping
    orig_adopt = MonoSlam._adopt_pending
    orig_loop_close = MonoSlam._loop_close

    def timed_eat(*a, **k):
        t0 = time.perf_counter()
        r = orig_extract_and_track(*a, **k)
        record("extract_and_track_dispatch", time.perf_counter() - t0)
        return r

    def timed_decide(self, *a, **k):
        t0 = time.perf_counter()
        r = orig_track_decide(self, *a, **k)
        record("track_decide_total", time.perf_counter() - t0)
        return r

    def timed_dispatch(self, *a, **k):
        t0 = time.perf_counter()
        r = orig_dispatch(self, *a, **k)
        record("dispatch_mapping", time.perf_counter() - t0)
        return r

    def timed_adopt(self, force=False):
        t0 = time.perf_counter()
        r = orig_adopt(self, force)
        record("adopt_pending" + ("_force" if force else ""),
               time.perf_counter() - t0)
        return r

    def timed_loop(self, k):
        t0 = time.perf_counter()
        r = orig_loop_close(self, k)
        record("loop_close", time.perf_counter() - t0)
        return r

    tracking.extract_and_track = timed_eat
    MonoSlam._track_decide = timed_decide
    MonoSlam._dispatch_mapping = timed_dispatch
    MonoSlam._adopt_pending = timed_adopt
    MonoSlam._loop_close = timed_loop

    # also time the first host sync inside track_decide: patch int() sync by
    # timing n_inliers read. Simplest: time res.n_inliers block separately.

    F = seq.images.shape[0]
    for timed in (False, True):
        slam = MonoSlam(c, enable_loop_closing=True)
        if timed:
            buckets.clear()
        frame_times = []
        t0 = time.perf_counter()
        for i in range(F):
            tf = time.perf_counter()
            slam.process_frame(seq.images[i], float(seq.timestamps[i]))
            frame_times.append(time.perf_counter() - tf)
        wall = time.perf_counter() - t0
    print(f"fps={F / wall:.2f} wall={wall:.2f}s")
    ft = np.array(frame_times) * 1e3
    print(f"frame ms: p50={np.percentile(ft, 50):.1f} "
          f"p90={np.percentile(ft, 90):.1f} p99={np.percentile(ft, 99):.1f} "
          f"max={ft.max():.1f} mean={ft.mean():.1f}")
    total = wall
    for name, vals in sorted(buckets.items(),
                             key=lambda kv: -sum(kv[1])):
        v = np.array(vals) * 1e3
        print(f"  {name:32s} n={len(v):4d} sum={v.sum()/1e3:7.2f}s "
              f"mean={v.mean():7.2f}ms max={v.max():7.2f}ms "
              f"({v.sum()/1e3/total*100:5.1f}%)")
    print("stats:", slam.stats)


if __name__ == "__main__":
    main()
