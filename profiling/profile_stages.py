"""Isolate steady-state device-program times for each pipeline stage on
the real chip: fused extract+track, update_found_visible, the mapping
chain, loop-closer db ops, and raw dispatch round-trip latency."""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import time
import numpy as np


def timeit(fn, n=20):
    import jax
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from multi_orbslam3_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from multi_orbslam3_tpu.eval import benchmarks as B
    from multi_orbslam3_tpu.dataio import synthetic
    from multi_orbslam3_tpu.pipeline.system import MonoSlam
    from multi_orbslam3_tpu.pipeline import tracking, local_mapping
    from multi_orbslam3_tpu.map import mapstate as ms
    from multi_orbslam3_tpu.bow import database as dbm

    c = B._euroc_scale_config()
    seq = synthetic.make_sequence(c, n_frames=60, n_points=1500,
                                  seed=5, trajectory="forward")
    # build a mature map by running the pipeline
    slam = MonoSlam(c, enable_loop_closing=True)
    for i in range(60):
        slam.process_frame(seq.images[i], float(seq.timestamps[i]))
    slam._adopt_pending(force=True)
    m = slam.m
    print("map:", int(m.n_kf), "KFs", int(m.n_mp), "MPs")

    # 0) dispatch round-trip latency over the tunnel
    x = jnp.zeros((8, 128))
    f = jax.jit(lambda a: a + 1)
    print(f"tiny-jit roundtrip       : {timeit(lambda: f(x), 50):8.2f} ms")
    img = jnp.asarray(seq.images[0], jnp.float32)
    print(f"host->dev img transfer   : "
          f"{timeit(lambda: jnp.asarray(seq.images[0], jnp.float32), 20):8.2f}"
          " ms")

    T_pred = jnp.asarray(slam.T_cur)
    # 1) fused extract+track
    print(f"extract_and_track        : "
          f"{timeit(lambda: tracking.extract_and_track(m, img, T_pred, c)):8.2f} ms")
    # 1b) extraction alone
    from multi_orbslam3_tpu.frontend import extractor
    print(f"extract_features         : "
          f"{timeit(lambda: extractor.extract_features(img, c)):8.2f} ms")
    feats = extractor.extract_features(img, c)
    K = slam.K
    print(f"track_frame alone        : "
          f"{timeit(lambda: tracking.track_frame(m, feats, T_pred, K, width=c.camera.width, height=c.camera.height, scale_factor=c.orb.scale_factor, n_levels=c.orb.n_levels)):8.2f} ms")
    # 2) update_found_visible
    feat_mp = m.kf_mp[0]
    vis = m.mp_valid
    print(f"update_found_visible     : "
          f"{timeit(lambda: ms.update_found_visible(m, feat_mp, vis)):8.2f} ms")
    # 3) mapping chain
    k = int(m.n_kf) - 1
    print(f"process_new_keyframe     : "
          f"{timeit(lambda: local_mapping.process_new_keyframe(m, jnp.int32(k), K, n_neighbors=c.local_mapping.triangulation_neighbors, width=c.camera.width, height=c.camera.height, scale_factor=c.orb.scale_factor, n_levels=c.orb.n_levels), 5):8.2f} ms")
    print(f"local_ba (16+8,4096,10it): "
          f"{timeit(lambda: local_mapping.local_bundle_adjustment(m, jnp.int32(k), K, n_window=16, n_fixed=8, n_points=4096, scale_factor=c.orb.scale_factor, iters=10), 5):8.2f} ms")
    # 4) loop closer pieces
    lc = slam.loop_closer
    covis_t = timeit(lambda: ms.covisibility_row(m, jnp.int32(k)))
    print(f"covisibility_row         : {covis_t:8.2f} ms")
    desc = m.kf_desc[jnp.int32(k)]
    fv = m.kf_feat_valid[jnp.int32(k)]
    excl = jnp.zeros(m.max_kf, bool)
    print(f"bow query                : "
          f"{timeit(lambda: dbm.query(lc.db, lc.voc, desc, fv, excl)):8.2f} ms")
    print(f"bow add                  : "
          f"{timeit(lambda: dbm.add_keyframe_bow(lc.db, lc.voc, jnp.int32(k), desc, fv)[0].bow):8.2f} ms")
    # 5) track_reference_kf (fallback)
    print(f"track_reference_kf       : "
          f"{timeit(lambda: tracking.track_reference_kf(m, jnp.int32(slam.ref_kf), feats, T_pred, K, scale_factor=c.orb.scale_factor)):8.2f} ms")


if __name__ == "__main__":
    main()
