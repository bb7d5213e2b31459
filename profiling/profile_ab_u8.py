"""A/B: mono full-system run with uint8 wire frames vs float32, on the
real chip — isolates whether the uint8 quantization costs tracking
robustness (frames_lost regression seen in profile_mono)."""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import time
import numpy as np


def run(u8: bool):
    import jax.numpy as jnp
    from multi_orbslam3_tpu.eval import benchmarks as B
    from multi_orbslam3_tpu.dataio import synthetic
    from multi_orbslam3_tpu.pipeline.system import MonoSlam

    c = B._euroc_scale_config()
    seq = synthetic.make_sequence(c, n_frames=120, n_points=1500,
                                  seed=5, trajectory="forward")
    for timed in (False, True):
        slam = MonoSlam(c, enable_loop_closing=True)
        if not u8:
            slam.to_device = lambda im: im if isinstance(im, jnp.ndarray) \
                else jnp.asarray(np.asarray(im, np.float32))
        t0 = time.perf_counter()
        for i in range(120):
            slam.process_frame(seq.images[i], float(seq.timestamps[i]))
        wall = time.perf_counter() - t0
    print(f"u8={u8}: fps={120 / wall:.2f} stats={slam.stats}")


def main():
    from multi_orbslam3_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    run(True)
    run(False)


if __name__ == "__main__":
    main()
