"""Benchmark: FULL-SYSTEM accuracy + throughput across BASELINE configs.

Prints ONE JSON line. Primary metric stays tracked frames/s/chip
(vs_baseline = fps / the reference's 20 fps real-time envelope,
BASELINE.md), but the line also carries per-config full-system results:

- mono / stereo / mono_inertial / collab_2agent: ATE RMSE (Sim3-aligned;
  SE3 for stereo) over OK-tracked frames of a synthetic ground-truth
  sequence, plus fps measured over the WHOLE pipeline (keyframe
  insertion, triangulation, fusion, local BA, loop closing included —
  two-pass protocol so compilation is excluded but mapping work is not).
- gba_iters_per_s: global-BA PCG iterations/s on the collaborative arena.
- euroc: activates when an EuRoC dataset directory exists
  (EUROC_ROOT env var or ./datasets/euroc/MH01).

The reference's validation story is trajectory export + ATE
(src/ServerSystem.cc:134-185); this bench reproduces it in-process.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    from multi_orbslam3_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from multi_orbslam3_tpu.eval import benchmarks as B

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    configs = {}
    log("bench: mono (full system, loop closing on)...")
    configs["mono"] = B.bench_mono()
    log(f"  -> {configs['mono']}")
    log("bench: stereo...")
    configs["stereo"] = B.bench_stereo()
    log(f"  -> {configs['stereo']}")
    log("bench: mono_inertial (EuRoC T_bc)...")
    configs["mono_inertial"] = B.bench_mono_inertial()
    log(f"  -> {configs['mono_inertial']}")
    log("bench: collab 2-agent...")
    configs["collab_2agent"], server = B.bench_collab(n_agents=2)
    log(f"  -> {configs['collab_2agent']}")
    log("bench: global BA iters/s...")
    gba = B.bench_gba(server)
    log(f"  -> {gba}")
    log("bench: frontend kernel micro-bench (pallas vs XLA)...")
    kernels = B.bench_kernels()
    log(f"  -> {kernels}")

    euroc_root = os.environ.get(
        "EUROC_ROOT", os.path.join(os.path.dirname(__file__),
                                   "datasets", "euroc", "MH01"))
    euroc = B.bench_euroc(euroc_root)
    if euroc:
        configs["euroc_mono"] = euroc

    fps = configs["mono"].get("fps", 0.0)
    print(json.dumps({
        "metric": "tracked_frames_per_s_per_chip",
        "value": fps,
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
        "configs": configs,
        "gba": gba,
        "kernels": kernels,
    }))


if __name__ == "__main__":
    main()
