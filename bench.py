"""Benchmark: FULL-SYSTEM accuracy + throughput across BASELINE configs.

Prints ONE JSON line on stdout. Primary metric stays tracked
frames/s/chip (vs_baseline = fps / the reference's 20 fps real-time
envelope, BASELINE.md), and the line carries per-config full-system
results for the CORE configs:

- mono / stereo / mono_inertial / collab_2agent: ATE RMSE (Sim3-aligned;
  SE3 for stereo) over OK-tracked frames of a synthetic ground-truth
  sequence, plus fps measured over the WHOLE pipeline (keyframe
  insertion, triangulation, fusion, local BA, loop closing included).
  mono/stereo/mono_inertial use the two-pass protocol (pass 1 warms the
  XLA caches, pass 2 is timed). The collab configs run a SINGLE pass
  inside the driver budget and report both fps definitions:
  total_fps_wall (frames/wall incl. compiles) and total_fps_tail
  (steady state over the tail two-thirds; collab's headline total_fps).

The headline JSON is printed IMMEDIATELY after the core configs so a
driver-side timeout can never lose the scored result (BENCH_r02/r03 both
timed out before the old end-of-run print). Heavier studies — 4-agent
collab, GBA iters/s at arena scale, kernel micro-bench, the virtual-mesh
GBA scaling sweep, EuRoC (if a dataset exists) — run only under
MO3_BENCH_FULL=1 and report on stderr, keeping stdout single-line.

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

    def emit():
        # re-printed after every core config: the driver parses the LAST
        # JSON line on stdout, so a timeout mid-config can no longer lose
        # the configs that already finished (BENCH_r02/r03 both scored
        # nothing because the single print sat after the slowest config).
        fps = configs.get("mono", {}).get("fps", 0.0)
        print(json.dumps({
            "metric": "tracked_frames_per_s_per_chip",
            "value": fps,
            "unit": "frames/s",
            "vs_baseline": round(fps / 20.0, 3),
            "configs": configs,
        }), flush=True)

    log("bench: mono (full system, loop closing on)...")
    configs["mono"] = B.bench_mono()
    log(f"  -> {configs['mono']}")
    emit()
    log("bench: stereo...")
    configs["stereo"] = B.bench_stereo()
    log(f"  -> {configs['stereo']}")
    emit()
    log("bench: mono_inertial (EuRoC T_bc)...")
    configs["mono_inertial"] = B.bench_mono_inertial()
    log(f"  -> {configs['mono_inertial']}")
    emit()
    log("bench: mini-ASL (EuRoC-layout dataset-ingest drill)...")
    try:
        configs["mini_asl"] = B.bench_mini_asl()
        log(f"  -> {configs['mini_asl']}")
    except Exception as e:  # noqa: BLE001
        configs["mini_asl"] = {"error": str(e)[:300]}
    emit()
    log("bench: collab 2-agent (150 frames, GBA on, single pass)...")
    # single pass: the two-pass warmup protocol doubled the slowest
    # config and pushed the whole bench past the driver budget
    # (BENCH_r03 rc=124); steady-state fps comes from the tail frames
    configs["collab_2agent"], server = B.bench_collab(
        n_agents=2, warmup=False)
    log(f"  -> {configs['collab_2agent']}")
    emit()
    # ---- heavy configs, IN the scored artifact (round-4 VERDICT Next
    # #4: 4-agent + arena-scale GBA + vocabulary selectivity had sat
    # behind MO3_BENCH_FULL and were never captured). Budget order:
    # cheapest first, emit() after each so a driver timeout keeps
    # whatever finished.
    log("bench: global BA at arena scale (1024 KF / 32k MP)...")
    try:
        configs["gba_large"] = B.bench_gba_large()
        log(f"  -> {configs['gba_large']}")
    except Exception as e:  # noqa: BLE001
        configs["gba_large"] = {"error": str(e)[:300]}
    emit()
    log("bench: collab 4-agent (BASELINE config #5, 100 frames)...")
    try:
        configs["collab_4agent"], server4 = B.bench_collab(
            n_agents=4, n_frames=100, warmup=False)
        log(f"  -> {configs['collab_4agent']}")
    except Exception as e:  # noqa: BLE001
        configs["collab_4agent"] = {"error": str(e)[:300]}
    emit()
    log("bench: vocabulary selectivity (10k vs 100k words)...")
    try:
        configs["vocab"] = B.bench_vocab_selectivity()
        log(f"  -> {configs['vocab']}")
    except Exception as e:  # noqa: BLE001
        configs["vocab"] = {"error": str(e)[:300]}
    emit()

    if os.environ.get("MO3_BENCH_FULL") != "1":
        return

    # ---- full mode: extra studies, results on stderr only -------------
    extra = {}
    log("bench[full]: global BA iters/s (2-agent arena)...")
    extra["gba"] = B.bench_gba(server)
    log(f"  -> {extra['gba']}")
    log("bench[full]: frontend kernel micro-bench (pallas vs XLA)...")
    extra["kernels"] = B.bench_kernels()
    log(f"  -> {extra['kernels']}")
    log("bench[full]: distributed GBA scaling sweep (virtual CPU mesh)...")
    extra["gba_scaling"] = _gba_scaling_sweep(log)
    log(f"  -> {extra['gba_scaling']}")

    euroc_root = os.environ.get(
        "EUROC_ROOT", os.path.join(os.path.dirname(__file__),
                                   "datasets", "euroc", "MH01"))
    euroc = B.bench_euroc(euroc_root)
    if euroc:
        extra["euroc_mono"] = euroc

    log("FULL_RESULTS " + json.dumps(extra))


def _gba_scaling_sweep(log):
    """Distributed-GBA behavior on the virtual CPU mesh (subprocess per
    N; the only multi-device surface on a 1-chip machine).

    HONESTY NOTE: virtual devices PARTITION one CPU's cores, so
    wall-clock speedup at N>1 is structurally impossible here — any
    "efficiency" number from this machine would measure thread
    contention, not ICI scaling. What this sweep does measure:

    - iters/s of the SAME shard_map program at N=1/2/4/8 — flat means
      the collective cost stays O(Kc*6) per CG iteration (the
      landmark-aligned decomposition), not O(P);
    - shard_overhead = t_sharded(1 dev) / t_single(1 dev) — the cost of
      entering shard_map at all;
    - the analytic per-CG-iteration collective traffic, which is what
      actually rides the ICI on a pod.

    True ≥0.8-efficiency measurement needs N physical chips; the driver
    dryrun validates this exact code path multi-device."""
    import subprocess
    out = {}
    rate1 = None
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={n}"
                            ).strip()
        try:
            r = subprocess.run(
                [sys.executable, "-m",
                 "multi_orbslam3_tpu.eval.gba_scaling"],
                capture_output=True, text=True, timeout=900, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            line = [ln for ln in r.stdout.strip().splitlines()
                    if ln.startswith("{")][-1]
            rec = json.loads(line)
            rate = rec["gba_iters_per_s"]
            if n == 1:
                rate1 = rate
                if rec.get("single_path_iters_per_s"):
                    out["single_path_iters_per_s"] = \
                        rec["single_path_iters_per_s"]
                    out["shard_overhead_1dev"] = round(
                        rec["single_path_iters_per_s"] / rate, 2)
            out[f"iters_per_s_{n}dev_sharded"] = rate
            if rate1:
                out[f"rate_vs_1dev_{n}dev"] = round(rate / rate1, 3)
        except Exception as e:  # noqa: BLE001
            out[f"error_{n}dev"] = str(e)[:200]
    # analytic collective traffic per CG iteration (what rides the ICI):
    # landmark-aligned -> one (Kc,6) psum; naive obs-sharding would add
    # a (P,3) psum per matvec
    Kc, P = 48, 3072     # the sweep arena (make_server_arena defaults)
    out["collective_bytes_per_cg_iter"] = Kc * 6 * 4
    out["collective_bytes_naive"] = (Kc * 6 + P * 3) * 4
    out["virtual_mesh_note"] = (
        "virtual CPU devices share one CPU's cores: speedup at N>1 is "
        "structurally impossible on this machine; flat iters/s across N "
        "demonstrates O(Kc) collective cost. ICI scaling needs a pod.")
    return out


if __name__ == "__main__":
    main()
