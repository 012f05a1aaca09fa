"""Benchmark: HYPELCNN training + full-scene inference on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.

Workload: the reference's documented flagship — HYPELCNN (filter_count=480,
`nnmodel/modelconfigs/alg_param_hypelcnn.json`) on a TRUE GRSS2013-scale
scene (349x1905, 144-band CASI + 1-band LiDAR, 15 classes — dims per
`loader/GRSS2013DataLoader.py:94-95`), with the full training pipeline
on-device: window gather + rotation/reflection augmentation +
forward/backward + Adam, batch 4096 bfloat16, scan-chunked (200 steps per
dispatch), median of 10 measurement windows (the shared chip swings 25x
between windows; only the median is meaningful).

``vs_baseline`` compares against a MEASURED number: the TF reference's own
hot loop (`classify/monitored_session_runner.py:182-184`) run in this image
via ``scripts/measure_tf_reference.py`` and recorded in
``BASELINE_TF_MEASURED.json``.  The reference publishes no numbers
(BASELINE.md); if the measured baseline file is absent, ``vs_baseline`` is
null — never an invented constant.  Caveat carried in ``extras``: the
reference measurement runs on CPU (this image has no CUDA GPU; the
reference's documented setup is a single GPU).

``extras`` adds: MFU + achieved FLOP/s for the training step (FLOPs from
XLA's own cost analysis of the compiled program, peak from the device kind),
and the full-scene inference sweep (entire 349x1905 scene classified in one
jitted dispatch) as a second machine-readable metric.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

# bf16 peak FLOP/s per chip by TPU generation (public spec sheets)
PEAK_BF16_FLOPS = {
    "v4": 275e12,
    "v5lite": 197e12,  # v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v6": 918e12,  # Trillium
    "v6e": 918e12,
}


def peak_flops_for(device_kind: str):
    kind = device_kind.lower().replace(" ", "")
    for key, flops in sorted(PEAK_BF16_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if key in kind:
            return flops
    return None


def load_measured_baseline():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_TF_MEASURED.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _flops_of(compiled) -> float:
    """FLOPs of the compiled program per XLA's cost analysis.

    CAVEAT (verified empirically): XLA counts a ``lax.scan`` body ONCE — the
    trip count is NOT multiplied in.  For a scan-chunked train program the
    returned number is therefore ~the FLOPs of ONE step, and chunk totals
    must multiply by the scan length.  (An earlier bench divided this by the
    chunk length, underreporting per-step FLOPs — and MFU — by ~chunk x.)
    """
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0)) if cost else 0.0


# v5e HBM bandwidth per chip (public spec: 819 GB/s)
PEAK_HBM_BYTES = {"v5lite": 819e9, "v5e": 819e9, "v5p": 2765e9,
                  "v6": 1640e9, "v6e": 1640e9}


def peak_hbm_for(device_kind: str):
    kind = device_kind.lower().replace(" ", "")
    for key, bw in sorted(PEAK_HBM_BYTES.items(), key=lambda kv: -len(kv[0])):
        if key in kind:
            return bw
    return None


def _bytes_of(compiled) -> float:
    """"bytes accessed" of the compiled program per XLA's cost analysis —
    same scan-body-once caveat as :func:`_flops_of` (the number is ~one
    step's HBM traffic).  Static estimate: gathers are costed at their
    sliced sizes, fusions at their root operands, so treat it as the
    op-level traffic XLA schedules, not a DMA trace."""
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(cost.get("bytes accessed", 0.0)) if cost else 0.0


# ---------------------------------------------------------------------------
# Outage-proof supervisor.
#
# Round 4's driver capture (BENCH_r04.json) failed rc=1 because the axon TPU
# tunnel returned UNAVAILABLE at snapshot time — and the tunnel's OTHER
# documented failure mode is a plain hang on ``jax.devices()`` (CLAUDE.md
# "Environment hazards").  Neither can be survived in-process: a hang inside
# the PJRT client is not interruptible from Python.  So the default entry
# point is a supervisor that
#   1. probes backend liveness in a SUBPROCESS with a hard timeout (a hung
#      probe is killed, not waited on),
#   2. re-invokes this file with ``--inner`` as a timed subprocess to run the
#      actual benchmark,
#   3. retries both with exponential backoff under a total deadline, and
#   4. on final failure prints ONE parseable JSON line carrying the error and
#      the last good recorded value (scanned from BENCH_r*.json) instead of a
#      traceback — the driver's record stays machine-readable either way.
#
# Env knobs (all optional; defaults sized for the real driver run):
#   BENCH_ATTEMPTS=4  BENCH_BACKOFF_S=60  BENCH_PROBE_TIMEOUT_S=240
#   BENCH_INNER_TIMEOUT_S=2400  BENCH_DEADLINE_S=4800
#   BENCH_PROBE_OVERRIDE=<shell cmd>   (tests substitute a failing probe)
# ---------------------------------------------------------------------------

_PROBE_SRC = (
    "import jax; d = jax.devices(); assert d; print(d[0].device_kind)"
)

METRIC_NAME = "hypelcnn_train_patches_per_sec_per_chip"


def _last_good():
    """Latest BENCH_r*.json whose parsed record carries a value."""
    best = None
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = rec.get("parsed")
        if isinstance(parsed, dict) and parsed.get("value"):
            best = {"value": parsed["value"],
                    "unit": parsed.get("unit"),
                    "source": os.path.basename(path)}
    return best


def _tail(text, n=400) -> str:
    return (text or "").strip()[-n:]


def _supervise(passthrough_argv) -> int:
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "4"))
    backoff = float(os.environ.get("BENCH_BACKOFF_S", "60"))
    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "240"))
    inner_timeout = float(os.environ.get("BENCH_INNER_TIMEOUT_S", "2400"))
    deadline = time.time() + float(os.environ.get("BENCH_DEADLINE_S", "4800"))
    errors = []
    for i in range(attempts):
        if time.time() > deadline:
            errors.append(f"attempt {i}: total deadline exceeded")
            break
        probe_override = os.environ.get("BENCH_PROBE_OVERRIDE")
        try:
            if probe_override:
                probe = subprocess.run(probe_override, shell=True, text=True,
                                       capture_output=True, timeout=probe_timeout)
            else:
                probe = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                                       text=True, capture_output=True,
                                       timeout=probe_timeout)
            probe_ok = probe.returncode == 0
            if not probe_ok:
                errors.append(f"attempt {i}: probe rc={probe.returncode}: "
                              f"{_tail(probe.stderr, 300)}")
        except subprocess.TimeoutExpired:
            probe_ok = False
            errors.append(f"attempt {i}: probe hung >{probe_timeout:.0f}s "
                          "(backend unresponsive; killed)")
        if probe_ok:
            print(f"bench supervisor: backend probe ok (attempt {i}), "
                  "running inner benchmark", file=sys.stderr)
            try:
                inner = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--inner",
                     *passthrough_argv],
                    text=True, capture_output=True, timeout=inner_timeout)
                line = None
                for cand in reversed((inner.stdout or "").splitlines()):
                    cand = cand.strip()
                    if cand.startswith("{"):
                        try:
                            json.loads(cand)
                            line = cand
                            break
                        except ValueError:
                            continue
                if inner.returncode == 0 and line:
                    print(line)
                    return 0
                errors.append(f"attempt {i}: inner rc={inner.returncode}: "
                              f"{_tail(inner.stderr, 600)}")
            except subprocess.TimeoutExpired:
                errors.append(f"attempt {i}: inner benchmark exceeded "
                              f"{inner_timeout:.0f}s; killed")
        if i < attempts - 1:
            delay = backoff * (2 ** i)
            print(f"bench supervisor: attempt {i} failed, backing off "
                  f"{delay:.0f}s", file=sys.stderr)
            time.sleep(delay)
    print(json.dumps({
        "metric": METRIC_NAME,
        "value": None,
        "unit": "patches/s",
        "vs_baseline": None,
        "error": "; ".join(errors)[-1500:] or "unknown failure",
        "last_good": _last_good(),
    }))
    return 0


def _honor_platform_request() -> None:
    # the ambient TPU plugin wins even over JAX_PLATFORMS (CLAUDE.md);
    # --smoke's documented CPU pass needs the authoritative config switch
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--chunk", type=int, default=None,
                        help="steps per compiled scan chunk (default 200; "
                             "4 under --smoke).  Measured sweep on the v5e: "
                             "50: 715k / 200: 784k / 500: 798k patches/s — "
                             "dispatch overhead is ~0.5 ms/step at 50; 200 "
                             "amortizes it while matching a realistic "
                             "log-every-200 training cadence")
    parser.add_argument("--smoke", action="store_true",
                        help="tiny shapes for a CPU correctness pass; NOT a benchmark")
    parser.add_argument("--inner", action="store_true",
                        help="run the benchmark body directly (no supervisor; "
                             "used by the supervisor's own re-invocation)")
    parser.add_argument("--supervise", action="store_true",
                        help="force the supervisor even with --smoke (lets "
                             "tests exercise the retry/JSON-relay path on CPU)")
    parser.add_argument("--fused", type=int, default=None, choices=(0, 1),
                        help="override fuse_level_convs (A/B lever; default: "
                             "the model's default)")
    parser.add_argument("--compiler_option", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="XLA compiler option override for the train "
                             "chunk (repeatable), e.g. "
                             "xla_tpu_allow_layout_negotiation=true — rides "
                             "lowered.compile(compiler_options=...), which "
                             "reaches the remote TPU compiler (env XLA_FLAGS "
                             "may not)")
    args = parser.parse_args()
    if not args.inner and (args.supervise or not args.smoke):
        # default path (what the driver runs): outage-proof supervisor.
        # --smoke stays direct — it is a CPU correctness pass used by tests
        # and needs no tunnel protection (unless --supervise asks for it).
        passthrough = [a for a in sys.argv[1:]
                       if a not in ("--inner", "--supervise")]
        raise SystemExit(_supervise(passthrough))
    _honor_platform_request()

    import jax
    import jax.numpy as jnp

    from hypelcnn_tpu.data.augmentation import AugmentationInfo
    from hypelcnn_tpu.data.loaders.synthetic import SyntheticDataLoader
    from hypelcnn_tpu.models import HYPELCNNModel

    # TRUE GRSS2013-scale synthetic scene: 349x1905, 144-band CASI + LiDAR,
    # 15 classes — ~385 MB resident in HBM (the SURVEY §7 residency case)
    scene_url = ("synthetic://?h=64&w=96&bands=8&classes=15" if args.smoke
                 else "synthetic://?h=349&w=1905&bands=144&classes=15")
    loader = SyntheticDataLoader(scene_url)
    scene = loader.load_data(neighborhood=1, normalize=True)
    np.random.seed(0)
    ratios = (0.3, 0.1) if args.smoke else (0.1, 0.02)
    samples = loader.load_samples(train_data_ratio=ratios[0], test_data_ratio=ratios[1])

    from hypelcnn_tpu.train.trainer import ClassificationTrainer

    model = HYPELCNNModel()
    # measured sweet spot on v5e (see DESIGN.md perf notes): 2048: 630k,
    # 4096: 717k, 8192: 696k, 16384: 613k patches/s — the MXU is idle at the
    # reference's 48 either way; 4096 best amortizes per-op overhead before
    # activation traffic starts spilling
    batch_size = 64 if args.smoke else 4096
    algorithm_params = {**model.default_params(), "batch_size": batch_size,
                        "compute_dtype": "bfloat16"}
    if args.fused is not None:
        algorithm_params["fuse_level_convs"] = bool(args.fused)
    if args.smoke:
        algorithm_params["filter_count"] = 32

    trainer = ClassificationTrainer(
        model=model, class_count=15, algorithm_params=algorithm_params,
        scene=scene, sample_set=samples,
        augmentation_info=AugmentationInfo(perform_rotation_augmentation=True,
                                           perform_reflection_augmentation=True),
        test_cadence=10 ** 9)

    # ---- training throughput: compiled scan chunk, median of 10 windows ----
    train = samples.training_targets
    # tables ride as program arguments (trainer._build_train_chunk contract)
    tables = (jnp.asarray(train[:, :2].astype(np.int32)),
              jnp.asarray(train[:, 2].astype(np.int32)),
              trainer.rng_pool.key("train", 0))
    step_fn = trainer._build_train_chunk()
    state = trainer.init_state()

    chunk = args.chunk or (4 if args.smoke else 200)
    arrays = trainer.sources["training"].device_arrays()
    idx = jnp.asarray(np.random.randint(0, train.shape[0],
                                        size=(chunk, batch_size)).astype(np.int32))
    step_nos = jnp.arange(chunk, dtype=jnp.uint32)
    lowered = step_fn.lower(state, arrays, tables, idx, step_nos)
    if args.compiler_option:
        opts = dict(kv.split("=", 1) for kv in args.compiler_option)
        compiled = lowered.compile(compiler_options=opts)
    else:
        compiled = lowered.compile()
    step_flops = _flops_of(compiled)  # scan body counted once = ONE step

    state, losses = compiled(state, arrays, tables, idx, step_nos)  # warm
    float(losses[-1])

    windows = []
    for _ in range(10):
        t0 = time.time()
        state, losses = compiled(state, arrays, tables, idx, step_nos)
        # synchronize by FETCHING a scalar: through the remote tunnel
        # block_until_ready does not reliably block (verify SKILL.md)
        float(losses[-1])
        windows.append(time.time() - t0)
    elapsed = float(np.median(windows))
    patches_per_sec = chunk * batch_size / elapsed

    device_kind = jax.devices()[0].device_kind
    peak = peak_flops_for(device_kind)
    achieved_flops = step_flops * chunk / elapsed if step_flops else None
    mfu = (achieved_flops / peak) if (achieved_flops and peak) else None

    # ---- roofline: which wall does the op mix hit first? ----
    step_bytes = _bytes_of(compiled)
    peak_bw = peak_hbm_for(device_kind)
    step_ms = elapsed / chunk * 1e3
    flops_bound_ms = (step_flops / peak * 1e3) if (step_flops and peak) else None
    bytes_bound_ms = (step_bytes / peak_bw * 1e3) if (step_bytes and peak_bw) else None
    roofline = None
    if flops_bound_ms is not None and bytes_bound_ms is not None:
        bound_ms = max(flops_bound_ms, bytes_bound_ms)
        roofline = {
            "step_bytes_accessed": round(step_bytes),
            "peak_hbm_gbps": round(peak_bw / 1e9),
            "flops_bound_ms": round(flops_bound_ms, 3),
            "bytes_bound_ms": round(bytes_bound_ms, 3),
            "binding_wall": ("hbm_bandwidth" if bytes_bound_ms > flops_bound_ms
                             else "mxu_flops"),
            "roofline_bound_ms": round(bound_ms, 3),
            "measured_step_ms": round(step_ms, 3),
            "fraction_of_roofline": round(bound_ms / step_ms, 3),
        }

    # ---- full-scene inference: one jitted scan sweep over the whole scene ----
    from hypelcnn_tpu.infer.scene_inference import predict_full_scene_scan
    infer_vars = {"params": state.params}
    if state.batch_stats:
        infer_vars["batch_stats"] = state.batch_stats
    height, width = scene.get_scene_shape()
    _ = predict_full_scene_scan(trainer.module, infer_vars, scene)  # compile + warm
    sweep_windows = []
    for _ in range(5):
        t0 = time.time()
        _ = predict_full_scene_scan(trainer.module, infer_vars, scene)
        sweep_windows.append(time.time() - t0)
    sweep_s = float(np.median(sweep_windows))

    baseline = load_measured_baseline()
    vs_baseline = (round(patches_per_sec / baseline["value"], 2)
                   if baseline and baseline.get("value") else None)

    print(json.dumps({
        "metric": "hypelcnn_train_patches_per_sec_per_chip",
        "value": round(patches_per_sec, 1),
        "unit": "patches/s",
        "vs_baseline": vs_baseline,
        "extras": {
            "device_kind": device_kind,
            "scene": f"{height}x{width}x{scene.get_data_shape()[2]}"
                     + (" (smoke)" if args.smoke else " (GRSS2013 scale, HBM-resident)"),
            "batch_size": batch_size,
            "train_step_ms": round(elapsed / chunk * 1e3, 3),
            "train_flops_per_step": round(step_flops) if step_flops else None,
            "train_achieved_tflops": round(achieved_flops / 1e12, 2) if achieved_flops else None,
            "train_mfu": round(mfu, 4) if mfu is not None else None,
            "peak_bf16_tflops": round(peak / 1e12) if peak else None,
            "roofline": roofline,
            "full_scene_inference_s": round(sweep_s, 3),
            "full_scene_pixels_per_sec": round(height * width / sweep_s),
            "baseline": None if baseline is None else {
                "value": baseline["value"], "unit": baseline["unit"],
                "batch_size": baseline.get("batch_size"),
                "device": baseline.get("device"),
                "provenance": baseline.get("provenance"),
            },
        },
    }))


if __name__ == "__main__":
    main()
