"""Benchmark: training throughput (utt/sec/chip) on the flagship hybrid
CTC/attention config — the official metric [BASELINE.json:L2].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "utt/s/chip", "vs_baseline": N}

``vs_baseline`` compares against the reference's MXNet-CPU throughput.
No published number exists ([BASELINE.json:L13] "published": {};
BASELINE.md), so the stand-in is this repo's own measured CPU-JAX
throughput on identical shapes (see BASELINE.md "Measured baselines") —
a *conservative* proxy: CPU-JAX with fused XLA kernels is faster than
MXNet-CPU imperative ops, so vs_baseline understates the true ratio.
The target is >=10x [BASELINE.json:L5].

Run ``python bench.py --cpu-baseline`` to (re)measure the CPU number.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from gluon_e2e_asr_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

# Measured on this machine (see BASELINE.md): CPU-JAX utt/sec on the same
# batch shapes and model config as the TPU benchmark below, keyed by
# (batch, att_type) (python bench.py --cpu-baseline --batch N --att A).
# fp32 on CPU (bf16 has no CPU advantage; conservative for the ratio).
CPU_BASELINE_UTT_PER_SEC = {
    (16, "loc"): 0.433,  # measured 2026-08-16
    (64, "loc"): 0.302,  # measured 2026-08-17
    (96, "loc"): 0.668,  # measured 2026-08-17
    (96, "dot"): 0.378,  # measured 2026-08-17 (idle box; the faster of
                         # two runs — higher baseline = conservative ratio)
}

# LibriSpeech-100h-like shapes: ~12.8 s utterances, char targets ~7/s.
# Batch 96 + bf16 matmuls is the flagship throughput point (batch sweep
# 16/64/96/112 in BASELINE.md; streams/accumulation stay f32).
BATCH = 96
SECONDS = 12.8
MAX_LABELS = 96
WARMUP_STEPS = 3
MEASURE_STEPS = 10
CPU_WARMUP_STEPS = 1
CPU_MEASURE_STEPS = 3


def build(dp: bool, lstm_impl: str = "scan", batch_size: int = BATCH,
          compute_dtype: str = "float32", dec_impl: str = "scan",
          att_type: str = "loc"):
    import jax

    from __graft_entry__ import _flagship_config, _synth_batch
    from gluon_e2e_asr_tpu.data.tokenizer import CharTokenizer
    from gluon_e2e_asr_tpu.models.asr import build_model
    from gluon_e2e_asr_tpu.training.train_step import (
        create_train_state, make_optimizer, make_train_step,
    )

    config = _flagship_config(tiny=False)
    config.model.lstm_impl = lstm_impl
    config.model.compute_dtype = compute_dtype
    config.model.att_type = att_type
    config.model.dec_impl = dec_impl
    tok = CharTokenizer()
    model = build_model(config, tok.vocab_size, tok.sos_id, tok.eos_id)
    tx = make_optimizer(config)
    batch = _synth_batch(batch_size, SECONDS, MAX_LABELS)
    state = create_train_state(config, model, tx, batch)
    step = make_train_step(model, config, tx, mesh=None)
    return state, step, batch


def _fetch(state) -> float:
    # On this image's axon platform block_until_ready does not reliably
    # fence short async dispatch chains (BASELINE.md); pulling real bytes
    # from the final state does, and each step depends on the previous
    # state, so this serializes the whole chain.
    import jax

    leaf = jax.tree_util.tree_leaves(state.params)[0]
    return float(np.asarray(leaf).ravel()[0])


def measure(state, step, batch, warmup=WARMUP_STEPS,
            steps=MEASURE_STEPS, repeats=1):
    """Return per-pass utt/s readings (len == repeats).

    Multiple back-to-back passes bound the tunnel's measured ~12%
    run-to-run spread (BASELINE.md round-2 tunnel-recovery notes): the
    JSON reports the median and the spread so the artifact detects
    regressions instead of reporting weather [VERDICT.md round-2 weak 1].
    """
    import jax.numpy as jnp

    bsz = batch["audio"].shape[0]
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    for _ in range(warmup):
        state, metrics = step(state, dev_batch)
    _fetch(state)
    readings = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step(state, dev_batch)
        _fetch(state)
        dt = time.perf_counter() - t0
        readings.append(bsz * steps / dt)
    assert np.isfinite(float(metrics["loss"]))
    return readings


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu-baseline", action="store_true",
                   help="measure the CPU-JAX stand-in baseline instead")
    p.add_argument("--lstm-impl", default="pallas", choices=["scan", "pallas"])
    p.add_argument("--dec-impl", default="pallas", choices=["scan", "pallas"])
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--batch", type=int, default=BATCH)
    # dot is the flagship default since round 2: +13% step throughput over
    # loc at a statistical quality tie on the 192-utt dev (paired bootstrap
    # diff -0.3 WER points, CI [-3.9, +3.1]; BASELINE.md round-2 table).
    p.add_argument("--att", default="dot", choices=["loc", "add", "dot"])
    p.add_argument("--repeats", type=int, default=3,
                   help="measurement passes (median reported)")
    args = p.parse_args()

    if args.cpu_baseline:
        import jax

        jax.config.update("jax_platforms", "cpu")
        # Same att_type as the TPU run so the ratio compares like models
        # (scan impls + fp32: the honest CPU realization).
        state, step, batch = build(dp=False, batch_size=args.batch,
                                   att_type=args.att)
        ups = measure(state, step, batch, warmup=CPU_WARMUP_STEPS,
                      steps=CPU_MEASURE_STEPS)[0]
        print(f"CPU-JAX baseline (batch {args.batch}, att {args.att}): "
              f"{ups:.3f} utt/s", file=sys.stderr)
        print(json.dumps({
            "metric": "train_throughput_cpu_baseline",
            "value": round(ups, 3),
            "unit": "utt/s",
            "vs_baseline": 1.0,
        }))
        return

    import jax

    from gluon_e2e_asr_tpu.utils.platform import warm_device_transfer

    # Device watchdog: if the axon tunnel is wedged, the first device
    # touch blocks forever (claim_timeout is infinite in this image's
    # plugin). Fail loudly instead of hanging the driver — 900 s is far
    # past the worst first-compile/transfer-init observed (~2 min).
    import os as _os
    import threading

    _device_ready = threading.Event()
    _timeout_s = float(_os.environ.get("GLUON_BENCH_DEVICE_TIMEOUT_S", 900))

    def _watchdog():
        if not _device_ready.wait(_timeout_s):
            print(
                f"bench: no device response after {_timeout_s:.0f} s "
                "(TPU tunnel wedged?) — aborting instead of hanging",
                file=sys.stderr,
            )
            _os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    warm_device_transfer()
    n_chips = max(len(jax.devices()), 1)
    _device_ready.set()
    state, step, batch = build(dp=False, lstm_impl=args.lstm_impl,
                               batch_size=args.batch,
                               compute_dtype=args.dtype,
                               dec_impl=args.dec_impl,
                               att_type=args.att)
    readings = measure(state, step, batch, repeats=max(args.repeats, 1))
    per_chip = float(np.median(readings))
    spread_pct = 100.0 * (max(readings) - min(readings)) / per_chip
    print(
        f"devices={jax.devices()} utt/s/chip={per_chip:.2f} "
        f"(readings={[round(r, 1) for r in readings]})",
        file=sys.stderr,
    )
    # Achieved TFLOP/s + MFU from the exact analytic matmul-FLOP count at
    # these shapes (utils/flops.py) [VERDICT.md round-2 item 2].
    from gluon_e2e_asr_tpu.data.tokenizer import CharTokenizer
    from gluon_e2e_asr_tpu.utils.flops import bench_mfu
    from __graft_entry__ import _flagship_config

    cfg = _flagship_config(tiny=False)
    cfg.model.compute_dtype = args.dtype
    cfg.model.att_type = args.att
    util = bench_mfu(per_chip, cfg, CharTokenizer().vocab_size,
                     args.batch, int(SECONDS * 16000), MAX_LABELS)
    # Nearest measured (batch, att) if this exact point wasn't benchmarked
    # on CPU (per-utt CPU throughput is batch- and attention-sensitive).
    base_key = min(
        CPU_BASELINE_UTT_PER_SEC,
        key=lambda k: (k[1] != args.att, abs(k[0] - args.batch)),
    )
    # Cross-run ledger [VERDICT.md round-4 weak #4 / item 7]: any single
    # run's median-of-3 is tight (<2% spread) but cross-process tunnel
    # weather moves the level by up to ~13% across days. Each bench run
    # appends to a ledger and the JSON line reports the ledger range, so
    # a driver artifact is self-contextualizing without BASELINE.md
    # exegesis.
    ledger_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "docs", "evidence", "bench_ledger.jsonl")
    ledger_vals = []
    try:
        with open(ledger_path) as f:
            for line in f:
                try:
                    ledger_vals.append(float(json.loads(line)["median"]))
                except (ValueError, KeyError):
                    pass
    except OSError:
        pass
    try:
        os.makedirs(os.path.dirname(ledger_path), exist_ok=True)
        with open(ledger_path, "a") as f:
            f.write(json.dumps({
                "median": round(per_chip, 3), "ts": round(time.time(), 1),
                "readings": [round(r, 1) for r in readings],
                "batch": args.batch, "att": args.att,
            }) + "\n")
    except OSError:
        pass
    ledger_vals.append(per_chip)
    print(json.dumps({
        "metric": "train_throughput_utt_per_sec_per_chip",
        "value": round(per_chip, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(
            per_chip / CPU_BASELINE_UTT_PER_SEC[base_key], 2),
        # No published reference number exists (BASELINE.json "published":
        # {}); the ratio is against this repo's own CPU-JAX measurement at
        # identical shapes — a conservative proxy for MXNet-CPU.
        "baseline": f"cpu-jax-standin-batch{base_key[0]}-{base_key[1]}",
        "repeats": len(readings),
        "median": round(per_chip, 3),
        "spread_pct": round(spread_pct, 2),
        "cross_run_min": round(min(ledger_vals), 1),
        "cross_run_max": round(max(ledger_vals), 1),
        "cross_run_n": len(ledger_vals),
        "tflops_per_sec": round(util["tflops_per_sec"], 2),
        "mfu": round(util["mfu"], 4),
        "peak_tflops": util["peak_tflops"],
        "model_tflops_per_step": round(util["model_tflops_per_step"], 3),
    }))


if __name__ == "__main__":
    main()
