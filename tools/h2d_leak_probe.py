"""Measure host RSS retained per host->device transfer, by dtype.

Motivation [VERDICT.md round-3 item 2, 100 h rehearsal]: this box's
device plugin retains every H2D staging buffer (RSS grows ~1:1 with
transferred payload and neither gc nor jax.clear_caches releases it),
which OOM'd the first 100 h run at epoch 4 (~29 GB audio/epoch at
float32). `data.transfer_dtype=int16` halves the payload; this probe
turns that claim into a per-dtype measured number.

Run each dtype in its OWN process (the leak is per-process monotonic):

    python tools/h2d_leak_probe.py --dtype float32 --iters 24
    python tools/h2d_leak_probe.py --dtype int16   --iters 24

Prints one JSON line: payload MB/transfer, retained MB/transfer
(median of per-iteration RSS deltas after a warmup), and the ratio.
"""

import argparse
import json

import numpy as np


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    raise RuntimeError("VmRSS not found")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", choices=["float32", "int16"],
                    default="float32")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--samples", type=int, default=160_000,
                    help="per-row sample count (64 x 160k f32 = 40.96 MB)")
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--warmup", type=int, default=4)
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    dtype = np.dtype(args.dtype)
    rng = np.random.RandomState(0)
    if dtype == np.int16:
        host = rng.randint(-32768, 32768,
                           size=(args.batch, args.samples)).astype(np.int16)
    else:
        host = rng.randn(args.batch, args.samples).astype(np.float32)
    payload_mb = host.nbytes / 1e6

    deltas = []
    for i in range(args.warmup + args.iters):
        # Fresh bytes each transfer (defeat any content dedup) without
        # reallocating the host array.
        host.flat[i] = i
        before = _rss_mb()
        x = jax.device_put(host, dev)
        x.block_until_ready()
        del x
        after = _rss_mb()
        if i >= args.warmup:
            deltas.append(after - before)

    retained = float(np.median(deltas))
    print(json.dumps({
        "dtype": args.dtype,
        "payload_mb": round(payload_mb, 2),
        "retained_mb_per_transfer_median": round(retained, 2),
        "retained_over_payload": round(retained / payload_mb, 3),
        "iters": args.iters,
        "platform": dev.platform,
    }))


if __name__ == "__main__":
    main()
