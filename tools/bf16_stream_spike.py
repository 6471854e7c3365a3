"""The bf16-stream spike, run once with numbers [VERDICT.md round-4
weak #5 / item 6; DESIGN.md TODO 2].

Round 5's full-tile stream stores made bf16 stream refs LEGAL (the only
store/load the stream dtype sees is a full [B, tc, H] block, which
Mosaic accepts at lane-unaligned H). This harness decides whether they
are WORTH turning on, in one process:

1. **Admission** (pure host): ``fits_vmem`` under f32 vs bf16 streams at
   the shapes that matter — does the B=128 wide layer (the round-4 scan
   fallback that cost the B=128 bench row its tile-fill win) now fit?
2. **Parity** (real TPU): fwd output + input/weight grads, f32 streams
   vs bf16 streams at the flagship layer shape. bf16 streams round the
   saved residuals, so the backward's gate recompute is approximate —
   parity here is a tolerance report, not a bit-identity claim.
3. **Timing** (real TPU): fwd and fwd+bwd per layer shape at B=96 and
   B=128, both stream dtypes, compute_dtype=bf16 (the flagship setting).

Usage::

    python tools/bf16_stream_spike.py [--iters 20]

Emits one JSON line per measurement; tee to docs/evidence/.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gluon_e2e_asr_tpu.utils.platform import (  # noqa: E402
    configure_from_env, enable_compilation_cache, warm_device_transfer,
)

configure_from_env()
enable_compilation_cache()

H = 320
# Flagship encoder layer shapes (pyramidal halving, feat 80 x2):
# (T, D) per layer; layer 0 is narrow-D, layers 1-2 are the wide ones.
SHAPES = [(1280, 160), (640, 4 * H), (320, 4 * H)]


def _set_stream(dtype: str):
    os.environ["GLUON_LSTM_STREAM_DTYPE"] = dtype


def _fresh_fns(cd, lens):
    """New jit wrappers so the env-var stream dtype is re-read at trace
    time (the pallas_call reads it as a trace-time constant; a cached
    trace would silently keep the old stream dtype)."""
    import jax

    from gluon_e2e_asr_tpu.ops.pallas_lstm import bilstm_fused

    fwd = jax.jit(lambda *a: bilstm_fused(*a, cd))
    grads = jax.jit(lambda xx, wx, bx, whf, whb: jax.grad(
        lambda *g: bilstm_fused(g[0], lens, *g[1:], cd).sum(),
        argnums=(0, 1, 2, 3, 4))(xx, wx, bx, whf, whb))
    fwd_s = jax.jit(lambda *a: bilstm_fused(*a, cd).sum())
    loss_s = jax.jit(lambda xx, wx, bx, whf, whb: sum(
        g.sum() for g in jax.grad(
            lambda *g: bilstm_fused(g[0], lens, *g[1:], cd).sum(),
            argnums=(0, 1, 2, 3, 4))(xx, wx, bx, whf, whb)))
    return fwd, grads, fwd_s, loss_s


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batches", default="96,128")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gluon_e2e_asr_tpu.ops.pallas_lstm import fits_vmem

    # ---- 1. Admission under the word model (host-only) ----
    for sd in ("float32", "bfloat16"):
        _set_stream(sd)
        row = {"event": "admission", "stream_dtype": sd}
        for B in (96, 128, 148):
            for D in (80, 160, 4 * H):
                row[f"B{B}_D{D}"] = fits_vmem(B, H, D, cd_bytes=2)
        print(json.dumps(row), flush=True)

    warm_device_transfer()
    rng = np.random.default_rng(0)
    cd = jnp.bfloat16

    # ---- 2. Parity at the flagship wide layer, B=96 ----
    T, D = SHAPES[1]
    B = 96
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    lens = jnp.asarray(
        rng.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    w_x = jnp.asarray(rng.standard_normal((D, 8 * H)) * 0.02, jnp.float32)
    b_x = jnp.zeros((8 * H,), jnp.float32)
    w_hf = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.02, jnp.float32)
    w_hb = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.02, jnp.float32)
    outs = {}
    for sd in ("float32", "bfloat16"):
        _set_stream(sd)
        fwd, grads, _, _ = _fresh_fns(cd, lens)
        y = np.asarray(fwd(x, lens, w_x, b_x, w_hf, w_hb), np.float32)
        g = [np.asarray(t, np.float32)
             for t in grads(x, w_x, b_x, w_hf, w_hb)]
        outs[sd] = (y, g)
    y0, g0 = outs["float32"]
    y1, g1 = outs["bfloat16"]
    scale = float(np.max(np.abs(y0))) or 1.0
    rec = {
        "event": "parity", "shape": [B, T, D],
        "fwd_max_abs_diff": float(np.max(np.abs(y0 - y1))),
        "fwd_max_rel_diff": float(np.max(np.abs(y0 - y1)) / scale),
    }
    for name, a, b in [("dx", g0[0], g1[0]), ("dwx", g0[1], g1[1]),
                       ("dwhf", g0[3], g1[3]), ("dwhb", g0[4], g1[4])]:
        s = float(np.max(np.abs(a))) or 1.0
        rec[f"{name}_max_rel_diff"] = float(np.max(np.abs(a - b)) / s)
    print(json.dumps(rec), flush=True)

    # ---- 3. Timing ----
    def timeit(fn, ops):
        out = fn(*ops)
        float(np.asarray(out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*ops)
        float(np.asarray(out))
        return (time.perf_counter() - t0) / args.iters * 1e3

    for B in [int(b) for b in args.batches.split(",")]:
        for T, D in SHAPES:
            x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
            lens = jnp.full((B,), T, jnp.int32)
            w_x = jnp.asarray(
                rng.standard_normal((D, 8 * H)) * 0.02, jnp.float32)
            b_x = jnp.zeros((8 * H,), jnp.float32)
            w_hf = jnp.asarray(
                rng.standard_normal((H, 4 * H)) * 0.02, jnp.float32)
            w_hb = jnp.asarray(
                rng.standard_normal((H, 4 * H)) * 0.02, jnp.float32)
            for sd in ("float32", "bfloat16"):
                _set_stream(sd)
                if not fits_vmem(B, H, D, cd_bytes=2):
                    print(json.dumps({
                        "event": "timing", "B": B, "T": T, "D": D,
                        "stream_dtype": sd, "admitted": False,
                    }), flush=True)
                    continue
                _, _, fwd_s, loss_s = _fresh_fns(cd, lens)
                t_f = timeit(fwd_s, (x, lens, w_x, b_x, w_hf, w_hb))
                t_fb = timeit(loss_s, (x, w_x, b_x, w_hf, w_hb))
                print(json.dumps({
                    "event": "timing", "B": B, "T": T, "D": D,
                    "stream_dtype": sd, "admitted": True,
                    "fwd_ms": round(t_f, 3), "fwd_bwd_ms": round(t_fb, 3),
                }), flush=True)


if __name__ == "__main__":
    main()
