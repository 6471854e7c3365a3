"""Microbenchmark the fused Pallas BiLSTM layer kernel (fwd and fwd+bwd)
at the flagship layer shapes, to guide kernel work (docs/ROADMAP.md).

Usage: python tools/lstm_microbench.py [--batch 64]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from gluon_e2e_asr_tpu.utils.platform import (  # noqa: E402
    enable_compilation_cache, warm_device_transfer,
)

enable_compilation_cache()

H = 320


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="kernel compute dtype (flagship runs bfloat16)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gluon_e2e_asr_tpu.ops.pallas_lstm import bilstm_fused

    warm_device_transfer()
    rng = np.random.default_rng(0)
    B = args.batch
    # (T, D) per flagship encoder layer (pyramidal halving, feat 80 x2).
    shapes = [(1280, 160), (640, 2 * 2 * H), (320, 2 * 2 * H)]

    for T, D in shapes:
        x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
        lens = jnp.full((B,), T, jnp.int32)
        w_x = jnp.asarray(rng.standard_normal((D, 8 * H)) * 0.02, jnp.float32)
        b_x = jnp.zeros((8 * H,), jnp.float32)
        w_hf = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.02, jnp.float32)
        w_hb = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.02, jnp.float32)

        # Reduce outputs to a scalar ON DEVICE: fetching a big array over
        # the axon tunnel would swamp the measurement (BASELINE.md).
        cd = jnp.dtype(args.dtype)
        fwd = jax.jit(lambda *a: bilstm_fused(*a, cd).sum())
        loss_fn = jax.jit(lambda *a: sum(
            g.sum() for g in jax.grad(
                lambda xx, wx, bx, whf, whb:
                bilstm_fused(xx, lens, wx, bx, whf, whb, cd).sum(),
                argnums=(0, 1, 2, 3, 4))(*a)))

        def timeit(fn, ops):
            out = fn(*ops)
            float(np.asarray(out))  # fence via real (scalar) fetch
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*ops)
            float(np.asarray(out))
            return (time.perf_counter() - t0) / args.iters * 1e3

        t_f = timeit(fwd, (x, lens, w_x, b_x, w_hf, w_hb))
        t_fb = timeit(loss_fn, (x, w_x, b_x, w_hf, w_hb))
        print(f"B={B} T={T:5d} D={D:5d}: fwd {t_f:6.2f} ms   "
              f"fwd+bwd {t_fb:6.2f} ms   (bwd ~{t_fb - t_f:6.2f})")


if __name__ == "__main__":
    main()
