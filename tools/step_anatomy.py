"""Step-anatomy ablation: time the flagship train step with components
toggled off to locate the remaining wall-clock (docs/DESIGN.md "Measured
step anatomy"). Run on the TPU host:

    python tools/step_anatomy.py [--batch 16] [--dtype float32]

Variants:
  full        hybrid CTC+attention (the bench.py configuration)
  no-ctc      mtl_alpha=0: attention-only (skips the CTC recursion)
  ctc-only    mtl_alpha=1: no attention decoder at all
  lstm-scan   full, but encoder via lax.scan instead of the Pallas kernel
  dec-scan    full, but teacher-forced decoder via lax.scan
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from gluon_e2e_asr_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()


def build(mtl_alpha, lstm_impl, dec_impl, dtype, batch, att_type="loc"):
    from __graft_entry__ import _flagship_config, _synth_batch
    from gluon_e2e_asr_tpu.data.tokenizer import CharTokenizer
    from gluon_e2e_asr_tpu.models.asr import build_model
    from gluon_e2e_asr_tpu.training.train_step import (
        create_train_state, make_optimizer, make_train_step,
    )

    config = _flagship_config(tiny=False)
    config.model.lstm_impl = lstm_impl
    config.model.dec_impl = dec_impl
    config.model.compute_dtype = dtype
    config.model.att_type = att_type
    config.loss.mtl_alpha = mtl_alpha
    tok = CharTokenizer()
    model = build_model(config, tok.vocab_size, tok.sos_id, tok.eos_id)
    tx = make_optimizer(config)
    batch_np = _synth_batch(batch, 12.8, 96)
    state = create_train_state(config, model, tx, batch_np)
    step = make_train_step(model, config, tx, mesh=None)
    return state, step, batch_np


def _fetch(state):
    # On this image's axon platform block_until_ready does not reliably
    # fence short async dispatch chains (BASELINE.md); pulling real bytes
    # from the final state does, and each step depends on the previous
    # state, so this serializes the whole chain.
    import jax

    leaf = jax.tree_util.tree_leaves(state.params)[0]
    return float(np.asarray(leaf).ravel()[0])


def measure(state, step, batch, warmup=3, iters=20):
    import jax.numpy as jnp

    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    for _ in range(warmup):
        state, m = step(state, dev_batch)
    _fetch(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, dev_batch)
    _fetch(state)
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(float(m["loss"]))
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--att", default="loc", choices=["loc", "add", "dot"])
    p.add_argument("--variants", default="full,no-ctc,ctc-only,lstm-scan,dec-scan")
    args = p.parse_args()

    variants = {
        "full": (0.3, "pallas", "pallas"),
        "no-ctc": (0.0, "pallas", "pallas"),
        "ctc-only": (1.0, "pallas", "pallas"),
        "lstm-scan": (0.3, "scan", "pallas"),
        "dec-scan": (0.3, "pallas", "scan"),
    }
    for name in args.variants.split(","):
        mtl, li, di = variants[name]
        state, step, batch = build(mtl, li, di, args.dtype, args.batch,
                                   att_type=args.att)
        dt = measure(state, step, batch)
        print(f"{name:10s} {dt * 1e3:7.2f} ms/step  "
              f"{args.batch / dt:7.1f} utt/s", flush=True)


if __name__ == "__main__":
    main()
