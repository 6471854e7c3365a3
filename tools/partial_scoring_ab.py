"""Interleaved A/B of full-vocab vs partial CTC prefix scoring in the
joint beam, at a BPE-sized vocab — the value case the serving defaults
assert but round 3 never measured [VERDICT.md round-3 weak #6 / item 5].

Partial scoring (decode.ctc_score_candidates=N) narrows the per-step
CTC prefix-score scan from V columns to N attention-ranked candidates.
At char vocab (V=32) it is a measured wash; its claimed value cases are
BPE+ vocabs, where the full-vocab prefix state row is V-wide per (beam,
frame). This harness measures both variants in ONE process:

- wall time per batch call, interleaved per batch (same tunnel weather),
- DEVICE time per call via a K-chained scan of the jitted device
  program (one dispatch, one fetch — the tunnel RTT amortizes away),
- executed beam steps, and output WER equality/divergence.

Usage::

    python tools/partial_scoring_ab.py --config configs/english_m5_bpe.yaml \
        --ckpt runs/english_bpe/ckpts_english_m5/best.msgpack --n-cand 20
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gluon_e2e_asr_tpu.utils.platform import configure_from_env

configure_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gluon_e2e_asr_tpu.config import apply_overrides, load_config  # noqa: E402
from gluon_e2e_asr_tpu.data.loader import DataLoader  # noqa: E402
from gluon_e2e_asr_tpu.data.sampler import (  # noqa: E402
    BucketSampler,
    make_bucket_specs,
)
from gluon_e2e_asr_tpu.data.tokenizer import (  # noqa: E402
    CharTokenizer,
    tokenizer_from_json,
)
from gluon_e2e_asr_tpu.decoding.beam import make_beam_decoder  # noqa: E402
from gluon_e2e_asr_tpu.eval.metrics import wer  # noqa: E402
from gluon_e2e_asr_tpu.models.asr import build_model  # noqa: E402
from gluon_e2e_asr_tpu.training.checkpoint import restore_checkpoint  # noqa: E402
from gluon_e2e_asr_tpu.training.train_step import (  # noqa: E402
    create_template_state,
    make_optimizer,
)
from gluon_e2e_asr_tpu.training.trainer import build_datasets  # noqa: E402


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--n-cand", type=int, default=20)
    p.add_argument("--chain", type=int, default=8,
                   help="dependent device calls per device-time chain")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL")
    args = p.parse_args(argv)

    config = load_config(args.config)
    apply_overrides(config, args.set)
    config.decode.method = "beam"

    from gluon_e2e_asr_tpu.utils.platform import warm_device_transfer

    warm_device_transfer()

    tokenizer = CharTokenizer()
    meta_path = args.ckpt + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            m0 = json.load(f)
        if m0.get("vocab"):
            tokenizer = tokenizer_from_json(m0["vocab"])
    _, dev_utts = build_datasets(config)
    specs = make_bucket_specs(
        config.data.bucket_bounds_sec, config.data.sample_rate,
        config.data.batch_size, config.data.max_label_len,
        config.frontend.hop_length, config.data.dynamic_batch,
    )
    sampler = BucketSampler(dev_utts, specs, config.data.sample_rate,
                            seed=0, shuffle=False)
    loader = DataLoader(dev_utts, sampler, tokenizer,
                        config.data.sample_rate,
                        transfer_dtype=config.data.transfer_dtype)
    model = build_model(config, tokenizer.vocab_size, tokenizer.sos_id,
                        tokenizer.eos_id)
    first = next(iter(loader.epoch(0)))
    template = create_template_state(
        config, model, make_optimizer(config),
        {"audio": first.audio, "audio_len": first.audio_len,
         "labels": first.labels, "label_len": first.label_len},
    )
    state, cmvn_stats, _ = restore_checkpoint(args.ckpt, template,
                                              params_only=True)

    cfg_full = copy.deepcopy(config)
    cfg_full.decode.ctc_score_candidates = 0
    cfg_part = copy.deepcopy(config)
    cfg_part.decode.ctc_score_candidates = args.n_cand
    variants = {
        "full": make_beam_decoder(model, cfg_full, tokenizer, cmvn_stats),
        "partial": make_beam_decoder(model, cfg_part, tokenizer, cmvn_stats),
    }

    K = max(2, int(args.chain))
    chains = {}
    for name, dec in variants.items():
        def chained(params, lm_ps, a, al, _dfn=dec.device_fn):
            def body(carry, _):
                aud, dep = carry
                _, _, scores, steps = _dfn(params, lm_ps, aud + dep, al)
                # Data dependency in the AUDIO dtype (audio may ship as
                # int16 under data.transfer_dtype — keep the chain from
                # promoting it).
                dep = jnp.zeros_like(aud) * scores[0, 0].astype(aud.dtype)
                return (aud, dep), steps
            (_, _), s = jax.lax.scan(body, (a, jnp.zeros_like(a)),
                                     None, length=K)
            return s[-1]
        chains[name] = jax.jit(chained)

    wall = {k: [] for k in variants}
    dev = {k: [] for k in variants}
    steps = {k: [] for k in variants}
    hyps = {k: [] for k in variants}
    refs = []
    by_id = {u.utt_id: u for u in dev_utts}
    warmed = set()
    for b in loader.epoch(0):
        a, al = jnp.asarray(b.audio), jnp.asarray(b.audio_len)
        refs.extend(by_id[u].text for u in b.utt_ids[: b.num_real])
        for name, dec in variants.items():
            key = (name, b.audio.shape[1])
            if key not in warmed:
                dec(state.params, a, al)
                np.asarray(chains[name](state.params, dec.lm_arg, a, al))
                warmed.add(key)
            t0 = time.perf_counter()
            texts, _ = dec(state.params, a, al)
            wall[name].append(time.perf_counter() - t0)
            steps[name].append(dec.last_steps)
            hyps[name].extend(texts[: b.num_real])
            t0 = time.perf_counter()
            np.asarray(chains[name](state.params, dec.lm_arg, a, al))
            dev[name].append((time.perf_counter() - t0) / K)

    out = {
        "vocab_size": tokenizer.vocab_size,
        "n_cand": args.n_cand,
        "batch_size": config.data.batch_size,
        "device_time_chain": K,
        "num_utts": len(refs),
    }
    for name in variants:
        ws = sorted(wall[name])
        ds = sorted(dev[name])
        tot_steps = sum(steps[name])
        out[name] = {
            "wall_p50_s": round(ws[len(ws) // 2], 4),
            "device_p50_s": round(ds[len(ds) // 2], 4),
            "device_ms_per_step": round(
                sum(dev[name]) * 1e3 / max(tot_steps, 1), 3),
            "beam_steps_total": int(tot_steps),
            "wer": round(wer(refs, hyps[name]), 4),
        }
    out["hyps_identical"] = hyps["full"] == hyps["partial"]
    out["full_over_partial_device"] = round(
        out["full"]["device_p50_s"] / out["partial"]["device_p50_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
