"""Interleaved A/B microbench: jnp vs fused-Pallas vs regridded-Pallas
frontend.

Runs all impls back-to-back per trial (interleaved, so tunnel drift hits
each equally) and reports per-impl medians at milestone and flagship
shapes. Used to adjudicate VERDICT round-1 item 4 (win-or-demote)
[BASELINE.json:L8] and the round-3 item-7 regrid experiment
(DESIGN.md TODO 1): grid=(frame-chunks,) with whole-batch blocks vs the
original grid=(batch,) kernel vs XLA's fused einsum.
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gluon_e2e_asr_tpu.config import Config
from gluon_e2e_asr_tpu.frontend.features import compute_features
from gluon_e2e_asr_tpu.frontend.pallas_frontend import (
    compute_features_pallas,
    compute_features_pallas_regrid,
)
from gluon_e2e_asr_tpu.utils.platform import warm_device_transfer


def bench_shape(B, T_s, trials=30, cmvn="utterance"):
    cfg = Config()
    cfg.frontend.cmvn = cmvn
    sr = cfg.frontend.sample_rate
    T = int(T_s * sr)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
    lens = jnp.asarray(rng.integers(T // 2, T, size=(B,)), jnp.int32)
    stats = None
    if cmvn == "global":
        stats = (jnp.full((cfg.frontend.n_mels,), -5.0),
                 jnp.full((cfg.frontend.n_mels,), 3.0))

    impls = {
        "jnp": lambda a, l: compute_features(
            cfg.frontend, a, l, train=False, cmvn_stats=stats),
        "pallas": lambda a, l: compute_features_pallas(
            cfg.frontend, a, l, train=False, cmvn_stats=stats),
        "regrid": lambda a, l: compute_features_pallas_regrid(
            cfg.frontend, a, l, train=False, cmvn_stats=stats),
    }
    jitted = {k: jax.jit(v) for k, v in impls.items()}
    for f in jitted.values():  # warm
        f(audio, lens)[0].block_until_ready()

    # Single-call timing is swamped by ~27 ms of tunnel dispatch latency;
    # queue K calls and block on the last so device time dominates.
    K = 50
    times = {k: [] for k in jitted}
    for _ in range(trials):
        for k, f in jitted.items():
            t0 = time.perf_counter()
            for _ in range(K):
                r = f(audio, lens)
            r[0].block_until_ready()
            times[k].append((time.perf_counter() - t0) / K)
    med = {k: statistics.median(v) * 1e3 for k, v in times.items()}
    print(
        f"B={B} T={T_s}s cmvn={cmvn}  "
        + "  ".join(f"{k}={v:.3f}ms" for k, v in med.items())
        + f"  ratio regrid/jnp={med['regrid'] / med['jnp']:.3f}"
        f"  (FC={os.environ.get('GLUON_FE_CHUNK', '256')}"
        f" RC={os.environ.get('GLUON_FE_RC', '128')})"
    )
    return med


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cmvn", default="utterance",
                    choices=["utterance", "global", "none"])
    args = ap.parse_args()
    warm_device_transfer()
    bench_shape(16, 8.0, cmvn=args.cmvn)   # milestone shape
    bench_shape(96, 8.0, cmvn=args.cmvn)   # flagship shape
    bench_shape(96, 12.8, cmvn=args.cmvn)  # bench.py shape
