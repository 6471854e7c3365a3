"""Interleaved A/B microbench: jnp vs fused-Pallas frontend.

Runs both impls back-to-back per trial (interleaved, so tunnel drift hits
both equally) and reports per-impl medians at milestone and flagship
shapes. Used to adjudicate VERDICT round-1 item 4 (win-or-demote)
[BASELINE.json:L8].
"""

import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from gluon_e2e_asr_tpu.config import Config
from gluon_e2e_asr_tpu.frontend.features import compute_features
from gluon_e2e_asr_tpu.frontend.pallas_frontend import compute_features_pallas
from gluon_e2e_asr_tpu.utils.platform import warm_device_transfer


def bench_shape(B, T_s, trials=30):
    cfg = Config()
    sr = cfg.frontend.sample_rate
    T = int(T_s * sr)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
    lens = jnp.asarray(rng.integers(T // 2, T, size=(B,)), jnp.int32)

    f_jnp = jax.jit(lambda a, l: compute_features(cfg.frontend, a, l, train=False))
    f_pal = jax.jit(
        lambda a, l: compute_features_pallas(cfg.frontend, a, l, train=False)
    )
    # warm both
    f_jnp(audio, lens)[0].block_until_ready()
    f_pal(audio, lens)[0].block_until_ready()

    # Single-call timing is swamped by ~27 ms of tunnel dispatch latency;
    # queue K calls and block on the last so device time dominates.
    K = 50
    tj, tp = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(K):
            r = f_jnp(audio, lens)
        r[0].block_until_ready()
        t1 = time.perf_counter()
        for _ in range(K):
            r = f_pal(audio, lens)
        r[0].block_until_ready()
        t2 = time.perf_counter()
        tj.append((t1 - t0) / K)
        tp.append((t2 - t1) / K)
    mj = statistics.median(tj) * 1e3
    mp = statistics.median(tp) * 1e3
    print(
        f"B={B} T={T_s}s  jnp={mj:.3f}ms  pallas={mp:.3f}ms  "
        f"ratio pallas/jnp={mp / mj:.3f}  (FC={os.environ.get('GLUON_FE_CHUNK', '256')})"
    )
    return mj, mp


if __name__ == "__main__":
    warm_device_transfer()
    bench_shape(16, 8.0)   # milestone shape
    bench_shape(96, 8.0)   # flagship shape
