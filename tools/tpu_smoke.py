"""TPU smoke tests for paths that CPU pytest can't compile (Pallas
kernels, in-kernel PRNG). Run directly on a TPU host:
    python tools/tpu_smoke.py
"""
import numpy as np
import jax
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax.numpy as jnp

from gluon_e2e_asr_tpu.config import FrontendConfig
from gluon_e2e_asr_tpu.frontend.features import compute_features
from gluon_e2e_asr_tpu.frontend.pallas_frontend import compute_features_pallas


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.RandomState(0)
    B, S = 4, 32000
    t = np.arange(S) / 16000.0
    audio = np.stack([
        (np.sin(2 * np.pi * (200 + 150 * b) * t) * 0.5).astype(np.float32)
        for b in range(B)
    ]) + 0.01 * rng.randn(B, S).astype(np.float32)
    lens = np.array([S, S - 777, S - 3200, 20000], np.int32)
    cfg = FrontendConfig(cmvn="utterance")

    ref, rl = jax.jit(lambda a, l: compute_features(cfg, a, l))(
        jnp.asarray(audio), jnp.asarray(lens))
    got, gl = jax.jit(
        lambda a, l: compute_features_pallas(cfg, a, l, interpret=False)
    )(jnp.asarray(audio), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(rl), np.asarray(gl))
    d = np.abs(np.asarray(got) - np.asarray(ref))
    print("pallas-vs-jnp compiled max abs diff:", float(d.max()))
    assert d.max() < 5e-2, d.max()

    # SpecAugment in-kernel PRNG: masks something, deterministic per seed
    k = jax.random.PRNGKey(7)
    f1, _ = jax.jit(
        lambda a, l: compute_features_pallas(cfg, a, l, train=True, rng=k,
                                             interpret=False)
    )(jnp.asarray(audio), jnp.asarray(lens))
    f2, _ = jax.jit(
        lambda a, l: compute_features_pallas(cfg, a, l, train=True, rng=k,
                                             interpret=False)
    )(jnp.asarray(audio), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    zero_frac = (np.asarray(f1) == 0).mean() - (np.asarray(got) == 0).mean()
    print("specaug extra zero fraction:", float(zero_frac))
    assert zero_frac > 0.005, zero_frac

    # benchmark both paths
    import time
    for name, fn in [
        ("jnp", jax.jit(lambda a, l: compute_features(cfg, a, l))),
        ("pallas", jax.jit(
            lambda a, l: compute_features_pallas(cfg, a, l, interpret=False))),
    ]:
        a, l = jnp.asarray(audio), jnp.asarray(lens)
        jax.block_until_ready(fn(a, l)[0])
        t0 = time.perf_counter()
        for _ in range(50):
            out = fn(a, l)
        jax.block_until_ready(out[0])
        dt = (time.perf_counter() - t0) / 50
        print(f"frontend[{name}]: {dt*1e6:.1f} us/batch (B={B}, {S/16000}s)")
    print("TPU SMOKE OK")


if __name__ == "__main__":
    main()
