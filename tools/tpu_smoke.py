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
    from gluon_e2e_asr_tpu.utils.platform import warm_device_transfer
    import time as _t
    t0 = _t.perf_counter()
    warm_device_transfer()
    print(f"transfer warmup: {_t.perf_counter()-t0:.1f}s")
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
    assert bool(jnp.all(rl == gl))
    d = float(jnp.max(jnp.abs(got - ref)))
    print("pallas-vs-jnp compiled max abs diff:", d)
    assert d < 5e-2, d

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
    assert bool(jnp.all(f1 == f2))
    zero_frac = float(jnp.mean((f1 == 0).astype(jnp.float32)) -
                      jnp.mean((got == 0).astype(jnp.float32)))
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
    bilstm_section()
    print("TPU SMOKE OK")


def bilstm_section():
    """Compiled parity + timing: pallas BiLSTM kernel vs lax.scan."""
    import time

    from gluon_e2e_asr_tpu.models.lstm import bilstm_scan
    from gluon_e2e_asr_tpu.ops.pallas_lstm import bilstm_pallas

    rng = np.random.RandomState(0)
    B, T, H = 16, 1278, 320
    xg_f = jnp.asarray(rng.randn(B, T, 4 * H).astype(np.float32) * 0.1)
    xg_b = jnp.asarray(rng.randn(B, T, 4 * H).astype(np.float32) * 0.1)
    w_hf = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.05)
    w_hb = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.05)
    lens = jnp.asarray(
        np.r_[T, rng.randint(T // 2, T, size=B - 1)].astype(np.int32)
    )

    f_scan = jax.jit(lambda a, b: bilstm_scan(a, b, lens, w_hf, w_hb))
    f_pl = jax.jit(
        lambda a, b: bilstm_pallas(a, b, lens, w_hf, w_hb, jnp.float32, 16)
    )
    ref = f_scan(xg_f, xg_b)
    got = f_pl(xg_f, xg_b)
    d = float(jnp.max(jnp.abs(ref - got)))
    print("bilstm pallas-vs-scan fwd max diff:", d)
    assert d < 1e-3, d

    # grads
    g_scan = jax.jit(jax.grad(lambda a: jnp.sum(
        bilstm_scan(a, xg_b, lens, w_hf, w_hb) ** 2)))
    g_pl = jax.jit(jax.grad(lambda a: jnp.sum(
        bilstm_pallas(a, xg_b, lens, w_hf, w_hb, jnp.float32, 16) ** 2)))
    dg = float(jnp.max(jnp.abs(g_scan(xg_f) - g_pl(xg_f))))
    print("bilstm pallas-vs-scan grad max diff:", dg)
    assert dg < 1e-2, dg

    for name, fn in [("scan", f_scan), ("pallas", f_pl)]:
        jax.block_until_ready(fn(xg_f, xg_b))
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(xg_f, xg_b)
        jax.block_until_ready(out)
        print(f"bilstm fwd[{name}]: {(time.perf_counter()-t0)/10*1e3:.2f} ms"
              f" (B={B}, T={T}, H={H})")
    for name, fn in [("scan", g_scan), ("pallas", g_pl)]:
        jax.block_until_ready(fn(xg_f))
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(xg_f)
        jax.block_until_ready(out)
        print(f"bilstm fwd+bwd[{name}]: {(time.perf_counter()-t0)/10*1e3:.2f} ms")


if __name__ == "__main__":
    main()
