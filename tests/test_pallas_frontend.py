"""Fused Pallas frontend vs composed-jnp parity [SURVEY.md §3.3, §4].
Runs in interpreter mode on CPU; the same kernel is exercised compiled on
the real TPU by tools/tpu_smoke.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluon_e2e_asr_tpu.config import FrontendConfig
from gluon_e2e_asr_tpu.frontend.features import compute_features
from gluon_e2e_asr_tpu.frontend.pallas_frontend import compute_features_pallas


def _batch(B=2, S=32000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(S) / 16000.0
    audio = np.stack(
        [
            (np.sin(2 * np.pi * (200 + 150 * b) * t) * 0.5).astype(np.float32)
            for b in range(B)
        ]
    )
    audio += 0.01 * rng.randn(B, S).astype(np.float32)
    lens = np.array([S] + [S - 3200 * b for b in range(1, B)], np.int32)
    return jnp.asarray(audio), jnp.asarray(lens)


@pytest.mark.parametrize("cmvn", ["utterance", "none"])
def test_parity_with_jnp_path(cmvn):
    cfg = FrontendConfig(cmvn=cmvn)
    audio, lens = _batch()
    ref, ref_len = compute_features(cfg, audio, lens, train=False)
    got, got_len = compute_features_pallas(cfg, audio, lens, train=False,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_len), np.asarray(got_len))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=2e-3
    )


def test_parity_nonaligned_length():
    # bucket whose frame count is not a multiple of the kernel chunk
    cfg = FrontendConfig(cmvn="utterance")
    audio, lens = _batch(B=2, S=16000)
    ref, _ = compute_features(cfg, audio, lens, train=False)
    got, _ = compute_features_pallas(cfg, audio, lens, train=False,
                                     interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=2e-3
    )


def test_global_cmvn_mode():
    cfg = FrontendConfig(cmvn="global")
    audio, lens = _batch()
    mean = jnp.full((cfg.n_mels,), -5.0)
    std = jnp.full((cfg.n_mels,), 3.0)
    ref, _ = compute_features(cfg, audio, lens, cmvn_stats=(mean, std))
    got, _ = compute_features_pallas(cfg, audio, lens, cmvn_stats=(mean, std),
                                     interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=2e-3
    )


def test_specaugment_interpret_path():
    """Under interpret mode SpecAugment falls back to the jnp masks; check
    train mode masks something and eval mode is deterministic."""
    cfg = FrontendConfig(cmvn="utterance")
    audio, lens = _batch()
    k = jax.random.PRNGKey(0)
    f1, _ = compute_features_pallas(cfg, audio, lens, train=True, rng=k,
                                    interpret=True)
    f2, _ = compute_features_pallas(cfg, audio, lens, train=False,
                                    interpret=True)
    assert not np.allclose(np.asarray(f1), np.asarray(f2))


def test_jit_wrapping():
    cfg = FrontendConfig(cmvn="utterance")
    audio, lens = _batch()
    fn = jax.jit(
        lambda a, l: compute_features_pallas(cfg, a, l, interpret=True)
    )
    feats, feat_len = fn(audio, lens)
    assert np.isfinite(np.asarray(feats)).all()


# ---- regrid kernel (DESIGN.md TODO 1 / VERDICT round-3 item 7) ----

from gluon_e2e_asr_tpu.frontend.pallas_frontend import (  # noqa: E402
    compute_features_pallas_regrid,
)


@pytest.mark.parametrize("cmvn", ["utterance", "none", "global"])
def test_regrid_parity_with_jnp_path(cmvn):
    cfg = FrontendConfig(cmvn=cmvn)
    audio, lens = _batch()
    stats = None
    if cmvn == "global":
        stats = (jnp.full((cfg.n_mels,), -5.0), jnp.full((cfg.n_mels,), 3.0))
    ref, ref_len = compute_features(cfg, audio, lens, train=False,
                                    cmvn_stats=stats)
    got, got_len = compute_features_pallas_regrid(
        cfg, audio, lens, train=False, cmvn_stats=stats, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_len), np.asarray(got_len))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=2e-3
    )


def test_regrid_parity_nonaligned_length():
    cfg = FrontendConfig(cmvn="utterance")
    audio, lens = _batch(B=3, S=16000)
    ref, _ = compute_features(cfg, audio, lens, train=False)
    got, _ = compute_features_pallas_regrid(cfg, audio, lens, train=False,
                                            interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=2e-3
    )


def test_regrid_specaugment_interpret_path():
    """Train mode under interpret applies SpecAugment outside the kernel
    (identical jnp epilogue): statistics match the jnp path exactly."""
    cfg = FrontendConfig(cmvn="utterance")
    audio, lens = _batch()
    key = jax.random.PRNGKey(7)
    ref, _ = compute_features(cfg, audio, lens, train=True, rng=key)
    got, _ = compute_features_pallas_regrid(cfg, audio, lens, train=True,
                                            rng=key, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=2e-3
    )


def test_regrid_jit_wrapping():
    cfg = FrontendConfig(cmvn="none")
    audio, lens = _batch(B=2, S=8000)

    @jax.jit
    def f(a, l):
        return compute_features_pallas_regrid(cfg, a, l, interpret=True)

    feats, flen = f(audio, lens)
    assert np.all(np.isfinite(np.asarray(feats)))
