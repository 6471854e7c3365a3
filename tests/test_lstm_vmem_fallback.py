"""Pallas-LSTM VMEM guard (ops/pallas_lstm.py::fits_vmem) and the
encoder's automatic scan fallback.

Found by the LibriSpeech-scale dress rehearsal: the 4 s dynamic bucket
(batch 148) at the wide layers (D=1280) needs 147.7M of the 128M VMEM
at the kernel's minimum time chunk — an XLA:TPU compile OOM the config
system cannot see. The encoder now pre-checks the kernel's own word
model and falls back to lax.scan per layer instead of crashing.
"""

import numpy as np

from gluon_e2e_asr_tpu.config import Config, ModelConfig
from gluon_e2e_asr_tpu.data.tokenizer import CharTokenizer
from gluon_e2e_asr_tpu.models.asr import build_model
from gluon_e2e_asr_tpu.ops.pallas_lstm import fits_vmem


def test_fits_vmem_boundaries():
    # The rehearsal OOM shape (predicted 149.2M vs actual 147.7M used).
    assert not fits_vmem(148, 320, 1280)
    # The known-good flagship bench point (runs at tc=8, ~114M predicted).
    assert fits_vmem(96, 320, 1280)
    # Narrow layers and small batches always fit.
    assert fits_vmem(96, 320, 80)
    assert fits_vmem(16, 256, 512)


def test_encoder_falls_back_instead_of_requesting_oversize_kernel(caplog):
    """A forward at the OOM batch must run (on CPU the kernel would run
    in interpret mode either way; the point is the fallback DECISION is
    taken before pallas_call, identically on every backend)."""
    import logging

    import jax

    cfg = Config(model=ModelConfig(enc_hidden=320, enc_layers=1,
                                   enc_subsample=(2,), lstm_impl="pallas"))
    tok = CharTokenizer()
    model = build_model(cfg, tok.vocab_size, tok.sos_id, tok.eos_id,
                        use_decoder=False)
    B, T = 148, 40  # subsample 2 -> D = 2*80 = 160 at layer 0: fits
    rng = jax.random.PRNGKey(0)
    feats = np.random.RandomState(0).randn(B, T, 80).astype(np.float32)
    feat_len = np.full((B,), T, np.int32)
    with caplog.at_level(logging.WARNING):
        params = model.init(rng, feats, feat_len, train=False)
        out = model.apply(params, feats, feat_len, train=False)
    # Layer 0 at D=160 fits even at B=148 — no fallback warning expected.
    assert not any("falling back to lax.scan" in r.message
                   for r in caplog.records)


def test_encoder_warns_and_runs_at_oom_shape(caplog):
    """Three wide layers at B=148 trigger the per-layer fallback."""
    import logging

    import jax

    cfg = Config(model=ModelConfig(enc_hidden=320, enc_layers=3,
                                   enc_subsample=(1, 2, 2),
                                   lstm_impl="pallas"))
    tok = CharTokenizer()
    model = build_model(cfg, tok.vocab_size, tok.sos_id, tok.eos_id,
                        use_decoder=False)
    B, T = 148, 40
    feats = np.random.RandomState(0).randn(B, T, 80).astype(np.float32)
    feat_len = np.full((B,), T, np.int32)
    rng = jax.random.PRNGKey(0)
    with caplog.at_level(logging.WARNING):
        params = model.init(rng, feats, feat_len, train=False)
        out = model.apply(params, feats, feat_len, train=False)
    assert any("falling back to lax.scan" in r.message
               for r in caplog.records)
    assert np.all(np.isfinite(np.asarray(out["ctc_logits"])))
