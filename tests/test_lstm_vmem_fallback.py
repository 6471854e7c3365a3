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
    # The rehearsal OOM shape (predicted 152.4M vs actual 147.7M used).
    assert not fits_vmem(148, 320, 1280)
    # The known-good flagship bench point (runs at tc=8, ~115M predicted).
    assert fits_vmem(96, 320, 1280)
    # Narrow layers and small batches always fit.
    assert fits_vmem(96, 320, 80)
    assert fits_vmem(16, 256, 512)


def test_fits_vmem_lane_padding_and_dtype():
    """Round-4 B=128 bench findings: the D=80 layer-0 shape compile-OOM'd
    at 131.76M where the unpadded model said 102.4M — lane padding
    (80->128, 1->128, 320->384) is the whole gap. The model must (a)
    admit the shape (auto-chunk now lands at tc=8, ~67M) and (b) keep
    flagship layer-0 at its round-3 tc=16."""
    from gluon_e2e_asr_tpu.ops.pallas_lstm import (
        _v2_auto_chunk, _v2_vmem_words,
    )

    assert fits_vmem(128, 320, 80)
    assert _v2_auto_chunk(64, 128, 320, 80) == 8
    assert _v2_auto_chunk(64, 96, 320, 80) == 16  # flagship unchanged
    # Calibration point: tc=16 at B=128/D=80 predicts 120.0M; the
    # observed compile usage was 131.76M — the gap is the residual
    # floor fits_vmem adds before admitting.
    c, p = _v2_vmem_words(128, 320, 80)
    predicted_mib = (c + 16 * p) * 4 / 2**20
    assert abs(predicted_mib - 120.0) < 1.5, predicted_mib
    # bf16 does NOT rescue the wide layer at B=128: measured 133.1M
    # compile OOM (bf16 tiles pad the tc=8 sublane dim back to 16, so
    # the stream discount is illusory) — both dtypes must be rejected.
    assert not fits_vmem(128, 320, 1280, cd_bytes=4)
    assert not fits_vmem(128, 320, 1280, cd_bytes=2)
    # The production flagship wide layer stays admitted in both dtypes.
    assert fits_vmem(96, 320, 1280, cd_bytes=2)
    assert fits_vmem(96, 320, 1280, cd_bytes=4)


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
