"""Analytic FLOP accounting (utils/flops.py) [VERDICT.md round-2 item 2].

Pins the encoder count against the docs/DESIGN.md roofline formulae
(input proj 2*B*T*D*8H + recurrence 2 dirs * T * 2*B*H*4H) at the exact
flagship bench shapes, and the MFU arithmetic on a round number.
"""

import math

from gluon_e2e_asr_tpu.config import Config
from gluon_e2e_asr_tpu.data.tokenizer import CharTokenizer
from gluon_e2e_asr_tpu.frontend.features import num_frames
from gluon_e2e_asr_tpu.utils.flops import (
    bench_mfu,
    peak_tflops,
    train_step_flops,
)


def _flagship():
    return Config()  # defaults == flagship model (320x3 BiLSTM + LAS)


def test_encoder_count_matches_roofline_formulae():
    cfg = _flagship()
    B, samples, L = 96, int(12.8 * 16000), 96
    V = CharTokenizer().vocab_size
    fl = train_step_flops(cfg, V, B, samples, L)

    # Hand-roll the DESIGN.md encoder formulae at these shapes.
    T = num_frames(samples, cfg.frontend.win_length, cfg.frontend.hop_length)
    D, H = cfg.frontend.n_mels, cfg.model.enc_hidden
    expect = 0.0
    for f in cfg.model.enc_subsample:
        T = math.ceil(T / f)
        D = D * f
        expect += 2 * B * T * D * 8 * H
        expect += 2 * T * 2 * B * H * 4 * H
        D = 2 * H
    assert fl["breakdown"]["encoder"] == expect
    # Encoder dominates the step (DESIGN.md: ~71% of step time).
    assert fl["breakdown"]["encoder"] > 0.7 * fl["fwd"]
    assert fl["train"] == 3.0 * fl["fwd"]


def test_all_terms_positive_and_scale_with_batch():
    cfg = _flagship()
    V = CharTokenizer().vocab_size
    a = train_step_flops(cfg, V, 16, 16000 * 4, 32)
    b = train_step_flops(cfg, V, 32, 16000 * 4, 32)
    for k, v in a["breakdown"].items():
        assert v > 0, k
        assert b["breakdown"][k] == 2 * v, k  # every term is linear in B


def test_vgg_front_adds_conv_flops():
    cfg = _flagship()
    V = CharTokenizer().vocab_size
    base = train_step_flops(cfg, V, 8, 16000 * 2, 16)
    cfg.model.enc_type = "vggblstm"
    cfg.model.enc_subsample = (1, 1, 1)
    vgg = train_step_flops(cfg, V, 8, 16000 * 2, 16)
    assert vgg["breakdown"]["frontend"] > base["breakdown"]["frontend"]


def test_mfu_arithmetic():
    cfg = _flagship()
    cfg.model.compute_dtype = "bfloat16"
    V = CharTokenizer().vocab_size
    B, samples, L = 96, int(12.8 * 16000), 96
    fl = train_step_flops(cfg, V, B, samples, L)
    util = bench_mfu(1000.0, cfg, V, B, samples, L)
    expect_tps = 1000.0 * (fl["train"] / B) / 1e12
    assert abs(util["tflops_per_sec"] - expect_tps) < 1e-9
    assert util["peak_tflops"] == peak_tflops("bfloat16") == 197.0
    assert abs(util["mfu"] - expect_tps / 197.0) < 1e-12
    # Sanity: the flagship's measured ~1,300 utt/s lands in a plausible
    # utilization band (latency-bound recurrence keeps it well under 1).
    assert 0.05 < bench_mfu(1300.0, cfg, V, B, samples, L)["mfu"] < 0.8


def test_peak_override_env(monkeypatch):
    monkeypatch.setenv("GLUON_PEAK_TFLOPS", "123.5")
    assert peak_tflops("float32") == 123.5
