"""Analytic model-FLOP accounting for the train step.

VERDICT.md round-2 item 2: the official benchmark must self-report
achieved TFLOP/s and MFU, so "is it actually fast" is answerable from
the BENCH artifact alone. XLA's cost analysis cannot see inside the
Pallas custom calls, so the count is analytic: it mirrors the exact
matmul shapes the model builds (frontend/features.py DFT+mel chain,
models/encoder.py pyramidal BiLSTM, models/decoder.py LAS step) from
the config, the MFU convention (matmul multiply-adds x 2; elementwise,
softmax, and the CTC alpha-beta recursion are VPU work and excluded).

Training FLOPs use the standard fwd + backward ~= 3x forward-matmul
estimate (each matmul's backward is two matmuls of the same size).
"""

from __future__ import annotations

import math
import os
from typing import Dict

from gluon_e2e_asr_tpu.config import Config
from gluon_e2e_asr_tpu.frontend.features import num_frames

# Peak MXU throughput used as the MFU denominator, in TFLOP/s.
# TPU v5-lite (v5e): 197 TFLOP/s bf16; f32 matmuls run at ~half that
# (this chip's measured f32 matmul ceiling is ~99 TFLOP/s — the
# docs/DESIGN.md encoder roofline's 92%-of-ceiling reading at L2).
# Override with GLUON_PEAK_TFLOPS for other hardware.
PEAK_TFLOPS = {"bfloat16": 197.0, "float32": 98.5}


def peak_tflops(compute_dtype: str) -> float:
    env = os.environ.get("GLUON_PEAK_TFLOPS")
    if env:
        return float(env)
    return PEAK_TFLOPS[str(compute_dtype)]


def train_step_flops(
    config: Config,
    vocab_size: int,
    batch_size: int,
    audio_samples: int,
    max_labels: int,
) -> Dict[str, float]:
    """Exact matmul-FLOP count of one train step at the given shapes.

    Returns {"fwd": F, "train": 3F, "breakdown": {...}} in FLOPs
    (multiply-add = 2). Shapes mirror the padded bucket the step runs
    on (padding FLOPs are real FLOPs — the step computes them).
    """
    fc, mc = config.frontend, config.model
    B, L = batch_size, max_labels
    V = vocab_size

    # --- frontend (jnp impl; the Pallas kernel computes the same math) ---
    F = int(num_frames(audio_samples, fc.win_length, fc.hop_length))
    bins = fc.n_fft // 2 + 1
    dft = 2.0 * B * F * fc.win_length * (2 * bins)  # combined cos|sin basis
    mel = 2.0 * B * F * bins * fc.n_mels
    frontend = dft + mel
    D = fc.n_mels * (1 + int(getattr(fc, "deltas", 0)))

    # --- encoder: pyramidal BiLSTM stack (models/encoder.py) -------------
    T = F
    H = mc.enc_hidden
    subs = tuple(mc.enc_subsample) + (1,) * max(
        0, mc.enc_layers - len(mc.enc_subsample)
    )
    if mc.enc_type == "vggblstm":
        # Two (conv x2 + pool) stages: 3x3 convs at compute_dtype.
        C_in = int(mc.vgg_in_channels)
        Freq = D // C_in
        conv = 0.0
        t, f = T, Freq
        for ch in mc.vgg_channels:
            conv += 2.0 * B * t * f * 9 * C_in * ch      # conv 1
            conv += 2.0 * B * t * f * 9 * ch * ch        # conv 2
            t, f, C_in = (t + 1) // 2, (f + 1) // 2, int(ch)
        frontend += conv
        T, D = t, f * C_in
    encoder = 0.0
    for layer in range(mc.enc_layers):
        f = int(subs[layer])
        T = (T + f - 1) // f
        D = D * f
        encoder += 2.0 * B * T * D * (8 * H)          # in-proj, both dirs
        encoder += 2 * T * (2.0 * B * H * (4 * H))    # recurrence, 2 dirs
        D = 2 * H

    # --- CTC head ---------------------------------------------------------
    T_enc, enc_dim = T, 2 * H
    ctc_head = 2.0 * B * T_enc * enc_dim * V

    # --- LAS decoder, teacher-forced over L steps (models/decoder.py) ----
    Hd, A, E = mc.dec_hidden, mc.att_dim, mc.dec_embed
    dec = 2.0 * B * T_enc * enc_dim * A               # key precompute
    per_step = 2.0 * B * (E + enc_dim) * (4 * Hd)     # cell0 input proj
    per_step += 2.0 * B * Hd * (4 * Hd)               # cell0 recurrence
    for _ in range(mc.dec_layers - 1):
        per_step += 2.0 * B * Hd * (4 * Hd) * 2       # deeper cells
    per_step += 2.0 * B * Hd * A                      # query projection
    if mc.att_type == "dot":
        per_step += 2.0 * B * T_enc * A               # q . k scores
    else:
        per_step += 2.0 * B * T_enc * A               # energy v-dot
        if mc.att_type == "loc":
            per_step += 2.0 * B * T_enc * mc.loc_conv_width \
                * mc.loc_conv_channels
            per_step += 2.0 * B * T_enc * mc.loc_conv_channels * A
    per_step += 2.0 * B * T_enc * enc_dim             # context sum
    per_step += 2.0 * B * (Hd + enc_dim) * V          # output projection
    dec += L * per_step

    fwd = frontend + encoder + ctc_head + dec
    return {
        "fwd": fwd,
        "train": 3.0 * fwd,
        "breakdown": {
            "frontend": frontend,
            "encoder": encoder,
            "ctc_head": ctc_head,
            "decoder": dec,
        },
    }


def bench_mfu(utt_per_sec: float, config: Config, vocab_size: int,
              batch_size: int, audio_samples: int,
              max_labels: int) -> Dict[str, float]:
    """Achieved TFLOP/s + MFU for a measured train throughput."""
    fl = train_step_flops(config, vocab_size, batch_size,
                          audio_samples, max_labels)
    flops_per_utt = fl["train"] / batch_size
    tps = utt_per_sec * flops_per_utt / 1e12
    peak = peak_tflops(config.model.compute_dtype)
    return {
        "model_tflops_per_step": fl["train"] / 1e12,
        "tflops_per_sec": tps,
        "mfu": tps / peak,
        "peak_tflops": peak,
    }
