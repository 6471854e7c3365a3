"""Milestone 2: the fused Pallas frontend kernel [BASELINE.json:L8].

One ``pallas_call`` fuses the acoustic frontend — framing, STFT, log-Mel
filterbank, CMVN, SpecAugment — per utterance [BASELINE.json:L5 "fuses
into a single Pallas kernel feeding HBM-resident feature batches";
SURVEY.md §3.3].

TPU mapping decisions:
  * grid = (batch,): one program per utterance; frames are processed in
    fixed-size chunks inside the kernel so VMEM stays bounded for long
    buckets;
  * overlapping frames are assembled in-kernel by concatenating three
    hop-strided views of the audio (win=400 = 2*hop + 80 at hop=160).
    The views are contiguous reshapes built outside (Mosaic does not
    lower value-level dynamic_slice or ref reshapes, so a flat in-kernel
    gather is not expressible); the kernel does the actual window
    assembly, so each audio sample still crosses HBM exactly once per
    stride;
  * the STFT is a framed matmul against DFT cosine/sine bases restricted
    to the window length (zero-padding rows contribute nothing), running
    on the MXU [SURVEY.md §7 hard part 3];
  * CMVN (utterance mode) is a masked two-moment reduction over the
    on-chip feature buffer;
  * SpecAugment draws mask geometry from the in-kernel TPU PRNG
    (pltpu.prng_seed / prng_random_bits), seeded per (step, utterance).

Parity with the composed-jnp path (``features.compute_features``) is
unit-tested with SpecAugment off; SpecAugment statistics are tested
separately (the two paths use different PRNG streams by design).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gluon_e2e_asr_tpu.config import FrontendConfig
from gluon_e2e_asr_tpu.frontend.features import (
    dft_basis,
    hann_window,
    mel_filterbank,
    num_frames,
    spec_augment,
)

import os
FRAME_CHUNK = int(os.environ.get("GLUON_FE_CHUNK", "256"))  # frames per inner iteration (multiple of 8)


def _kernel(
    # scalar prefetch
    feat_len_ref,  # [B] int32
    seed_ref,  # [B] int32
    # inputs (hop-strided views of the padded audio)
    a1_ref,  # [1, FP, hop]
    a2_ref,  # [1, FP, hop]
    a3_ref,  # [1, FP, hop]
    basis_ref,  # [win, 2*n_freq]: window-folded (cos | sin), split by hop
    mel_ref,  # [n_freq, M]
    cmvn_ref,  # [2, M]: (mean, std) for cmvn_mode == "global"
    # output
    out_ref,  # [1, FP, M]
    *,
    hop: int,
    win: int,
    n_mels: int,
    log_floor: float,
    cmvn_mode: str,
    train_specaug: bool,
    sa_freq_masks: int,
    sa_freq_width: int,
    sa_time_masks: int,
    sa_time_width: int,
):
    b = pl.program_id(0)
    FP = out_ref.shape[1]
    n_chunks = FP // FRAME_CHUNK
    rem = win - 2 * hop
    n_freq = mel_ref.shape[0]
    feat_len = feat_len_ref[b]

    def chunk_body(c, _):
        sl = pl.ds(c * FRAME_CHUNK, FRAME_CHUNK)
        # HIGHEST precision: matches the jnp path; bf16 default would put
        # O(1) noise into the log features near the power floor.
        hp = jax.lax.Precision.HIGHEST
        # Segmented-K STFT against the combined (cos|sin) basis — same
        # structure as the jnp path: no [FC, win] frame materialization
        # (the per-chunk concatenate was a 400 KB VMEM copy), and one
        # matmul per hop segment instead of two per basis half.
        acc = jnp.dot(a1_ref[0, sl, :], basis_ref[:hop], precision=hp,
                      preferred_element_type=jnp.float32)
        acc += jnp.dot(a2_ref[0, sl, :], basis_ref[hop:2 * hop],
                       precision=hp, preferred_element_type=jnp.float32)
        acc += jnp.dot(a3_ref[0, sl, :rem], basis_ref[2 * hop:],
                       precision=hp, preferred_element_type=jnp.float32)
        power = acc[:, :n_freq] ** 2 + acc[:, n_freq:] ** 2
        mel = jnp.dot(power, mel_ref[:], precision=hp,
                      preferred_element_type=jnp.float32)
        out_ref[0, sl, :] = jnp.log(jnp.maximum(mel, log_floor))
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    # ---- CMVN + SpecAugment + padding mask, one read-modify-write ----
    # (CMVN before SpecAugment, matching the jnp path's order.)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (FP, n_mels), 0)
    valid = (row_ids < feat_len).astype(jnp.float32)
    feats = out_ref[0]
    if cmvn_mode == "utterance":
        denom = jnp.maximum(feat_len.astype(jnp.float32), 1.0)
        mean = jnp.sum(feats * valid, axis=0, keepdims=True) / denom
        var = jnp.sum((feats - mean) ** 2 * valid, axis=0, keepdims=True) / denom
        feats = (feats - mean) * jax.lax.rsqrt(var + 1e-10)
    elif cmvn_mode == "global":
        mean = cmvn_ref[0:1, :]
        std = cmvn_ref[1:2, :]
        feats = (feats - mean) / jnp.maximum(std, 1e-5)

    if train_specaug:  # train only; in-kernel TPU PRNG
        pltpu.prng_seed(seed_ref[b])
        nm = sa_freq_masks + sa_time_masks
        rnd = pltpu.bitcast(
            pltpu.prng_random_bits((2 * nm, 128)), jnp.uint32
        )[:, 0]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (FP, n_mels), 1)
        for i in range(sa_freq_masks):
            w = (rnd[2 * i] % jnp.uint32(sa_freq_width + 1)).astype(jnp.int32)
            s = (rnd[2 * i + 1] % jnp.uint32(max(n_mels, 1))).astype(jnp.int32)
            s = jnp.minimum(s, n_mels - w)
            hit = (col_ids >= s) & (col_ids < s + w)
            valid = jnp.where(hit, 0.0, valid)
        for i in range(sa_time_masks):
            j = sa_freq_masks + i
            w = (rnd[2 * j] % jnp.uint32(sa_time_width + 1)).astype(jnp.int32)
            w = jnp.minimum(w, jnp.maximum(feat_len // 5, 1))
            span = jnp.maximum(feat_len - w + 1, 1)
            s = (rnd[2 * j + 1] % jnp.uint32(FP)).astype(jnp.int32) % span
            hit = (row_ids >= s) & (row_ids < s + w)
            valid = jnp.where(hit, 0.0, valid)

    out_ref[0] = feats * valid


REGRID_CHUNK = int(os.environ.get("GLUON_FE_RC", "128"))  # frames/grid step

# Measured VMEM cost of the regrid kernel per (utterance, frame) at
# hop=160/n_freq=257/M=80: the B=96/RC=128 compile used 163.11M ->
# 3,481 f32 words per (b, frame) including double buffering and Mosaic
# overheads. The raw per-(b,frame) footprint at that config is
# 3*hop (three hop-strided audio views) + 2*n_freq (re/im spectrum)
# + M (mel out) = 1,074 words; the measured/raw ratio (~3.24x) folds in
# double buffering, window products, and Mosaic lane padding. For
# non-default frontend shapes the model scales the calibrated constant
# by the raw-footprint ratio [ADVICE.md round-4 #1: a fixed constant
# under-budgets larger hop/n_fft/n_mels]. The budget keeps ~25%
# headroom under the 128M hard limit.
_REGRID_WORDS_PER_BF = 3481
_REGRID_CALIB_RAW = 3 * 160 + 2 * 257 + 80  # = 1074 at the calibrated config
_REGRID_BUDGET_WORDS = (96 * 1024 * 1024) // 4


def _regrid_words_per_bf(hop: int, n_freq: int, n_mels: int) -> int:
    raw = 3 * hop + 2 * n_freq + n_mels
    return max(1, (_REGRID_WORDS_PER_BF * raw) // _REGRID_CALIB_RAW)


def _regrid_auto_chunk(B: int, hop: int = 160, n_freq: int = 257,
                       n_mels: int = 80) -> int:
    words = _regrid_words_per_bf(hop, n_freq, n_mels)
    rc = min(REGRID_CHUNK, _REGRID_BUDGET_WORDS // (B * words))
    return max(8, (rc // 8) * 8)


def _regrid_kernel(
    # scalar prefetch
    seed_ref,  # [1] int32
    # inputs (hop-strided views, windowed over the frame-chunk grid)
    a1_ref,  # [B, RC, hop]
    a2_ref,  # [B, RC, hop]
    a3_ref,  # [B, RC, hop]
    basis_ref,  # [win, 2*n_freq]
    mel_ref,  # [n_freq, M]
    cmvn_ref,  # [2, M]
    lens_ref,  # [B, 1] int32 (VMEM: Mosaic cannot vector-load SMEM)
    # output
    out_ref,  # [B, RC, M]
    *,
    hop: int,
    win: int,
    n_mels: int,
    log_floor: float,
    fused_epilogue: bool,
    cmvn_mode: str,
    train_specaug: bool,
    sa_freq_masks: int,
    sa_freq_width: int,
    sa_time_masks: int,
    sa_time_width: int,
):
    """One grid step = one frame chunk of the WHOLE batch.

    The STFT segments run as (B*RC, hop) x (hop, 2*n_freq) matmuls — the
    full cross-batch MXU parallelism the grid=(batch,) kernel gives up
    (DESIGN.md TODO 1's regrid experiment; VERDICT.md round-3 item 7).
    """
    c = pl.program_id(0)
    B, RC = out_ref.shape[0], out_ref.shape[1]
    rem = win - 2 * hop
    n_freq = mel_ref.shape[0]
    hp = jax.lax.Precision.HIGHEST

    x1 = a1_ref[...].reshape(B * RC, hop)
    x2 = a2_ref[...].reshape(B * RC, hop)
    x3 = a3_ref[...].reshape(B * RC, hop)
    acc = jnp.dot(x1, basis_ref[:hop], precision=hp,
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(x2, basis_ref[hop:2 * hop], precision=hp,
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(x3[:, :rem], basis_ref[2 * hop:], precision=hp,
                   preferred_element_type=jnp.float32)
    power = acc[:, :n_freq] ** 2 + acc[:, n_freq:] ** 2
    mel = jnp.dot(power, mel_ref[:], precision=hp,
                  preferred_element_type=jnp.float32)
    feats = jnp.log(jnp.maximum(mel, log_floor)).reshape(B, RC, n_mels)

    if not fused_epilogue:
        out_ref[...] = feats
        return

    # ---- fused epilogue (cmvn global/none): normalize + SpecAugment +
    # valid-mask, all on the resident chunk ----
    lens_v = lens_ref[...][:, 0]  # [B]
    row = (c * RC + jax.lax.broadcasted_iota(jnp.int32, (B, RC, n_mels), 1))
    valid = (row < lens_v[:, None, None]).astype(jnp.float32)
    if cmvn_mode == "global":
        feats = (feats - cmvn_ref[0:1, :][None]) / jnp.maximum(
            cmvn_ref[1:2, :][None], 1e-5)

    if train_specaug:
        # One seed for the whole call; every chunk re-derives the SAME
        # (B, 128) draw, so mask geometry agrees across chunk programs.
        pltpu.prng_seed(seed_ref[0])
        rnd = pltpu.bitcast(pltpu.prng_random_bits((B, 128)), jnp.uint32)
        col = jax.lax.broadcasted_iota(jnp.int32, (B, RC, n_mels), 2)
        for i in range(sa_freq_masks):
            w = (rnd[:, 2 * i] % jnp.uint32(sa_freq_width + 1)).astype(
                jnp.int32)
            s = (rnd[:, 2 * i + 1] % jnp.uint32(max(n_mels, 1))).astype(
                jnp.int32)
            s = jnp.minimum(s, n_mels - w)
            hit = ((col >= s[:, None, None])
                   & (col < (s + w)[:, None, None]))
            valid = jnp.where(hit, 0.0, valid)
        for i in range(sa_time_masks):
            j = sa_freq_masks + i
            w = (rnd[:, 2 * j] % jnp.uint32(sa_time_width + 1)).astype(
                jnp.int32)
            w = jnp.minimum(w, jnp.maximum(lens_v // 5, 1))
            span = jnp.maximum(lens_v - w + 1, 1)
            s = (rnd[:, 2 * j + 1].astype(jnp.int32) % span)
            hit = ((row >= s[:, None, None])
                   & (row < (s + w)[:, None, None]))
            valid = jnp.where(hit, 0.0, valid)

    out_ref[...] = feats * valid


def compute_features_pallas_regrid(
    cfg: FrontendConfig,
    audio: jnp.ndarray,
    audio_len: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    cmvn_stats=None,
    interpret: Optional[bool] = None,
):
    """Frontend regridded over frame chunks [DESIGN.md TODO 1].

    Same signature/semantics as ``compute_features`` (modulo SpecAugment
    PRNG streams). cmvn global/none runs fully fused in one streaming
    pallas_call; cmvn utterance needs a whole-utterance moment pass, so
    the kernel emits raw log-mel and the (bandwidth-bound, XLA-fused)
    CMVN/SpecAugment epilogue runs as jnp — the MXU-heavy front half is
    what the regrid experiment is about.
    """
    from gluon_e2e_asr_tpu.frontend.features import apply_cmvn

    B, S = audio.shape
    win, hop, M = cfg.win_length, cfg.hop_length, cfg.n_mels
    assert win <= 3 * hop, "kernel framing assumes win <= 3*hop"
    F = num_frames(S, win, hop)
    assert F > 0, "bucket shorter than one window"
    RC = _regrid_auto_chunk(B, hop=hop, n_freq=cfg.n_fft // 2 + 1, n_mels=M)
    FP = ((F + RC - 1) // RC) * RC
    n = FP // RC
    S_need = (FP + 2) * hop
    if S_need > S:
        audio = jnp.pad(audio, ((0, 0), (0, S_need - S)))
    a1 = audio[:, : FP * hop].reshape(B, FP, hop)
    a2 = audio[:, hop: (FP + 1) * hop].reshape(B, FP, hop)
    a3 = audio[:, 2 * hop: (FP + 2) * hop].reshape(B, FP, hop)

    fmax = cfg.fmax if cfg.fmax is not None else cfg.sample_rate / 2.0
    basis, mel = _constants(
        (win, cfg.n_fft, M, cfg.sample_rate, cfg.fmin, float(fmax))
    )
    feat_len = num_frames(audio_len, win, hop).astype(jnp.int32)
    do_specaug = train and (
        cfg.specaug_freq_masks > 0 or cfg.specaug_time_masks > 0
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fused = cfg.cmvn in ("global", "none")
    in_kernel_specaug = do_specaug and fused and not interpret

    if in_kernel_specaug:
        assert rng is not None
        seed = jax.random.randint(
            rng, (1,), 0, np.iinfo(np.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    if cfg.cmvn == "global":
        assert cmvn_stats is not None
        cmvn_arr = jnp.stack([jnp.asarray(cmvn_stats[0], jnp.float32),
                              jnp.asarray(cmvn_stats[1], jnp.float32)])
    else:
        cmvn_arr = jnp.zeros((2, M), jnp.float32)

    kernel = functools.partial(
        _regrid_kernel,
        hop=hop,
        win=win,
        n_mels=M,
        log_floor=cfg.log_floor,
        # The CMVN/valid-mask epilogue is interpretable (iota +
        # arithmetic only), so it runs in-kernel under interpret mode
        # too and the CPU parity tests cover it [ADVICE.md round-4 #3];
        # only the TPU-PRNG SpecAugment stage needs real hardware.
        fused_epilogue=fused,
        cmvn_mode=cfg.cmvn,
        train_specaug=in_kernel_specaug,
        sa_freq_masks=cfg.specaug_freq_masks,
        sa_freq_width=cfg.specaug_freq_width,
        sa_time_masks=cfg.specaug_time_masks,
        sa_time_width=cfg.specaug_time_width,
    )
    view_spec = pl.BlockSpec(
        (B, RC, hop), lambda c, *_: (0, c, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            view_spec, view_spec, view_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, RC, M), lambda c, *_: (0, c, 0), memory_space=pltpu.VMEM
        ),
    )
    feats_padded = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, FP, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(seed, a1, a2, a3, jnp.asarray(basis),
      jnp.asarray(mel), cmvn_arr, feat_len[:, None])
    feats = feats_padded[:, :F, :]

    if fused:
        if do_specaug and not in_kernel_specaug:
            # Interpret mode: the kernel already applied CMVN + valid
            # mask; only the (TPU-PRNG) SpecAugment stage falls back to
            # the jnp implementation.
            assert rng is not None
            feats = spec_augment(
                feats, feat_len, rng, cfg.specaug_freq_masks,
                cfg.specaug_freq_width, cfg.specaug_time_masks,
                cfg.specaug_time_width,
            )
            valid = (jnp.arange(F)[None, :] < feat_len[:, None])[..., None]
            feats = jnp.where(valid, feats, 0.0)
        return feats, feat_len

    # utterance CMVN (whole-utterance moments): finish with the XLA
    # epilogue — bandwidth-bound elementwise work XLA fuses fine;
    # parity with the jnp path falls out by reusing it.
    feats = apply_cmvn(feats, feat_len, cfg.cmvn, cmvn_stats)
    if do_specaug:
        assert rng is not None
        feats = spec_augment(
            feats, feat_len, rng, cfg.specaug_freq_masks,
            cfg.specaug_freq_width, cfg.specaug_time_masks,
            cfg.specaug_time_width,
        )
    valid = (jnp.arange(F)[None, :] < feat_len[:, None])[..., None]
    feats = jnp.where(valid, feats, 0.0)
    return feats, feat_len


@functools.lru_cache(maxsize=None)
def _constants(cfg_key) -> Tuple[np.ndarray, np.ndarray]:
    (win, n_fft, n_mels, sr, fmin, fmax) = cfg_key
    cos_b, sin_b = dft_basis(win, n_fft)
    w = hann_window(win)[:, None]
    basis = np.concatenate([w * cos_b, w * sin_b], axis=1).astype(np.float32)
    mel = mel_filterbank(n_mels, n_fft, sr, fmin, fmax)
    return basis, mel


def compute_features_pallas(
    cfg: FrontendConfig,
    audio: jnp.ndarray,
    audio_len: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    cmvn_stats=None,
    interpret: Optional[bool] = None,
):
    """Fused-kernel frontend with the same signature/semantics as
    ``features.compute_features`` (modulo the SpecAugment PRNG stream)."""
    B, S = audio.shape
    win, hop, M = cfg.win_length, cfg.hop_length, cfg.n_mels
    assert win <= 3 * hop, "kernel framing assumes win <= 3*hop"
    F = num_frames(S, win, hop)
    assert F > 0, "bucket shorter than one window"
    FP = ((F + FRAME_CHUNK - 1) // FRAME_CHUNK) * FRAME_CHUNK
    # Hop-strided views cover up to FP*hop + 2*hop samples.
    S_need = (FP + 2) * hop
    if S_need > S:
        audio = jnp.pad(audio, ((0, 0), (0, S_need - S)))
    a1 = audio[:, : FP * hop].reshape(B, FP, hop)
    a2 = audio[:, hop : (FP + 1) * hop].reshape(B, FP, hop)
    a3 = audio[:, 2 * hop : (FP + 2) * hop].reshape(B, FP, hop)

    fmax = cfg.fmax if cfg.fmax is not None else cfg.sample_rate / 2.0
    basis, mel = _constants(
        (win, cfg.n_fft, M, cfg.sample_rate, cfg.fmin, float(fmax))
    )

    feat_len = num_frames(audio_len, win, hop).astype(jnp.int32)
    do_specaug = train and (
        cfg.specaug_freq_masks > 0 or cfg.specaug_time_masks > 0
    )
    if do_specaug:
        assert rng is not None
        seeds = jax.random.randint(
            rng, (B,), 0, np.iinfo(np.int32).max, dtype=jnp.int32
        )
    else:
        seeds = jnp.zeros((B,), jnp.int32)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(
        _kernel,
        hop=hop,
        win=win,
        n_mels=M,
        log_floor=cfg.log_floor,
        cmvn_mode=cfg.cmvn,
        # In-kernel PRNG is TPU-only; under interpret (CPU) SpecAugment is
        # applied outside the kernel below.
        train_specaug=do_specaug and not interpret,
        sa_freq_masks=cfg.specaug_freq_masks,
        sa_freq_width=cfg.specaug_freq_width,
        sa_time_masks=cfg.specaug_time_masks,
        sa_time_width=cfg.specaug_time_width,
    )

    if cfg.cmvn == "global":
        assert cmvn_stats is not None
        cmvn_arr = jnp.stack([jnp.asarray(cmvn_stats[0], jnp.float32),
                              jnp.asarray(cmvn_stats[1], jnp.float32)])
    else:
        cmvn_arr = jnp.zeros((2, M), jnp.float32)

    view_spec = pl.BlockSpec(
        (1, FP, hop), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            view_spec,
            view_spec,
            view_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FP, M), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    feats_padded = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, FP, M), jnp.float32),
        interpret=interpret,
    )(feat_len, seeds, a1, a2, a3, jnp.asarray(basis),
      jnp.asarray(mel), cmvn_arr)
    feats = feats_padded[:, :F, :]

    if do_specaug and interpret:
        feats = spec_augment(
            feats, feat_len, rng, cfg.specaug_freq_masks,
            cfg.specaug_freq_width, cfg.specaug_time_masks,
            cfg.specaug_time_width,
        )
        valid = (jnp.arange(F)[None, :] < feat_len[:, None])[..., None]
        feats = jnp.where(valid, feats, 0.0)
    return feats, feat_len
