"""Pyramidal BiLSTM encoder + CTC projection head.

Reference-side realization: Gluon ``rnn.LSTM`` blocks over MXNet's C++
fused RNN ops [SURVEY.md §2.1 #8]. New-repo realization: stacked
bidirectional ``lax.scan`` LSTM layers with optional frame-pair
time subsampling between layers [BASELINE.json:L5,L7; SURVEY.md §2.1 #8
"pyramidal/stride subsampling"].
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gluon_e2e_asr_tpu.config import ModelConfig
from gluon_e2e_asr_tpu.models.lstm import bilstm_scan, lstm_scan


def subsample_concat(x: jnp.ndarray, lens: jnp.ndarray, factor: int):
    """Pyramidal reduction: concatenate ``factor`` consecutive frames and
    stride by ``factor``. [B,T,D] -> [B,ceil(T/f),f*D]; len -> ceil(len/f)."""
    if factor == 1:
        return x, lens
    B, T, D = x.shape
    pad = (-T) % factor
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    x = x.reshape(B, (T + pad) // factor, factor * D)
    new_lens = (lens + factor - 1) // factor
    return x, new_lens


class VGG2L(nn.Module):
    """VGG2L conv front: per stage, (3x3 conv + ReLU) x2 then 2x2 max-pool.

    The family's standard conv-subsampling encoder front ("vggblstm"
    [SURVEY.md §2.1 #8, INFERRED-med for the conv variant]). TPU-first
    realization: NHWC ``nn.Conv`` stacks that XLA tiles onto the MXU in
    ``compute_dtype`` — large batched convs, static shapes, no custom
    kernel. Each stage halves both time and feature axes (SAME pooling,
    so lens map as ceil(len/2) per stage); frames past the reduced
    length are re-zeroed after every stage so padded buckets stay
    deterministic and bucket-size-invariant (the frontend contract,
    frontend/features.py::compute_features).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, feats: jnp.ndarray, lens: jnp.ndarray, cdtype):
        cfg = self.cfg
        B, T, D = feats.shape
        C = int(cfg.vgg_in_channels)
        if D % C != 0:
            raise ValueError(
                f"feature dim {D} is not divisible by vgg_in_channels={C} "
                "(set vgg_in_channels = 1 + frontend.deltas)"
            )
        F = D // C
        # Deltas concatenate [static | d | dd] along the feature axis;
        # unstack those blocks into conv input channels: [B,T,F,C].
        x = feats.reshape(B, T, C, F).transpose(0, 1, 3, 2).astype(cdtype)
        for stage, ch in enumerate(cfg.vgg_channels):
            # Conv bias + ReLU make padded frames nonzero; re-zero after
            # EVERY conv so the next conv's boundary window sees zeros
            # regardless of how far the bucket is padded (otherwise a
            # relu(bias) frame just past ``lens`` leaks into the last
            # valid frames and breaks bucket-size invariance).
            valid = (jnp.arange(x.shape[1])[None, :] < lens[:, None])
            for sub in range(2):
                x = nn.Conv(
                    int(ch), (3, 3), padding="SAME", dtype=cdtype,
                    name=f"conv{stage + 1}_{sub + 1}",
                )(x)
                x = nn.relu(x)
                x = jnp.where(valid[:, :, None, None], x, 0)
            # SAME pooling == ceil(T/2): every valid frame lands in a
            # window whose start index is even, independent of bucket T.
            x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
            lens = (lens + 1) // 2
        Tr, Fr, Cr = x.shape[1], x.shape[2], x.shape[3]
        # Hand the LSTM stack f32, matching the frontend's output contract
        # (each layer casts to compute_dtype internally).
        out = x.reshape(B, Tr, Fr * Cr).astype(jnp.float32)
        return out, lens.astype(jnp.int32)


class BiLSTMEncoder(nn.Module):
    """Stacked BiLSTM with per-layer subsampling and a CTC head."""

    cfg: ModelConfig
    vocab_size: int

    @nn.compact
    def __call__(self, feats: jnp.ndarray, feat_len: jnp.ndarray,
                 train: bool = False, dropout_rng=None):
        cfg = self.cfg
        cdtype = jnp.dtype(cfg.compute_dtype)
        x, lens = feats, feat_len
        if cfg.enc_type == "vggblstm":
            x, lens = VGG2L(cfg, name="vgg")(x, lens, cdtype)
        elif cfg.enc_type != "blstm":
            raise ValueError(f"unknown enc_type {cfg.enc_type!r}")
        subs = tuple(cfg.enc_subsample) + (1,) * max(
            0, cfg.enc_layers - len(cfg.enc_subsample)
        )
        for layer in range(cfg.enc_layers):
            x, lens = subsample_concat(x, lens, int(subs[layer]))
            H = cfg.enc_hidden
            D = x.shape[-1]
            # One input projection for both directions [D, 8H], shared by
            # the scan path (XLA matmul) and the fused kernel (which
            # computes it per time chunk in VMEM, docs/ROADMAP.md #3).
            w_in = self.param(
                f"l{layer}_in_w", nn.initializers.lecun_normal(), (D, 8 * H)
            )
            b_in = self.param(f"l{layer}_in_b", nn.initializers.zeros,
                              (8 * H,))
            w_hf = self.param(
                f"l{layer}_rec_f", nn.initializers.orthogonal(), (H, 4 * H)
            )
            w_hb = self.param(
                f"l{layer}_rec_b", nn.initializers.orthogonal(), (H, 4 * H)
            )
            # Both directions share one sequential loop (see bilstm_scan /
            # bilstm_fused — identical numerics, parity-tested).
            use_pallas = cfg.lstm_impl == "pallas"
            if use_pallas:
                from gluon_e2e_asr_tpu.ops.pallas_lstm import (
                    bilstm_fused,
                    fits_vmem,
                )

                if not fits_vmem(x.shape[0], H, D, cdtype.itemsize):
                    # The fused kernel cannot run this shape (its backward
                    # would not fit VMEM even at the minimum time chunk) —
                    # e.g. very large dynamic-bucket batches at wide
                    # layers. Fall back to the scan path, loudly.
                    import logging

                    logging.getLogger(__name__).warning(
                        "pallas LSTM layer %d: shape B=%d D=%d H=%d "
                        "exceeds the kernel's VMEM budget at the minimum "
                        "time chunk; falling back to lax.scan for this "
                        "layer", layer, x.shape[0], D, H,
                    )
                    use_pallas = False
            if use_pallas:
                # custom_vjp functions take positional args only.
                x = bilstm_fused(x, lens, w_in, b_in, w_hf, w_hb, cdtype,
                                 int(cfg.lstm_time_chunk))  # [B, T, 2H]
            else:
                xg = (
                    jnp.dot(x.astype(cdtype), w_in.astype(cdtype),
                            preferred_element_type=jnp.float32)
                    + b_in
                ).astype(cdtype)
                xg_f, xg_b = jnp.split(xg, 2, axis=-1)
                scan_fn = functools.partial(bilstm_scan, compute_dtype=cdtype)
                if cfg.remat:
                    # Recompute the scan in the backward pass instead of
                    # storing per-step activations (O(1) residency for
                    # long buckets). The pallas kernel recomputes gates in
                    # its backward by construction.
                    scan_fn = jax.checkpoint(scan_fn)
                x = scan_fn(xg_f, xg_b, lens, w_hf, w_hb)  # [B, T, 2H]
            if train and cfg.enc_dropout > 0.0 and dropout_rng is not None:
                # independent mask per layer
                layer_rng = jax.random.fold_in(dropout_rng, layer)
                x = nn.Dropout(cfg.enc_dropout, deterministic=False)(
                    x, rng=layer_rng
                )
        # CTC projection head [SURVEY.md §2.1 #9]; loss applies log_softmax.
        ctc_logits = nn.Dense(self.vocab_size, dtype=cdtype, name="ctc_head")(
            x.astype(cdtype)
        ).astype(jnp.float32)
        return x, lens.astype(jnp.int32), ctc_logits
