"""Attention-branch losses and the joint CTC-attention objective.

Cross-entropy + label smoothing, padding-masked [BASELINE.json:L9;
SURVEY.md §2.1 #11], and the hybrid multi-task combine
L = mtl_alpha * L_ctc + (1 - mtl_alpha) * L_att
[BASELINE.json:L5,L10; SURVEY.md §2.1 #13, INFERRED-high for form].
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def make_decoder_io(labels: jnp.ndarray, label_lens: jnp.ndarray,
                    sos_id: int, eos_id: int, pad_id: int = 0):
    """Build teacher-forcing inputs and CE targets.

    labels [B, L] (padded with pad_id) ->
      tokens_in [B, L+1] = [sos, y_1..y_L]
      targets   [B, L+1] = [y_1..y_L, eos at position label_len]
      tgt_mask  [B, L+1] = positions < label_len + 1
    """
    B, L = labels.shape
    tokens_in = jnp.concatenate(
        [jnp.full((B, 1), sos_id, labels.dtype), labels], axis=1
    )
    pos = jnp.arange(L + 1)[None, :]
    targets = jnp.concatenate(
        [labels, jnp.full((B, 1), pad_id, labels.dtype)], axis=1
    )
    targets = jnp.where(pos == label_lens[:, None], eos_id, targets)
    tgt_mask = (pos <= label_lens[:, None]).astype(jnp.float32)
    return tokens_in, targets, tgt_mask


def ce_label_smoothing_loss(
    logits: jnp.ndarray,  # [B, L, V]
    targets: jnp.ndarray,  # [B, L]
    mask: jnp.ndarray,  # [B, L] float
    smoothing: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (per-sample summed CE [B], per-sample token-accuracy [B]).

    Smoothed target distribution: (1-eps) on the gold token, eps uniform
    over the full vocabulary.
    """
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    gold = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    uniform = logp.mean(axis=-1)
    nll = -((1.0 - smoothing) * gold + smoothing * uniform)
    loss = (nll * mask).sum(axis=-1)  # [B]
    pred = jnp.argmax(logits, axis=-1)
    acc = ((pred == targets).astype(jnp.float32) * mask).sum(axis=-1)
    denom = jnp.maximum(mask.sum(axis=-1), 1.0)
    return loss, acc / denom


def hybrid_loss(
    ctc_nll: jnp.ndarray,  # [B] per-sample CTC loss
    att_ce: jnp.ndarray,  # [B] per-sample summed attention CE (or zeros)
    label_lens: jnp.ndarray,  # [B]
    mtl_alpha: float,
    num_real: jnp.ndarray,  # scalar: count of non-pad rows in batch
) -> Dict[str, jnp.ndarray]:
    """Per-token-normalized joint objective. Pad rows (label_len==0 and
    input_len==0) carry zero loss already; normalize by real rows."""
    denom_tok = jnp.maximum(label_lens.astype(jnp.float32), 1.0)
    ctc_per = ctc_nll / denom_tok
    att_per = att_ce / (denom_tok + 1.0)  # +1 for the eos target
    n = jnp.maximum(num_real.astype(jnp.float32), 1.0)
    ctc_mean = ctc_per.sum() / n
    att_mean = att_per.sum() / n
    total = mtl_alpha * ctc_mean + (1.0 - mtl_alpha) * att_mean
    return {"loss": total, "loss_ctc": ctc_mean, "loss_att": att_mean}
