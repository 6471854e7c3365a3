"""Fused bidirectional scan == two separate directional scans."""

import jax.numpy as jnp
import numpy as np

from gluon_e2e_asr_tpu.models.lstm import bilstm_scan, lstm_scan


def test_bilstm_scan_matches_two_scans():
    B, T, H = 3, 9, 8
    rng = np.random.RandomState(0)
    xg_f = jnp.asarray(rng.randn(B, T, 4 * H).astype(np.float32) * 0.5)
    xg_b = jnp.asarray(rng.randn(B, T, 4 * H).astype(np.float32) * 0.5)
    w_hf = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.2)
    w_hb = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.2)
    lens = jnp.array([9, 5, 1], jnp.int32)

    fused = bilstm_scan(xg_f, xg_b, lens, w_hf, w_hb)
    fwd = lstm_scan(xg_f, lens, w_hf, reverse=False)
    bwd = lstm_scan(xg_b, lens, w_hb, reverse=True)
    ref = jnp.concatenate([fwd, bwd], axis=-1)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_v2_auto_chunk_vmem_model():
    """The fused-kernel time-chunk clamp: keeps tc at small shapes, shrinks
    at wide/big-batch shapes, never below the 8-sublane floor, and its
    modeled backward footprint stays under the VMEM limit whenever a
    shrink is possible (pallas_lstm._v2_auto_chunk docstring)."""
    from gluon_e2e_asr_tpu.ops.pallas_lstm import (
        _V2_VMEM_LIMIT, _v2_auto_chunk,
    )

    H = 320

    def modeled_bytes(tc, B, D):
        const_words = 3 * (8 * D * H + 8 * H * H + 8 * H) + 4 * B * H
        per_t_words = B * (8 * D + 34 * H + 4)
        return 4 * (const_words + tc * per_t_words)

    # Flagship batch-16 shapes keep the default chunk.
    assert _v2_auto_chunk(16, 16, H, 1280) == 16
    # Batch 64 on the wide layers must shrink (16 would exceed VMEM).
    tc64 = _v2_auto_chunk(16, 64, H, 1280)
    assert tc64 < 16 and tc64 % 8 == 0
    assert modeled_bytes(tc64, 64, 1280) <= _V2_VMEM_LIMIT
    assert modeled_bytes(16, 64, 1280) > int(_V2_VMEM_LIMIT * 0.85)
    # Never below the sublane floor, even at absurd widths.
    assert _v2_auto_chunk(16, 512, H, 4096) == 8
    # Narrow first layer stays at the requested chunk for all batches.
    assert _v2_auto_chunk(16, 96, H, 160) == 16
