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
