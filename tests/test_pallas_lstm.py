"""Pallas BiLSTM kernel vs the lax.scan reference: forward parity and
gradient parity (interpret mode on CPU; compiled on TPU via
tools/tpu_smoke.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluon_e2e_asr_tpu.models.lstm import bilstm_scan
from gluon_e2e_asr_tpu.ops.pallas_lstm import bilstm_pallas


def _inputs(B=3, T=11, H=8, seed=0):
    rng = np.random.RandomState(seed)
    xg_f = jnp.asarray(rng.randn(B, T, 4 * H).astype(np.float32) * 0.5)
    xg_b = jnp.asarray(rng.randn(B, T, 4 * H).astype(np.float32) * 0.5)
    w_hf = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.2)
    w_hb = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.2)
    lens = jnp.array([T, 7, 3][:B], jnp.int32)
    return xg_f, xg_b, lens, w_hf, w_hb


@pytest.mark.parametrize("tc", [4, 8])
def test_forward_parity(tc):
    xg_f, xg_b, lens, w_hf, w_hb = _inputs()
    got = bilstm_pallas(xg_f, xg_b, lens, w_hf, w_hb, jnp.float32, tc)
    ref = bilstm_scan(xg_f, xg_b, lens, w_hf, w_hb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_unaligned_T():
    # T not a multiple of the time chunk
    xg_f, xg_b, lens, w_hf, w_hb = _inputs(T=13)
    got = bilstm_pallas(xg_f, xg_b, lens, w_hf, w_hb, jnp.float32, 8)
    ref = bilstm_scan(xg_f, xg_b, lens, w_hf, w_hb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_gradient_parity():
    xg_f, xg_b, lens, w_hf, w_hb = _inputs(T=10)
    tgt = jnp.asarray(
        np.random.RandomState(9).randn(*bilstm_scan(
            xg_f, xg_b, lens, w_hf, w_hb).shape).astype(np.float32)
    )

    def loss_pallas(xf, xb, wf, wb):
        out = bilstm_pallas(xf, xb, lens, wf, wb, jnp.float32, 4)
        return jnp.sum(out * tgt)

    def loss_scan(xf, xb, wf, wb):
        out = bilstm_scan(xf, xb, lens, wf, wb)
        return jnp.sum(out * tgt)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(xg_f, xg_b, w_hf, w_hb)
    gs = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(xg_f, xg_b, w_hf, w_hb)
    for a, b in zip(gp, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_gradient_masking():
    """Padded timesteps must carry zero input-projection gradient."""
    xg_f, xg_b, lens, w_hf, w_hb = _inputs(B=2, T=9)
    lens = jnp.array([9, 4], jnp.int32)

    def loss(xf):
        out = bilstm_pallas(xf, xg_b[:2], lens, w_hf, w_hb, jnp.float32, 4)
        return jnp.sum(out ** 2)

    g = np.asarray(jax.grad(loss)(xg_f[:2]))
    np.testing.assert_array_equal(g[1, 4:], 0.0)
    assert np.abs(g[1, :4]).sum() > 0


@pytest.mark.slow
def test_fused_zero_and_full_lengths():
    """bilstm_fused handles len=0 rows (all-zero outputs, zero grads) and
    len=T rows exactly like the scan path — guards the no-per-step-valid
    design (invalid-prefix/suffix reasoning in _v2_fwd_kernel)."""
    import numpy as np

    from gluon_e2e_asr_tpu.models.lstm import bilstm_scan
    from gluon_e2e_asr_tpu.ops.pallas_lstm import bilstm_fused

    rng = np.random.RandomState(3)
    B, T, D, H = 3, 19, 8, 8
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = jnp.array([0, T, 5], jnp.int32)
    w_x = jnp.asarray(rng.randn(D, 8 * H).astype(np.float32) * 0.2)
    b_x = jnp.asarray(rng.randn(8 * H).astype(np.float32) * 0.1)
    w_hf = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.2)
    w_hb = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.2)

    def ref_fn(x, w_x, b_x, w_hf, w_hb):
        xg = jnp.dot(x, w_x) + b_x
        xg_f, xg_b = jnp.split(xg, 2, axis=-1)
        return bilstm_scan(xg_f, xg_b, lens, w_hf, w_hb)

    got = bilstm_fused(x, lens, w_x, b_x, w_hf, w_hb,
                       jnp.float32, 8)
    ref = ref_fn(x, w_x, b_x, w_hf, w_hb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # len=0 row emits exactly zero everywhere
    np.testing.assert_array_equal(np.asarray(got[0]), 0.0)

    g_got = jax.grad(lambda *a: bilstm_fused(
        a[0], lens, *a[1:], jnp.float32, 8).sum(), argnums=(0, 1, 2, 3, 4))(
        x, w_x, b_x, w_hf, w_hb)
    g_ref = jax.grad(lambda *a: ref_fn(*a).sum(), argnums=(0, 1, 2, 3, 4))(
        x, w_x, b_x, w_hf, w_hb)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    # no gradient flows into the len=0 row's inputs
    np.testing.assert_array_equal(np.asarray(g_got[0][0]), 0.0)
