"""Encoder with lstm_impl=pallas == lstm_impl=scan (full module parity,
including gradients through the CTC head)."""

import jax
import jax.numpy as jnp
import numpy as np

from gluon_e2e_asr_tpu.config import ModelConfig
from gluon_e2e_asr_tpu.models.encoder import BiLSTMEncoder
import pytest


@pytest.mark.slow
def test_encoder_impl_parity():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 37, 8).astype(np.float32))
    feat_len = jnp.array([37, 20], jnp.int32)

    cfg_scan = ModelConfig(enc_hidden=16, enc_layers=2, enc_subsample=(1, 2),
                           lstm_impl="scan")
    cfg_pl = ModelConfig(enc_hidden=16, enc_layers=2, enc_subsample=(1, 2),
                         lstm_impl="pallas", lstm_time_chunk=8)
    enc_scan = BiLSTMEncoder(cfg_scan, vocab_size=10)
    enc_pl = BiLSTMEncoder(cfg_pl, vocab_size=10)
    params = enc_scan.init(jax.random.PRNGKey(0), feats, feat_len)["params"]

    x1, l1, logits1 = enc_scan.apply({"params": params}, feats, feat_len)
    x2, l2, logits2 = enc_pl.apply({"params": params}, feats, feat_len)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                               rtol=1e-5, atol=1e-5)

    def loss(module, p):
        _, _, lg = module.apply({"params": p}, feats, feat_len)
        return jnp.sum(lg ** 2)

    g1 = jax.grad(lambda p: loss(enc_scan, p))(params)
    g2 = jax.grad(lambda p: loss(enc_pl, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
