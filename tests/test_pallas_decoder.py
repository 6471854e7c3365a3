"""Fused Pallas decoder kernel parity vs the lax.scan baseline
[docs/ROADMAP.md #1; SURVEY.md §2.1 #10,#12].

Runs in interpret mode on CPU (tests/conftest.py), where the kernel is
bit-exact against the scan path at float32; the TPU-side Mosaic compile
and the bf16 precision contract are exercised by bench/milestone runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluon_e2e_asr_tpu.config import ModelConfig
from gluon_e2e_asr_tpu.models.decoder import AttentionDecoder
from gluon_e2e_asr_tpu.ops.pallas_decoder import (
    build_loc_band_cmajor,
    las_decoder_fused,
    las_decoder_fwd,
)

V = 12
B, T, L = 4, 24, 11


def _setup(att_type):
    cfg = ModelConfig(enc_hidden=32, dec_hidden=32, dec_embed=16, att_dim=16,
                      dec_layers=1, att_type=att_type,
                      loc_conv_channels=4, loc_conv_width=7)
    dec = AttentionDecoder(cfg, V)
    enc = jax.random.normal(jax.random.PRNGKey(0), (B, T, 2 * cfg.enc_hidden))
    enc_len = jnp.array([24, 20, 17, 5], jnp.int32)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, V)
    tokens = tokens.at[:, 0].set(2)
    variables = dec.init(jax.random.PRNGKey(2), enc, enc_len, tokens)
    return cfg, dec, variables, enc, enc_len, tokens


def _fused_args(cfg, p, enc, enc_len, tokens, coins_bl):
    T_ = enc.shape[1]
    is_loc = cfg.att_type == "loc"
    enc_mask = (jnp.arange(T_)[None] < enc_len[:, None]).astype(jnp.float32)
    enc_proj = enc @ p["att_k"]
    band2 = (build_loc_band_cmajor(p["loc_filter"], T_)
             if is_loc else jnp.zeros((1, 1)))
    return (tokens, coins_bl, enc, enc_proj, enc_mask, band2,
            p["embed"], p["cell0_wx"], p["cell0_b"], p["cell0_wh"],
            p["att_q"],
            p.get("att_b", jnp.zeros((cfg.att_dim,))),
            p.get("att_v", jnp.zeros((cfg.att_dim, 1))),
            p.get("loc_proj", jnp.zeros((1, cfg.att_dim))),
            p["out_w"], p["out_b"])


@pytest.mark.parametrize("att_type", [pytest.param("loc", marks=pytest.mark.slow), "add", "dot"])
def test_fwd_matches_scan(att_type):
    cfg, dec, variables, enc, enc_len, tokens = _setup(att_type)
    ref = dec.apply(variables, enc, enc_len, tokens, 0.0, None)
    coins = jnp.zeros((B, L), jnp.float32)
    args = list(_fused_args(cfg, variables["params"], enc, enc_len, tokens,
                            coins))
    if att_type != "loc":
        args[5] = None  # las_decoder_fwd infers is_loc from band2
    logits, resid = las_decoder_fwd(*args, compute_dtype="float32",
                                    l_chunk=4,
                                    is_dot=att_type == "dot")
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # residual shapes
    h_seq, c_seq, att_seq, ctx_seq, tok_seq = resid
    assert h_seq.shape == (B, L, cfg.dec_hidden)
    assert att_seq.shape == (B, L, T)
    assert tok_seq.shape == (B, L)
    np.testing.assert_array_equal(np.asarray(tok_seq), np.asarray(tokens))


@pytest.mark.parametrize("att_type", [pytest.param("loc", marks=pytest.mark.slow), "add", "dot"])
def test_scheduled_sampling_matches_stepwise(att_type):
    """Argmax feedback in-kernel == an explicit step loop with the same
    coins [SURVEY.md §2.1 #12]."""
    cfg, dec, variables, enc, enc_len, tokens = _setup(att_type)
    p = variables["params"]
    coins = (jax.random.uniform(jax.random.PRNGKey(3), (L, B)) < 0.5)
    coins = coins.at[0].set(False)

    enc_mask = (jnp.arange(T)[None] < enc_len[:, None]).astype(jnp.float32)
    enc_proj = dec.apply(variables, enc, method=dec.precompute)
    band = (dec.apply(variables, T, method=dec.build_loc_band)
            if att_type == "loc" else None)
    state = dec.apply(variables, B, T, method=dec.init_state)
    prev = tokens[:, 0]
    outs = []
    for t in range(L):
        tok = jnp.where(coins[t], prev, tokens[:, t])
        state, lg = dec.apply(variables, state, tok, enc, enc_proj,
                              enc_mask, band, method=dec.step)
        prev = jnp.argmax(lg, -1).astype(tokens.dtype)
        outs.append(lg)
    ref = jnp.stack(outs, axis=1)

    args = list(_fused_args(cfg, p, enc, enc_len, tokens,
                            coins.T.astype(jnp.float32)))
    if att_type != "loc":
        args[5] = None  # las_decoder_fwd infers is_loc from band2
    logits, _ = las_decoder_fwd(*args, compute_dtype="float32", l_chunk=4,
                                is_dot=att_type == "dot")
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("att_type", [pytest.param("loc", marks=pytest.mark.slow), "add", "dot"])
def test_grads_match_scan_autodiff(att_type):
    """custom_vjp backward kernel == autodiff through the scan path, for
    every parameter (incl. loc_filter via the band gather and att_k via
    enc_proj) and for the encoder activations."""
    cfg, dec, variables, enc, enc_len, tokens = _setup(att_type)
    p = variables["params"]
    w = jax.random.normal(jax.random.PRNGKey(5), (B, L, V))

    def loss_scan(p, enc):
        lg = dec.apply({"params": p}, enc, enc_len, tokens, 0.0, None)
        return jnp.sum(lg * w)

    def loss_fused(p, enc):
        coins = jnp.zeros((B, L), jnp.float32)
        args = _fused_args(cfg, p, enc, enc_len, tokens, coins)
        lg = las_decoder_fused(("float32", 4, att_type), *args)
        return jnp.sum(lg * w)

    (v1, g1) = jax.value_and_grad(loss_scan, argnums=(0, 1))(p, enc)
    (v2, g2) = jax.value_and_grad(loss_fused, argnums=(0, 1))(p, enc)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for key in g1[0]:
        a, b = np.asarray(g1[0][key]), np.asarray(g2[0][key])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-5,
                                   err_msg=f"grad mismatch: {key}")
    a, b = np.asarray(g1[1]), np.asarray(g2[1])
    np.testing.assert_allclose(b, a, atol=2e-5 * max(np.abs(a).max(), 1.0))


def test_model_level_dispatch():
    """dec_impl='pallas' routes __call__ through the fused kernel and
    produces the same logits; unsupported shapes fall back silently."""
    cfg, dec, variables, enc, enc_len, tokens = _setup("loc")
    ref = dec.apply(variables, enc, enc_len, tokens, 0.0, None)

    cfg2 = ModelConfig(**{**cfg.__dict__, "dec_impl": "pallas"})
    dec2 = AttentionDecoder(cfg2, V)
    out = dec2.apply(variables, enc, enc_len, tokens, 0.0, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # dec_layers=2 is unsupported -> must silently use the scan path
    cfg3 = ModelConfig(**{**cfg.__dict__, "dec_impl": "pallas",
                          "dec_layers": 2})
    dec3 = AttentionDecoder(cfg3, V)
    v3 = dec3.init(jax.random.PRNGKey(2), enc, enc_len, tokens)
    out3 = dec3.apply(v3, enc, enc_len, tokens, 0.0, None)
    assert out3.shape == (B, L, V)


@pytest.mark.slow
def test_train_step_with_fused_decoder():
    """End-to-end: a hybrid train step with dec_impl=pallas matches the
    scan-decoder step on a deterministic config."""
    from gluon_e2e_asr_tpu.config import (
        Config, DataConfig, FrontendConfig, LossConfig, TrainConfig,
    )
    from gluon_e2e_asr_tpu.data.loader import DataLoader
    from gluon_e2e_asr_tpu.data.manifest import build_synthetic_manifest
    from gluon_e2e_asr_tpu.data.sampler import BucketSampler, make_bucket_specs
    from gluon_e2e_asr_tpu.data.tokenizer import CharTokenizer
    from gluon_e2e_asr_tpu.models.asr import build_model
    from gluon_e2e_asr_tpu.training.train_step import (
        create_train_state, make_optimizer, make_train_step,
    )

    def mk(dec_impl):
        cfg = Config(
            data=DataConfig(dataset="synthetic", synth_num_train=4,
                            synth_max_tokens=5, batch_size=4,
                            bucket_bounds_sec=(1.5,)),
            frontend=FrontendConfig(specaug_freq_masks=0,
                                    specaug_time_masks=0),
            model=ModelConfig(enc_hidden=32, enc_layers=2,
                              enc_subsample=(1, 2), dec_hidden=32,
                              dec_embed=16, att_dim=16, att_type="loc",
                              loc_conv_channels=4, loc_conv_width=7,
                              dec_impl=dec_impl),
            loss=LossConfig(mtl_alpha=0.3),
            train=TrainConfig(seed=0),
        )
        tok = CharTokenizer()
        utts = build_synthetic_manifest(4, seed=0, max_tokens=5)
        specs = make_bucket_specs(cfg.data.bucket_bounds_sec, 16000, 4, 16)
        sampler = BucketSampler(utts, specs, 16000, seed=0, shuffle=False)
        loader = DataLoader(utts, sampler, tok)
        b = next(iter(loader.epoch(0)))
        batch = {"audio": b.audio, "audio_len": b.audio_len,
                 "labels": b.labels, "label_len": b.label_len}
        model = build_model(cfg, tok.vocab_size, tok.sos_id, tok.eos_id)
        tx = make_optimizer(cfg)
        state = create_train_state(cfg, model, tx, batch)
        step = make_train_step(model, cfg, tx, mesh=None)
        return step, state, {k: jnp.asarray(v) for k, v in batch.items()}

    step_s, state_s, batch_s = mk("scan")
    s1, m1 = step_s(state_s, batch_s)
    step_p, state_p, batch_p = mk("pallas")
    s2, m2 = step_p(state_p, batch_p)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5)
