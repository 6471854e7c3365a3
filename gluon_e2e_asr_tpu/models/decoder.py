"""LAS-style attention decoder (unidirectional LSTM + attention).

Reference-side realization: Gluon Blocks over MXNet C++ ops with a
Python per-step loop [SURVEY.md §2.1 #10,#12]. New-repo realization
[BASELINE.json:L9]: one flax module with two apply paths sharing the
same parameters —

  * ``__call__``  — the teacher-forced training pass as a single
    ``lax.scan`` over output steps, with scheduled sampling (per-step
    Bernoulli mix of gold vs the model's own argmax, PRNG-keyed)
    [SURVEY.md §2.1 #12];
  * ``step``      — a single decode step over an explicit state pytree,
    used by greedy/beam search [SURVEY.md §3.2]. Scan-path vs step-path
    parity is unit-tested.

Attention variants: "dot" (scaled dot product), "add" (Bahdanau), and
"loc" (location-aware: additive + a conv feature over the previous
attention weights) [SURVEY.md §2.1 #10, INFERRED-med on variant].
The encoder-side key projection is precomputed once per utterance
(``precompute``) so the per-step work is one cell update + one masked
softmax — the big matmuls stay outside the scan.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gluon_e2e_asr_tpu.config import ModelConfig
from gluon_e2e_asr_tpu.models.lstm import lstm_cell_step


class AttentionDecoder(nn.Module):
    cfg: ModelConfig
    vocab_size: int
    sos_id: int = 2
    eos_id: int = 3

    def setup(self):
        cfg = self.cfg
        V, E, H, A = self.vocab_size, cfg.dec_embed, cfg.dec_hidden, cfg.att_dim
        enc_dim = 2 * cfg.enc_hidden
        self.embed = self.param(
            "embed", nn.initializers.normal(1.0 / (E ** 0.5)), (V, E)
        )
        # Stacked LSTM cells; layer 0 consumes [embedding ; context].
        in_dims = [E + enc_dim] + [H] * (cfg.dec_layers - 1)
        self.w_x = [
            self.param(f"cell{l}_wx", nn.initializers.lecun_normal(),
                       (in_dims[l], 4 * H))
            for l in range(cfg.dec_layers)
        ]
        self.b_x = [
            self.param(f"cell{l}_b", nn.initializers.zeros, (4 * H,))
            for l in range(cfg.dec_layers)
        ]
        self.w_h = [
            self.param(f"cell{l}_wh", nn.initializers.orthogonal(), (H, 4 * H))
            for l in range(cfg.dec_layers)
        ]
        # Attention parameters.
        self.att_q = self.param("att_q", nn.initializers.lecun_normal(), (H, A))
        self.att_k = self.param("att_k", nn.initializers.lecun_normal(), (enc_dim, A))
        if cfg.att_type in ("add", "loc"):
            self.att_b = self.param("att_b", nn.initializers.zeros, (A,))
            self.att_v = self.param("att_v", nn.initializers.lecun_normal(), (A, 1))
        if cfg.att_type == "loc":
            self.loc_filter = self.param(
                "loc_filter",
                nn.initializers.lecun_normal(),
                (cfg.loc_conv_width, 1, cfg.loc_conv_channels),
            )
            self.loc_proj = self.param(
                "loc_proj", nn.initializers.lecun_normal(),
                (cfg.loc_conv_channels, A),
            )
        self.w_out = self.param(
            "out_w", nn.initializers.lecun_normal(), (H + enc_dim, V)
        )
        self.b_out = self.param("out_b", nn.initializers.zeros, (V,))

    # ------------------------------------------------------------------
    # Attention
    # ------------------------------------------------------------------
    def precompute(self, enc: jnp.ndarray) -> jnp.ndarray:
        """Encoder key projection, computed once per utterance: [B,T,A]."""
        cdtype = jnp.dtype(self.cfg.compute_dtype)
        return jnp.dot(
            enc.astype(cdtype), self.att_k.astype(cdtype),
            preferred_element_type=jnp.float32,
        )

    def build_loc_band(self, T: int) -> jnp.ndarray:
        """Banded matrix realizing the location conv as one MXU matmul.

        ``conv_general_dilated`` inside the decode scan was the single most
        expensive op of the train step (~9 ms of 35 at B=16: conv + its
        backward lower poorly inside lax.scan). Same math as a matmul:
        out[n,t,c] = sum_s att[n,s] * Band[s,(t,c)] with
        Band[s,t,c] = filter[s - t + (w-1)//2, 0, c] (XLA SAME alignment,
        verified empirically). MUST be built OUTSIDE any scan (the gather
        and its scatter-backward are per-call costs); callers pass it into
        step/step_beam. Returns [T, T*C], or None when the band would be
        too large (long buckets: T*T*C floats) — callers then fall back
        to the conv path."""
        cfg = self.cfg
        if T * T * cfg.loc_conv_channels > 16_000_000:  # > 64 MB f32
            return None
        w = cfg.loc_conv_width
        pad_left = (w - 1) // 2
        s_idx = jnp.arange(T)[:, None]
        t_idx = jnp.arange(T)[None, :]
        k = s_idx - t_idx + pad_left  # [T,T]
        valid = (k >= 0) & (k < w)
        gathered = self.loc_filter[jnp.clip(k, 0, w - 1), 0, :]  # [T,T,C]
        band = jnp.where(valid[..., None], gathered, 0.0)
        return band.reshape(T, T * cfg.loc_conv_channels)

    def _loc_feature(self, att_prev_flat: jnp.ndarray, loc_band) -> jnp.ndarray:
        """att_prev_flat [N, T] -> [N, T, C]: banded matmul when a band is
        available, conv otherwise (long-bucket fallback)."""
        T = att_prev_flat.shape[-1]
        if loc_band is not None:
            out = jnp.dot(
                att_prev_flat, loc_band, preferred_element_type=jnp.float32
            )
            return out.reshape(att_prev_flat.shape[0], T,
                               self.cfg.loc_conv_channels)
        return jax.lax.conv_general_dilated(
            att_prev_flat[:, :, None],
            self.loc_filter,
            window_strides=(1,),
            padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    def _attend(self, query, enc, enc_proj, enc_mask, att_prev,
                loc_band=None):
        """query [B,H] -> (context [B,enc_dim], att_w [B,T])."""
        cfg = self.cfg
        q = jnp.dot(query, self.att_q, preferred_element_type=jnp.float32)  # [B,A]
        if cfg.att_type == "dot":
            scores = jnp.einsum("ba,bta->bt", q, enc_proj) / jnp.sqrt(
                jnp.asarray(cfg.att_dim, jnp.float32)
            )
        else:
            e = q[:, None, :] + enc_proj + self.att_b  # [B,T,A]
            if cfg.att_type == "loc":
                # Location feature over previous attention weights
                # [B,T] -> [B,T,C], as a banded matmul (see build_loc_band).
                f = self._loc_feature(att_prev, loc_band)
                e = e + jnp.dot(f, self.loc_proj,
                                preferred_element_type=jnp.float32)
            scores = jnp.tanh(e) @ self.att_v  # [B,T,1]
            scores = scores[..., 0]
        scores = jnp.where(enc_mask, scores, -1e30)
        att_w = jax.nn.softmax(scores, axis=-1)
        att_w = att_w * enc_mask  # exact zeros on padding
        context = jnp.einsum("bt,btd->bd", att_w, enc)
        return context, att_w

    # ------------------------------------------------------------------
    # Single decode step (shared by training scan, greedy, beam)
    # ------------------------------------------------------------------
    def init_state(self, batch: int, enc_frames: int) -> Dict[str, Any]:
        cfg = self.cfg
        H, enc_dim = cfg.dec_hidden, 2 * cfg.enc_hidden
        z = lambda *s: jnp.zeros(s, jnp.float32)
        # Initial attention: uniform over the (masked) window would need
        # lens; zeros work because step() recomputes attention before use.
        return {
            "h": z(cfg.dec_layers, batch, H),
            "c": z(cfg.dec_layers, batch, H),
            "att_w": z(batch, enc_frames),
            "context": z(batch, enc_dim),
        }

    def step(self, state, token, enc, enc_proj, enc_mask, loc_band=None):
        """One decode step. token [B] int32 -> (new_state, logits [B,V]).
        For loc attention inside a scan, pass a prebuilt ``loc_band``
        (build_loc_band) — building it per step is pathological."""
        cfg = self.cfg
        emb = self.embed[token]  # [B,E]
        x = jnp.concatenate([emb, state["context"]], axis=-1)
        hs, cs = [], []
        for l in range(cfg.dec_layers):
            xg = jnp.dot(x, self.w_x[l], preferred_element_type=jnp.float32) + self.b_x[l]
            h_new, c_new = lstm_cell_step(
                state["h"][l], state["c"][l], xg, self.w_h[l]
            )
            hs.append(h_new)
            cs.append(c_new)
            x = h_new
        query = hs[-1]
        context, att_w = self._attend(query, enc, enc_proj, enc_mask,
                                      state["att_w"], loc_band)
        logits = (
            jnp.dot(jnp.concatenate([query, context], axis=-1), self.w_out,
                    preferred_element_type=jnp.float32)
            + self.b_out
        )
        new_state = {
            "h": jnp.stack(hs),
            "c": jnp.stack(cs),
            "att_w": att_w,
            "context": context,
        }
        return new_state, logits

    # ------------------------------------------------------------------
    # Beam-layout step: encoder tensors stay [B,T,*] (NOT replicated
    # K-fold); only the small decoder state carries the beam axis.
    # ------------------------------------------------------------------
    def _attend_beam(self, query, enc, enc_proj, enc_mask, att_prev,
                     loc_band=None):
        """query [B,K,H], enc [B,T,D], enc_proj [B,T,A], enc_mask [B,T],
        att_prev [B,K,T] -> (context [B,K,D], att_w [B,K,T])."""
        cfg = self.cfg
        B, K, _ = query.shape
        T = enc.shape[1]
        q = jnp.einsum("bkh,ha->bka", query, self.att_q)
        if cfg.att_type == "dot":
            scores = jnp.einsum("bka,bta->bkt", q, enc_proj) / jnp.sqrt(
                jnp.asarray(cfg.att_dim, jnp.float32)
            )
        else:
            e = q[:, :, None, :] + enc_proj[:, None, :, :] + self.att_b
            if cfg.att_type == "loc":
                f = self._loc_feature(att_prev.reshape(B * K, T), loc_band)
                e = e + jnp.dot(
                    f, self.loc_proj, preferred_element_type=jnp.float32
                ).reshape(B, K, T, -1)
            scores = (jnp.tanh(e) @ self.att_v)[..., 0]  # [B,K,T]
        scores = jnp.where(enc_mask[:, None, :] > 0, scores, -1e30)
        att_w = jax.nn.softmax(scores, axis=-1) * enc_mask[:, None, :]
        context = jnp.einsum("bkt,btd->bkd", att_w, enc)
        return context, att_w

    def init_state_beam(self, batch: int, beams: int, enc_frames: int):
        cfg = self.cfg
        H, enc_dim = cfg.dec_hidden, 2 * cfg.enc_hidden
        z = lambda *s: jnp.zeros(s, jnp.float32)
        return {
            "h": z(cfg.dec_layers, batch * beams, H),
            "c": z(cfg.dec_layers, batch * beams, H),
            "att_w": z(batch, beams, enc_frames),
            "context": z(batch * beams, enc_dim),
        }

    def step_beam(self, state, token, enc, enc_proj, enc_mask, beams: int,
                  loc_band=None):
        """One decode step over [B*K] flattened beams with shared encoder
        tensors. token [B*K] -> (new_state, logits [B*K, V])."""
        cfg = self.cfg
        B = enc.shape[0]
        emb = self.embed[token]
        x = jnp.concatenate([emb, state["context"]], axis=-1)
        hs, cs = [], []
        for l in range(cfg.dec_layers):
            xg = jnp.dot(x, self.w_x[l],
                         preferred_element_type=jnp.float32) + self.b_x[l]
            h_new, c_new = lstm_cell_step(
                state["h"][l], state["c"][l], xg, self.w_h[l]
            )
            hs.append(h_new)
            cs.append(c_new)
            x = h_new
        query = hs[-1].reshape(B, beams, -1)
        context, att_w = self._attend_beam(
            query, enc, enc_proj, enc_mask, state["att_w"], loc_band
        )
        context_flat = context.reshape(B * beams, -1)
        logits = (
            jnp.dot(
                jnp.concatenate([hs[-1], context_flat], axis=-1),
                self.w_out,
                preferred_element_type=jnp.float32,
            )
            + self.b_out
        )
        new_state = {
            "h": jnp.stack(hs),
            "c": jnp.stack(cs),
            "att_w": att_w,
            "context": context_flat,
        }
        return new_state, logits

    # ------------------------------------------------------------------
    # Fused Pallas decoder path (ops/pallas_decoder.py)
    # ------------------------------------------------------------------
    def _use_fused(self, B: int, T: int) -> bool:
        cfg = self.cfg
        if cfg.dec_impl != "pallas":
            return False
        if cfg.dec_layers != 1 or cfg.att_type not in ("add", "loc", "dot"):
            return False
        from gluon_e2e_asr_tpu.ops.pallas_decoder import fused_supported

        is_loc = cfg.att_type == "loc"
        return fused_supported(
            B, T, 2 * cfg.enc_hidden, cfg.att_dim, cfg.dec_embed,
            cfg.dec_hidden, self.vocab_size,
            cfg.loc_conv_channels if is_loc else 1,
            cfg.compute_dtype, is_loc,
        )

    def _fused_call(self, enc, enc_proj, enc_mask, tokens_in, coins):
        """Teacher-forced pass through the fused kernel. ``coins`` [L,B]
        bool; step 0 is forced to the gold sos outside the kernel."""
        from gluon_e2e_asr_tpu.ops.pallas_decoder import (
            DEFAULT_L_CHUNK, build_loc_band_cmajor, las_decoder_fused)

        cfg = self.cfg
        T = enc.shape[1]
        is_loc = cfg.att_type == "loc"
        has_av = cfg.att_type in ("add", "loc")
        coins_bl = jnp.swapaxes(coins, 0, 1).astype(jnp.float32)
        coins_bl = coins_bl.at[:, 0].set(0.0)
        band2 = (build_loc_band_cmajor(self.loc_filter, T)
                 if is_loc else jnp.zeros((1, 1), jnp.float32))
        loc_proj = (self.loc_proj if is_loc
                    else jnp.zeros((1, cfg.att_dim), jnp.float32))
        # dot attention has no energy bias/vector params; pass inert
        # zeros (constants, so their cotangents are dropped).
        att_b = (self.att_b if has_av
                 else jnp.zeros((cfg.att_dim,), jnp.float32))
        att_v = (self.att_v if has_av
                 else jnp.zeros((cfg.att_dim, 1), jnp.float32))
        return las_decoder_fused(
            (cfg.compute_dtype, DEFAULT_L_CHUNK, cfg.att_type),
            tokens_in, coins_bl, enc, enc_proj, enc_mask, band2,
            self.embed, self.w_x[0], self.b_x[0], self.w_h[0],
            self.att_q, att_b, att_v, loc_proj,
            self.w_out, self.b_out,
        )

    # ------------------------------------------------------------------
    # Teacher-forced training pass (lax.scan) with scheduled sampling
    # ------------------------------------------------------------------
    def __call__(
        self,
        enc: jnp.ndarray,  # [B,T,enc_dim]
        enc_len: jnp.ndarray,  # [B]
        tokens_in: jnp.ndarray,  # [B,L] gold inputs, tokens_in[:,0] == sos
        ss_prob: float = 0.0,
        ss_rng=None,
    ) -> jnp.ndarray:
        """Returns logits [B, L, V] predicting tokens_in shifted by one."""
        B, T = enc.shape[0], enc.shape[1]
        L = tokens_in.shape[1]
        enc_mask = (jnp.arange(T)[None, :] < enc_len[:, None]).astype(jnp.float32)
        enc_proj = self.precompute(enc)

        # ss_prob may be a traced scalar (the per-step sampling-ratio ramp,
        # SURVEY.md §2.1 #12); gate the branch statically: compiled out only
        # when ss_prob is a Python number <= 0 or no key was given.
        static_off = isinstance(ss_prob, (int, float)) and ss_prob <= 0.0
        use_ss = ss_rng is not None and not static_off
        if use_ss:
            coins = jax.random.bernoulli(ss_rng, ss_prob, (L, B))
        else:
            coins = jnp.zeros((L, B), bool)

        if self._use_fused(B, T):
            return self._fused_call(enc, enc_proj, enc_mask, tokens_in,
                                    coins)

        # Built once, closure-captured: scan treats it as loop-invariant.
        loc_band = (self.build_loc_band(T)
                    if self.cfg.att_type == "loc" else None)
        state0 = self.init_state(B, T)

        def scan_step(carry, inp):
            state, prev_pred = carry
            gold_tok, coin = inp
            tok = jnp.where(coin, prev_pred, gold_tok)
            state, logits = self.step(state, tok, enc, enc_proj, enc_mask,
                                      loc_band)
            pred = jnp.argmax(logits, axis=-1).astype(tokens_in.dtype)
            return (state, pred), logits

        # Step 0 always consumes sos (coins[0] forced False).
        coins = coins.at[0].set(False)
        init = (state0, tokens_in[:, 0])
        _, logits = jax.lax.scan(
            scan_step, init, (tokens_in.T, coins)
        )  # [L, B, V]
        return jnp.swapaxes(logits, 0, 1)
