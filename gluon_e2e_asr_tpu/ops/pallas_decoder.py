"""Fused Pallas LAS-decoder kernel: the whole per-step decode stack in
one kernel iteration.

Reference-side counterpart: the per-step Python decoder loop over MXNet
C++ ops [SURVEY.md §2.1 #10, §3.2]. The `lax.scan` path
(models/decoder.py) is the always-correct baseline; it is *latency*
bound on TPU — ~20 small XLA ops per decode step at ~1% MXU utilization
(docs/ROADMAP.md #1). This kernel collapses each step into one fused
program with everything resident in VMEM across all L steps:

  * weights (embed, LSTM cell, attention projections, output head) and
    the per-utterance encoder tensors (enc, enc_proj, location band)
    are DMA'd once per batch block and stay in VMEM;
  * the decode loop runs as a `fori_loop` inside the kernel — token
    embedding is a one-hot matmul (MXU-friendly, V is tiny), the
    location-aware conv is the banded matmul of
    models/decoder.py::build_loc_band (transposed to channel-major so
    per-channel slices stay lane-contiguous), and the per-step state
    (h, c, attention weights, context) lives in VMEM scratch;
  * the grid is (batch-blocks, L-chunks); the L-chunk axis streams the
    token/coin inputs in and the logits + backward residuals out while
    state persists in scratch (the TPU grid is sequential);
  * the additive-attention energy tensor is built in T-chunks so its
    f32 temporaries stay ~1 MB instead of [Bb, T, A];
  * scheduled sampling [SURVEY.md §2.1 #12] happens in-kernel: the
    argmax of the previous step's logits is fed back when that step's
    pre-drawn Bernoulli coin (computed outside with the step PRNG key)
    says so — greedy attention decoding is the coins==1 special case.

Precision contract: all matmuls run at ``compute_dtype`` with f32
accumulation; state, softmax, and gate math are f32. Unlike the scan
path (which only downcasts the encoder-side projections), compute_dtype
here governs *every* decoder matmul, so logits differ from the scan
path at the compute dtype's matmul precision (~1e-3 relative at
flagship shapes on the MXU; bit-exact in interpret mode).

Supports ``dec_layers == 1`` and att_type in {"add", "loc", "dot"} (the
flagship + milestone configs); other shapes fall back to the scan path
at the caller. For "dot" the additive-energy loop is replaced by a
single scaled batched matvec per step (and its transpose + outer
product in the backward) — no [Bb,T,A] tanh at all.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Decode-step chunk per grid iteration (streams tokens in / logits +
# residuals out while state persists in scratch). Env-overridable for
# tuning sweeps.
DEFAULT_L_CHUNK = int(os.environ.get("GLUON_DEC_L_CHUNK", "8"))
_T_CHUNK = 64  # T is padded to a multiple of this; e-temps are [Bb,Tc,A]
# This chip compiles and runs kernels well past the default ~16 MB scoped
# VMEM (measured: 96 MB scratch OK with an explicit 128 MB limit — v5e's
# physical VMEM is large). Budget conservatively below the limit so
# Mosaic keeps room for double-buffered streams and temporaries.
_VMEM_LIMIT = 128 * 1024 * 1024
_VMEM_BUDGET = int(120e6)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# Shared with the encoder kernel: (i,f,g,o) -> (i,f,o,g) gate column
# permutation (an involution) so the three sigmoid gates evaluate as one
# wide VPU op, with the forget bias baked into the bias operand.
from gluon_e2e_asr_tpu.ops.pallas_lstm import _perm_ifog  # noqa: E402


def _forget_bias4(H):
    """+1.0 on the f segment of an (i,f,o,g) [4H] bias."""
    return jnp.zeros((4 * H,), jnp.float32).at[H:2 * H].set(1.0)


def build_loc_band_cmajor(loc_filter: jnp.ndarray, T: int) -> jnp.ndarray:
    """Banded location-conv matrix in channel-major flat layout [T, C*T]:
    band[s, c*T + t] = filter[s - t + (w-1)//2, 0, c]. Same math as
    models/decoder.py::build_loc_band (which is (t,c)-minor); c-major
    keeps each channel's T values lane-contiguous so the kernel can
    re-slab the matmul result into a [Bb, C, T] scratch with C cheap
    static-slice copies (Mosaic cannot lane-split reshape directly).
    """
    w, _, C = loc_filter.shape
    pad_left = (w - 1) // 2
    s_idx = jnp.arange(T)[:, None]
    t_idx = jnp.arange(T)[None, :]
    k = s_idx - t_idx + pad_left  # [T,T]
    valid = (k >= 0) & (k < w)
    gathered = loc_filter[jnp.clip(k, 0, w - 1), 0, :]  # [T,T,C]
    band = jnp.where(valid[..., None], gathered, 0.0)
    return jnp.transpose(band, (0, 2, 1)).reshape(T, C * T)


def _estimate_vmem(Bb: int, T: int, D: int, A: int, E: int, H: int, V: int,
                   C: int, Lc: int, cd_bytes: int, is_loc: bool) -> int:
    fixed = 2 * cd_bytes * (  # x2: Pallas double-buffers blocks
        (T * C * T if is_loc else 0)  # band
        + V * E + (E + D) * 4 * H + H * 4 * H + H * A + C * A
        + (H + D) * V + 4 * H + A + A + V
    )
    per_b = (
        # enc/enc_proj residents are b-indexed blocks: Pallas allocates
        # 2 buffering levels for any block whose index map varies.
        2 * cd_bytes * Bb * T * (D + A)
        + 4 * Bb * T  # mask
        + 2 * 4 * Bb * _T_CHUNK * A  # chunked f32 e-temps
        # backward adds a [Bb,T,A] f32 d_enc_proj out block (2 levels)
        # and a same-size accumulator scratch
        + 3 * 4 * Bb * T * A
        + 4 * Bb * (2 * C * T + 2 * T + D + 2 * H + 16)  # slabs + scratch
        # double-buffered streamed blocks (cotangents + residuals, f32;
        # the backward streams ~2x the forward's set incl. d_f)
        + 4 * 4 * Bb * Lc * (V + 3 * H + 2 * T + 2 * D + C * T // Lc + 8)
    )
    # register-allocator spill slots observed ~21 MB for the big
    # backward body, plus Mosaic temporaries.
    slack = int(24e6)
    return fixed + per_b + slack


def pick_block_batch(B: int, T: int, D: int, A: int, E: int, H: int, V: int,
                     C: int, Lc: int, cd_bytes: int,
                     is_loc: bool) -> Optional[int]:
    """Largest Mosaic-legal batch block fitting the VMEM budget, or None
    (caller falls back to the scan path). Legal blocks: multiples of 8
    dividing B, or B itself (a full-dim block)."""
    cands = [b for b in range(B, 0, -1)
             if B % b == 0 and (b % 8 == 0 or b == B)]
    for Bb in cands:
        if _estimate_vmem(Bb, T, D, A, E, H, V, C, Lc, cd_bytes,
                          is_loc) <= _VMEM_BUDGET:
            return Bb
    return None


def fused_supported(B: int, T: int, D: int, A: int, E: int, H: int, V: int,
                    C: int, compute_dtype, is_loc: bool,
                    l_chunk: int = DEFAULT_L_CHUNK) -> bool:
    """True if the fused decoder kernel handles this shape (Mosaic-legal
    batch block within the VMEM budget)."""
    TP = T + ((-T) % _T_CHUNK)
    cd = jnp.dtype(compute_dtype)
    return pick_block_batch(B, TP, D, A, E, H, V, C, l_chunk, cd.itemsize,
                            is_loc) is not None


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    # streamed inputs [Bb, Lc, 1]
    tokens_ref, coins_ref,
    # per-batch-block residents
    enc_ref, encp_ref, mask_ref,
    # loc band (full, present iff att_type == "loc"), then weights, then
    # outputs and scratch
    *refs,
    Lc: int, V: int, C: int, is_loc: bool, is_dot: bool, save_resid: bool,
    compute_dtype,
):
    if is_loc:
        band_ref = refs[0]
        refs = refs[1:]
    (embed_ref, wx_ref, bx_ref, wh_ref, attq_ref, attb_ref, attv_ref,
     locp_ref, wout_ref, bout_ref) = refs[:10]
    outs = refs[10:]
    if save_resid:
        (logits_ref, h_seq_ref, c_seq_ref, att_seq_ref, ctx_seq_ref,
         tok_seq_ref) = outs[:6]
        scr = outs[6:]
    else:
        logits_ref = outs[0]
        scr = outs[1:]
    if is_loc:
        h_scr, c_scr, att_scr, ctx_scr, pred_scr, sc_scr, f_scr = scr
    else:
        h_scr, c_scr, att_scr, ctx_scr, pred_scr, sc_scr = scr

    cd = compute_dtype
    Bb, T = mask_ref.shape
    H = h_scr.shape[-1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)
        att_scr[...] = jnp.zeros_like(att_scr)
        ctx_scr[...] = jnp.zeros_like(ctx_scr)
        pred_scr[...] = jnp.zeros_like(pred_scr)

    mask = mask_ref[...]  # [Bb, T] f32
    neg = jnp.float32(-1e30)
    n_tc = T // _T_CHUNK

    def body(i, _):
        gold = tokens_ref[:, pl.ds(i, 1), 0]  # [Bb,1] int32
        coin = coins_ref[:, pl.ds(i, 1), 0]  # [Bb,1] f32
        tok = jnp.where(coin > 0.5, pred_scr[...], gold)  # [Bb,1]
        # One-hot embedding lookup as an MXU matmul (V is tiny).
        vids = jax.lax.broadcasted_iota(jnp.int32, (Bb, V), 1)
        oh = (vids == tok).astype(cd)  # [Bb,V]
        emb = jnp.dot(oh, embed_ref[...].astype(cd),
                      preferred_element_type=jnp.float32)  # [Bb,E]
        x = jnp.concatenate([emb, ctx_scr[...]], axis=-1)  # [Bb,E+D] f32
        gates = (
            jnp.dot(x.astype(cd), wx_ref[...].astype(cd),
                    preferred_element_type=jnp.float32)
            + bx_ref[...]
            + jnp.dot(h_scr[...].astype(cd), wh_ref[...].astype(cd),
                      preferred_element_type=jnp.float32)
        )  # [Bb,4H] f32
        # Gate layout (i,f,o,g), forget bias baked into bx (see
        # _perm_ifog in pallas_lstm.py): the three sigmoids run as ONE
        # wide VPU op.
        s3 = jax.nn.sigmoid(gates[:, :3 * H])
        gg = jnp.tanh(gates[:, 3 * H:])
        c_new = s3[:, H:2 * H] * c_scr[...] + s3[:, :H] * gg
        h_new = s3[:, 2 * H:3 * H] * jnp.tanh(c_new)  # [Bb,H] f32
        h_scr[...] = h_new
        c_scr[...] = c_new

        qb = (
            jnp.dot(h_new.astype(cd), attq_ref[...].astype(cd),
                    preferred_element_type=jnp.float32)
            + attb_ref[...]
        )  # [Bb,A]
        if is_loc:
            f_ct = jnp.dot(att_scr[...].astype(cd), band_ref[...].astype(cd),
                           preferred_element_type=jnp.float32)  # [Bb,C*T]
            # Re-slab to [Bb,C,T] (Mosaic cannot lane-split reshape).
            for ch in range(C):
                f_scr[:, ch, :] = f_ct[:, ch * T:(ch + 1) * T]
        if is_dot:
            # Scaled dot scores as a VPU multiply-reduce (an M=1 batched
            # matvec lowers to one MXU pass per batch row — slower) —
            # replaces the whole additive-energy loop (no [Bb,T,A] tanh).
            A = qb.shape[-1]
            sc_scr[...] = jnp.sum(
                encp_ref[...].astype(jnp.float32) * qb[:, None, :],
                axis=-1,
            ) * (1.0 / float(np.sqrt(A)))
        else:
            v_row = attv_ref[...]  # [1,A] (pre-reshaped outside)
            # Energy + tanh + reduce over A, in T-chunks (bounds the
            # f32 temp).
            for tc in range(n_tc):
                t0 = tc * _T_CHUNK
                e = (encp_ref[:, t0:t0 + _T_CHUNK, :].astype(jnp.float32)
                     + qb[:, None, :])  # [Bb,Tc,A]
                if is_loc:
                    # Location feature -> attention space as one MXU
                    # matmul: [Bb,C,Tc] x [C,A], contracting C.
                    e += jax.lax.dot_general(
                        f_scr[:, :, t0:t0 + _T_CHUNK].astype(cd),
                        locp_ref[...].astype(cd),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                sc_scr[:, t0:t0 + _T_CHUNK] = jnp.sum(
                    jnp.tanh(e) * v_row[None], axis=-1)
        scores = jnp.where(mask > 0, sc_scr[...], neg)  # [Bb,T]
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        att_w = p / jnp.sum(p, axis=-1, keepdims=True) * mask  # [Bb,T]
        att_scr[...] = att_w

        # Batched matvec as [Bb,1,T]@[Bb,T,D] (Mosaic requires a
        # non-contracting lhs dim).
        ctx = jax.lax.dot_general(
            att_w[:, None, :].astype(cd), enc_ref[...].astype(cd),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]  # [Bb,D]
        ctx_scr[...] = ctx

        logits = (
            jnp.dot(jnp.concatenate([h_new, ctx], axis=-1).astype(cd),
                    wout_ref[...].astype(cd),
                    preferred_element_type=jnp.float32)
            + bout_ref[...]
        )  # [Bb,V]
        logits_ref[:, pl.ds(i, 1), :] = logits[:, None, :]
        pred_scr[...] = jnp.argmax(logits, axis=-1,
                                   keepdims=True).astype(jnp.int32)
        if save_resid:
            h_seq_ref[:, pl.ds(i, 1), :] = h_new[:, None, :]
            c_seq_ref[:, pl.ds(i, 1), :] = c_new[:, None, :]
            att_seq_ref[:, pl.ds(i, 1), :] = att_w[:, None, :]
            ctx_seq_ref[:, pl.ds(i, 1), :] = ctx[:, None, :]
            tok_seq_ref[:, pl.ds(i, 1), 0] = tok
        return 0

    jax.lax.fori_loop(0, Lc, body, 0)


def _pad_axis(x, mult, axis):
    n = x.shape[axis]
    pad = (-n) % mult
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def las_decoder_fwd(
    tokens: jnp.ndarray,  # [B, L] int32 (gold inputs; [:,0] is sos)
    coins: jnp.ndarray,  # [B, L] f32 (1.0 = feed own argmax)
    enc: jnp.ndarray,  # [B, T, D]
    enc_proj: jnp.ndarray,  # [B, T, A]
    enc_mask: jnp.ndarray,  # [B, T] f32
    band2,  # [T, C*T] c-major loc band, or None for att_type="add"
    embed, w_x, b_x, w_h, att_q, att_b, att_v, loc_proj, w_out, b_out,
    *,
    compute_dtype=jnp.bfloat16,
    l_chunk: int = DEFAULT_L_CHUNK,
    save_resid: bool = True,
    block_batch=None,
    interpret=None,
    is_dot: bool = False,
):
    """Run the fused decoder over all L steps. Returns
    (logits [B,L,V], residuals) — residuals is None if save_resid=False,
    else (h_seq, c_seq, att_seq, ctx_seq, tok_seq) each [B,L,...]."""
    B, L = tokens.shape
    T, D = enc.shape[1], enc.shape[2]
    A = enc_proj.shape[2]
    V, E = embed.shape
    H = w_h.shape[0]
    is_loc = band2 is not None
    C = loc_proj.shape[0] if is_loc else 1
    cd = jnp.dtype(compute_dtype)
    Lc = min(l_chunk, L)
    LP = L + ((-L) % Lc)
    TP = T + ((-T) % _T_CHUNK)

    if block_batch is None:
        block_batch = pick_block_batch(B, TP, D, A, E, H, V, C, Lc,
                                       cd.itemsize, is_loc)
    assert block_batch is not None, "decoder kernel over VMEM budget"
    Bb = block_batch
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tokens3 = _pad_axis(tokens, Lc, 1)[..., None]
    coins3 = _pad_axis(coins, Lc, 1)[..., None]
    enc_p = _pad_axis(enc, _T_CHUNK, 1).astype(cd)
    encp_p = _pad_axis(enc_proj, _T_CHUNK, 1).astype(cd)
    mask_p = _pad_axis(enc_mask.astype(jnp.float32), _T_CHUNK, 1)
    if is_loc:
        if TP != T:
            # band2 is [T, C*T]; pad both time axes to TP (XLA-side
            # reshape, legal outside the kernel).
            band3 = band2.reshape(T, C, T)
            band3 = _pad_axis(_pad_axis(band3, _T_CHUNK, 0), _T_CHUNK, 2)
            band_p = band3.reshape(TP, C * TP).astype(cd)
        else:
            band_p = band2.astype(cd)

    grid = (B // Bb, LP // Lc)
    in_specs = [
        pl.BlockSpec((Bb, Lc, 1), lambda b, l: (b, l, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bb, Lc, 1), lambda b, l: (b, l, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bb, TP, D), lambda b, l: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bb, TP, A), lambda b, l: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bb, TP), lambda b, l: (b, 0), memory_space=pltpu.VMEM),
    ]
    operands = [tokens3, coins3, enc_p, encp_p, mask_p]
    if is_loc:
        in_specs.append(
            pl.BlockSpec((TP, C * TP), lambda b, l: (0, 0),
                         memory_space=pltpu.VMEM))
        operands.append(band_p)
    const = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda b, l: (0,) * arr.ndim, memory_space=pltpu.VMEM)
    weights = [
        embed.astype(cd),
        _perm_ifog(w_x, H).astype(cd),
        (_perm_ifog(b_x, H) + _forget_bias4(H)).reshape(
            1, -1).astype(jnp.float32),
        _perm_ifog(w_h, H).astype(cd),
        att_q.astype(cd),
        att_b.reshape(1, -1).astype(jnp.float32),
        att_v.reshape(1, -1).astype(jnp.float32),
        (loc_proj if is_loc else jnp.zeros((1, A))).astype(jnp.float32),
        w_out.astype(cd),
        b_out.reshape(1, -1).astype(jnp.float32),
    ]
    in_specs += [const(w) for w in weights]
    operands += weights

    out_specs = [
        pl.BlockSpec((Bb, Lc, V), lambda b, l: (b, l, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((B, LP, V), jnp.float32)]
    if save_resid:
        for last in (H, H, TP, D):
            out_specs.append(
                pl.BlockSpec((Bb, Lc, last), lambda b, l: (b, l, 0),
                             memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((B, LP, last), jnp.float32))
        out_specs.append(
            pl.BlockSpec((Bb, Lc, 1), lambda b, l: (b, l, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, LP, 1), jnp.int32))

    scratch = [
        pltpu.VMEM((Bb, H), jnp.float32),
        pltpu.VMEM((Bb, H), jnp.float32),
        pltpu.VMEM((Bb, TP), jnp.float32),
        pltpu.VMEM((Bb, D), jnp.float32),
        pltpu.VMEM((Bb, 1), jnp.int32),
        pltpu.VMEM((Bb, TP), jnp.float32),  # scores assembly
    ]
    if is_loc:
        scratch.append(pltpu.VMEM((Bb, C, TP), jnp.float32))  # loc feature

    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, Lc=Lc, V=V, C=C, is_loc=is_loc, is_dot=is_dot,
            save_resid=save_resid, compute_dtype=cd,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)

    logits = outs[0][:, :L]
    if not save_resid:
        return logits, None
    h_seq, c_seq = outs[1][:, :L], outs[2][:, :L]
    att_seq, ctx_seq = outs[3][:, :L, :T], outs[4][:, :L]
    tok_seq = outs[5][:, :L, 0]
    return logits, (h_seq, c_seq, att_seq, ctx_seq, tok_seq)


# ---------------------------------------------------------------------------
# Backward kernel: reverse sweep over decode steps
# ---------------------------------------------------------------------------


def _bwd_kernel(
    # streamed residuals / cotangents [Bb, Lc, *] (reverse chunk order)
    dlog_ref, h_ref, hp_ref, c_ref, cp_ref, att_ref, attp_ref, ctxp_ref,
    tok_ref,
    # residents
    enc_ref, encp_ref, mask_ref,
    *refs,
    Lc: int, V: int, C: int, is_loc: bool, is_dot: bool, compute_dtype,
):
    if is_loc:
        band_ref = refs[0]
        refs = refs[1:]
    (embed_ref, wx_ref, bx_ref, wh_ref, attq_ref, attb_ref, attv_ref,
     locp_ref, locpt_ref, wout_ref) = refs[:10]
    refs = refs[10:]
    if is_loc:
        (dgates_ref, dctx_ref, dqb_ref, demb_ref, dfct_ref,
         dencp_ref, dv_ref, dlocpt_ref) = refs[:8]
        (dh_scr, dc_scr, datt_scr, dctxc_scr, dencp_scr, dv_scr,
         dlocpt_scr, f_scr, dfct_scr) = refs[8:]
    else:
        (dgates_ref, dctx_ref, dqb_ref, demb_ref,
         dencp_ref, dv_ref, dlocpt_ref) = refs[:7]
        (dh_scr, dc_scr, datt_scr, dctxc_scr, dencp_scr, dv_scr,
         dlocpt_scr) = refs[7:]

    cd = compute_dtype
    Bb, T = mask_ref.shape
    H = dh_scr.shape[-1]
    E = demb_ref.shape[-1]
    n_tc = T // _T_CHUNK
    n_l = pl.num_programs(1)

    @pl.when(pl.program_id(1) == 0)
    def _init_batch_block():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)
        datt_scr[...] = jnp.zeros_like(datt_scr)
        dctxc_scr[...] = jnp.zeros_like(dctxc_scr)
        dencp_scr[...] = jnp.zeros_like(dencp_scr)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init_global():
        dv_scr[...] = jnp.zeros_like(dv_scr)
        dlocpt_scr[...] = jnp.zeros_like(dlocpt_scr)

    mask = mask_ref[...]  # [Bb,T] f32

    def body(k, _):
        i = Lc - 1 - k  # reverse order within the chunk
        dlg = dlog_ref[:, pl.ds(i, 1), :][:, 0, :]  # [Bb,V] f32
        h_t = h_ref[:, pl.ds(i, 1), :][:, 0, :]
        h_p = hp_ref[:, pl.ds(i, 1), :][:, 0, :]
        c_t = c_ref[:, pl.ds(i, 1), :][:, 0, :]
        c_p = cp_ref[:, pl.ds(i, 1), :][:, 0, :]
        alpha = att_ref[:, pl.ds(i, 1), :][:, 0, :]  # [Bb,T]
        alpha_p = attp_ref[:, pl.ds(i, 1), :][:, 0, :]
        ctx_p = ctxp_ref[:, pl.ds(i, 1), :][:, 0, :]  # [Bb,D]
        tok = tok_ref[:, pl.ds(i, 1), 0]  # [Bb,1]

        # 1. output head backward: d[h;ctx] = dlogits @ Wo^T
        dhc = jax.lax.dot_general(
            dlg.astype(cd), wout_ref[...].astype(cd),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Bb,H+D]
        dh_total = dh_scr[...] + dhc[:, :H]
        dctx_total = dctxc_scr[...] + dhc[:, H:]
        dctx_ref[:, pl.ds(i, 1), :] = dctx_total[:, None, :]

        # 2. context backward -> attention weights
        datt_ctx = jax.lax.dot_general(
            dctx_total[:, None, :].astype(cd), enc_ref[...].astype(cd),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]  # [Bb,T]
        dalpha = datt_scr[...] + datt_ctx

        # 3. softmax backward (alpha == softmax * mask; masked cols are 0)
        dsm = dalpha * mask
        tot = jnp.sum(dsm * alpha, axis=-1, keepdims=True)
        ds = alpha * (dsm - tot)  # [Bb,T]

        # 4. recompute attention energies; scatter grads
        qb = (
            jnp.dot(h_t.astype(cd), attq_ref[...].astype(cd),
                    preferred_element_type=jnp.float32)
            + attb_ref[...]
        )  # [Bb,A]
        if is_loc:
            f_ct = jnp.dot(alpha_p.astype(cd), band_ref[...].astype(cd),
                           preferred_element_type=jnp.float32)  # [Bb,C*T]
            for ch in range(C):
                f_scr[:, ch, :] = f_ct[:, ch * T:(ch + 1) * T]
        if is_dot:
            A = qb.shape[-1]
            dsn = ds * (1.0 / float(np.sqrt(A)))  # [Bb,T]
            # scores = qb . encp / sqrt(A):
            #   dqb   = sum_t dsn[t] * encp[t]   (VPU multiply-reduce)
            #   dencp += dsn (x) qb              (outer product)
            dqb = jnp.sum(
                encp_ref[...].astype(jnp.float32) * dsn[..., None], axis=1)
            dencp_scr[...] += dsn[..., None] * qb[:, None, :]
        else:
            v_row = attv_ref[...]  # [1,A]
            dqb = jnp.zeros_like(qb)
        # Additive/location energy backward (statically absent for dot).
        for tc in range(0 if is_dot else n_tc):
            t0 = tc * _T_CHUNK
            e = (encp_ref[:, t0:t0 + _T_CHUNK, :].astype(jnp.float32)
                 + qb[:, None, :])
            if is_loc:
                e += jax.lax.dot_general(
                    f_scr[:, :, t0:t0 + _T_CHUNK].astype(cd),
                    locp_ref[...].astype(cd),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            th = jnp.tanh(e)  # [Bb,Tc,A]
            ds_c = ds[:, t0:t0 + _T_CHUNK]
            dv_scr[...] += jnp.sum(th * ds_c[..., None], axis=(0, 1))[None]
            de = (1.0 - th * th) * ds_c[..., None] * v_row[None]  # [Bb,Tc,A]
            dencp_scr[:, t0:t0 + _T_CHUNK, :] += de
            dqb += jnp.sum(de, axis=1)
            if is_loc:
                # dlocp^T[a,c] += sum_b de[b,:,a]^T @ f3[b,c,:]^T
                dlocpt_scr[...] += jnp.sum(jax.lax.dot_general(
                    de.astype(cd), f_scr[:, :, t0:t0 + _T_CHUNK].astype(cd),
                    dimension_numbers=(((1,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ), axis=0)  # [A,C]
                # d(location feature): de @ locp^T -> [Bb,Tc,C]
                dft = jax.lax.dot_general(
                    de.astype(cd), locpt_ref[...].astype(cd),
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [Bb,Tc,C]
                dfct_scr[:, :, t0:t0 + _T_CHUNK] = jnp.swapaxes(dft, 1, 2)
        dqb_ref[:, pl.ds(i, 1), :] = dqb[:, None, :]
        if is_loc:
            # flatten slab -> c-major flat, stream out, and push the loc
            # cotangent onto the previous step's attention weights
            dfct_flat = _flat_slab(dfct_scr, Bb, C, T)  # [Bb,C*T]
            dfct_ref[:, pl.ds(i, 1), :] = dfct_flat[:, None, :]
            datt_scr[...] = jax.lax.dot_general(
                dfct_flat.astype(cd), band_ref[...].astype(cd),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Bb,T(s)]
        else:
            datt_scr[...] = jnp.zeros_like(datt_scr)

        # 5. attention query backward into h
        dh_total = dh_total + jax.lax.dot_general(
            dqb.astype(cd), attq_ref[...].astype(cd),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Bb,H]

        # 6. LSTM cell backward (recompute gates from residuals)
        vids = jax.lax.broadcasted_iota(jnp.int32, (Bb, V), 1)
        oh = (vids == tok).astype(cd)
        emb = jnp.dot(oh, embed_ref[...].astype(cd),
                      preferred_element_type=jnp.float32)  # [Bb,E]
        x = jnp.concatenate([emb, ctx_p], axis=-1)
        gates = (
            jnp.dot(x.astype(cd), wx_ref[...].astype(cd),
                    preferred_element_type=jnp.float32)
            + bx_ref[...]
            + jnp.dot(h_p.astype(cd), wh_ref[...].astype(cd),
                      preferred_element_type=jnp.float32)
        )
        # (i,f,o,g) layout, forget bias baked into bx; one wide sigmoid.
        s3 = jax.nn.sigmoid(gates[:, :3 * H])
        gi, gf, go = s3[:, :H], s3[:, H:2 * H], s3[:, 2 * H:]
        gc = jnp.tanh(gates[:, 3 * H:])
        tanh_c = jnp.tanh(c_t)
        do = dh_total * tanh_c
        dc_total = dh_total * go * (1.0 - tanh_c * tanh_c) + dc_scr[...]
        dgates = jnp.concatenate(
            [
                dc_total * gc * gi * (1.0 - gi),
                dc_total * c_p * gf * (1.0 - gf),
                do * go * (1.0 - go),
                dc_total * gi * (1.0 - gc * gc),
            ],
            axis=-1,
        )  # [Bb,4H] in (i,f,o,g)
        dgates_ref[:, pl.ds(i, 1), :] = dgates[:, None, :]
        dh_scr[...] = jax.lax.dot_general(
            dgates.astype(cd), wh_ref[...].astype(cd),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dc_scr[...] = dc_total * gf
        dx = jax.lax.dot_general(
            dgates.astype(cd), wx_ref[...].astype(cd),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Bb,E+D]
        demb_ref[:, pl.ds(i, 1), :] = dx[:, :E][:, None, :]
        dctxc_scr[...] = dx[:, E:]
        return 0

    jax.lax.fori_loop(0, Lc, body, 0)

    @pl.when(pl.program_id(1) == n_l - 1)
    def _flush_batch_block():
        dencp_ref[...] = dencp_scr[...]

    @pl.when((pl.program_id(0) == pl.num_programs(0) - 1)
             & (pl.program_id(1) == n_l - 1))
    def _flush_global():
        dv_ref[...] = dv_scr[...]
        dlocpt_ref[...] = dlocpt_scr[...]


def _flat_slab(slab_ref, Bb, C, T):
    """Read a [Bb, C, T] scratch as a flat c-major [Bb, C*T] vector via C
    static slice reads (Mosaic cannot lane-merge reshape)."""
    return jnp.concatenate([slab_ref[:, ch, :] for ch in range(C)], axis=-1)


def _shift_right(x):
    """x[:, t] -> x[:, t-1] with zeros at t=0 (previous-step residuals)."""
    zrow = jnp.zeros_like(x[:, :1])
    return jnp.concatenate([zrow, x[:, :-1]], axis=1)


def las_decoder_bwd(
    dlogits,  # [B, L, V] f32 cotangent
    resid,  # (h_seq, c_seq, att_seq, ctx_seq, tok_seq) from the fwd kernel
    enc, enc_proj, enc_mask, band2,
    embed, w_x, b_x, w_h, att_q, att_b, att_v, loc_proj, w_out,
    *,
    compute_dtype=jnp.bfloat16,
    l_chunk: int = DEFAULT_L_CHUNK,
    block_batch=None,
    interpret=None,
    is_dot: bool = False,
):
    """Reverse sweep. Returns a dict of cotangents; big weight grads are
    single XLA einsums over the streamed per-step grads (one large MXU op
    each), the sequential chain runs in the Pallas kernel."""
    h_seq, c_seq, att_seq, ctx_seq, tok_seq = resid
    B, L, V = dlogits.shape
    T, D = enc.shape[1], enc.shape[2]
    A = enc_proj.shape[2]
    E = embed.shape[1]
    H = w_h.shape[0]
    is_loc = band2 is not None
    C = loc_proj.shape[0] if is_loc else 1
    cd = jnp.dtype(compute_dtype)
    Lc = min(l_chunk, L)
    LP = L + ((-L) % Lc)
    TP = T + ((-T) % _T_CHUNK)
    if block_batch is None:
        block_batch = pick_block_batch(B, TP, D, A, E, H, V, C, Lc,
                                       cd.itemsize, is_loc)
    assert block_batch is not None, "decoder bwd kernel over VMEM budget"
    Bb = block_batch
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Shifted previous-step residuals, then L/T padding.
    h_prev = _shift_right(h_seq)
    c_prev = _shift_right(c_seq)
    att_prev = _shift_right(att_seq)
    ctx_prev = _shift_right(ctx_seq)

    padL = lambda x: _pad_axis(x, Lc, 1)  # noqa: E731
    dlog_p = padL(dlogits.astype(jnp.float32))
    h_p, hp_p = padL(h_seq), padL(h_prev)
    c_p, cp_p = padL(c_seq), padL(c_prev)
    att_p = _pad_axis(padL(att_seq), _T_CHUNK, 2)
    attp_p = _pad_axis(padL(att_prev), _T_CHUNK, 2)
    ctxp_p = padL(ctx_prev)
    tok_p = padL(tok_seq)[..., None]
    enc_p = _pad_axis(enc, _T_CHUNK, 1).astype(cd)
    encp_p = _pad_axis(enc_proj, _T_CHUNK, 1).astype(cd)
    mask_p = _pad_axis(enc_mask.astype(jnp.float32), _T_CHUNK, 1)
    if is_loc:
        if TP != T:
            band3 = band2.reshape(T, C, T)
            band3 = _pad_axis(_pad_axis(band3, _T_CHUNK, 0), _T_CHUNK, 2)
            band_p = band3.reshape(TP, C * TP).astype(cd)
        else:
            band_p = band2.astype(cd)

    nB, nL = B // Bb, LP // Lc
    rev3 = lambda b, l: (b, nL - 1 - l, 0)  # noqa: E731
    stream = lambda last: pl.BlockSpec((Bb, Lc, last), rev3,  # noqa: E731
                                       memory_space=pltpu.VMEM)
    const = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda b, l: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    in_specs = [
        stream(V), stream(H), stream(H), stream(H), stream(H),
        stream(TP), stream(TP), stream(D), stream(1),
        pl.BlockSpec((Bb, TP, D), lambda b, l: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bb, TP, A), lambda b, l: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bb, TP), lambda b, l: (b, 0), memory_space=pltpu.VMEM),
    ]
    operands = [dlog_p, h_p, hp_p, c_p, cp_p, att_p, attp_p, ctxp_p, tok_p,
                enc_p, encp_p, mask_p]
    if is_loc:
        in_specs.append(pl.BlockSpec((TP, C * TP), lambda b, l: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(band_p)
    locp = (loc_proj if is_loc else jnp.zeros((1, A))).astype(jnp.float32)
    weights = [
        embed.astype(cd),
        _perm_ifog(w_x, H).astype(cd),
        (_perm_ifog(b_x, H) + _forget_bias4(H)).reshape(
            1, -1).astype(jnp.float32),
        _perm_ifog(w_h, H).astype(cd),
        att_q.astype(cd),
        att_b.reshape(1, -1).astype(jnp.float32),
        att_v.reshape(1, -1).astype(jnp.float32),
        locp,
        jnp.swapaxes(locp, 0, 1),  # [A,C]
        w_out.astype(cd),
    ]
    in_specs += [const(w) for w in weights]
    operands += weights

    out_specs = [stream(4 * H), stream(D), stream(A), stream(E)]
    out_shape = [
        jax.ShapeDtypeStruct((B, LP, 4 * H), jnp.float32),
        jax.ShapeDtypeStruct((B, LP, D), jnp.float32),
        jax.ShapeDtypeStruct((B, LP, A), jnp.float32),
        jax.ShapeDtypeStruct((B, LP, E), jnp.float32),
    ]
    if is_loc:
        out_specs.append(stream(C * TP))
        out_shape.append(jax.ShapeDtypeStruct((B, LP, C * TP), jnp.float32))
    out_specs += [
        pl.BlockSpec((Bb, TP, A), lambda b, l: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, A), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((A, C), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape += [
        jax.ShapeDtypeStruct((B, TP, A), jnp.float32),
        jax.ShapeDtypeStruct((1, A), jnp.float32),
        jax.ShapeDtypeStruct((A, C), jnp.float32),
    ]

    scratch = [
        pltpu.VMEM((Bb, H), jnp.float32),  # dh carry
        pltpu.VMEM((Bb, H), jnp.float32),  # dc carry
        pltpu.VMEM((Bb, TP), jnp.float32),  # datt carry
        pltpu.VMEM((Bb, D), jnp.float32),  # dctx carry
        pltpu.VMEM((Bb, TP, A), jnp.float32),  # d_enc_proj accumulator
        pltpu.VMEM((1, A), jnp.float32),  # d_att_v accumulator
        pltpu.VMEM((A, C), jnp.float32),  # d_loc_proj^T accumulator
    ]
    if is_loc:
        scratch += [
            pltpu.VMEM((Bb, C, TP), jnp.float32),  # recomputed loc feature
            pltpu.VMEM((Bb, C, TP), jnp.float32),  # d(loc feature) slab
        ]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, Lc=Lc, V=V, C=C, is_loc=is_loc,
                          is_dot=is_dot,
                          compute_dtype=cd),
        grid=(nB, nL),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)

    # Kernel streams dgates in its internal (i,f,o,g) order; the perm is
    # an involution, so reapplying it restores the caller's (i,f,g,o).
    dgates = _perm_ifog(outs[0][:, :L], H)
    dctx_seq = outs[1][:, :L]
    dqb_seq = outs[2][:, :L]
    demb = outs[3][:, :L]
    k = 4
    if is_loc:
        dfct = outs[4][:, :L]
        k = 5
    d_encp = outs[k][:, :T]
    d_att_v = outs[k + 1].reshape(A, 1)
    d_locp = jnp.swapaxes(outs[k + 2], 0, 1)  # [C,A]

    # --- external weight grads: one big einsum each [SURVEY.md §3.5
    # "decide by benchmark" analogue — these are single MXU ops] ---
    emb_seq = embed[tok_seq]  # [B,L,E]
    x_seq = jnp.concatenate([emb_seq, ctx_prev], axis=-1)
    d_w_x = jnp.einsum("bli,blg->ig", x_seq, dgates)
    d_b_x = dgates.sum(axis=(0, 1))
    d_w_h = jnp.einsum("blh,blg->hg", h_prev, dgates)
    d_w_q = jnp.einsum("blh,bla->ha", h_seq, dqb_seq)
    d_att_b = dqb_seq.sum(axis=(0, 1))
    d_w_out = jnp.einsum(
        "blk,blv->kv",
        jnp.concatenate([h_seq, ctx_seq], axis=-1), dlogits)
    d_b_out = dlogits.sum(axis=(0, 1))
    d_embed = jnp.zeros_like(embed).at[tok_seq.reshape(-1)].add(
        demb.reshape(-1, E))
    d_enc = jnp.einsum("blt,bld->btd", att_seq, dctx_seq)
    d_band = None
    if is_loc:
        d_band = jnp.einsum("bls,blk->sk", attp_p[:, :L, :], dfct)
        if TP != T:
            d_band = d_band[:T].reshape(T, C, TP)[:, :, :T].reshape(T, C * T)
    return dict(
        enc=d_enc, enc_proj=d_encp, band=d_band, embed=d_embed,
        w_x=d_w_x, b_x=d_b_x, w_h=d_w_h, att_q=d_w_q, att_b=d_att_b,
        att_v=d_att_v, loc_proj=d_locp, w_out=d_w_out, b_out=d_b_out,
    )


# ---------------------------------------------------------------------------
# custom_vjp wrapper (the training entry point)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def las_decoder_fused(static, tokens, coins, enc, enc_proj, enc_mask, band2,
                      embed, w_x, b_x, w_h, att_q, att_b, att_v, loc_proj,
                      w_out, b_out):
    """Differentiable fused decoder. ``static`` = (compute_dtype_name,
    l_chunk, att_kind) with att_kind in {"loc","add","dot"}. For
    att_type != "loc" pass a dummy band2/loc_proj; for "dot" also dummy
    att_b/att_v."""
    cd, l_chunk, att_kind = static
    is_loc = att_kind == "loc"
    logits, _ = las_decoder_fwd(
        tokens, coins, enc, enc_proj, enc_mask, band2 if is_loc else None,
        embed, w_x, b_x, w_h, att_q, att_b, att_v, loc_proj, w_out, b_out,
        compute_dtype=cd, l_chunk=l_chunk, save_resid=False,
        is_dot=att_kind == "dot",
    )
    return logits


def _fused_fwd(static, tokens, coins, enc, enc_proj, enc_mask, band2,
               embed, w_x, b_x, w_h, att_q, att_b, att_v, loc_proj,
               w_out, b_out):
    cd, l_chunk, att_kind = static
    is_loc = att_kind == "loc"
    logits, resid = las_decoder_fwd(
        tokens, coins, enc, enc_proj, enc_mask, band2 if is_loc else None,
        embed, w_x, b_x, w_h, att_q, att_b, att_v, loc_proj, w_out, b_out,
        compute_dtype=cd, l_chunk=l_chunk, save_resid=True,
        is_dot=att_kind == "dot",
    )
    saved = (resid, tokens, coins, enc, enc_proj, enc_mask, band2, embed,
             w_x, b_x, w_h, att_q, att_b, att_v, loc_proj, w_out, b_out)
    return logits, saved


def _fused_bwd(static, saved, dlogits):
    cd, l_chunk, att_kind = static
    is_loc = att_kind == "loc"
    (resid, tokens, coins, enc, enc_proj, enc_mask, band2, embed,
     w_x, b_x, w_h, att_q, att_b, att_v, loc_proj, w_out, b_out) = saved
    g = las_decoder_bwd(
        dlogits.astype(jnp.float32), resid, enc, enc_proj, enc_mask,
        band2 if is_loc else None,
        embed, w_x, b_x, w_h, att_q, att_b, att_v, loc_proj, w_out,
        compute_dtype=cd, l_chunk=l_chunk, is_dot=att_kind == "dot",
    )
    ftok = np.zeros((), jax.dtypes.float0)
    d_tokens = np.zeros(tokens.shape, jax.dtypes.float0)
    del ftok
    d_band = g["band"] if is_loc else jnp.zeros_like(band2)
    return (
        d_tokens,
        jnp.zeros_like(coins),
        g["enc"].astype(enc.dtype),
        g["enc_proj"].astype(enc_proj.dtype),
        jnp.zeros_like(enc_mask),
        d_band.astype(band2.dtype),
        g["embed"].astype(embed.dtype),
        g["w_x"].astype(w_x.dtype),
        g["b_x"].astype(b_x.dtype),
        g["w_h"].astype(w_h.dtype),
        g["att_q"].astype(att_q.dtype),
        g["att_b"].astype(att_b.dtype),
        g["att_v"].astype(att_v.dtype),
        g["loc_proj"].astype(loc_proj.dtype),
        g["w_out"].astype(w_out.dtype),
        g["b_out"].astype(b_out.dtype),
    )


las_decoder_fused.defvjp(_fused_fwd, _fused_bwd)
