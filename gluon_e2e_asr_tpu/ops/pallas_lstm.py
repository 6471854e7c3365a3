"""Pallas BiLSTM layer kernel: VMEM-resident recurrent weights.

Reference-side counterpart: MXNet's fused C++/cuDNN RNN operator
[SURVEY.md §2.1 #8, §2.2]. The ``lax.scan`` path (models/lstm.py) is the
always-correct baseline prescribed by [BASELINE.json:L5]; this kernel is
its speed-of-light variant for the hot encoder loop:

  * the recurrent weight stack [2, H, 4H] is DMA'd to VMEM **once** and
    stays resident across every timestep — the scan path re-fetches it
    from HBM each iteration (~1.6 MB x thousands of steps dominates the
    step's HBM traffic);
  * time is the Pallas grid dimension: input-projection chunks
    [TC, 2, B, 4H] and output chunks stream through VMEM with the
    pipeline's built-in double buffering; (h, c) persist across grid
    steps in VMEM scratch (the TPU grid is sequential);
  * both directions ride one kernel as a stacked [2, B, H] state (the
    backward direction consumes pre-flipped inputs, exactly like
    models/lstm.py::bilstm_scan — numerics match that path);
  * training runs a mirrored *backward* kernel (reverse grid order)
    under ``jax.custom_vjp``: gate activations are recomputed from the
    streamed forward outputs (h_{t-1}, c_{t-1}, c_t), dW accumulates in
    a VMEM scratch, and d(input-projections) stream back out.

Precision: gate matmuls run at the layer's compute dtype with f32
accumulation; (h, c) carries are f32.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TIME_CHUNK = 16

# Per-stream VMEM budget for the double-buffered time chunks. The forward
# kernel streams 1 wide array (xs) + 2 narrow outputs; the backward kernel
# streams 6; both also hold w (and dW) resident. This chip runs kernels
# far past the default ~16 MB scoped VMEM (96 MB scratch verified with an
# explicit 128 MB limit — see ops/pallas_decoder.py), so the caps size the
# double-buffered blocks for pipelining, not for a 16 MB ceiling.
_FWD_XS_BLOCK_BYTES = int(11e6)
_BWD_XS_BLOCK_BYTES = int(5.5e6)
_VMEM_LIMIT = 128 * 1024 * 1024


def _auto_chunk(tc: int, B: int, H4: int, budget: int) -> int:
    """Largest chunk <= tc whose [tc, 2, B, 4H] f32 block fits the budget."""
    per_step = 2 * B * H4 * 4
    cap = max(1, budget // per_step)
    return max(1, min(tc, cap))


def _cell_math(xg, h, c, w, compute_dtype):
    """Shared gate math: xg [2,B,4H], h/c [2,B,H], w [2,H,4H]."""
    gates = xg.astype(jnp.float32) + jax.lax.dot_general(
        h.astype(compute_dtype), w.astype(compute_dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    si = jax.nn.sigmoid(i)
    sf = jax.nn.sigmoid(f + 1.0)
    tg = jnp.tanh(g)
    so = jax.nn.sigmoid(o)
    c_new = sf * c + si * tg
    h_new = so * jnp.tanh(c_new)
    return h_new, c_new, (si, sf, tg, so)


def _fwd_kernel(xs_ref, vs_ref, w_ref, ys_ref, cs_ref, h_scr, c_scr, *,
                tc: int, compute_dtype):
    """One grid step = one time chunk. State persists in scratch."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    def body(i, _):
        xg = xs_ref[i].astype(jnp.float32)  # [2,B,4H]
        # Masks travel as float32: Mosaic cannot reshape i1 vectors
        # ("minor dim insertion only for 32-bit types").
        v = vs_ref[i][..., None] > 0.5  # [2,B,1]
        h, c = h_scr[...], c_scr[...]
        h_new, c_new, _ = _cell_math(xg, h, c, w_ref[...], compute_dtype)
        h_scr[...] = jnp.where(v, h_new, h)
        c_scr[...] = jnp.where(v, c_new, c)
        ys_ref[i] = jnp.where(v, h_new, 0.0).astype(ys_ref.dtype)
        cs_ref[i] = jnp.where(v, c_new, 0.0).astype(cs_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tc, body, 0)


def _bwd_kernel(
    xs_ref, vs_ref, hprev_ref, cprev_ref, cs_ref, dys_ref, w_ref,
    dxs_ref, dw_ref, dh_scr, dc_scr, dw_scr, *,
    tc: int, compute_dtype,
):
    """Reverse-time chunk: recompute gates, push grads through the cell."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)
        dw_scr[...] = jnp.zeros_like(dw_scr)

    w = w_ref[...]

    def body(k, _):
        i = tc - 1 - k  # within-chunk reverse order
        xg = xs_ref[i].astype(jnp.float32)
        v = vs_ref[i][..., None] > 0.5  # [2,B,1] (f32 mask; see fwd kernel)
        h_prev = hprev_ref[i].astype(jnp.float32)
        c_prev = cprev_ref[i].astype(jnp.float32)
        c_t = cs_ref[i].astype(jnp.float32)
        dy = dys_ref[i].astype(jnp.float32)

        # Recompute gate activations.
        _, _, (si, sf, tg, so) = _cell_math(xg, h_prev, c_prev, w,
                                            compute_dtype)
        tanh_c = jnp.tanh(c_t)
        dc_carry = dc_scr[...]
        # Masked steps emitted zeros, so their output cotangent must not
        # enter the state gradient; the carries pass through unchanged.
        dh_total = jnp.where(v, dy, 0.0) + dh_scr[...]
        do = dh_total * tanh_c
        dc = dh_total * so * (1.0 - tanh_c * tanh_c) + dc_carry
        di = dc * tg
        dg = dc * si
        df = dc * c_prev
        dgates = jnp.concatenate(
            [
                di * si * (1.0 - si),
                df * sf * (1.0 - sf),
                dg * (1.0 - tg * tg),
                do * so * (1.0 - so),
            ],
            axis=-1,
        )  # [2,B,4H]
        dgates = jnp.where(v, dgates, 0.0)
        # Grad wrt h_{t-1} through the recurrent matmul; pass-through on
        # masked steps (state was frozen there).
        dh_rec = jax.lax.dot_general(
            dgates.astype(compute_dtype),
            w.astype(compute_dtype),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [2,B,H]
        dh_scr[...] = jnp.where(v, dh_rec, dh_total)
        dc_scr[...] = jnp.where(v, dc * sf, dc_carry)
        dw_scr[...] += jax.lax.dot_general(
            h_prev.astype(compute_dtype),
            dgates.astype(compute_dtype),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [2,H,4H]
        dxs_ref[i] = dgates.astype(dxs_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tc, body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _flush():
        dw_ref[...] = dw_scr[...]


def _pad_time(x, tc):
    T = x.shape[0]
    pad = (-T) % tc
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, T + pad


def _prep(xg_f, xg_b, lens):
    """Host-side packing to time-major stacked layout [T,2,B,4H] + masks."""
    B, T, H4 = xg_f.shape
    xs_f = jnp.swapaxes(xg_f, 0, 1)
    xs_b = jnp.flip(jnp.swapaxes(xg_b, 0, 1), axis=0)
    xs = jnp.stack([xs_f, xs_b], axis=1)  # [T,2,B,4H]
    valid = (jnp.arange(T)[None, :] < lens[:, None]).T  # [T,B]
    vs = jnp.stack([valid, jnp.flip(valid, axis=0)], axis=1)  # [T,2,B]
    return xs, vs


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def bilstm_pallas(xg_f, xg_b, lens, w_hf, w_hb, compute_dtype=jnp.float32,
                  time_chunk=DEFAULT_TIME_CHUNK):
    out, _ = _bilstm_fwd_impl(xg_f, xg_b, lens, w_hf, w_hb, compute_dtype,
                              time_chunk)
    return out


def _bilstm_fwd_impl(xg_f, xg_b, lens, w_hf, w_hb, compute_dtype, tc):
    B, T, H4 = xg_f.shape
    H = H4 // 4
    tc = _auto_chunk(tc, B, H4, _FWD_XS_BLOCK_BYTES)
    xs, vs = _prep(xg_f, xg_b, lens)
    xs, TP = _pad_time(xs, tc)
    vs, _ = _pad_time(vs, tc)
    w = jnp.stack([w_hf, w_hb])  # [2,H,4H]
    n_chunks = TP // tc
    interpret = jax.default_backend() != "tpu"

    ys, cs = pl.pallas_call(
        functools.partial(_fwd_kernel, tc=tc, compute_dtype=compute_dtype),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((tc, 2, B, H4), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, 2, B), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w: resident
        ],
        out_specs=[
            pl.BlockSpec((tc, 2, B, H), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, 2, B, H), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((TP, 2, B, H), xg_f.dtype),
            jax.ShapeDtypeStruct((TP, 2, B, H), xg_f.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.VMEM((2, B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xs, vs.astype(jnp.float32), w)
    ys = ys[:T]
    cs = cs[:T]
    fwd = jnp.swapaxes(ys[:, 0], 0, 1)
    bwd = jnp.swapaxes(jnp.flip(ys[:, 1], axis=0), 0, 1)
    out = jnp.concatenate([fwd, bwd], axis=-1)  # [B,T,2H]
    return out, (xs[:T], vs[:T], ys, cs, w)


def _bilstm_vjp_fwd(xg_f, xg_b, lens, w_hf, w_hb, compute_dtype, tc):
    out, res = _bilstm_fwd_impl(xg_f, xg_b, lens, w_hf, w_hb, compute_dtype,
                                tc)
    return out, res


def _bilstm_vjp_bwd(compute_dtype, tc, res, g):
    xs, vs, ys, cs, w = res  # time-major, unpadded
    T, _, B, H = ys.shape
    H4 = 4 * H
    # The backward kernel streams six arrays (vs three in forward); cap its
    # time chunk so double-buffered blocks + resident w/dW fit the ~16 MB
    # scoped VMEM limit.
    tc = _auto_chunk(tc, B, H4, _BWD_XS_BLOCK_BYTES)
    # Incoming cotangent g: [B,T,2H] -> per-direction time-major dys.
    g_f = jnp.swapaxes(g[..., :H], 0, 1)  # [T,B,H]
    g_b = jnp.flip(jnp.swapaxes(g[..., H:], 0, 1), axis=0)
    dys = jnp.stack([g_f, g_b], axis=1)  # [T,2,B,H]
    # Shifted state streams: h_{t-1}, c_{t-1} (zeros at t=0).
    zrow = jnp.zeros((1, 2, B, H), ys.dtype)
    hprev = jnp.concatenate([zrow, ys[:-1]], axis=0)
    cprev = jnp.concatenate([zrow, cs[:-1]], axis=0)

    xs_p, TP = _pad_time(xs, tc)
    vs_p, _ = _pad_time(vs, tc)
    hprev_p, _ = _pad_time(hprev, tc)
    cprev_p, _ = _pad_time(cprev, tc)
    cs_p, _ = _pad_time(cs, tc)
    dys_p, _ = _pad_time(dys, tc)
    n_chunks = TP // tc
    interpret = jax.default_backend() != "tpu"

    rev = lambda c: (n_chunks - 1 - c, 0, 0, 0)
    rev3 = lambda c: (n_chunks - 1 - c, 0, 0)
    bspec4 = lambda last: pl.BlockSpec((tc, 2, B, last), rev,
                                       memory_space=pltpu.VMEM)
    dxs, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, tc=tc, compute_dtype=compute_dtype),
        grid=(n_chunks,),
        in_specs=[
            bspec4(H4),  # xs
            pl.BlockSpec((tc, 2, B), rev3, memory_space=pltpu.VMEM),  # vs
            bspec4(H),  # hprev
            bspec4(H),  # cprev
            bspec4(H),  # cs
            bspec4(H),  # dys
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w
        ],
        out_specs=[
            bspec4(H4),  # dxs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw (written at end)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((TP, 2, B, H4), xs.dtype),
            jax.ShapeDtypeStruct((2, H, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.VMEM((2, H, H4), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xs_p, vs_p.astype(jnp.float32), hprev_p, cprev_p, cs_p, dys_p, w)
    dxs = dxs[:T]  # [T,2,B,4H]
    dxg_f = jnp.swapaxes(dxs[:, 0], 0, 1)  # [B,T,4H]
    dxg_b = jnp.swapaxes(jnp.flip(dxs[:, 1], axis=0), 0, 1)
    dw = dw.astype(res[4].dtype)
    return dxg_f, dxg_b, None, dw[0], dw[1]


bilstm_pallas.defvjp(_bilstm_vjp_fwd, _bilstm_vjp_bwd)


# ---------------------------------------------------------------------------
# v2: input projection fused into the kernel (docs/ROADMAP.md #3)
# ---------------------------------------------------------------------------
#
# The v1 kernel consumes precomputed input projections in a packed
# [T, 2, B, 4H] layout; building that layout (swapaxes/flip/stack) and
# round-tripping it through HBM showed up as ~1.5 ms of slice/bitcast
# fusions per step in the profile. v2 takes the raw layer input
# [B, T, D] directly: each grid step DMAs one natural-layout time chunk
# per direction (the backward direction simply indexes blocks in
# reverse), computes the input projection for the whole chunk as one
# full-width MXU matmul into VMEM scratch, and runs the recurrence off
# that scratch. The backward kernel recomputes the projections the same
# way and accumulates dW_x / dW_h / db as chunk-merged matmuls; dx
# streams out in natural layout (half the bytes of d(projections)).

_V2_VMEM_LIMIT = 128 * 1024 * 1024
# Sequential-loop unroll hook for the v2 kernels (the per-step recurrence
# is latency-bound, and unrolling lets Mosaic software-pipeline the two
# directions' independent matmul/VPU work across iterations). Mosaic's
# fori_loop lowering only supports unroll=1 or a FULL unroll
# (unroll == num_steps), so the hook is boolean: GLUON_LSTM_UNROLL=full
# fully unrolls the tc-step chunk loop. Numerics are unchanged.
def _parse_unroll_env() -> bool:
    v = os.environ.get("GLUON_LSTM_UNROLL", "1").strip()
    if v in ("full", "tc"):
        return True
    if v in ("", "1"):
        return False
    # Legacy numeric values (the old int-valued hook): Mosaic supports
    # only unroll=1 or a full unroll, so map any other request to "full"
    # loudly rather than silently measuring a different configuration.
    import warnings

    warnings.warn(
        f"GLUON_LSTM_UNROLL={v!r}: Mosaic supports only unroll=1 or a "
        "full chunk unroll; treating as 'full'", stacklevel=2)
    return True


_LOOP_UNROLL_FULL = _parse_unroll_env()


def _unroll(tc: int) -> int:
    return tc if _LOOP_UNROLL_FULL else 1


def _perm_ifog(a, H):
    """Reorder gate columns (i,f,g,o) -> (i,f,o,g) on the last axis.

    The kernels below run the three sigmoid gates as ONE wide VPU op
    over the contiguous [i|f|o] block; this permutation (an involution,
    so it also maps the kernel's weight grads back) rearranges the
    parameter layout of models/lstm.py accordingly.
    """
    return jnp.concatenate(
        [a[..., :2 * H], a[..., 3 * H:4 * H], a[..., 2 * H:3 * H]], axis=-1)


def _perm_ifog8(a, H):
    """_perm_ifog applied per direction block of a [..., 8H] array."""
    return jnp.concatenate(
        [_perm_ifog(a[..., :4 * H], H), _perm_ifog(a[..., 4 * H:], H)],
        axis=-1)


def _forget_bias8(H, dtype=jnp.float32):
    """+1.0 on the f segments of an (i,f,o,g)x2 [8H] bias (baked into the
    bias so the kernel's sigmoid needs no separate add)."""
    fb = jnp.zeros((8 * H,), dtype)
    return fb.at[H:2 * H].set(1.0).at[5 * H:6 * H].set(1.0)


def _cell_fwd_dir(xg, h, c, w_h, compute_dtype):
    """Gate layout (i,f,o,g); forget bias pre-baked into xg's bias."""
    gates = xg + jax.lax.dot_general(
        h.astype(compute_dtype), w_h.astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    H = h.shape[-1]
    s = jax.nn.sigmoid(gates[:, :3 * H])  # i,f,o in one wide VPU op
    tg = jnp.tanh(gates[:, 3 * H:])
    si, sf, so = s[:, :H], s[:, H:2 * H], s[:, 2 * H:]
    c_new = sf * c + si * tg
    h_new = so * jnp.tanh(c_new)
    return h_new, c_new


def _v2_fwd_kernel(xf_ref, xb_ref, vf_ref, vb_ref, wx_ref, bx_ref,
                   whf_ref, whb_ref,
                   ysf_ref, ysb_ref, csf_ref, csb_ref,
                   hf_scr, cf_scr, hb_scr, cb_scr, xgf_scr, xgb_scr,
                   ysf_scr, ysb_scr, csf_scr, csb_scr, *,
                   tc: int, H: int, compute_dtype):
    cd = compute_dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        hf_scr[...] = jnp.zeros_like(hf_scr)
        cf_scr[...] = jnp.zeros_like(cf_scr)
        hb_scr[...] = jnp.zeros_like(hb_scr)
        cb_scr[...] = jnp.zeros_like(cb_scr)

    # Whole-chunk input projections: one full-width MXU matmul per dir.
    xgf_scr[...] = jax.lax.dot_general(
        xf_ref[...].astype(cd), wx_ref[:, :4 * H].astype(cd),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bx_ref[:, :4 * H][None]
    xgb_scr[...] = (jax.lax.dot_general(
        xb_ref[...].astype(cd), wx_ref[:, 4 * H:].astype(cd),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bx_ref[:, 4 * H:][None]) * vb_ref[...]

    # No per-step valid handling inside the loop:
    #  * forward dir: invalidity is a time *suffix*, so a stale state is
    #    never consumed by a valid step; all streamed outputs are masked
    #    chunk-wide below.
    #  * backward dir: its sweep hits the invalid region *first*, but
    #    with xgb zeroed chunk-wide (above) a (0,0) state maps to (0,0)
    #    — gates = 0, c' = sig(0)*0 + sig(0)*tanh(0) = 0,
    #    h' = sig(0)*tanh(0) = 0 — so the state is still exactly the
    #    initial zeros when the first valid step arrives.
    def body(k, _):
        # forward direction: natural time order within the chunk.
        # Per-step rows land in f32 VMEM scratch; the stream refs get ONE
        # full-block masked store at chunk end. Full-block stores are
        # what makes bf16 stream refs legal: Mosaic rejects [B,1,H]
        # bf16 stores at lane-unaligned H (DESIGN.md TODO 2), but a
        # whole-[B,tc,H] store tiles cleanly at any dtype.
        h_new, c_new = _cell_fwd_dir(xgf_scr[:, pl.ds(k, 1), :][:, 0, :],
                                     hf_scr[...], cf_scr[...],
                                     whf_ref[...], cd)
        hf_scr[...] = h_new
        cf_scr[...] = c_new
        ysf_scr[:, pl.ds(k, 1), :] = h_new[:, None, :]
        csf_scr[:, pl.ds(k, 1), :] = c_new[:, None, :]
        # backward direction: reverse order within the (reverse-indexed)
        # chunk, so it sweeps global time T-1 -> 0
        i = tc - 1 - k
        h_new, c_new = _cell_fwd_dir(xgb_scr[:, pl.ds(i, 1), :][:, 0, :],
                                     hb_scr[...], cb_scr[...],
                                     whb_ref[...], cd)
        hb_scr[...] = h_new
        cb_scr[...] = c_new
        ysb_scr[:, pl.ds(i, 1), :] = h_new[:, None, :]
        csb_scr[:, pl.ds(i, 1), :] = c_new[:, None, :]
        return 0

    jax.lax.fori_loop(0, tc, body, 0, unroll=_unroll(tc))

    # Single full-block masked store per stream (invalid steps -> 0).
    # One write instead of the old per-step store + full-ref masking
    # rewrite, and the only store the stream dtype sees is full-tile.
    ysf_ref[...] = (ysf_scr[...] * vf_ref[...]).astype(ysf_ref.dtype)
    csf_ref[...] = (csf_scr[...] * vf_ref[...]).astype(csf_ref.dtype)
    ysb_ref[...] = (ysb_scr[...] * vb_ref[...]).astype(ysb_ref.dtype)
    csb_ref[...] = (csb_scr[...] * vb_ref[...]).astype(csb_ref.dtype)


def _v2_bwd_kernel(xf_ref, xb_ref, vf_ref, vb_ref,
                   ysf_ref, csf_ref, dyf_ref, bhf_ref, bcf_ref,
                   ysb_ref, csb_ref, dyb_ref, bhb_ref, bcb_ref,
                   wx_ref, bx_ref, whf_ref, whb_ref,
                   dxf_ref, dxb_ref, dwx_ref, dbx_ref, dwhf_ref, dwhb_ref,
                   dhf_scr, dcf_scr, dhb_scr, dcb_scr,
                   xgf_scr, xgb_scr, dgf_scr, dgb_scr,
                   dwx_acc, dbx_acc, dwhf_acc, dwhb_acc,
                   thf_scr, thb_scr,
                   hpf_scr, cpf_scr, hpb_scr, cpb_scr, *,
                   tc: int, H: int, D: int, compute_dtype):
    """Reverse sweep. Grid step c: forward direction processes time
    blocks in reverse (refs indexed n-1-c outside), backward direction in
    natural order (its own reverse)."""
    cd = compute_dtype
    B = dhf_scr.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dhf_scr[...] = jnp.zeros_like(dhf_scr)
        dcf_scr[...] = jnp.zeros_like(dcf_scr)
        dhb_scr[...] = jnp.zeros_like(dhb_scr)
        dcb_scr[...] = jnp.zeros_like(dcb_scr)
        dwx_acc[...] = jnp.zeros_like(dwx_acc)
        dbx_acc[...] = jnp.zeros_like(dbx_acc)
        dwhf_acc[...] = jnp.zeros_like(dwhf_acc)
        dwhb_acc[...] = jnp.zeros_like(dwhb_acc)

    # Gate recompute is hoisted out of the sequential loop: h_prev comes
    # from the STORED forward outputs (not the backward recursion), so
    # gates = xg + h_prev @ W_h is computable for the whole chunk as one
    # full-width MXU matmul, and the activations as one chunk-wide VPU
    # pass. The in-loop critical path then carries a single matmul
    # (dh_rec) instead of two. xg*_scr is transformed in place into the
    # activation layout [si | sf | tg | so].
    # Gate layout is (i,f,o,g) with the forget bias baked into bx (see
    # _perm_ifog): the three sigmoids run as ONE wide VPU op. Activations
    # are masked chunk-wide by the valid stream, which makes every dgates
    # term vanish at invalid steps (each term carries a factor of some
    # activation), so the per-step dgates select disappears.
    def recompute_acts(xg_scr, x_ref, wx_cols, bx_cols, hp_ref, wh_ref,
                       v_ref):
        gates = jax.lax.dot_general(
            x_ref[...].astype(cd), wx_cols.astype(cd),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bx_cols[None] + jax.lax.dot_general(
            hp_ref[...].astype(cd), wh_ref[...].astype(cd),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xg_scr[...] = jnp.concatenate(
            [
                jax.nn.sigmoid(gates[..., :3 * H]),
                jnp.tanh(gates[..., 3 * H:]),
            ],
            axis=-1,
        ) * v_ref[...]

    # h_prev / c_prev are rebuilt in VMEM from the ys/cs streams plus a
    # tiny per-chunk boundary operand ([B,1,H]: the neighbouring chunk's
    # edge state) instead of streaming XLA-materialized shifted copies —
    # saves two full [B,T,H] HBM streams per direction plus their
    # production (write+read) in the XLA prologue.
    # Streams load as FULL blocks and slice in-register: partial-sublane
    # loads of bf16 refs hit the same Mosaic tiling restriction as the
    # old per-step stores; full-block loads tile cleanly at any dtype.
    f32 = lambda a: a.astype(jnp.float32)  # noqa: E731
    hpf_scr[:, :1, :] = f32(bhf_ref[0][:, None, :])
    hpf_scr[:, 1:, :] = f32(ysf_ref[...])[:, :tc - 1, :]
    cpf_scr[:, :1, :] = f32(bcf_ref[0][:, None, :])
    cpf_scr[:, 1:, :] = f32(csf_ref[...])[:, :tc - 1, :]
    # backward dir: "previous" state lives at t+1
    hpb_scr[:, tc - 1:, :] = f32(bhb_ref[0][:, None, :])
    hpb_scr[:, :tc - 1, :] = f32(ysb_ref[...])[:, 1:, :]
    cpb_scr[:, tc - 1:, :] = f32(bcb_ref[0][:, None, :])
    cpb_scr[:, :tc - 1, :] = f32(csb_ref[...])[:, 1:, :]

    recompute_acts(xgf_scr, xf_ref, wx_ref[:, :4 * H], bx_ref[:, :4 * H],
                   hpf_scr, whf_ref, vf_ref)
    recompute_acts(xgb_scr, xb_ref, wx_ref[:, 4 * H:], bx_ref[:, 4 * H:],
                   hpb_scr, whb_ref, vb_ref)
    # tanh(c_t) hoisted chunk-wide (off the sequential critical path).
    thf_scr[...] = jnp.tanh(f32(csf_ref[...]))
    thb_scr[...] = jnp.tanh(f32(csb_ref[...]))

    def dir_step(i, xg_scr, cp_ref, dy_ref, wh_ref,
                 dh_scr, dc_scr, dg_scr, th_scr):
        c_prev = cp_ref[:, pl.ds(i, 1), :][:, 0, :]
        acts = xg_scr[:, pl.ds(i, 1), :][:, 0, :]
        si = acts[:, :H]
        sf = acts[:, H:2 * H]
        so = acts[:, 2 * H:3 * H]
        tg = acts[:, 3 * H:]
        tanh_c = th_scr[:, pl.ds(i, 1), :][:, 0, :]
        # dy is pre-masked outside the kernel (dys *= valid).
        dh_total = dy_ref[:, pl.ds(i, 1), :][:, 0, :] + dh_scr[...]
        do = dh_total * tanh_c
        dc = dh_total * so * (1.0 - tanh_c * tanh_c) + dc_scr[...]
        dgates = jnp.concatenate(
            [
                dc * tg * si * (1.0 - si),
                dc * c_prev * sf * (1.0 - sf),
                do * so * (1.0 - so),
                dc * si * (1.0 - tg * tg),
            ],
            axis=-1,
        )  # (i,f,o,g); zero at invalid steps via the masked activations
        dh_rec = jax.lax.dot_general(
            dgates.astype(cd), wh_ref[...].astype(cd),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # No valid select on the carries: at invalid steps the masked
        # activations zero dgates (so dh_rec = 0) and sf (so dc*sf = 0),
        # and invalid steps only ever precede valid ones at the *start*
        # of each direction's reverse sweep, where the carries are zero
        # anyway — a valid step never consumes a clobbered carry.
        dh_scr[...] = dh_rec
        dc_scr[...] = dc * sf
        dg_scr[:, pl.ds(i, 1), :] = dgates[:, None, :]

    def body(k, _):
        # forward dir: within-chunk reverse (global reverse sweep)
        dir_step(tc - 1 - k, xgf_scr, cpf_scr, dyf_ref,
                 whf_ref, dhf_scr, dcf_scr, dgf_scr, thf_scr)
        # backward dir: within-chunk natural order (its reverse sweep)
        dir_step(k, xgb_scr, cpb_scr, dyb_ref,
                 whb_ref, dhb_scr, dcb_scr, dgb_scr, thb_scr)
        return 0

    jax.lax.fori_loop(0, tc, body, 0, unroll=_unroll(tc))

    # Chunk-merged weight-gradient matmuls (full MXU width).
    rows = B * tc
    xf2 = xf_ref[...].astype(cd).reshape(rows, D)
    xb2 = xb_ref[...].astype(cd).reshape(rows, D)
    dgf2 = dgf_scr[...].reshape(rows, 4 * H)
    dgb2 = dgb_scr[...].reshape(rows, 4 * H)
    tT = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwx_acc[:, :4 * H] += tT(xf2, dgf2)
    dwx_acc[:, 4 * H:] += tT(xb2, dgb2)
    dbx_acc[:, :4 * H] += jnp.sum(dgf2, axis=0)[None]
    dbx_acc[:, 4 * H:] += jnp.sum(dgb2, axis=0)[None]
    dwhf_acc[...] += tT(hpf_scr[...].astype(cd).reshape(rows, H), dgf2)
    dwhb_acc[...] += tT(hpb_scr[...].astype(cd).reshape(rows, H), dgb2)

    dxf_ref[...] = jax.lax.dot_general(
        dgf_scr[...].astype(cd), wx_ref[:, :4 * H].astype(cd),
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dxf_ref.dtype)
    dxb_ref[...] = jax.lax.dot_general(
        dgb_scr[...].astype(cd), wx_ref[:, 4 * H:].astype(cd),
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dxb_ref.dtype)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _flush():
        dwx_ref[...] = dwx_acc[...]
        dbx_ref[...] = dbx_acc[...]
        dwhf_ref[...] = dwhf_acc[...]
        dwhb_ref[...] = dwhb_acc[...]


def _lane(v: int) -> int:
    """VMEM lane padding: the last (minor) dim of every VMEM buffer is
    stored padded to a multiple of 128 lanes."""
    return ((v + 127) // 128) * 128


def _v2_vmem_words(B: int, H: int, D: int, cd_bytes: int = 4,
                   sd_bytes: int = 4):
    """(const_words, per_t_words) of the *backward* kernel (the bigger
    of the two pallas_calls), lane-padding and dtype aware.

    Word counts (1 word = 4 bytes) from _v2_vjp_bwd's actual specs, with
    every stream's minor dim padded to 128 lanes (pl(.) below).
    Double-buffered windowed blocks count x2; scratch counts x1. The x
    streams and weights are stored in compute_dtype (cd_bytes), the
    ys/cs residual streams in the stream dtype (sd_bytes, f32 default);
    dy/dx/valid/scratch are f32:
      per-timestep: x in 2 views x2 buf: 4*pl(D)*r_cd; valid 2x2:
                    4*pl(1); ys/cs 2 dirs x2 buf: 8*pl(H)*r_sd; dy 2x2:
                    4*pl(H); dx out 2x2: 4*pl(D); xg/dg scratch 2 dirs:
                    4*pl(4H); tanh(c)/h_prev/c_prev scratch: 6*pl(H)
      constant: weights in (r_cd) + weight-grad outs + accumulators
                  = (8DH + 8H^2)*(2 + r_cd) + 24H
                + boundary rows + dh/dc scratch ~= 12*B*pl(H)

    The lane-padding terms are NOT optional: the round-4 B=128 bench
    compile-OOM'd at 131.76M where the unpadded model predicted 102.4M —
    most of the gap is D=80->128, 1->128, and H=320->384 lane inflation.

    The forward kernel (round 5) carries 4 extra f32 [B,tc,plH] stream
    chunk buffers (full-block bf16 stores), but stays strictly smaller
    than the backward at every shape: bwd - fwd per-timestep =
    4*pl(D) + 6*pl(H) + 2*pl(4H) > 0, so modeling the backward still
    bounds both pallas_calls.

    cd_bytes discounts ONLY the VMEM-resident weights: the bf16 x
    windows do NOT shrink in practice, because bf16 tiles pad the
    sublane (time) dim to 16, and the kernel's minimum chunk is tc=8 —
    measured: B=128/D=1280 bf16 used 133.1M where a stream-discounted
    model said 120.4M. Treating streams as f32-equivalent is
    conservative for tc>=16 (costs at most a smaller chunk or a scan
    fallback, never a compile OOM).

    Calibration points (all residuals absorbed by the fits_vmem /
    auto-chunk margins): B=128/D=80/f32/tc=16 predicts 120.0M, actual
    131.76M (-11.8M: the known residual floor — Mosaic-side fixed
    overhead); B=128/D=1280/bf16/tc=8 predicts 130.4M, actual 133.1M;
    B=148/D=1280/f32 forward-kernel OOM at 147.7M, backward model
    152.4M; flagship B=96 layer shapes keep their round-3 chunk sizes
    (layer0 tc=16, wide layers tc=8) and run in production.
    """
    plD, pl1, plH, pl4H = _lane(D), _lane(1), _lane(H), _lane(4 * H)
    r_cd, r_sd = cd_bytes / 4.0, sd_bytes / 4.0
    const_words = int((8 * D * H + 8 * H * H) * (2 + r_cd)) + 24 * H \
        + 12 * B * plH
    per_t_words = int(B * (8 * plD + 4 * pl1
                           + 8 * plH * r_sd + 10 * plH + 4 * pl4H))
    return const_words, per_t_words


def _stream_bytes() -> int:
    return jnp.dtype(
        os.environ.get("GLUON_LSTM_STREAM_DTYPE", "float32")).itemsize


# Worst observed model underprediction (words): B=128/D=80/f32/tc=16
# predicted 120.0M, compile used 131.76M. Added to every admission
# decision so a shape the model thinks is near the limit is rejected
# rather than compile-OOM'd.
_V2_RESIDUAL_WORDS = (12 * 1024 * 1024) // 4


def fits_vmem(B: int, H: int, D: int, cd_bytes: int = 4) -> bool:
    """True iff the fused kernel's backward fits the VMEM budget at the
    Mosaic tiling floor (time chunks are multiples of 8).

    Shapes where even tc=8 exceeds the budget cannot run this kernel at
    all (found by the LibriSpeech-scale rehearsal: the 4 s dynamic
    bucket at batch 148 x D=1280 OOM'd VMEM at 147.7M/128M); callers
    must fall back to the lax.scan path — BiLSTMEncoder does so
    automatically with a warning.

    Unlike _v2_auto_chunk's 0.85-headroom budget (which only decides how
    much LARGER than 8 a chunk may grow), this check admits a shape iff
    model + worst-observed-residual fits the HARD limit. Every known
    point lands on the right side: flagship B=96/D=1280 f32 (115.3M
    predicted + 12M = 127.1M, runs in production), B=128/D=80 f32
    (67M + 12M, compiles), B=128/D=1280 bf16 (130.4M predicted, measured
    133.1M OOM -> rejected), B=148/D=1280 f32 (rejected). A rejected
    shape just takes the lax.scan fallback — correctness is unaffected.
    """
    limit_words = _V2_VMEM_LIMIT // 4
    const_words, per_t_words = _v2_vmem_words(B, H, D, cd_bytes,
                                              _stream_bytes())
    return (const_words + 8 * per_t_words + _V2_RESIDUAL_WORDS
            <= limit_words)


def _v2_auto_chunk(tc: int, B: int, H: int, D: int,
                   cd_bytes: int = 4) -> int:
    """Largest multiple-of-8 chunk <= tc whose *backward* kernel (the
    bigger of the two) fits the VMEM budget (lane-padded, dtype-aware
    word model — see _v2_vmem_words).

    Must be applied identically by _v2_fwd_impl and _v2_vjp_bwd so the
    residual time padding agrees between the two pallas_calls.
    """
    budget_words = int(_V2_VMEM_LIMIT * 0.85) // 4
    const_words, per_t_words = _v2_vmem_words(B, H, D, cd_bytes,
                                              _stream_bytes())
    tc_max = max((budget_words - const_words) // max(per_t_words, 1), 8)
    if tc < 8:
        global _warned_chunk_floor
        if not _warned_chunk_floor:
            _warned_chunk_floor = True
            import warnings

            warnings.warn(
                f"lstm_time_chunk={tc} raised to the TPU tiling floor of 8 "
                "(chunks are multiples of 8; see ModelConfig.lstm_time_chunk)",
                stacklevel=2)
    return max(8, min(tc, (tc_max // 8) * 8))


_warned_chunk_floor = False


def _v2_pad_time(x, tc):
    T = x.shape[1]
    pad = (-T) % tc
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
    return x, T + pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def bilstm_fused(x, lens, w_x, b_x, w_hf, w_hb, compute_dtype=jnp.float32,
                 time_chunk=DEFAULT_TIME_CHUNK):
    """BiLSTM layer with the input projection fused into the kernel.

    x [B,T,D]; w_x [D,8H] (forward gates then backward gates, matching a
    single dense over both directions); b_x [8H]; w_hf/w_hb [H,4H].
    Returns concat(fwd, bwd) outputs [B,T,2H].
    """
    out, _ = _v2_fwd_impl(x, lens, w_x, b_x, w_hf, w_hb, compute_dtype,
                          time_chunk)
    return out


def _v2_fwd_impl(x, lens, w_x, b_x, w_hf, w_hb, compute_dtype, tc):
    B, T, D = x.shape
    H = w_hf.shape[0]
    cd = jnp.dtype(compute_dtype)
    interpret = jax.default_backend() != "tpu"
    tc = _v2_auto_chunk(tc, B, H, D, cd.itemsize)
    xp, TP = _v2_pad_time(x, tc)
    valid = (jnp.arange(TP)[None, :] < lens[:, None]).astype(
        jnp.float32)[..., None]  # [B,TP,1] (Mosaic block-tiling rules)
    n = TP // tc

    fwd3 = lambda: pl.BlockSpec((B, tc, D), lambda c: (0, c, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    rev3 = lambda: pl.BlockSpec((B, tc, D), lambda c: (0, n - 1 - c, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    fwd2 = lambda: pl.BlockSpec((B, tc, 1), lambda c: (0, c, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    rev2 = lambda: pl.BlockSpec((B, tc, 1), lambda c: (0, n - 1 - c, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    const = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda c: (0,) * arr.ndim, memory_space=pltpu.VMEM)
    outf = lambda: pl.BlockSpec((B, tc, H), lambda c: (0, c, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    outb = lambda: pl.BlockSpec((B, tc, H), lambda c: (0, n - 1 - c, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)

    # Kernel-internal gate order is (i,f,o,g) with the forget bias baked
    # into the bias vector (see _perm_ifog).
    wx_c = _perm_ifog8(w_x, H).astype(cd)
    bx_c = (_perm_ifog8(b_x, H) + _forget_bias8(H)).reshape(
        1, -1).astype(jnp.float32)
    whf_c = _perm_ifog(w_hf, H).astype(cd)
    whb_c = _perm_ifog(w_hb, H).astype(cd)
    # Residual/stream dtype stays f32 by default: Mosaic miscompiled
    # bf16 stores of lane-unaligned (H=320) middle slices when last
    # tested, and f32 residuals keep the gate recompute in the backward
    # exact. GLUON_LSTM_STREAM_DTYPE=bfloat16 opts into bf16 streams for
    # experiments (parity-check on real TPU before trusting).
    sdtype = jnp.dtype(os.environ.get("GLUON_LSTM_STREAM_DTYPE", "float32"))

    ys_f, ys_b, cs_f, cs_b = pl.pallas_call(
        functools.partial(_v2_fwd_kernel, tc=tc, H=H, compute_dtype=cd),
        grid=(n,),
        in_specs=[fwd3(), rev3(), fwd2(), rev2(),
                  const(wx_c), const(bx_c), const(whf_c), const(whb_c)],
        out_specs=[outf(), outb(), outf(), outb()],
        out_shape=[jax.ShapeDtypeStruct((B, TP, H), sdtype)] * 4,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, tc, 4 * H), jnp.float32),
            pltpu.VMEM((B, tc, 4 * H), jnp.float32),
            # f32 chunk buffers for the four streams: per-step rows are
            # written here, then cast+masked into the (possibly bf16)
            # out refs as one full-block store each (see _v2_fwd_kernel).
            pltpu.VMEM((B, tc, H), jnp.float32),
            pltpu.VMEM((B, tc, H), jnp.float32),
            pltpu.VMEM((B, tc, H), jnp.float32),
            pltpu.VMEM((B, tc, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_V2_VMEM_LIMIT),
        interpret=interpret,
    )(xp.astype(cd), xp.astype(cd), valid, valid, wx_c, bx_c, whf_c, whb_c)

    out = jnp.concatenate(
        [ys_f[:, :T].astype(jnp.float32), ys_b[:, :T].astype(jnp.float32)],
        axis=-1)
    return out, (xp, valid, ys_f, ys_b, cs_f, cs_b, w_x, b_x, w_hf, w_hb, T)


def _v2_vjp_fwd(x, lens, w_x, b_x, w_hf, w_hb, compute_dtype, tc):
    return _v2_fwd_impl(x, lens, w_x, b_x, w_hf, w_hb, compute_dtype, tc)


def _v2_vjp_bwd(compute_dtype, tc, res, g):
    xp, valid, ys_f, ys_b, cs_f, cs_b, w_x, b_x, w_hf, w_hb, T = res
    B, TP, D = xp.shape
    H = w_hf.shape[0]
    cd = jnp.dtype(compute_dtype)
    interpret = jax.default_backend() != "tpu"
    tc = _v2_auto_chunk(tc, B, H, D, cd.itemsize)  # same clamp as fwd
    n = TP // tc

    # Chunk-boundary states only ([B,n,H] — tiny): the kernel rebuilds
    # the full shifted h_prev/c_prev blocks in VMEM from the ys/cs
    # streams, so no full-size shifted copies are materialized in HBM.
    zrow = jnp.zeros((B, 1, H), ys_f.dtype)
    # [n,B,H] layout: Mosaic wants the last two block dims full-size, so
    # the chunk axis leads and each grid step streams one (1,B,H) row.
    # Always f32: the kernel reshapes these rows (1,B,H)->(B,1,H), and
    # Mosaic's layout inference rejects that shape cast on bf16 vectors
    # (bf16 streams would otherwise propagate their dtype here).
    nbh = lambda a: jnp.swapaxes(a, 0, 1).astype(jnp.float32)  # noqa: E731
    bh_f = nbh(jnp.concatenate([zrow, ys_f[:, tc - 1::tc][:, :n - 1]], axis=1))
    bc_f = nbh(jnp.concatenate([zrow, cs_f[:, tc - 1::tc][:, :n - 1]], axis=1))
    # backward dir processes time TP-1 -> 0; its "previous" state is t+1
    bh_b = nbh(jnp.concatenate([ys_b[:, tc::tc], zrow], axis=1))
    bc_b = nbh(jnp.concatenate([cs_b[:, tc::tc], zrow], axis=1))
    gp = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, TP - T), (0, 0)))
    # Pre-mask the cotangent (XLA fuses this into the stream producer);
    # the kernel then skips the per-step dy select.
    gp = gp * valid
    dy_f = gp[..., :H]
    dy_b = gp[..., H:]

    fwd3d = lambda last: pl.BlockSpec(  # noqa: E731
        (B, tc, last), lambda c: (0, n - 1 - c, 0), memory_space=pltpu.VMEM)
    nat3d = lambda last: pl.BlockSpec(  # noqa: E731
        (B, tc, last), lambda c: (0, c, 0), memory_space=pltpu.VMEM)
    fwd2d = lambda: pl.BlockSpec((B, tc, 1), lambda c: (0, n - 1 - c, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    nat2d = lambda: pl.BlockSpec((B, tc, 1), lambda c: (0, c, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    const = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda c: (0,) * arr.ndim, memory_space=pltpu.VMEM)
    # Boundary operands: one (1,B,H) row of the [n,B,H] boundary arrays
    # per grid step, following each direction's chunk order.
    fwdb = lambda: pl.BlockSpec((1, B, H), lambda c: (n - 1 - c, 0, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    natb = lambda: pl.BlockSpec((1, B, H), lambda c: (c, 0, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)

    wx_c = _perm_ifog8(w_x, H).astype(cd)
    bx_c = (_perm_ifog8(b_x, H) + _forget_bias8(H)).reshape(
        1, -1).astype(jnp.float32)
    whf_c = _perm_ifog(w_hf, H).astype(cd)
    whb_c = _perm_ifog(w_hb, H).astype(cd)

    outs = pl.pallas_call(
        functools.partial(_v2_bwd_kernel, tc=tc, H=H, D=D, compute_dtype=cd),
        grid=(n,),
        in_specs=[
            fwd3d(D), nat3d(D), fwd2d(), nat2d(),
            fwd3d(H), fwd3d(H), fwd3d(H), fwdb(), fwdb(),
            nat3d(H), nat3d(H), nat3d(H), natb(), natb(),
            const(wx_c), const(bx_c), const(whf_c), const(whb_c),
        ],
        out_specs=[
            fwd3d(D), nat3d(D),
            const(wx_c), const(bx_c), const(whf_c), const(whb_c),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, TP, D), jnp.float32),
            jax.ShapeDtypeStruct((B, TP, D), jnp.float32),
            jax.ShapeDtypeStruct(wx_c.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 8 * H), jnp.float32),
            jax.ShapeDtypeStruct(whf_c.shape, jnp.float32),
            jax.ShapeDtypeStruct(whb_c.shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, tc, 4 * H), jnp.float32),
            pltpu.VMEM((B, tc, 4 * H), jnp.float32),
            pltpu.VMEM((B, tc, 4 * H), jnp.float32),
            pltpu.VMEM((B, tc, 4 * H), jnp.float32),
            pltpu.VMEM((D, 8 * H), jnp.float32),
            pltpu.VMEM((1, 8 * H), jnp.float32),
            pltpu.VMEM((H, 4 * H), jnp.float32),
            pltpu.VMEM((H, 4 * H), jnp.float32),
            pltpu.VMEM((B, tc, H), jnp.float32),  # tanh(c_t) fwd dir
            pltpu.VMEM((B, tc, H), jnp.float32),  # tanh(c_t) bwd dir
            pltpu.VMEM((B, tc, H), jnp.float32),  # h_prev fwd dir
            pltpu.VMEM((B, tc, H), jnp.float32),  # c_prev fwd dir
            pltpu.VMEM((B, tc, H), jnp.float32),  # h_prev bwd dir
            pltpu.VMEM((B, tc, H), jnp.float32),  # c_prev bwd dir
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_V2_VMEM_LIMIT),
        interpret=interpret,
    )(
        xp.astype(cd), xp.astype(cd), valid, valid,
        ys_f, cs_f, dy_f, bh_f, bc_f,
        ys_b, cs_b, dy_b, bh_b, bc_b,
        wx_c, bx_c, whf_c, whb_c,
    )
    dx_f, dx_b, dwx, dbx, dwhf, dwhb = outs
    dx = (dx_f + dx_b)[:, :T]
    # The kernel accumulated weight grads in (i,f,o,g) column order;
    # _perm_ifog is an involution, so applying it again restores the
    # caller's (i,f,g,o) layout. (The baked +1 forget bias is a constant
    # and does not touch dbx.)
    return (dx.astype(jnp.float32), None,
            _perm_ifog8(dwx, H).astype(w_x.dtype),
            _perm_ifog8(dbx.reshape(-1), H).astype(b_x.dtype),
            _perm_ifog(dwhf, H).astype(w_hf.dtype),
            _perm_ifog(dwhb, H).astype(w_hb.dtype))


bilstm_fused.defvjp(_v2_vjp_fwd, _v2_vjp_bwd)
