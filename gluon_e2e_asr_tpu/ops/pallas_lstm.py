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
