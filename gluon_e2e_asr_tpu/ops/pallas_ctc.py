"""Pallas CTC alpha/beta recursion kernels.

The log-space DP of ops/ctc.py is mathematically unchanged
[SURVEY.md §3.5; BASELINE.json:L5 "alpha-beta recursion kernels"], but
the `lax.scan` realization pays XLA per-iteration op overhead on a tiny
[B, 2L+1] state (~3.4 ms per direction at flagship shapes). Here each
recursion runs as a single Pallas kernel: the state-emission table
[T, B, S] sits in VMEM (a few MB), the time loop is a `fori_loop`, and
each step is a handful of VPU ops on the resident state.

The state-lattice construction, the vocab gather/scatter (one-hot MXU
matmuls), the final log-likelihood reduction, and the feasibility mask
stay outside in XLA where they are single fused ops. ops/ctc.py keeps
the always-correct scan implementation; `ctc.py:ctc_loss` dispatches
here on TPU-compatible shapes (parity-tested in tests/test_ctc.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_VMEM_LIMIT = 128 * 1024 * 1024
# Resident tensors are ~3x [T,B,S] f32; stay well under the chip's VMEM.
_VMEM_BUDGET = int(72e6)


def _shift_lanes(x, n, fill):
    """x[:, s] -> x[:, s-n] with `fill` in the first n lanes."""
    B = x.shape[0]
    pad = jnp.full((B, n), fill, x.dtype)
    return jnp.concatenate([pad, x[:, :-n]], axis=1)


def _shift_lanes_left(x, n, fill):
    """x[:, s] -> x[:, s+n] with `fill` in the last n lanes."""
    B = x.shape[0]
    pad = jnp.full((B, n), fill, x.dtype)
    return jnp.concatenate([x[:, n:], pad], axis=1)


def _logsumexp3(a0, a1, a2):
    m = jnp.maximum(jnp.maximum(a0, a1), a2)
    msafe = jnp.maximum(m, NEG_INF)
    return msafe + jnp.log(
        jnp.exp(a0 - msafe) + jnp.exp(a1 - msafe) + jnp.exp(a2 - msafe)
    )


def _alpha_kernel(logps_ref, tmask_ref, skip_ref, svalid_ref, alpha_ref,
                  a_scr, *, T: int):
    S = skip_ref.shape[1]
    skip = skip_ref[...] > 0.5  # [B,S]
    svalid = svalid_ref[...] > 0.5
    s_idx = jax.lax.broadcasted_iota(jnp.int32, skip.shape, 1)
    first_ok = (s_idx <= 1) & svalid

    def body(t, _):
        emit = logps_ref[t]  # [B,S] f32
        tm = tmask_ref[t] > 0.5  # [B,1]
        a = a_scr[...]
        a1 = _shift_lanes(a, 1, NEG_INF)
        a2 = jnp.where(skip, _shift_lanes(a, 2, NEG_INF), NEG_INF)
        stepped = _logsumexp3(a, a1, a2) + emit
        stepped = jnp.where(svalid, stepped, NEG_INF)
        first = jnp.where(first_ok, emit, NEG_INF)
        new = jnp.where(t == 0, first, stepped)
        new = jnp.where(tm, new, a)  # freeze past each row's seq end
        a_scr[...] = new
        alpha_ref[t] = new
        return 0

    jax.lax.fori_loop(0, T, body, 0)


def _beta_post_kernel(logps_ref, tmask_ref, islast_ref, skipf2_ref,
                      svalid_ref, finalok_ref, alpha_ref, ll_ref,
                      post_ref, b_scr, *, T: int):
    skipf2 = skipf2_ref[...] > 0.5
    svalid = svalid_ref[...] > 0.5
    finalok = finalok_ref[...] > 0.5
    ll = ll_ref[...]  # [B,1]

    def init():
        b_scr[...] = jnp.full_like(b_scr, NEG_INF)

    init()

    def body(k, _):
        t = T - 1 - k
        emit = logps_ref[t]
        tm = tmask_ref[t] > 0.5  # [B,1]
        is_last = islast_ref[t] > 0.5  # [B,1]
        b = b_scr[...]
        b1 = _shift_lanes_left(b, 1, NEG_INF)
        b2 = jnp.where(skipf2, _shift_lanes_left(b, 2, NEG_INF), NEG_INF)
        new = emit + _logsumexp3(b, b1, b2)
        new = jnp.where(is_last, jnp.where(finalok, emit, NEG_INF), new)
        new = jnp.where(svalid, new, NEG_INF)
        new = jnp.where(tm, new, b)
        b_scr[...] = new
        # state posterior at t: exp(alpha + beta - emit - ll), masked
        gamma = alpha_ref[t] + new - emit
        post = jnp.exp(jnp.clip(gamma - ll, 2 * NEG_INF, 0.0))
        post = jnp.where(svalid & tm, post, 0.0)
        post_ref[t] = post
        return 0

    jax.lax.fori_loop(0, T, body, 0)


def _vmem_ok(T: int, B: int, S: int) -> bool:
    return 3 * 4 * T * B * S + 8 * B * S <= _VMEM_BUDGET


def ctc_supported(T: int, B: int, S: int) -> bool:
    """Mosaic-legal shapes within budget (B rows must tile by 8 or be the
    full dim — always true for full-array blocks, so only VMEM gates)."""
    return _vmem_ok(T, B, S)


def alpha_pallas(logp_states, time_mask, allow_skip, state_valid,
                 interpret=None):
    """logp_states [T,B,S] f32, time_mask [T,B] bool -> alpha [T,B,S]."""
    T, B, S = logp_states.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_alpha_kernel, T=T),
        in_specs=[full(), full(), full(), full()],
        out_specs=full(),
        out_shape=jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(
        logp_states.astype(jnp.float32),
        time_mask.astype(jnp.float32)[..., None],
        allow_skip.astype(jnp.float32),
        state_valid.astype(jnp.float32),
    )


def beta_post_pallas(logp_states, time_mask, allow_skip_fwd, state_valid,
                     last_state, alpha, ll, interpret=None):
    """Fused beta recursion + state posterior. Returns post_states
    [T,B,S] = exp(alpha + beta - emit - ll), masked to valid cells."""
    T, B, S = logp_states.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # s -> s+2 legal iff the forward skip into s+2 is legal.
    skipf2 = jnp.pad(allow_skip_fwd, ((0, 0), (0, 2)))[:, 2:]
    s_idx = jnp.arange(S)[None, :]
    finalok = (s_idx == last_state[:, None]) | (s_idx == last_state[:, None] - 1)
    T_lens = time_mask.sum(axis=0)  # [B]
    is_last = jnp.arange(T)[:, None] == (T_lens[None, :] - 1)  # [T,B]
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_beta_post_kernel, T=T),
        in_specs=[full()] * 8,
        out_specs=full(),
        out_shape=jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(
        logp_states.astype(jnp.float32),
        time_mask.astype(jnp.float32)[..., None],
        is_last.astype(jnp.float32)[..., None],
        skipf2.astype(jnp.float32),
        state_valid.astype(jnp.float32),
        finalok.astype(jnp.float32),
        alpha.astype(jnp.float32),
        ll.astype(jnp.float32)[:, None],
    )
