"""Measure the cross-layer-pipelining headroom DESIGN.md dismissed
analytically [VERDICT.md round-3 missing #4b / next-round item 3].

The proposal under test: a fused multi-layer encoder kernel that runs
layer k's timestep t concurrently with layer k+1's timestep t-1. Its
*steady state* is N independent LSTM recurrence chains interleaved in
one kernel (the chains never exchange data within a step; the handoff
is pipelined). So the question "is there pipelining headroom?" reduces
to a measurable one: does one kernel running N independent chains cost
~1x a single chain (the sequential matmul leaves the MXU idle —
pipelining would reclaim it) or ~Nx (the MXU is already saturated —
DESIGN.md's dismissal is correct)?

This probe times exactly that steady state, VMEM-resident, no
streaming — isolating the dependent-matmul latency question from
bandwidth. It also sweeps the row count M, measuring the 128-row MXU
tile under-fill DESIGN.md blames for L1's 46 TFLOP/s (M=96 leaves 25%
of each tile's rows empty; M=128 exactly fills it).

Cell math mirrors ops/pallas_lstm.py::_cell_fwd_dir (one wide sigmoid
over [i,f,o], tanh(g), f32 carries): per chain per step one
[M,H]x[H,4H] dependent matmul + VPU gates.

Usage: python tools/pipeline_probe.py [--T 640] [--iters 20]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from gluon_e2e_asr_tpu.utils.platform import (  # noqa: E402
    enable_compilation_cache, warm_device_transfer,
)

enable_compilation_cache()

H = 320
_VMEM_LIMIT = 128 * 1024 * 1024


def make_probe(N: int, M: int, T: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(h0_ref, c0_ref, w_ref, out_ref):
        hs = [h0_ref[i] for i in range(N)]
        cs = [c0_ref[i] for i in range(N)]
        ws = [w_ref[i] for i in range(N)]

        def body(_, carry):
            hs, cs = carry
            new_h, new_c = [], []
            # N independent chains interleaved per step: their matmuls
            # have no mutual dependency, so the compiler may overlap
            # them across the (sequential) per-chain dependency.
            for i in range(N):
                g = jnp.dot(hs[i], ws[i],
                            preferred_element_type=jnp.float32)
                s = jax.nn.sigmoid(g[:, :3 * H])
                tg = jnp.tanh(g[:, 3 * H:])
                c = s[:, H:2 * H] * cs[i] + s[:, :H] * tg
                h = s[:, 2 * H:] * jnp.tanh(c)
                new_h.append(h)
                new_c.append(c)
            return tuple(new_h), tuple(new_c)

        hs, cs = jax.lax.fori_loop(0, T, body, (tuple(hs), tuple(cs)))
        for i in range(N):
            out_ref[i] = hs[i]

    def probe(h0, c0, w):
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, M, H), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(h0, c0, w)
        return out.sum()

    return jax.jit(probe)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--T", type=int, default=640)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax  # noqa: F401
    import jax.numpy as jnp

    warm_device_transfer()
    rng = np.random.default_rng(0)
    T = args.T

    def timeit(fn, ops):
        out = fn(*ops)
        float(np.asarray(out))  # fence via real (scalar) fetch
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*ops)
        float(np.asarray(out))
        return (time.perf_counter() - t0) / args.iters * 1e3

    print(f"# T={T} steps, H={H}, one [M,{H}]x[{H},{4 * H}] dependent "
          f"matmul + gates per chain per step, f32")
    results = {}
    for M in (96, 128, 192, 256):
        for N in (1, 2, 3, 4):
            h0 = jnp.asarray(
                rng.standard_normal((N, M, H)) * 0.1, jnp.float32)
            c0 = jnp.zeros((N, M, H), jnp.float32)
            w = jnp.asarray(
                rng.standard_normal((N, H, 4 * H)) * 0.02, jnp.float32)
            fn = make_probe(N, M, T)
            ms = timeit(fn, (h0, c0, w))
            flops = N * T * 2 * M * H * 4 * H
            tf = flops / (ms * 1e-3) / 1e12
            results[(M, N)] = ms
            rel = ms / results[(M, 1)]
            print(f"M={M:3d} N={N}: {ms:7.2f} ms  {tf:6.2f} TFLOP/s  "
                  f"cost vs N=1: {rel:4.2f}x "
                  f"(perfect overlap 1.00x, none {float(N):.2f}x)")
    # Summary verdicts the docs can quote.
    for M in (96, 128):
        r2 = results[(M, 2)] / results[(M, 1)]
        r4 = results[(M, 4)] / results[(M, 1)]
        print(f"# M={M}: 2 chains cost {r2:.2f}x one chain, "
              f"4 chains {r4:.2f}x — "
              + ("latency-bound: pipelining headroom EXISTS"
                 if r4 < 2.5 else
                 "throughput-bound: no pipelining headroom"))


if __name__ == "__main__":
    main()
