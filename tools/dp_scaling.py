"""Virtual-mesh DP scaling table + ICI communication-volume model
[VERDICT.md round-2 item 4].

Runs the tiny-flagship DP train step on 1/2/4/8 virtual CPU devices at a
FIXED per-device batch (weak scaling) in fresh subprocesses, and prints:

- per-step wall time per mesh size (CPU wall-clock is noisy — the
  load-bearing checks are that the program compiles, executes, keeps
  per-step time ~flat as devices grow, and that memory does not grow
  super-linearly),
- the exact gradient-allreduce volume per step (bytes moved over ICI by
  ``psum`` on a ring), and the predicted ICI cost on real TPU hardware,
  next to the measured single-chip step time — the scaling-efficiency
  model DESIGN.md records.

Usage::

    python tools/dp_scaling.py [--devices 1 2 4 8] [--steps 5]
        [--per-device-batch 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, resource, sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import __graft_entry__ as g
from gluon_e2e_asr_tpu.data.tokenizer import CharTokenizer
from gluon_e2e_asr_tpu.models.asr import build_model
from gluon_e2e_asr_tpu.parallel.mesh import make_mesh, shard_batch_arrays
from gluon_e2e_asr_tpu.training.train_step import (
    create_train_state, make_optimizer, make_train_step)

n = {n}
steps = {steps}
per_dev = {per_dev}
config = g._flagship_config(tiny=True)
tok = CharTokenizer()
model = build_model(config, tok.vocab_size, tok.sos_id, tok.eos_id)
tx = make_optimizer(config)
batch = g._synth_batch(batch=per_dev * n, seconds=0.5, max_labels=8)
state = create_train_state(config, model, tx, batch)
mesh = make_mesh(jax.devices()[:n])
step = make_train_step(model, config, tx, mesh=mesh)
sharded = shard_batch_arrays(mesh, batch)
state, m = step(state, sharded)   # compile + warmup
jax.block_until_ready(state.params)
t0 = time.perf_counter()
for _ in range(steps):
    state, m = step(state, sharded)
jax.block_until_ready(state.params)
dt = (time.perf_counter() - t0) / steps
assert np.isfinite(float(m['loss']))
n_params = sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(state.params))
rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
print(json.dumps({{'n': n, 'step_ms': dt * 1e3, 'loss': float(m['loss']),
                   'n_params': n_params, 'rss_mb': rss_mb}}))
"""


def run_point(n: int, steps: int, per_dev: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    code = _CHILD.format(repo=REPO, n=n, steps=steps, per_dev=per_dev)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        raise RuntimeError(f"n={n} failed:\n{r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def ici_model(n_params: int, n_devices: int,
              ici_gbps: float = 45.0) -> dict:
    """Ring-allreduce volume + time for one psum(grads) step.

    Each chip sends and receives 2*(n-1)/n * 4*n_params bytes (f32
    grads; reduce-scatter + all-gather halves). ``ici_gbps`` is the
    per-link ICI bandwidth used for the estimate (v5e-class hardware,
    one ring link active for a 1-D mesh — conservative).
    """
    vol = 2.0 * (n_devices - 1) / max(n_devices, 1) * 4.0 * n_params
    return {
        "bytes_per_chip_per_step": vol,
        "ici_us_at_%dGBps" % int(ici_gbps): vol / (ici_gbps * 1e9) * 1e6,
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--per-device-batch", type=int, default=2)
    args = p.parse_args(argv)

    rows = []
    for n in args.devices:
        r = run_point(n, args.steps, args.per_device_batch)
        r.update(ici_model(r["n_params"], n))
        rows.append(r)
        print(json.dumps(r))
    base = rows[0]["step_ms"]
    print("\nweak-scaling table (fixed per-device batch "
          f"{args.per_device_batch}; CPU wall-clock, noisy):")
    print(f"{'n':>3} {'step_ms':>9} {'vs_n1':>6} {'rss_mb':>8} "
          f"{'psum_MB/chip':>13}")
    for r in rows:
        print(f"{r['n']:>3} {r['step_ms']:>9.1f} "
              f"{r['step_ms'] / base:>6.2f} {r['rss_mb']:>8.0f} "
              f"{r['bytes_per_chip_per_step'] / 1e6:>13.2f}")


if __name__ == "__main__":
    main()
