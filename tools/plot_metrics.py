"""Training-curve plots from a run's metrics.jsonl (the reference
family's per-epoch loss/accuracy report images [SURVEY.md §2.1 #21;
INFERRED-high: ESPnet-v0-era stacks ship plot_loss/plot_acc PNGs]).

    python tools/plot_metrics.py <workdir-or-metrics.jsonl> [--out plots/]

Emits:
  loss.png      train loss / loss_ctc / loss_att per step, dev epochs
                marked
  quality.png   dev WER / CER per epoch (+ att_acc per logged step)
  speed.png     utt/sec/chip per logged step (train) and per epoch

Purely offline — reads the JSONL event stream, touches no device.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def load_events(path: str):
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    events = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    events.append(json.loads(line))
                except json.JSONDecodeError:
                    continue  # tolerate a torn tail line from a live run
    return events


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run", help="workdir containing metrics.jsonl, or the "
                               "jsonl path itself")
    p.add_argument("--out", default="plots")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    events = load_events(args.run)
    train = [e for e in events if e.get("event") == "train"]
    epochs = [e for e in events if e.get("event") == "epoch"]
    if not train and not epochs:
        print("no train/epoch events found", file=sys.stderr)
        return 1
    os.makedirs(args.out, exist_ok=True)

    # --- loss.png ---
    fig, ax = plt.subplots(figsize=(8, 4.5))
    steps = [e["step"] for e in train]
    for key, style in (("loss", "-"), ("loss_ctc", "--"), ("loss_att", ":")):
        vals = [e.get(key) for e in train]
        if any(v is not None for v in vals):
            ax.plot(steps, vals, style, label=key)
    for e in epochs:
        ax.axvline(e["step"], color="0.85", lw=0.6, zorder=0)
    ax.set_xlabel("optimizer step")
    ax.set_ylabel("loss (per token/frame mean)")
    ax.legend()
    ax.set_title("training loss (grey lines = epoch boundaries)")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "loss.png"), dpi=120)
    plt.close(fig)

    # --- quality.png ---
    fig, ax = plt.subplots(figsize=(8, 4.5))
    ep_steps = [e["step"] for e in epochs]
    for key, style in (("dev_wer", "-o"), ("dev_cer", "--s")):
        vals = [e.get(key) for e in epochs]
        if any(v is not None for v in vals):
            ax.plot(ep_steps, vals, style, ms=3, label=key)
    accs = [e.get("att_acc") for e in train]
    if any(a is not None for a in accs):
        ax.plot(steps, accs, ":", color="0.6", label="att_acc (train)")
    ax.set_xlabel("optimizer step")
    ax.set_ylabel("rate")
    ax.set_ylim(bottom=0)
    ax.legend()
    ax.set_title("held-out quality per epoch")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "quality.png"), dpi=120)
    plt.close(fig)

    # --- speed.png ---
    fig, ax = plt.subplots(figsize=(8, 4.5))
    tr_speed = [e.get("utt_per_sec_per_chip") for e in train]
    if any(v is not None for v in tr_speed):
        ax.plot(steps, tr_speed, ".", ms=3, label="train window")
    ep_speed = [e.get("utt_per_sec_per_chip") for e in epochs]
    if any(v is not None for v in ep_speed):
        ax.plot(ep_steps, ep_speed, "-o", ms=3,
                label="epoch average (incl. eval)")
    ax.set_xlabel("optimizer step")
    ax.set_ylabel("utt/sec/chip")
    ax.set_ylim(bottom=0)
    ax.legend()
    ax.set_title("throughput")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "speed.png"), dpi=120)
    plt.close(fig)

    print(f"wrote {args.out}/loss.png quality.png speed.png "
          f"({len(train)} train / {len(epochs)} epoch events)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
