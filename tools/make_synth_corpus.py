"""Render the synthetic utterance set to an on-disk LibriSpeech-shaped
corpus (.flac or .wav), proving the real-corpus L0 path end to end
[VERDICT.md round-1 item 3].

Layout matches LibriSpeech exactly so ``build_librispeech_manifest``
walks it unchanged::

    <out>/train-clean-100/<spk>/<chap>/<spk>-<chap>-NNNN.flac
    <out>/train-clean-100/<spk>/<chap>/<spk>-<chap>.trans.txt
    <out>/dev-clean/...

FLAC files are written by the pure-Python reference encoder
(tools/flacenc.py) — the same container format LibriSpeech ships — and
decoded at train time by the native C++ decoder. Usage::

    python tools/make_synth_corpus.py --out /tmp/corpus --num-train 960
    python -m gluon_e2e_asr_tpu.train --config configs/milestone1_bilstm_ctc.yaml \
        --workdir /tmp/run --set data.dataset=librispeech \
        --set data.data_dir=/tmp/corpus
"""

from __future__ import annotations

import argparse
import os
import sys
import wave
from multiprocessing import Pool
from typing import List, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flacenc import write_flac  # noqa: E402
from gluon_e2e_asr_tpu.data.manifest import (  # noqa: E402
    build_synthetic_manifest,
    synth_waveform,
)

UTTS_PER_CHAPTER = 25
CHAPTERS_PER_SPEAKER = 4


def _write_one(job: Tuple[str, str, int, str, int]) -> int:
    path, text, seed, fmt, sample_rate = job
    wav = synth_waveform(text, seed, sample_rate)
    pcm = np.clip(np.round(wav * 32767.0), -32768, 32767).astype(np.int64)
    if fmt == "flac":
        write_flac(path, pcm, sample_rate=sample_rate)
    else:
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(pcm.astype("<i2").tobytes())
    return len(pcm)


def render_split(
    out_root: str,
    split: str,
    num_utts: int,
    seed: int,
    fmt: str,
    sample_rate: int,
    workers: int,
    spk_base: int,
) -> int:
    utts = build_synthetic_manifest(num_utts, seed, prefix=split)
    jobs: List[Tuple[str, str, int, str, int]] = []
    trans: dict = {}
    per_spk = UTTS_PER_CHAPTER * CHAPTERS_PER_SPEAKER
    for i, u in enumerate(utts):
        spk = spk_base + i // per_spk
        chap = 1000 + (i % per_spk) // UTTS_PER_CHAPTER
        idx = i % UTTS_PER_CHAPTER
        d = os.path.join(out_root, split, str(spk), str(chap))
        os.makedirs(d, exist_ok=True)
        utt_id = f"{spk}-{chap}-{idx:04d}"
        path = os.path.join(d, f"{utt_id}.{fmt}")
        jobs.append((path, u.text, u.synth_seed, fmt, sample_rate))
        trans.setdefault(os.path.join(d, f"{spk}-{chap}.trans.txt"), []).append(
            f"{utt_id} {u.text.upper()}"
        )
    for tpath, lines in trans.items():
        with open(tpath, "w") as f:
            f.write("\n".join(lines) + "\n")
    if workers > 1:
        with Pool(workers) as pool:
            samples = pool.map(_write_one, jobs, chunksize=8)
    else:
        samples = [_write_one(j) for j in jobs]
    return int(sum(samples))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--out", required=True)
    p.add_argument("--num-train", type=int, default=960)
    p.add_argument("--num-dev", type=int, default=128)
    p.add_argument("--format", choices=["flac", "wav"], default="flac")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--workers", type=int, default=os.cpu_count() or 4)
    args = p.parse_args(argv)

    total = 0
    total += render_split(args.out, "train-clean-100", args.num_train,
                          args.seed, args.format, args.sample_rate,
                          args.workers, spk_base=100)
    total += render_split(args.out, "dev-clean", args.num_dev,
                          args.seed + 1, args.format, args.sample_rate,
                          args.workers, spk_base=900)
    hours = total / args.sample_rate / 3600.0
    print(f"wrote {args.num_train}+{args.num_dev} utts "
          f"({hours:.2f} h of audio) to {args.out} as .{args.format}")


if __name__ == "__main__":
    main()
