"""Bootstrap WER/CER CI tool [VERDICT r1 item 5]: point estimates match
eval.metrics exactly; intervals bracket the point and shrink with N."""

import importlib.util
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "wer_ci", os.path.join(REPO, "tools", "wer_ci.py")
)
wer_ci = importlib.util.module_from_spec(spec)
spec.loader.exec_module(wer_ci)

from gluon_e2e_asr_tpu.eval.metrics import cer, wer


def _write(path, pairs):
    with open(path, "w") as f:
        for i, (ref, hyp) in enumerate(pairs):
            f.write(json.dumps({"utt_id": f"u{i}", "ref": ref,
                                "hyp": hyp, "score": 0.0}) + "\n")


def test_point_estimates_match_metrics(tmp_path):
    pairs = [("a b c", "a b c"), ("d e", "d x"), ("f g h i", "f g")]
    path = str(tmp_path / "d.jsonl")
    _write(path, pairs)
    c = wer_ci.per_utt_counts(path)
    w, lw, hw, ce, lc, hc = wer_ci.bootstrap_ci(c, iters=2000)
    refs = [r for r, _ in pairs]
    hyps = [h for _, h in pairs]
    assert abs(w - wer(refs, hyps)) < 1e-12
    assert abs(ce - cer(refs, hyps)) < 1e-12
    assert lw <= w <= hw and lc <= ce <= hc


def test_interval_shrinks_with_n(tmp_path):
    rng = np.random.default_rng(0)

    def corpus(n):
        pairs = []
        for _ in range(n):
            # ~20% word error rate
            pairs.append(("w x y z v", "w x y z v"
                          if rng.random() > 0.5 else "w x y z q"))
        return pairs

    small = str(tmp_path / "small.jsonl")
    big = str(tmp_path / "big.jsonl")
    _write(small, corpus(16))
    _write(big, corpus(256))
    _, lw_s, hw_s, *_ = wer_ci.bootstrap_ci(
        wer_ci.per_utt_counts(small), iters=3000)
    _, lw_b, hw_b, *_ = wer_ci.bootstrap_ci(
        wer_ci.per_utt_counts(big), iters=3000)
    assert (hw_b - lw_b) < (hw_s - lw_s)
