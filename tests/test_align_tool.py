"""tools/align.py — CTC forced-alignment CLI over the dev split."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(REPO, "tests", "goldens")

spec = importlib.util.spec_from_file_location(
    "align_tool", os.path.join(REPO, "tools", "align.py"))
align_tool = importlib.util.module_from_spec(spec)
spec.loader.exec_module(align_tool)


def test_align_cli_emits_monotone_spans(tmp_path):
    out = tmp_path / "align.jsonl"
    ctm = tmp_path / "align.ctm"
    rc = align_tool.main([
        "--config", os.path.join(GOLD, "tiny_golden.yaml"),
        "--ckpt", os.path.join(GOLD, "tiny_golden.msgpack"),
        "--output", str(out),
        "--ctm", str(ctm),
        "--num", "4",
    ])
    assert rc == 0
    recs = [json.loads(line) for line in open(out)]
    assert len(recs) == 4
    for r in recs:
        assert len(r["tokens"]) == len(r["text"])
        last_end = 0.0
        for t in r["tokens"]:
            if t["start_s"] is None:
                continue  # token absorbed by a skip transition
            # spans are ordered and non-overlapping (CTC lattice is
            # monotone) and positive-length
            assert t["start_s"] >= last_end - 1e-9
            assert t["end_s"] > t["start_s"]
            last_end = t["end_s"]
        assert r["score"] > -1e20  # feasible alignment found
    # CTM: 5 fields per line, durations positive, utts covered
    ctm_lines = [l.split() for l in open(ctm)]
    assert ctm_lines and all(len(f) == 5 for f in ctm_lines)
    assert {f[0] for f in ctm_lines} <= {r["utt_id"] for r in recs}
    assert all(float(f[3]) > 0 for f in ctm_lines)
