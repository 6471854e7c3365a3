"""tools/plot_metrics.py — offline training-curve reports
[SURVEY.md §2.1 #21]."""

import json
import subprocess
import sys
import os


def test_plot_metrics_writes_pngs(tmp_path):
    lines = []
    for s in range(1, 21):
        lines.append({"event": "train", "step": s, "epoch": s // 10,
                      "loss": 5.0 / s, "loss_ctc": 4.0 / s,
                      "loss_att": 5.5 / s, "att_acc": min(1.0, s / 20),
                      "utt_per_sec_per_chip": 100.0 + s})
        if s % 10 == 0:
            lines.append({"event": "epoch", "epoch": s // 10, "step": s,
                          "dev_wer": 1.0 / s, "dev_cer": 0.5 / s,
                          "utt_per_sec_per_chip": 80.0})
    with open(tmp_path / "metrics.jsonl", "w") as f:
        for rec in lines:
            f.write(json.dumps(rec) + "\n")
        f.write('{"torn json tail')  # live-run torn line must not crash
    out = tmp_path / "plots"
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "plot_metrics.py"),
         str(tmp_path), "--out", str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    for name in ("loss.png", "quality.png", "speed.png"):
        assert (out / name).stat().st_size > 0
