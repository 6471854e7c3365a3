"""WER/CER scoring via Levenshtein edit distance.

Reference-side realization: Python edit distance or an sclite shellout
[SURVEY.md §2.1 #19, INFERRED-med]. New-repo realization: a native C++
edit-distance core (``native/edit_distance.cpp``, ctypes) for corpus
scoring throughput, with a pure-Python fallback; both are parity-tested
[SURVEY.md §4 "Unit: tokenizer/WER"].
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


def _edit_distance_py(ref: Sequence, hyp: Sequence) -> int:
    """Classic O(|ref|*|hyp|) Levenshtein distance, two-row DP."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = list(range(m + 1))
    cur = [0] * (m + 1)
    for i in range(1, n + 1):
        cur[0] = i
        ri = ref[i - 1]
        for j in range(1, m + 1):
            cost = 0 if ri == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev, cur = cur, prev
    return prev[m]


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance between two sequences (tokens or chars)."""
    try:
        from gluon_e2e_asr_tpu.utils.native import edit_distance_native

        if all(isinstance(x, str) for x in ref) and all(
            isinstance(x, str) for x in hyp
        ):
            return edit_distance_native(list(ref), list(hyp))
    except Exception:
        pass
    return _edit_distance_py(list(ref), list(hyp))


def wer(refs: List[str], hyps: List[str]) -> float:
    """Word error rate over a corpus: sum(edits) / sum(ref words)."""
    assert len(refs) == len(hyps)
    edits, total = 0, 0
    for r, h in zip(refs, hyps):
        rw, hw = r.split(), h.split()
        edits += edit_distance(rw, hw)
        total += len(rw)
    return edits / max(total, 1)


def cer(refs: List[str], hyps: List[str]) -> float:
    """Character error rate over a corpus (spaces included)."""
    assert len(refs) == len(hyps)
    edits, total = 0, 0
    for r, h in zip(refs, hyps):
        edits += edit_distance(list(r), list(h))
        total += len(r)
    return edits / max(total, 1)
