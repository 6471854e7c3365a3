"""English-text synthetic fixture [VERDICT.md round-2 item 1].

Pins: pool loads and is alphabet-clean; english manifests are
deterministic, length-bounded, and draw contiguous word windows that
actually occur in the pool (real n-gram structure, not shuffled bags);
the random mode is bit-identical to its pre-knob output.
"""

import numpy as np

from gluon_e2e_asr_tpu.data.manifest import (
    build_synthetic_manifest,
    english_pool,
    english_pool_split,
    _sample_english_fragment,
)
from gluon_e2e_asr_tpu.data.tokenizer import DEFAULT_ALPHABET


def test_pool_loads_and_is_alphabet_clean():
    pool = english_pool()
    assert len(pool) > 1000
    allowed = set(DEFAULT_ALPHABET)
    for line in pool[:200] + pool[-200:]:
        assert set(line) <= allowed, line
        assert "  " not in line and line == line.strip()


def test_english_manifest_deterministic_and_bounded():
    a = build_synthetic_manifest(64, 7, 8, 26, text_mode="english")
    b = build_synthetic_manifest(64, 7, 8, 26, text_mode="english")
    assert [u.text for u in a] == [u.text for u in b]
    for u in a:
        assert 8 <= len(u.text) <= 26, u.text
        assert u.duration > 0
    # Different seeds give different draws.
    c = build_synthetic_manifest(64, 8, 8, 26, text_mode="english")
    assert [u.text for u in a] != [u.text for u in c]


def test_english_fragments_are_contiguous_pool_windows():
    pool = english_pool()
    utts = build_synthetic_manifest(32, 3, 10, 30, text_mode="english")
    for u in utts:
        assert any(u.text in line for line in pool), u.text


def test_english_has_word_structure_random_does_not():
    eng = build_synthetic_manifest(128, 1, 10, 30, text_mode="english")
    rnd = build_synthetic_manifest(128, 1, 10, 30, text_mode="random")
    def vocab(utts):
        words = [w for u in utts for w in u.text.split()]
        return len(set(words)) / max(len(words), 1)
    # English reuses words heavily (type/token ratio well below 1);
    # uniform character draws essentially never repeat a "word".
    assert vocab(eng) < 0.6
    assert vocab(rnd) > 0.9


def test_random_mode_unchanged_by_the_knob():
    # The default path must remain bit-identical so every existing
    # golden/config is unaffected.
    a = build_synthetic_manifest(16, 1234, 3, 12)
    b = build_synthetic_manifest(16, 1234, 3, 12, text_mode="random")
    assert [u.text for u in a] == [u.text for u in b]


def test_degenerate_bounds_never_fail():
    rng = np.random.RandomState(0)
    frag = _sample_english_fragment(rng, 1, 2)
    assert 1 <= len(frag) <= 2


# --- round-4 sentence-disjoint split [VERDICT.md round-3 weak #1] ---


def test_pool_split_is_a_disjoint_partition():
    tr, dv = english_pool_split("train"), english_pool_split("dev")
    pool = english_pool()
    assert not set(tr) & set(dv)
    assert sorted(tr + dv) == sorted(pool)
    # Roughly the intended 80/20 with headroom for containment pulls.
    assert 0.15 < len(dv) / len(pool) < 0.30
    # Containment closure: no cross-side substring relation survives.
    for a in dv:
        for b in tr:
            assert a not in b and b not in a


def test_pool_split_deterministic():
    assert english_pool_split("train") == english_pool_split("train")
    assert english_pool_split("dev") == english_pool_split("dev")


def test_split_manifests_have_zero_window_leakage():
    # The english_m5 shapes: dev windows must never occur (verbatim OR
    # as a substring) in the train-side text — the round-4 fixture rule.
    train = build_synthetic_manifest(
        128, 1234, 8, 26, text_mode="english", split="train")
    dev = build_synthetic_manifest(
        64, 1235, 8, 26, text_mode="english", split="dev")
    train_pool_blob = "\n".join(english_pool_split("train"))
    train_blob = "\n".join(u.text for u in train)
    for u in dev:
        assert u.text not in train_pool_blob, u.text
        assert u.text not in train_blob, u.text
    # Train windows still come from the train side; dev from the dev side.
    dev_blob = "\n".join(english_pool_split("dev"))
    for u in train:
        assert u.text in train_pool_blob
    for u in dev:
        assert u.text in dev_blob


def test_split_all_unchanged():
    # split="all" must remain bit-identical to the round-3 fixture so
    # the superseded numbers stay reproducible.
    a = build_synthetic_manifest(32, 7, 8, 26, text_mode="english")
    b = build_synthetic_manifest(32, 7, 8, 26, text_mode="english",
                                 split="all")
    assert [u.text for u in a] == [u.text for u in b]
