import pytest

from gluon_e2e_asr_tpu.eval.metrics import (
    _edit_distance_py,
    cer,
    edit_distance,
    wer,
)


@pytest.mark.parametrize(
    "ref,hyp,dist",
    [
        ("", "", 0),
        ("abc", "abc", 0),
        ("abc", "", 3),
        ("", "abc", 3),
        ("kitten", "sitting", 3),
        ("flaw", "lawn", 2),
    ],
)
def test_edit_distance_cases(ref, hyp, dist):
    assert _edit_distance_py(list(ref), list(hyp)) == dist
    assert edit_distance(list(ref), list(hyp)) == dist


def test_wer_words():
    refs = ["the cat sat", "hello world"]
    hyps = ["the cat sat", "hello word"]
    # 1 substitution over 5 reference words
    assert wer(refs, hyps) == pytest.approx(1 / 5)


def test_cer():
    assert cer(["abc"], ["axc"]) == pytest.approx(1 / 3)


def test_native_matches_python():
    try:
        from gluon_e2e_asr_tpu.utils.native import edit_distance_native, get_lib
    except Exception:
        pytest.skip("native module unavailable")
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    import random

    rng = random.Random(0)
    alphabet = "abcde"
    for _ in range(50):
        r = [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        h = [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        assert edit_distance_native(r, h) == _edit_distance_py(r, h)
