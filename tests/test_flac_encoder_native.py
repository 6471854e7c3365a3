"""Native C++ FLAC encoder (asr_native.cpp::encode_flac_i16)
[VERDICT.md round-2 item 3's corpus-writer hot path].

Pins: exact PCM roundtrip through the native decoder across signal
shapes (including fixed-predictor edge cases), STREAMINFO agreement,
and byte-level decode parity against the pure-Python coverage encoder
(tools/flacenc.py) on the same PCM.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from gluon_e2e_asr_tpu.utils.native import (  # noqa: E402
    decode_flac,
    encode_flac,
    probe_flac,
)


def _roundtrip(tmp_path, pcm, rate=16000):
    p = str(tmp_path / "x.flac")
    encode_flac(p, pcm.astype(np.int16), rate)
    got_rate, frames = probe_flac(p)
    assert got_rate == rate
    assert frames == len(pcm)
    dec = decode_flac(p, expect_rate=rate)
    back = np.round(np.asarray(dec, np.float64) * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(back, pcm.astype(np.int64))


@pytest.mark.parametrize("name,pcm", [
    ("tone", (np.sin(np.arange(48000) * 0.07) * 18000)),
    ("noise", np.random.RandomState(7).randint(-32768, 32768, 30001)),
    ("constant", np.full(9000, -123)),
    ("silence", np.zeros(5000)),
    ("ramp", np.arange(-16000, 16000, 2)),
    ("extremes", np.tile([-32768, 32767], 3000)),
    ("tiny", np.array([1, -2, 3])),
    ("one", np.array([42])),
    ("block_edge", np.random.RandomState(1).randint(-100, 100, 4096)),
    ("block_edge_p1", np.random.RandomState(2).randint(-100, 100, 4097)),
])
def test_native_encode_roundtrip_exact(tmp_path, name, pcm):
    _roundtrip(tmp_path, np.asarray(pcm, np.int64).astype(np.int16))


def test_native_encode_empty(tmp_path):
    _roundtrip(tmp_path, np.zeros(0, np.int16))


def test_native_matches_python_encoder_decode(tmp_path):
    """Both encoders must decode to identical PCM (bitstreams differ —
    the native encoder picks its own predictors — but the decoded
    signal is the contract)."""
    from flacenc import write_flac

    rng = np.random.RandomState(3)
    pcm = (np.cumsum(rng.randn(20000)) * 100).astype(np.int16)
    p_native = str(tmp_path / "n.flac")
    p_python = str(tmp_path / "p.flac")
    encode_flac(p_native, pcm)
    write_flac(p_python, pcm.astype(np.int64))
    a = np.asarray(decode_flac(p_native))
    b = np.asarray(decode_flac(p_python))
    np.testing.assert_array_equal(a, b)


def test_native_encoder_compresses_tones(tmp_path):
    """A fixture-like tone must compress well below raw PCM size."""
    import os

    pcm = (np.sin(np.arange(16000 * 4) * 0.05) * 15000).astype(np.int16)
    p = str(tmp_path / "t.flac")
    encode_flac(p, pcm)
    assert os.path.getsize(p) < 0.5 * pcm.nbytes


def test_fuzz_random_walk_roundtrips(tmp_path):
    rng = np.random.RandomState(11)
    for trial in range(10):
        n = int(rng.randint(1, 20000))
        scale = float(rng.choice([1, 30, 3000, 30000]))
        pcm = np.clip(np.cumsum(rng.randn(n)) * scale,
                      -32768, 32767).astype(np.int16)
        _roundtrip(tmp_path, pcm)


def test_bad_args_rejected(tmp_path):
    with pytest.raises(ValueError):
        encode_flac(str(tmp_path / "b.flac"), np.zeros(4, np.int16),
                    sample_rate=-1)
    with pytest.raises(ValueError):
        encode_flac("/nonexistent_dir_xyz/b.flac", np.zeros(4, np.int16))
