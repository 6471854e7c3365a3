"""Background batch prefetcher (DataLoader.prefetch_epoch): exact parity
with the synchronous path, skip/resume numbering, and failure
propagation [VERDICT.md round-1 item 3 "host prefetch"]."""

import numpy as np
import pytest

from gluon_e2e_asr_tpu.data.loader import DataLoader, EpochPrefetcher
from gluon_e2e_asr_tpu.data.manifest import build_synthetic_manifest
from gluon_e2e_asr_tpu.data.sampler import BucketSampler, make_bucket_specs
from gluon_e2e_asr_tpu.data.tokenizer import CharTokenizer


def _loader(n=24, batch=4):
    utts = build_synthetic_manifest(n, seed=7)
    specs = make_bucket_specs([1.0, 2.0, 4.0], 16000, batch, 64)
    sampler = BucketSampler(utts, specs, 16000, seed=3, shuffle=True)
    return DataLoader(utts, sampler, CharTokenizer())


@pytest.mark.parametrize("depth", [0, 1, 3])
def test_prefetch_matches_synchronous(depth):
    loader = _loader()
    sync = [(i, loader.make_batch(bucket, idxs))
            for i, (bucket, idxs) in enumerate(loader.sampler.epoch_batches(1))]
    pre = loader.prefetch_epoch(1, depth=depth)
    got = list(pre)
    pre.close()
    assert [i for i, _ in got] == [i for i, _ in sync]
    for (_, a), (_, b) in zip(got, sync):
        assert a.bucket == b.bucket
        assert a.utt_ids == b.utt_ids
        np.testing.assert_array_equal(a.audio, b.audio)
        np.testing.assert_array_equal(a.labels, b.labels)


def test_prefetch_skip_preserves_global_numbering():
    loader = _loader()
    total = len(list(loader.sampler.epoch_batches(0)))
    assert total >= 3
    pre = loader.prefetch_epoch(0, skip=2, depth=2)
    got = list(pre)
    pre.close()
    assert [i for i, _ in got] == list(range(2, total))


def test_prefetch_early_close_joins_thread():
    loader = _loader(n=48)
    pre = loader.prefetch_epoch(0, depth=1)
    it = iter(pre)
    next(it)  # consume one batch, abandon the rest mid-epoch
    pre.close()
    assert pre._thread is not None and not pre._thread.is_alive()


def test_prefetch_propagates_worker_exception():
    loader = _loader()
    jobs = [(0, 999, [0])]  # invalid bucket index -> worker raises
    pre = EpochPrefetcher(loader, jobs, depth=2)
    with pytest.raises(Exception):
        list(pre)
    pre.close()
