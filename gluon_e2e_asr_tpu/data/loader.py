"""Host-side batch assembly: pad to bucket shape, feed to device.

Reference-side realization: Gluon ``DataLoader`` + bucketing sampler,
with MXNet's C++ engine doing the packing [SURVEY.md §1 L0,
INFERRED-high]. New-repo realization: a Python loader whose hot path —
padding/packing waveforms and labels into static bucket-shaped arrays —
is implemented in native C++ (``gluon_e2e_asr_tpu/native/asr_native.cpp``, loaded via
ctypes) with a NumPy fallback [SURVEY.md §2.2]. For on-disk wav
corpora the entire read+decode+pack runs in C++ worker threads
(``load_pack_wav_batch``).

Every batch is padded to the bucket's static (batch, samples, labels)
shape so each bucket compiles exactly one XLA program
[BASELINE.json:L5 "bucketed padding"].
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

_LOG = logging.getLogger(__name__)

# After this many consecutive native-path failures, stop retrying the C++
# fused loader for the rest of the process (a systematic error — e.g. an
# unsupported subformat — would otherwise silently retry every batch).
_NATIVE_WAV_MAX_FAILURES = 3

from gluon_e2e_asr_tpu.data.manifest import Utterance, load_audio
from gluon_e2e_asr_tpu.data.sampler import BucketSampler, BucketSpec
from gluon_e2e_asr_tpu.data.tokenizer import CharTokenizer


@dataclass
class Batch:
    """One padded bucket batch. All arrays are host numpy; the jitted step
    consumes them directly (JAX stages host->HBM)."""

    audio: np.ndarray  # [B, S] float32
    audio_len: np.ndarray  # [B] int32 (0 for pad rows)
    labels: np.ndarray  # [B, L] int32, padded with blank(0)
    label_len: np.ndarray  # [B] int32
    utt_ids: List[str]
    bucket: int

    @property
    def num_real(self) -> int:
        return int((self.audio_len > 0).sum())


def _pack_python(
    waves: Sequence[np.ndarray], max_samples: int, batch_size: int
) -> tuple:
    audio = np.zeros((batch_size, max_samples), np.float32)
    lens = np.zeros((batch_size,), np.int32)
    for i, w in enumerate(waves):
        n = min(len(w), max_samples)
        audio[i, :n] = w[:n]
        lens[i] = n
    return audio, lens


def _get_native_packer():
    try:
        from gluon_e2e_asr_tpu.utils.native import pack_waves

        return pack_waves
    except Exception:
        return None


def _get_native_wav_loader():
    try:
        from gluon_e2e_asr_tpu.utils.native import load_pack_audio_batch

        return load_pack_audio_batch
    except Exception:
        return None


def _get_native_wav_loader_i16():
    try:
        from gluon_e2e_asr_tpu.utils.native import load_pack_audio_batch_i16

        return load_pack_audio_batch_i16
    except Exception:
        return None


def _quantize_i16(audio_f32: np.ndarray) -> np.ndarray:
    """round(x*32768) clipped to int16 — the exact inverse of the audio
    decoders' /32768 for 16-bit sources, so int16 transfer reconstructs
    the float32 pipeline bitwise on-device [data.transfer_dtype]."""
    q = np.rint(audio_f32 * 32768.0)
    return np.clip(q, -32768, 32767).astype(np.int16)


class DataLoader:
    """Iterates (epoch) -> padded Batch objects in sampler order."""

    def __init__(
        self,
        utts: Sequence[Utterance],
        sampler: BucketSampler,
        tokenizer: CharTokenizer,
        sample_rate: int = 16000,
        use_native: bool = True,
        speed_perturb: Sequence[float] = (),
        perturb_seed: int = 0,
        transfer_dtype: str = "float32",
    ):
        # PCM16 device-transfer mode [data.transfer_dtype]: batches ship
        # audio as int16 and the frontend reconstructs f32 on device
        # (* 2^-15). Halves host->device bytes — audio IS 16-bit on disk
        # and only needs to become f32 on the chip. Found necessary at
        # the 100 h rehearsal: this box's device plugin retains every
        # H2D staging buffer (~measured 1:1 with payload), so bytes on
        # the wire are also resident-host-memory per step.
        if transfer_dtype not in ("float32", "int16"):
            raise ValueError(
                f"data.transfer_dtype must be float32|int16, "
                f"got {transfer_dtype!r}")
        self._i16 = transfer_dtype == "int16"
        self.utts = list(utts)
        self.sampler = sampler
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        # On-the-fly speed perturbation (train loaders only; the factor
        # draw is deterministic in (perturb_seed, epoch, utterance) so
        # mid-epoch resume replays identical batches). The paired sampler
        # must be built with duration_scale = 1/min(factors) so stretched
        # audio still fits its bucket (sampler.py).
        self.speed_perturb = tuple(float(f) for f in speed_perturb)
        if any(f <= 0 for f in self.speed_perturb):
            raise ValueError(
                f"speed_perturb factors must be > 0: {self.speed_perturb}")
        self.perturb_seed = perturb_seed
        self._native = _get_native_packer() if use_native else None
        self._native_wav = (
            (_get_native_wav_loader_i16() if self._i16
             else _get_native_wav_loader()) if use_native else None)
        self._native_wav_failures = 0
        # Synthetic audio is cheap; cache decoded waveforms for reuse across
        # epochs (they are small: seconds of float32). Touched by at most
        # one thread at a time: batches are assembled either synchronously
        # or by the single EpochPrefetcher producer thread, and the trainer
        # closes (joins) each epoch's prefetcher before starting the next
        # [VERDICT r1 weak 8].
        self._wave_cache: Dict[int, np.ndarray] = {}

    def _wave(self, idx: int) -> np.ndarray:
        w = self._wave_cache.get(idx)
        if w is None:
            w = load_audio(self.utts[idx], self.sample_rate)
            self._wave_cache[idx] = w
        return w

    def epoch(self, epoch: int) -> Iterator[Batch]:
        for bucket, idxs in self.sampler.epoch_batches(epoch):
            yield self.make_batch(bucket, idxs, epoch=epoch)

    def prefetch_epoch(self, epoch: int, skip: int = 0,
                       depth: int = 2) -> "EpochPrefetcher":
        """Iterate ``(batch_idx, Batch)`` with background batch assembly.

        ``batch_idx`` numbers ALL sampler batches of the epoch (skipped
        ones included) so mid-epoch checkpoint/resume positions stay
        consistent with the synchronous path. ``depth=0`` degrades to
        synchronous assembly behind the same interface.
        """
        jobs = [
            (i, bucket, idxs)
            for i, (bucket, idxs) in enumerate(self.sampler.epoch_batches(epoch))
            if i >= skip
        ]
        return EpochPrefetcher(self, jobs, depth, epoch=epoch)


    def _perturb_factor(self, epoch: int, utt_idx: int) -> float:
        """Deterministic per-(epoch, utterance) speed factor draw —
        the SAME function the sampler's realized placement uses
        (sampler.perturb_factor), so the bucket an utterance lands in
        always matches the duration the loader produces for it."""
        from gluon_e2e_asr_tpu.data.sampler import perturb_factor

        return perturb_factor(self.perturb_seed, epoch, utt_idx,
                              self.speed_perturb)

    def _apply_speed_perturb(self, audio: np.ndarray, audio_len: np.ndarray,
                             idxs: Sequence[int], epoch: int,
                             max_samples: int) -> None:
        """Resample each packed row in place by its drawn factor.

        Factor f plays the utterance f× faster: output sample t takes the
        input's value at position t*f (linear interpolation), so duration
        scales by 1/f and pitch/tempo by f — the same transform as the
        classic offline sox-speed 0.9/1.0/1.1 corpus tripling, drawn
        fresh per epoch instead of fixed per copy.
        """
        i16 = audio.dtype == np.int16
        for row, i in enumerate(idxs):
            f = self._perturb_factor(epoch, i)
            n = int(audio_len[row])
            if f == 1.0 or n <= 1:
                continue
            new_n = min(int(round(n / f)), max_samples)
            pos = np.arange(new_n, dtype=np.float64) * f
            src = (audio[row, :n].astype(np.float64) / 32768.0
                   if i16 else audio[row, :n])
            w = np.interp(pos, np.arange(n, dtype=np.float64),
                          src).astype(np.float32)
            if i16:
                # Re-quantize the interpolated row (plain float assignment
                # into an int16 array would C-TRUNCATE, not round). The
                # added error is <= 0.5/32768 — 3 orders below the
                # recipe's own augmentation noise; eval/decode never
                # perturbs, so the exact-reconstruction contract holds
                # everywhere quality is measured.
                audio[row, :new_n] = _quantize_i16(w)
            else:
                audio[row, :new_n] = w
            if new_n < n:
                audio[row, new_n:n] = 0
            audio_len[row] = new_n

    def make_batch(self, bucket: int, idxs: Sequence[int],
                   epoch: Optional[int] = None) -> Batch:
        spec: BucketSpec = self.sampler.specs[bucket]
        # Realized bucket placement (sampler) admits an utterance whose
        # RAW length exceeds the bucket cap as long as its perturbed
        # length fits (f > 1 plays it faster). Pack into a buffer wide
        # enough for the largest such raw length so the resample sees
        # the whole waveform — packing straight into [bs, cap] would
        # silently truncate the tail BEFORE the speedup shrinks it.
        pack_cap = spec.max_samples
        perturbing = bool(self.speed_perturb) and epoch is not None
        if perturbing and max(self.speed_perturb) > 1.0:
            pack_cap = int(np.ceil(spec.max_samples
                                   * max(self.speed_perturb)))
        audio = audio_len = None
        # Real-corpus hot path: every utterance is an on-disk wav/flac ->
        # the native library reads, decodes, downmixes, and packs the whole
        # bucket batch in C++ worker threads with zero per-sample Python
        # (the OS page cache serves repeat epochs) [docs/ROADMAP.md #10].
        if self._native_wav is not None and idxs and all(
            self.utts[i].synth_seed < 0
            and self.utts[i].audio_path.endswith((".wav", ".flac"))
            for i in idxs
        ):
            try:
                audio, audio_len = self._native_wav(
                    [self.utts[i].audio_path for i in idxs],
                    self.sample_rate, pack_cap, spec.batch_size,
                )
                self._native_wav_failures = 0
            except Exception as e:
                audio = audio_len = None  # fall through to Python decode
                self._native_wav_failures += 1
                if self._native_wav_failures == 1:
                    _LOG.warning(
                        "native fused wav loader failed (falling back to "
                        "per-sample Python decode — a large slowdown on a "
                        "real corpus): %s", e)
                if self._native_wav_failures >= _NATIVE_WAV_MAX_FAILURES:
                    _LOG.warning(
                        "native fused wav loader failed %d consecutive "
                        "batches; disabling it for this process",
                        self._native_wav_failures)
                    self._native_wav = None
        if audio is None:
            waves = [self._wave(i) for i in idxs]
            if self._native is not None:
                audio, audio_len = self._native(
                    waves, pack_cap, spec.batch_size)
            else:
                audio, audio_len = _pack_python(
                    waves, pack_cap, spec.batch_size)
            if self._i16:
                audio = _quantize_i16(audio)
        if perturbing:
            self._apply_speed_perturb(
                audio, audio_len, idxs, epoch, spec.max_samples)
        if pack_cap != spec.max_samples:
            # Post-perturb every valid length fits the bucket cap
            # (placement guarantees it; _apply_speed_perturb clamps the
            # <=2-sample manifest-rounding slack); drop the staging tail.
            audio = np.ascontiguousarray(audio[:, : spec.max_samples])
            np.minimum(audio_len, spec.max_samples, out=audio_len)
        labels = np.zeros((spec.batch_size, spec.max_labels), np.int32)
        label_len = np.zeros((spec.batch_size,), np.int32)
        utt_ids = []
        for row, i in enumerate(idxs):
            ids = self.tokenizer.encode(self.utts[i].text)[: spec.max_labels]
            labels[row, : len(ids)] = ids
            label_len[row] = len(ids)
            utt_ids.append(self.utts[i].utt_id)
        return Batch(
            audio=audio,
            audio_len=audio_len,
            labels=labels,
            label_len=label_len,
            utt_ids=utt_ids,
            bucket=bucket,
        )

class EpochPrefetcher:
    """One epoch's batches, assembled ``depth`` ahead in a daemon thread.

    Overlaps host-side read+decode+pack (C++ worker threads release the
    GIL inside the native loader) with the device step, removing the
    synchronous batch-build stall of [VERDICT.md round-1 "What's missing"
    item 4]. ``close()`` is idempotent and must be called when abandoning
    the iterator mid-epoch (the trainer's max_steps break).
    """

    _DONE = object()

    def __init__(self, loader: "DataLoader",
                 jobs: Sequence[Tuple[int, int, Sequence[int]]],
                 depth: int = 2, epoch: Optional[int] = None):
        self._loader = loader
        self._jobs = list(jobs)
        self._epoch = epoch
        self._depth = depth
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # Occupancy accounting: time the CONSUMER spent blocked waiting
        # for a batch. occupancy = 1 - consumer_wait_s / epoch_time is
        # how well host batch assembly hides behind the device step
        # (the rehearsal metric, VERDICT.md round-2 item 3).
        self.consumer_wait_s = 0.0
        self.batches = 0
        if depth > 0:
            self._q: queue.Queue = queue.Queue(maxsize=depth)
            self._thread = threading.Thread(
                target=self._run, name="batch-prefetch", daemon=True)
            self._thread.start()

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _run(self) -> None:
        try:
            for idx, bucket, idxs in self._jobs:
                if self._stop.is_set():
                    return
                b = self._loader.make_batch(bucket, idxs, epoch=self._epoch)
                if not self._put((idx, b)):
                    return
            self._put(self._DONE)
        except BaseException as e:  # propagate to the consumer thread
            self._put(e)

    def __iter__(self) -> Iterator[Tuple[int, Batch]]:
        if self._thread is None:  # synchronous fallback
            for idx, bucket, idxs in self._jobs:
                t0 = time.perf_counter()
                b = self._loader.make_batch(bucket, idxs, epoch=self._epoch)
                self.consumer_wait_s += time.perf_counter() - t0
                self.batches += 1
                yield idx, b
            return
        while True:
            t0 = time.perf_counter()
            item = self._q.get()
            self.consumer_wait_s += time.perf_counter() - t0
            if item is self._DONE:
                return
            if isinstance(item, BaseException):
                raise item
            self.batches += 1
            yield item

    def close(self) -> None:
        self._stop.set()
        if self._thread is not None:
            # Unblock a producer waiting on a full queue, then join.
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=30.0)
            if self._thread.is_alive():
                # A producer stuck inside a long make_batch (e.g. a large
                # cold-cache native decode) outlived the join: it may still
                # touch the loader's caches concurrently with whatever the
                # caller does next — surface that instead of hiding it.
                _LOG.warning(
                    "batch-prefetch thread did not exit within 30s of "
                    "close(); it is still assembling a batch and shares "
                    "the loader with the caller until it finishes")
