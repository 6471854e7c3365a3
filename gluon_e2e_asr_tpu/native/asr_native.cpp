// Native host-path components for the TPU ASR framework.
//
// Reference-side counterpart: MXNet's C++ engine does the data-loader
// packing and metric hot loops under the Gluon Python API
// [SURVEY.md §2.2]. The TPU compute path is JAX/XLA/Pallas; this
// library covers the *host* hot paths around it:
//   * pack_waves      — pad/pack variable-length waveforms into the
//                       static bucket-shaped batch arrays the jitted
//                       step consumes [BASELINE.json:L5 "bucketed padding"]
//   * edit_distance   — Levenshtein DP for corpus WER/CER scoring
//                       [SURVEY.md §2.1 #19]
//   * decode_wav_f32 / load_pack_wav_batch — RIFF/WAV reader (PCM16 +
//                       IEEE float32, mono downmix) and a fused
//                       multi-threaded read+decode+pack that fills a
//                       bucket-shaped batch straight from disk, so the
//                       real-corpus data path has no per-sample Python
//                       [SURVEY.md §2.1 #1; docs/ROADMAP.md #10]
//
// Built as a shared library with g++ (no Rust in this image); loaded
// from Python via ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Pack n variable-length float32 waveforms into out_audio[batch, max_samples]
// (zero padded) and write per-row sample counts into out_lens[batch].
// Rows n..batch-1 are zeroed with length 0 (pad rows for static shapes).
void pack_waves(const float** waves, const int32_t* lens, int32_t n,
                int32_t max_samples, int32_t batch, float* out_audio,
                int32_t* out_lens) {
  std::memset(out_audio, 0,
              sizeof(float) * static_cast<size_t>(batch) * max_samples);
  std::memset(out_lens, 0, sizeof(int32_t) * batch);
  const int32_t rows = std::min(n, batch);
  for (int32_t i = 0; i < rows; ++i) {
    const int32_t m = std::min(lens[i], max_samples);
    std::memcpy(out_audio + static_cast<size_t>(i) * max_samples, waves[i],
                sizeof(float) * m);
    out_lens[i] = m;
  }
}

// Pack int32 label id sequences into out[batch, max_labels] with pad_id fill.
void pack_labels(const int32_t** seqs, const int32_t* lens, int32_t n,
                 int32_t max_labels, int32_t batch, int32_t pad_id,
                 int32_t* out_labels, int32_t* out_lens) {
  for (int64_t i = 0; i < static_cast<int64_t>(batch) * max_labels; ++i)
    out_labels[i] = pad_id;
  std::memset(out_lens, 0, sizeof(int32_t) * batch);
  const int32_t rows = std::min(n, batch);
  for (int32_t i = 0; i < rows; ++i) {
    const int32_t m = std::min(lens[i], max_labels);
    std::memcpy(out_labels + static_cast<size_t>(i) * max_labels, seqs[i],
                sizeof(int32_t) * m);
    out_lens[i] = m;
  }
}

// Levenshtein distance between two int32 token sequences (two-row DP).
int32_t edit_distance_i32(const int32_t* ref, int32_t n, const int32_t* hyp,
                          int32_t m) {
  if (n == 0) return m;
  if (m == 0) return n;
  std::vector<int32_t> prev(m + 1), cur(m + 1);
  for (int32_t j = 0; j <= m; ++j) prev[j] = j;
  for (int32_t i = 1; i <= n; ++i) {
    cur[0] = i;
    const int32_t ri = ref[i - 1];
    for (int32_t j = 1; j <= m; ++j) {
      const int32_t cost = (ri == hyp[j - 1]) ? 0 : 1;
      cur[j] = std::min(std::min(prev[j] + 1, cur[j - 1] + 1),
                        prev[j - 1] + cost);
    }
    std::swap(prev, cur);
  }
  return prev[m];
}

// Batched edit distance: sequences are concatenated; offsets give starts.
// Writes per-pair distances into out[npairs].
void edit_distance_batch(const int32_t* refs, const int32_t* ref_off,
                         const int32_t* hyps, const int32_t* hyp_off,
                         int32_t npairs, int32_t* out) {
  for (int32_t p = 0; p < npairs; ++p) {
    const int32_t rn = ref_off[p + 1] - ref_off[p];
    const int32_t hn = hyp_off[p + 1] - hyp_off[p];
    out[p] = edit_distance_i32(refs + ref_off[p], rn, hyps + hyp_off[p], hn);
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// WAV decoding
// ---------------------------------------------------------------------------

namespace {

struct WavInfo {
  uint16_t format = 0;    // 1 = PCM, 3 = IEEE float, 0xFFFE = extensible
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  long data_off = -1;     // file offset of PCM payload
  uint32_t data_bytes = 0;
};

bool read_exact(FILE* f, void* dst, size_t n) {
  return std::fread(dst, 1, n, f) == n;
}

// Walk the RIFF chunk list; fill info. Returns false on malformed input.
bool parse_wav_header(FILE* f, WavInfo* info) {
  char tag[4];
  uint32_t riff_size = 0;
  if (!read_exact(f, tag, 4) || std::memcmp(tag, "RIFF", 4) != 0) return false;
  if (!read_exact(f, &riff_size, 4)) return false;
  if (!read_exact(f, tag, 4) || std::memcmp(tag, "WAVE", 4) != 0) return false;
  while (read_exact(f, tag, 4)) {
    uint32_t chunk = 0;
    if (!read_exact(f, &chunk, 4)) return false;
    if (std::memcmp(tag, "fmt ", 4) == 0) {
      unsigned char buf[40];
      const uint32_t take = chunk < sizeof(buf) ? chunk : sizeof(buf);
      if (take < 16 || !read_exact(f, buf, take)) return false;
      // Skip any fmt bytes beyond the buffer, plus the word-alignment pad
      // byte an odd-sized fmt chunk carries (nonstandard but legal RIFF).
      const long skip = static_cast<long>(chunk - take) + (chunk & 1);
      if (skip > 0 && std::fseek(f, skip, SEEK_CUR) != 0) return false;
      info->format = static_cast<uint16_t>(buf[0] | buf[1] << 8);
      info->channels = static_cast<uint16_t>(buf[2] | buf[3] << 8);
      std::memcpy(&info->sample_rate, buf + 4, 4);
      info->bits = static_cast<uint16_t>(buf[14] | buf[15] << 8);
      if (info->format == 0xFFFE && chunk >= 40) {
        // WAVE_FORMAT_EXTENSIBLE: the real format is the GUID's first u16.
        info->format = static_cast<uint16_t>(buf[24] | buf[25] << 8);
      }
    } else if (std::memcmp(tag, "data", 4) == 0) {
      info->data_off = std::ftell(f);
      info->data_bytes = chunk;
      return info->format != 0 && info->data_off >= 0;
    } else {
      // Chunks are word-aligned; odd sizes carry a pad byte.
      if (std::fseek(f, chunk + (chunk & 1), SEEK_CUR) != 0) return false;
    }
  }
  return false;
}

// Decode up to max_samples mono frames into out. Returns frames written,
// or a negative error: -1 open, -2 malformed/unsupported, -3 rate mismatch.
int32_t decode_wav_impl(const char* path, int32_t expect_rate, float* out,
                        int32_t max_samples) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_wav_header(f, &info) || info.channels == 0) {
    std::fclose(f);
    return -2;
  }
  if (expect_rate > 0 &&
      info.sample_rate != static_cast<uint32_t>(expect_rate)) {
    std::fclose(f);
    return -3;
  }
  const bool pcm16 = info.format == 1 && info.bits == 16;
  const bool f32 = info.format == 3 && info.bits == 32;
  if (!pcm16 && !f32) {
    std::fclose(f);
    return -2;
  }
  const uint32_t bytes_per_frame =
      info.channels * (pcm16 ? 2u : 4u);
  uint32_t frames = info.data_bytes / bytes_per_frame;
  if (static_cast<int64_t>(frames) > max_samples)
    frames = static_cast<uint32_t>(max_samples);
  if (std::fseek(f, info.data_off, SEEK_SET) != 0) {
    std::fclose(f);
    return -2;
  }
  const uint32_t C = info.channels;
  std::vector<unsigned char> raw(static_cast<size_t>(frames) *
                                 bytes_per_frame);
  if (!read_exact(f, raw.data(), raw.size())) {
    std::fclose(f);
    return -2;
  }
  std::fclose(f);
  if (pcm16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(raw.data());
    if (C == 1) {
      for (uint32_t i = 0; i < frames; ++i) out[i] = s[i] / 32768.0f;
    } else {
      for (uint32_t i = 0; i < frames; ++i) {
        int32_t acc = 0;
        for (uint32_t c = 0; c < C; ++c) acc += s[i * C + c];
        out[i] = (acc / static_cast<float>(C)) / 32768.0f;
      }
    }
  } else {
    const float* s = reinterpret_cast<const float*>(raw.data());
    if (C == 1) {
      std::memcpy(out, s, sizeof(float) * frames);
    } else {
      for (uint32_t i = 0; i < frames; ++i) {
        float acc = 0.0f;
        for (uint32_t c = 0; c < C; ++c) acc += s[i * C + c];
        out[i] = acc / static_cast<float>(C);
      }
    }
  }
  return static_cast<int32_t>(frames);
}

}  // namespace

extern "C" {

int32_t decode_wav_f32(const char* path, int32_t expect_rate, float* out,
                       int32_t max_samples) {
  return decode_wav_impl(path, expect_rate, out, max_samples);
}

// Probe sample rate + frame count without reading the payload.
// Returns 0 on success, negative error codes as above.
int32_t probe_wav(const char* path, int32_t* out_rate, int64_t* out_frames) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_wav_header(f, &info) || info.channels == 0) {
    std::fclose(f);
    return -2;
  }
  std::fclose(f);
  const bool pcm16 = info.format == 1 && info.bits == 16;
  const bool f32 = info.format == 3 && info.bits == 32;
  if (!pcm16 && !f32) return -2;
  *out_rate = static_cast<int32_t>(info.sample_rate);
  *out_frames = info.data_bytes / (info.channels * (pcm16 ? 2 : 4));
  return 0;
}

// Fused read+decode+pack: fill out_audio[batch, max_samples] (zero padded)
// straight from n wav files, multi-threaded. Rows n..batch-1 are pad rows.
// Per-row status lands in out_lens[i]: >= 0 sample count, < 0 error code.
// Returns 0 if every row decoded, else the first negative error code.
int32_t load_pack_wav_batch(const char** paths, int32_t n,
                            int32_t expect_rate, int32_t max_samples,
                            int32_t batch, float* out_audio,
                            int32_t* out_lens, int32_t nthreads) {
  std::memset(out_audio, 0,
              sizeof(float) * static_cast<size_t>(batch) * max_samples);
  std::memset(out_lens, 0, sizeof(int32_t) * batch);
  const int32_t rows = std::min(n, batch);
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    for (;;) {
      const int32_t i = next.fetch_add(1);
      if (i >= rows) return;
      const int32_t got = decode_wav_impl(
          paths[i], expect_rate,
          out_audio + static_cast<size_t>(i) * max_samples, max_samples);
      out_lens[i] = got;
    }
  };
  int32_t nt = nthreads > 0 ? nthreads : 4;
  nt = std::min(nt, rows > 0 ? rows : 1);
  if (nt <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(nt);
    for (int32_t t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  for (int32_t i = 0; i < rows; ++i)
    if (out_lens[i] < 0) return out_lens[i];
  return 0;
}

}  // extern "C"
