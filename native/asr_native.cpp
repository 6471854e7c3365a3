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
//
// Built as a shared library with g++ (no Rust in this image); loaded
// from Python via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
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
