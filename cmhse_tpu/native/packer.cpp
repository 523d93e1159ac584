// Native batch packer: ragged clip/sentence arrays -> fixed-shape padded
// batch buffers (the hot inner loop of cmhse_tpu/data/bucketing.py).
//
// The reference had no first-party native code (SURVEY.md section 2a); this
// exists because the TPU rebuild's host-side duty is keeping the feed ahead
// of the device, and the Python pack loop (B x Cmax slice copies with
// bounds logic) is the one per-batch cost that native code removes. The
// numpy path remains as the portable fallback and the parity oracle
// (tests/test_native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC packer.cpp -o libpacker.so
// ABI: plain C, driven via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>

extern "C" {

// Pack ragged frame features.
//   src:        concatenated clip pointers, clip-major: clip_ptrs[total_clips]
//   nframes:    frames per clip [total_clips] (uncapped true counts)
//   clip_off:   first clip index of each video [batch+1] (CSR layout)
//   out_frames: [batch, cmax, fmax, feat] zero-initialized by caller? No:
//               zeroed here.
//   out_framelen: [batch, cmax], out_cliplen: [batch]
void pack_frames(const float* const* clip_ptrs,
                 const int64_t* nframes,
                 const int64_t* clip_off,
                 int64_t batch, int64_t cmax, int64_t fmax, int64_t feat,
                 float* out_frames,
                 int32_t* out_framelen,
                 int32_t* out_cliplen) {
  const int64_t clip_stride = fmax * feat;
  const int64_t video_stride = cmax * clip_stride;
  std::memset(out_frames, 0, sizeof(float) * batch * video_stride);
  std::memset(out_framelen, 0, sizeof(int32_t) * batch * cmax);
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t c0 = clip_off[b];
    int64_t nclip = clip_off[b + 1] - c0;
    if (nclip > cmax) nclip = cmax;
    out_cliplen[b] = static_cast<int32_t>(nclip);
    for (int64_t c = 0; c < nclip; ++c) {
      int64_t nf = nframes[c0 + c];
      if (nf > fmax) nf = fmax;
      out_framelen[b * cmax + c] = static_cast<int32_t>(nf);
      std::memcpy(out_frames + b * video_stride + c * clip_stride,
                  clip_ptrs[c0 + c], sizeof(float) * nf * feat);
    }
  }
}

// f32 -> bf16 with round-to-nearest-even, bit-identical to numpy/ml_dtypes
// astype (the parity oracle in tests/test_native.py). NaN keeps its payload
// top bits with the quiet bit forced, matching the truncation ml_dtypes does.
static inline uint16_t f32_to_bf16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, sizeof(x));
  if ((x & 0x7fffffffu) > 0x7f800000u) {           // NaN
    return static_cast<uint16_t>((x >> 16) | 0x0040u);
  }
  const uint32_t rounding_bias = 0x7fffu + ((x >> 16) & 1u);
  return static_cast<uint16_t>((x + rounding_bias) >> 16);
}

// Like pack_frames but emits bf16 directly: bf16-model batches used to pack
// into a full-size f32 buffer and astype into a SECOND full-size buffer in
// Python (VERDICT r2 weak 5); converting in the copy loop removes that
// duplicate allocation + pass.
void pack_frames_bf16(const float* const* clip_ptrs,
                      const int64_t* nframes,
                      const int64_t* clip_off,
                      int64_t batch, int64_t cmax, int64_t fmax, int64_t feat,
                      uint16_t* out_frames,
                      int32_t* out_framelen,
                      int32_t* out_cliplen) {
  const int64_t clip_stride = fmax * feat;
  const int64_t video_stride = cmax * clip_stride;
  std::memset(out_frames, 0, sizeof(uint16_t) * batch * video_stride);
  std::memset(out_framelen, 0, sizeof(int32_t) * batch * cmax);
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t c0 = clip_off[b];
    int64_t nclip = clip_off[b + 1] - c0;
    if (nclip > cmax) nclip = cmax;
    out_cliplen[b] = static_cast<int32_t>(nclip);
    for (int64_t c = 0; c < nclip; ++c) {
      int64_t nf = nframes[c0 + c];
      if (nf > fmax) nf = fmax;
      out_framelen[b * cmax + c] = static_cast<int32_t>(nf);
      const float* src = clip_ptrs[c0 + c];
      uint16_t* dst = out_frames + b * video_stride + c * clip_stride;
      const int64_t count = nf * feat;
      for (int64_t k = 0; k < count; ++k) dst[k] = f32_to_bf16(src[k]);
    }
  }
}

// Pack ragged token-id sentences (int32), same CSR layout.
void pack_tokens(const int32_t* const* sent_ptrs,
                 const int64_t* nwords,
                 const int64_t* sent_off,
                 int64_t batch, int64_t smax, int64_t wmax,
                 int32_t* out_words,
                 int32_t* out_wordlen,
                 int32_t* out_sentlen) {
  const int64_t sent_stride = wmax;
  const int64_t para_stride = smax * wmax;
  std::memset(out_words, 0, sizeof(int32_t) * batch * para_stride);
  std::memset(out_wordlen, 0, sizeof(int32_t) * batch * smax);
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t s0 = sent_off[b];
    int64_t nsent = sent_off[b + 1] - s0;
    if (nsent > smax) nsent = smax;
    out_sentlen[b] = static_cast<int32_t>(nsent);
    for (int64_t s = 0; s < nsent; ++s) {
      int64_t nw = nwords[s0 + s];
      if (nw > wmax) nw = wmax;
      out_wordlen[b * smax + s] = static_cast<int32_t>(nw);
      std::memcpy(out_words + b * para_stride + s * sent_stride,
                  sent_ptrs[s0 + s], sizeof(int32_t) * nw);
    }
  }
}

}  // extern "C"
