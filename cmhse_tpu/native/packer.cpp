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
