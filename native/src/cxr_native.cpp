// cxr_native — host-side preprocessing runtime for the TPU input pipeline.
//
// The reference's host pipeline is torch DataLoader workers calling OpenCV
// (cv2.imread / cv2.resize — C++ under the hood) per image
// (0425/prepare_data.py:65-90, :256-268). This library is the framework's
// own native runtime for the same stage: cv2.imread-parity PNG decode
// (libpng with OpenCV's transform set — 16-bit high-byte strip, palette
// and sub-8-bit gray expansion, alpha strip, gray→RGB duplication),
// OpenCV-parity fixed-point bilinear
// resize (11-bit coefficients, vectorized-path rounding — byte-identical to
// cv2.resize INTER_LINEAR on uint8 for every downscale and for all interior
// rows of upscales; cv2 5.x's fy==0 upscale border rows are within 1 LSB),
// fused uint8→float32
// channel normalization, and a std::thread pool that assembles whole NHWC
// batches in parallel — including a whole-batch read→decode→resize entry
// (`cxr_batch_load_resize_u8`) that crosses the Python boundary once per
// batch. Python binds via ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread cxr_native.cpp -o libcxr_native.so -lpng16 -lz

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <png.h>

namespace {

constexpr int kCoefBits = 11;                 // INTER_RESIZE_COEF_BITS
constexpr int kCoefScale = 1 << kCoefBits;    // 2048
constexpr int kAccBits = kCoefBits * 2;       // 22
constexpr int kRoundDelta = 1 << (kAccBits - 1);

inline short saturate_short(float v) {
  // OpenCV saturate_cast<short>(float): round-half-to-even then clamp.
  float r = std::nearbyintf(v);
  if (r < -32768.f) return -32768;
  if (r > 32767.f) return 32767;
  return static_cast<short>(r);
}

inline uint8_t saturate_u8(int v) {
  return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

struct InterpTable {
  std::vector<int> idx;      // source index of the left/top tap
  std::vector<short> coef;   // two coefficients per output position
};

InterpTable build_table(int src, int dst) {
  InterpTable t;
  t.idx.resize(dst);
  t.coef.resize(2 * dst);
  const double scale = static_cast<double>(src) / dst;
  for (int d = 0; d < dst; ++d) {
    // OpenCV computes the source coordinate in float32 — at large scale
    // factors the reduced precision changes coefficients, so match it.
    float s = static_cast<float>((d + 0.5) * scale - 0.5);
    int i = static_cast<int>(std::floor(s));
    float f = s - i;
    if (i < 0) { i = 0; f = 0.f; }
    if (i >= src - 1) { i = src - 1; f = 0.f; }
    t.idx[d] = i;
    t.coef[2 * d] = saturate_short((1.f - f) * kCoefScale);
    t.coef[2 * d + 1] = saturate_short(f * kCoefScale);
  }
  return t;
}

// Bilinear resize, OpenCV 8U fixed-point path. src/dst are HWC uint8.
void resize_u8(const uint8_t* src, int sh, int sw, int c, uint8_t* dst,
               int dh, int dw) {
  const InterpTable tx = build_table(sw, dw);
  const InterpTable ty = build_table(sh, dh);
  const int row_elems = dw * c;
  std::vector<int> row0(row_elems), row1(row_elems);
  int cached_y0 = -1, cached_y1 = -1;

  auto hresize = [&](int sy, int* out) {
    const uint8_t* in = src + static_cast<size_t>(sy) * sw * c;
    for (int x = 0; x < dw; ++x) {
      const int sx = tx.idx[x];
      const int a0 = tx.coef[2 * x], a1 = tx.coef[2 * x + 1];
      const int sx1 = std::min(sx + 1, sw - 1);
      const uint8_t* p0 = in + static_cast<size_t>(sx) * c;
      const uint8_t* p1 = in + static_cast<size_t>(sx1) * c;
      for (int k = 0; k < c; ++k)
        out[x * c + k] = p0[k] * a0 + p1[k] * a1;
    }
  };

  for (int y = 0; y < dh; ++y) {
    const int sy = ty.idx[y];
    const int sy1 = std::min(sy + 1, sh - 1);
    const int b0 = ty.coef[2 * y], b1 = ty.coef[2 * y + 1];
    if (cached_y0 != sy) { hresize(sy, row0.data()); cached_y0 = sy; }
    if (cached_y1 != sy1) { hresize(sy1, row1.data()); cached_y1 = sy1; }
    uint8_t* out = dst + static_cast<size_t>(y) * row_elems;
    if (b1 == 0) {
      // degenerate border row (fy == 0): single-row exact 11-bit rounding
      for (int x = 0; x < row_elems; ++x)
        out[x] = saturate_u8((row0[x] + (kCoefScale >> 1)) >> kCoefBits);
    } else {
      for (int x = 0; x < row_elems; ++x) {
        // OpenCV's vectorized VResizeLinearVec_32s8u rounding: rows
        // pre-shifted by 4, per-term >>16, then (+2)>>2 — reproduced
        // exactly (matches the cv2 binary's bit-exact interior too).
        const int acc = ((b0 * (row0[x] >> 4)) >> 16) +
                        ((b1 * (row1[x] >> 4)) >> 16) + 2;
        out[x] = saturate_u8(acc >> 2);
      }
    }
  }
}

// Fused resize + (x*scale + bias) normalize to float32.
void resize_normalize(const uint8_t* src, int sh, int sw, int c, float* dst,
                      int dh, int dw, const float* scale, const float* bias) {
  std::vector<uint8_t> tmp(static_cast<size_t>(dh) * dw * c);
  resize_u8(src, sh, sw, c, tmp.data(), dh, dw);
  const size_t n = tmp.size();
  for (size_t i = 0; i < n; ++i) {
    const int k = static_cast<int>(i % c);
    dst[i] = tmp[i] * scale[k] + bias[k];
  }
}

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { loop(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      jobs_.push(std::move(fn));
    }
    cv_.notify_one();
  }
  void wait_idle() {
    std::unique_lock<std::mutex> lk(mu_);
    idle_cv_.wait(lk, [this] { return jobs_.empty() && active_ == 0; });
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
        if (stop_ && jobs_.empty()) return;
        job = std::move(jobs_.front());
        jobs_.pop();
        ++active_;
      }
      job();
      {
        std::unique_lock<std::mutex> lk(mu_);
        --active_;
        if (jobs_.empty() && active_ == 0) idle_cv_.notify_all();
      }
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable idle_cv_;
  int active_ = 0;
  bool stop_;
};

// ---------------------------------------------------------------------------
// PNG decode, cv2.imread(IMREAD_COLOR) parity (modulo cv2's BGR order — we
// emit RGB directly, which equals the reference pipeline's
// cv2.cvtColor(..., COLOR_BGR2RGB) round trip in datasets.load_image).
// Transform set mirrors OpenCV's grfmt_png: strip 16→8 high byte,
// palette→RGB, expand 1/2/4-bit gray, strip alpha, gray→RGB.
// ---------------------------------------------------------------------------

struct MemReader {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

void mem_read_fn(png_structp png, png_bytep out, png_size_t n) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + n > r->len) png_error(png, "read past end of buffer");
  std::memcpy(out, r->data + r->pos, n);
  r->pos += n;
}

void png_silent(png_structp, png_const_charp) {}

bool is_png(const uint8_t* data, size_t len) {
  return len >= 8 && png_sig_cmp(data, 0, 8) == 0;
}

// Decode a PNG byte buffer to tightly-packed RGB8. Two-phase use:
// call with dst == nullptr to learn (h, w); call again with a h*w*3
// buffer. Returns 0 on success.
int decode_png_rgb(const uint8_t* data, size_t len, int* out_h, int* out_w,
                   uint8_t* dst) {
  if (!is_png(data, len)) return 1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           png_silent, png_silent);
  if (!png) return 2;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 2;
  }
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 3;
  }
  MemReader reader{data, len, 0};
  png_set_read_fn(png, &reader, mem_read_fn);
  png_read_info(png, info);
  png_uint_32 w = 0, h = 0;
  int bit_depth = 0, color_type = 0;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  *out_h = static_cast<int>(h);
  *out_w = static_cast<int>(w);
  if (dst == nullptr) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
  }
  if (bit_depth == 16) png_set_strip_16(png);  // cv2: high byte, no scaling
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  // OpenCV strips alpha unconditionally when decoding to 3 channels —
  // this also covers palette+tRNS, which palette_to_rgb expands to RGBA.
  png_set_strip_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  if (png_get_rowbytes(png, info) != static_cast<size_t>(w) * 3 ||
      png_get_channels(png, info) != 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 4;  // unexpected post-transform geometry; caller falls back
  }
  rows.resize(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = dst + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// Read a whole file into a byte vector. Returns false on failure.
bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n < 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(out->data(), 1, out->size(), f) : 0;
  std::fclose(f);
  return got == out->size();
}

// One slot of the batched loader: read + decode + resize into dst (dh*dw*3
// RGB). Returns true on success; on failure the caller zero-fills.
bool load_decode_resize(const char* path, uint8_t* dst, int dh, int dw,
                        std::vector<uint8_t>* file_buf,
                        std::vector<uint8_t>* img_buf) {
  if (!read_file(path, file_buf)) return false;
  int h = 0, w = 0;
  if (decode_png_rgb(file_buf->data(), file_buf->size(), &h, &w, nullptr) != 0)
    return false;
  if (h <= 0 || w <= 0) return false;
  if (h == dh && w == dw) {
    return decode_png_rgb(file_buf->data(), file_buf->size(), &h, &w, dst) == 0;
  }
  img_buf->resize(static_cast<size_t>(h) * w * 3);
  if (decode_png_rgb(file_buf->data(), file_buf->size(), &h, &w,
                     img_buf->data()) != 0)
    return false;
  resize_u8(img_buf->data(), h, w, 3, dst, dh, dw);
  return true;
}

ThreadPool* pool(int threads) {
  static ThreadPool* p = nullptr;
  static int p_threads = 0;
  if (p == nullptr || (threads > 0 && threads != p_threads)) {
    delete p;
    p_threads = threads > 0 ? threads
                            : static_cast<int>(std::thread::hardware_concurrency());
    p = new ThreadPool(p_threads);
  }
  return p;
}

}  // namespace

extern "C" {

// Single-image cv2-parity resize (uint8 HWC → uint8 HWC).
void cxr_resize_u8(const uint8_t* src, int sh, int sw, int c, uint8_t* dst,
                   int dh, int dw) {
  resize_u8(src, sh, sw, c, dst, dh, dw);
}

// Batched fused resize+normalize into a preallocated NHWC float32 buffer.
// srcs: array of B pointers; shapes: B*(h,w) int pairs; all images share
// channel count c. scale/bias are per-channel.
void cxr_batch_resize_normalize(const uint8_t** srcs, const int* shapes,
                                int batch, int c, float* dst, int dh, int dw,
                                const float* scale, const float* bias,
                                int threads) {
  ThreadPool* tp = pool(threads);
  const size_t stride = static_cast<size_t>(dh) * dw * c;
  for (int b = 0; b < batch; ++b) {
    tp->submit([=] {
      resize_normalize(srcs[b], shapes[2 * b], shapes[2 * b + 1], c,
                       dst + b * stride, dh, dw, scale, bias);
    });
  }
  tp->wait_idle();
}

// Batched uint8 resize into NHWC uint8 (device-normalize path: host only
// unifies shapes, the TPU does the float math).
void cxr_batch_resize_u8(const uint8_t** srcs, const int* shapes, int batch,
                         int c, uint8_t* dst, int dh, int dw, int threads) {
  ThreadPool* tp = pool(threads);
  const size_t stride = static_cast<size_t>(dh) * dw * c;
  for (int b = 0; b < batch; ++b) {
    tp->submit([=] {
      resize_u8(srcs[b], shapes[2 * b], shapes[2 * b + 1], c, dst + b * stride,
                dh, dw);
    });
  }
  tp->wait_idle();
}

// PNG header probe: fills (h, w); returns 0 if the buffer is a decodable
// PNG header.
int cxr_png_info(const uint8_t* data, size_t len, int* h, int* w) {
  return decode_png_rgb(data, len, h, w, nullptr);
}

// Decode a PNG byte buffer into a preallocated h*w*3 RGB8 buffer
// (dimensions from cxr_png_info). cv2.imread parity in RGB order.
int cxr_decode_png_rgb(const uint8_t* data, size_t len, uint8_t* dst) {
  int h = 0, w = 0;
  return decode_png_rgb(data, len, &h, &w, dst);
}

// Whole-batch read→decode→resize: paths[b] → dst[b] (NHWC RGB8, dh×dw),
// threaded. ok[b] = 1 on success; failures (missing file, non-PNG,
// corrupt) zero-fill their slot — the reference's decode-failure fallback
// (0425/prepare_data.py:92-180) — and set ok[b] = 0 so the caller can
// retry those through its own decoder.
void cxr_batch_load_resize_u8(const char** paths, int batch, uint8_t* dst,
                              int dh, int dw, int threads, uint8_t* ok) {
  ThreadPool* tp = pool(threads);
  const size_t stride = static_cast<size_t>(dh) * dw * 3;
  for (int b = 0; b < batch; ++b) {
    tp->submit([=] {
      std::vector<uint8_t> file_buf, img_buf;
      uint8_t* slot = dst + b * stride;
      bool good = load_decode_resize(paths[b], slot, dh, dw, &file_buf,
                                     &img_buf);
      if (!good) std::memset(slot, 0, stride);
      if (ok != nullptr) ok[b] = good ? 1 : 0;
    });
  }
  tp->wait_idle();
}

int cxr_version() { return 2; }

}  // extern "C"
