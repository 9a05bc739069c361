// nltio: native host-IO for the NLT data pipeline.
//
// The reference hides slow PIL/py_function image loading behind a
// 128-way tf.data map (reference: nlt/datasets/base.py:98-116,
// nlt/datasets/nlt.py:106-110). Here the hot host path — PNG decode,
// uint->[0,1] normalize, bilinear resize — is native C++ (libpng + zlib),
// called through ctypes so every worker thread decodes without holding
// the GIL. Keeps 512x512 feeding rates ahead of the device step.
//
// Build: make -C native    (produces libnltio.so)

#include <png.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Reads PNG header: fills w, h, channels. Returns 0 on success.
int nltio_png_info(const char* path, int* w, int* h, int* ch) {
  png_image image;
  memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return -1;
  *w = static_cast<int>(image.width);
  *h = static_cast<int>(image.height);
  *ch = static_cast<int>(PNG_IMAGE_SAMPLE_CHANNELS(image.format));
  png_image_free(&image);
  return 0;
}

// Decodes an 8-bit PNG into caller-allocated buf (h*w*ch bytes, packed
// row-major). 16-bit files are downconverted by libpng. Returns 0 on
// success.
int nltio_png_read_u8(const char* path, uint8_t* buf, int w, int h,
                      int ch) {
  png_image image;
  memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return -1;
  switch (ch) {
    case 1: image.format = PNG_FORMAT_GRAY; break;
    case 2: image.format = PNG_FORMAT_GA; break;
    case 3: image.format = PNG_FORMAT_RGB; break;
    case 4: image.format = PNG_FORMAT_RGBA; break;
    default:
      png_image_free(&image);
      return -2;
  }
  if (static_cast<int>(image.width) != w ||
      static_cast<int>(image.height) != h) {
    png_image_free(&image);
    return -3;
  }
  if (!png_image_finish_read(&image, nullptr, buf, 0, nullptr)) {
    png_image_free(&image);
    return -4;
  }
  return 0;
}

// Bilinear resize of a float32 HWC image (align_corners=false pixel
// centers, matching jax.image.resize('linear') closely enough for data
// prep).
void nltio_resize_bilinear_f32(const float* src, int sh, int sw, int ch,
                               float* dst, int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(fy >= 0 ? fy : fy - 1);  // floor
    float ty = fy - y0;
    int y0c = std::min(std::max(y0, 0), sh - 1);
    int y1c = std::min(std::max(y0 + 1, 0), sh - 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(fx >= 0 ? fx : fx - 1);
      float tx = fx - x0;
      int x0c = std::min(std::max(x0, 0), sw - 1);
      int x1c = std::min(std::max(x0 + 1, 0), sw - 1);
      const float* p00 = src + (y0c * sw + x0c) * ch;
      const float* p01 = src + (y0c * sw + x1c) * ch;
      const float* p10 = src + (y1c * sw + x0c) * ch;
      const float* p11 = src + (y1c * sw + x1c) * ch;
      float* out = dst + (y * dw + x) * ch;
      for (int c = 0; c < ch; ++c) {
        float top = p00[c] * (1 - tx) + p01[c] * tx;
        float bot = p10[c] * (1 - tx) + p11[c] * tx;
        out[c] = top * (1 - ty) + bot * ty;
      }
    }
  }
}

// One-shot: decode PNG, normalize uint8 -> [0,1] float32, optionally
// resize to (dh, dw) (dh/dw <= 0 keeps native size). `out` must hold
// dh*dw*ch floats (with dh/dw resolved by the caller from
// nltio_png_info). Returns 0 on success.
int nltio_load_png_f32(const char* path, float* out, int dh, int dw,
                       int w, int h, int ch) {
  std::vector<uint8_t> raw(static_cast<size_t>(w) * h * ch);
  int rc = nltio_png_read_u8(path, raw.data(), w, h, ch);
  if (rc != 0) return rc;
  const float inv = 1.0f / 255.0f;
  if (dh <= 0 || dw <= 0 || (dh == h && dw == w)) {
    const size_t n = static_cast<size_t>(w) * h * ch;
    for (size_t i = 0; i < n; ++i) out[i] = raw[i] * inv;
    return 0;
  }
  std::vector<float> full(static_cast<size_t>(w) * h * ch);
  const size_t n = full.size();
  for (size_t i = 0; i < n; ++i) full[i] = raw[i] * inv;
  nltio_resize_bilinear_f32(full.data(), h, w, ch, out, dh, dw);
  return 0;
}

}  // extern "C"
