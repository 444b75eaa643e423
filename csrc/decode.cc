// Native PNG decode for the bevrender_tpu host input pipeline.
//
// Round-4 measurement (TRAINER_OVERLAP_k8_png.json): on the 1-core host the
// training loop over a real on-disk PNG trace ran at 252 ms/step against a
// 72 ms device ceiling, and the bottleneck was PNG *decode* — the one stage
// csrc/preprocess.cc did not cover, shared by the native and PIL paths alike
// (the reference's pipeline starts at PIL.Image.open,
// dataloader/dataset.py:121-136). This file closes that gap: libpng-backed
// decode, plus fused decode->preprocess entry points so a camera frame goes
// from file path to normalized (V, H, W, 3) f32 views in ONE native call
// with no intermediate buffer crossing the Python boundary.
//
// libpng's simplified API (png_image_*, libpng >= 1.6) handles palette,
// gray, 16-bit, alpha and interlaced sources uniformly, converting to RGB8.
// Linked against the system libpng16 + zlib; when those are absent at build
// time, bevrender_tpu/data/native.py compiles preprocess.cc alone and PNG
// decode falls back to PIL (same kill switch: BEV_NATIVE=0).
//
// C ABI only — bound via ctypes (no pybind11 in the image). Every function
// returns 0 on success, nonzero on failure (callers fall back to PIL).

#include <png.h>

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// from preprocess.cc (same shared object)
void bev_fused_views(const uint8_t* src, int hs, int ws, float* dst, int v,
                     int ho, int wo, const float* mean, const float* stdv);
void bev_resize_u8(const uint8_t* src, int hs, int ws, uint8_t* dst, int ho,
                   int wo);

// Read the PNG header only: fills (h, w). ~100 bytes of IO, no IDAT decode.
int bev_png_probe(const char* path, int* h, int* w) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return 1;
  *h = static_cast<int>(image.height);
  *w = static_cast<int>(image.width);
  png_image_free(&image);
  return 0;
}

// Decode to RGB8 into a caller buffer of exactly (h, w, 3) — call
// bev_png_probe first for the dimensions.
int bev_png_decode_rgb(const char* path, uint8_t* dst, int h, int w) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return 1;
  image.format = PNG_FORMAT_RGB;
  if (static_cast<int>(image.height) != h ||
      static_cast<int>(image.width) != w) {
    png_image_free(&image);
    return 2;
  }
  if (!png_image_finish_read(&image, nullptr, dst, 0, nullptr)) return 3;
  return 0;
}

namespace {
// decode helper shared by the fused entry points
int decode_rgb(const char* path, std::vector<uint8_t>* buf, int* h, int* w) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return 1;
  image.format = PNG_FORMAT_RGB;
  *h = static_cast<int>(image.height);
  *w = static_cast<int>(image.width);
  buf->resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, buf->data(), 0, nullptr)) {
    return 2;
  }
  return 0;
}
}  // namespace

// Fused camera-frame path: decode -> resize -> view split -> /255 ->
// normalize, file path to (v, ho, wo / v, 3) f32 in one native call.
int bev_png_views(const char* path, float* dst, int v, int ho, int wo,
                  const float* mean, const float* stdv) {
  std::vector<uint8_t> raw;
  int hs = 0, ws = 0;
  const int rc = decode_rgb(path, &raw, &hs, &ws);
  if (rc) return rc;
  bev_fused_views(raw.data(), hs, ws, dst, v, ho, wo, mean, stdv);
  return 0;
}

// Fused raw_uint8 path: decode -> triangle resize to u8 (ho, wo, 3).
int bev_png_resize_u8(const char* path, uint8_t* dst, int ho, int wo) {
  std::vector<uint8_t> raw;
  int hs = 0, ws = 0;
  const int rc = decode_rgb(path, &raw, &hs, &ws);
  if (rc) return rc;
  if (hs == ho && ws == wo) {
    std::memcpy(dst, raw.data(), raw.size());
    return 0;
  }
  bev_resize_u8(raw.data(), hs, ws, dst, ho, wo);
  return 0;
}

}  // extern "C"
