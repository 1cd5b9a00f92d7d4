// Native host-side image preprocessing for the yolov5m_tpu data pipeline.
//
// TPU-native equivalent of the C++ the reference leans on through OpenCV
// (cv2.resize / cv2.copyMakeBorder at reference utils/utils.py:87,145-148):
// bilinear resize with half-pixel centers (INTER_LINEAR semantics) and
// letterbox padding, multithreaded with OpenMP, exposed via a C ABI for
// ctypes. Built by native/Makefile into libyolopreproc.so.

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>

namespace {

inline float lerp(float a, float b, float t) { return a + t * (b - a); }

// libjpeg's default error handler exit()s the process; trampoline back to
// the call site instead so a corrupt file degrades to an error code.
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  std::jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  std::longjmp(err->setjmp_buffer, 1);
}

}  // namespace

extern "C" {

// Bilinear resize, uint8 HWC interleaved. Half-pixel-center sampling matches
// OpenCV INTER_LINEAR (and torch align_corners=False).
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int ch,
                        uint8_t* dst, int dh, int dw) {
  const float scale_y = static_cast<float>(sh) / dh;
  const float scale_x = static_cast<float>(sw) / dw;

#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * scale_y - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float ty = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * scale_x - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, sw - 1);
      const float tx = fx - x0;
      const uint8_t* r0 = src + (static_cast<int64_t>(y0) * sw + x0) * ch;
      const uint8_t* r1 = src + (static_cast<int64_t>(y0) * sw + x1) * ch;
      const uint8_t* r2 = src + (static_cast<int64_t>(y1) * sw + x0) * ch;
      const uint8_t* r3 = src + (static_cast<int64_t>(y1) * sw + x1) * ch;
      uint8_t* out = dst + (static_cast<int64_t>(y) * dw + x) * ch;
      for (int c = 0; c < ch; ++c) {
        const float top = lerp(r0[c], r1[c], tx);
        const float bot = lerp(r2[c], r3[c], tx);
        out[c] = static_cast<uint8_t>(lerp(top, bot, ty) + 0.5f);
      }
    }
  }
}

// Letterbox: copy src into dst (pre-sized dh x dw) at offset (top, left),
// filling the border with `fill` (reference letterbox uses 114,
// utils/utils.py:119).
void letterbox_u8(const uint8_t* src, int sh, int sw, int ch,
                  uint8_t* dst, int dh, int dw, int top, int left,
                  uint8_t fill) {
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    uint8_t* row = dst + static_cast<int64_t>(y) * dw * ch;
    if (y < top || y >= top + sh) {
      std::memset(row, fill, static_cast<size_t>(dw) * ch);
      continue;
    }
    std::memset(row, fill, static_cast<size_t>(left) * ch);
    std::memcpy(row + static_cast<size_t>(left) * ch,
                src + static_cast<int64_t>(y - top) * sw * ch,
                static_cast<size_t>(sw) * ch);
    const int right_start = left + sw;
    std::memset(row + static_cast<size_t>(right_start) * ch, fill,
                static_cast<size_t>(dw - right_start) * ch);
  }
}

// Batched normalize: uint8 HWC → float32 HWC / 255, fused with optional
// letterbox already applied. Saves a numpy pass per batch.
void normalize_u8_to_f32(const uint8_t* src, float* dst, int64_t n) {
  constexpr float kInv = 1.0f / 255.0f;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * kInv;
}

// JPEG header probe: writes (h, w) for a compressed buffer. Returns 0 on
// success, nonzero on parse failure. Output is always 3-channel RGB from
// decode_jpeg_u8 regardless of the file's colorspace.
int jpeg_dims(const uint8_t* buf, int64_t len, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  *h = static_cast<int>(cinfo.image_height);
  *w = static_cast<int>(cinfo.image_width);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode a JPEG buffer into a preallocated (h, w, 3) RGB uint8 array.
// Releases no Python state (pure C) — callers can run it from threads
// without the GIL. Returns 0 on success.
int decode_jpeg_u8(const uint8_t* buf, int64_t len, uint8_t* out,
                   int h, int w) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // grayscale/YCbCr/CMYK all land as RGB
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_height) != h ||
      static_cast<int>(cinfo.output_width) != w ||
      cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  const size_t stride = static_cast<size_t>(w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
