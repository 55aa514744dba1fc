// Native data-loader core: the CPU-hot inner loops of the host input
// pipeline (bilinear resize, ImageNet normalisation, canvas padding).
//
// Role analogy: the reference delegates its host-side data path to torch
// DataLoader's native worker pool and torchvision's C++ image ops; this
// library is the equivalent for the TPU build. Python (PIL) still decodes
// compressed images; everything after decode can run here, called through
// ctypes from faster_rcnn_pytorch_tpu/data/native.py.
//
// Build: make -C native   (produces libimage_ops.so)

#include <algorithm>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>

extern "C" {

// Bilinear resize, uint8 HWC RGB -> uint8 HWC RGB.
// Matches PIL's convention of sampling at pixel centers scaled by
// (src/dst) with half-pixel alignment.
void resize_bilinear_u8(const uint8_t* src, int sh, int sw,
                        uint8_t* dst, int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, sw - 1);
      const float wx = fx - x0;
      const uint8_t* p00 = src + (y0 * sw + x0) * 3;
      const uint8_t* p01 = src + (y0 * sw + x1) * 3;
      const uint8_t* p10 = src + (y1 * sw + x0) * 3;
      const uint8_t* p11 = src + (y1 * sw + x1) * 3;
      uint8_t* out = dst + (y * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        const float top = p00[c] + (p01[c] - p00[c]) * wx;
        const float bot = p10[c] + (p11[c] - p10[c]) * wx;
        out[c] = static_cast<uint8_t>(top + (bot - top) * wy + 0.5f);
      }
    }
  }
}

// uint8 HWC image -> float32 ImageNet-normalised, written into the
// top-left corner of a zeroed (canvas_h, canvas_w, 3) float canvas.
// Fuses normalize() + the canvas copy of DetectionLoader._to_canvas.
void normalize_into_canvas(const uint8_t* src, int h, int w,
                           float* canvas, int canvas_h, int canvas_w) {
  static const float kMean[3] = {0.485f, 0.456f, 0.406f};
  static const float kStd[3] = {0.229f, 0.224f, 0.225f};
  const float inv255 = 1.0f / 255.0f;
  std::memset(canvas, 0, sizeof(float) * canvas_h * canvas_w * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + y * w * 3;
    float* out = canvas + y * canvas_w * 3;
    for (int x = 0; x < w; ++x) {
      for (int c = 0; c < 3; ++c) {
        out[x * 3 + c] = (row[x * 3 + c] * inv255 - kMean[c]) / kStd[c];
      }
    }
  }
}

// Horizontal flip in place, uint8 HWC.
void hflip_u8(uint8_t* img, int h, int w) {
  for (int y = 0; y < h; ++y) {
    uint8_t* row = img + y * w * 3;
    for (int x = 0; x < w / 2; ++x) {
      for (int c = 0; c < 3; ++c) {
        std::swap(row[x * 3 + c], row[(w - 1 - x) * 3 + c]);
      }
    }
  }
}

// ---- JPEG decode (libjpeg) --------------------------------------------
//
// Completes the native loader: the reference leans on torchvision/PIL's
// C decode path; here the same libjpeg the system PIL wraps is called
// directly, so the Python worker threads never hold the GIL during
// decode (ctypes releases it around the call).

namespace {
struct JerrMgr {
  jpeg_error_mgr pub;
  jmp_buf jmp;
};

void jerr_exit(j_common_ptr cinfo) {
  JerrMgr* err = reinterpret_cast<JerrMgr*>(cinfo->err);
  longjmp(err->jmp, 1);
}
}  // namespace

// Reads image dimensions from an in-memory JPEG. Returns 0 on success.
int jpeg_dims(const uint8_t* data, long size, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JerrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  *h = static_cast<int>(cinfo.image_height);
  *w = static_cast<int>(cinfo.image_width);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decodes an in-memory JPEG into a caller-allocated uint8 HWC RGB buffer
// of exactly h*w*3 bytes (h, w from jpeg_dims). Grayscale/CMYK sources
// are converted to RGB by libjpeg. Returns 0 on success.
int decode_jpeg_rgb(const uint8_t* data, long size, uint8_t* out,
                    int h, int w) {
  jpeg_decompress_struct cinfo;
  JerrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_height) != h ||
      static_cast<int>(cinfo.output_width) != w ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
