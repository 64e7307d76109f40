// media_shim — native host-side media & annotation runtime.
//
// TPU-native equivalent of the reference's OpenCV C++ substrate
// (SURVEY.md N1-N3: videoio/imgproc/highgui reached from
// /root/reference/yolo_multi_model.py:63-121, :252-334). The
// accelerator only ever sees tensors; every pixel-pushing operation —
// drawing, blending, letterbox resize, overlay composition — runs here
// on the host so the device is never back-pressured by annotation
// (SURVEY.md §7 hard part #6).
//
// Exposed as a plain C ABI consumed via ctypes
// (strongsort_yolo_tpu/media/native.py). All images are HxWx3 BGR
// uint8, row-major, tightly packed.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "font_gen.h"

extern "C" {

struct Img {
  uint8_t* data;
  int h, w;
};

static inline void put_px(uint8_t* img, int h, int w, int x, int y,
                          uint8_t b, uint8_t g, uint8_t r) {
  if (x < 0 || y < 0 || x >= w || y >= h) return;
  uint8_t* p = img + (static_cast<size_t>(y) * w + x) * 3;
  p[0] = b; p[1] = g; p[2] = r;
}

// --- rectangles -----------------------------------------------------------

void shim_draw_rect(uint8_t* img, int h, int w, int x1, int y1, int x2,
                    int y2, uint8_t b, uint8_t g, uint8_t r,
                    int thickness) {
  if (x2 < x1) std::swap(x1, x2);
  if (y2 < y1) std::swap(y1, y2);
  if (thickness < 0) {  // filled
    int cx1 = std::max(x1, 0), cx2 = std::min(x2, w - 1);
    int cy1 = std::max(y1, 0), cy2 = std::min(y2, h - 1);
    for (int y = cy1; y <= cy2; ++y) {
      uint8_t* row = img + (static_cast<size_t>(y) * w + cx1) * 3;
      for (int x = cx1; x <= cx2; ++x) {
        row[0] = b; row[1] = g; row[2] = r; row += 3;
      }
    }
    return;
  }
  for (int t = 0; t < thickness; ++t) {
    int xa = x1 + t, xb = x2 - t, ya = y1 + t, yb = y2 - t;
    for (int x = xa; x <= xb; ++x) {
      put_px(img, h, w, x, ya, b, g, r);
      put_px(img, h, w, x, yb, b, g, r);
    }
    for (int y = ya; y <= yb; ++y) {
      put_px(img, h, w, xa, y, b, g, r);
      put_px(img, h, w, xb, y, b, g, r);
    }
  }
}

// --- lines ----------------------------------------------------------------

void shim_draw_line(uint8_t* img, int h, int w, int x1, int y1, int x2,
                    int y2, uint8_t b, uint8_t g, uint8_t r,
                    int thickness) {
  // Bresenham with square brush of `thickness`
  int dx = std::abs(x2 - x1), dy = -std::abs(y2 - y1);
  int sx = x1 < x2 ? 1 : -1, sy = y1 < y2 ? 1 : -1;
  int err = dx + dy;
  int rad = std::max(thickness / 2, 0);
  int x = x1, y = y1;
  while (true) {
    for (int oy = -rad; oy <= rad; ++oy)
      for (int ox = -rad; ox <= rad; ++ox)
        put_px(img, h, w, x + ox, y + oy, b, g, r);
    if (x == x2 && y == y2) break;
    int e2 = 2 * err;
    if (e2 >= dy) { err += dy; x += sx; }
    if (e2 <= dx) { err += dx; y += sy; }
  }
}

void shim_draw_polyline(uint8_t* img, int h, int w, const int32_t* pts,
                        int npts, int closed, uint8_t b, uint8_t g,
                        uint8_t r, int thickness) {
  for (int i = 0; i + 1 < npts; ++i)
    shim_draw_line(img, h, w, pts[2 * i], pts[2 * i + 1], pts[2 * i + 2],
                   pts[2 * i + 3], b, g, r, thickness);
  if (closed && npts > 2)
    shim_draw_line(img, h, w, pts[2 * (npts - 1)], pts[2 * (npts - 1) + 1],
                   pts[0], pts[1], b, g, r, thickness);
}

// --- polygon fill (even-odd scanline) -------------------------------------

void shim_fill_poly(uint8_t* img, int h, int w, const int32_t* pts,
                    int npts, uint8_t b, uint8_t g, uint8_t r) {
  if (npts < 3) return;
  int ymin = h, ymax = -1;
  for (int i = 0; i < npts; ++i) {
    ymin = std::min(ymin, pts[2 * i + 1]);
    ymax = std::max(ymax, pts[2 * i + 1]);
  }
  ymin = std::max(ymin, 0);
  ymax = std::min(ymax, h - 1);
  std::vector<int> xs;
  for (int y = ymin; y <= ymax; ++y) {
    xs.clear();
    for (int i = 0; i < npts; ++i) {
      int j = (i + 1) % npts;
      int y1 = pts[2 * i + 1], y2 = pts[2 * j + 1];
      int x1 = pts[2 * i], x2 = pts[2 * j];
      if ((y1 <= y && y2 > y) || (y2 <= y && y1 > y)) {
        double t = static_cast<double>(y - y1) / (y2 - y1);
        xs.push_back(static_cast<int>(std::lround(x1 + t * (x2 - x1))));
      }
    }
    std::sort(xs.begin(), xs.end());
    for (size_t k = 0; k + 1 < xs.size(); k += 2) {
      int xa = std::max(xs[k], 0), xb = std::min(xs[k + 1], w - 1);
      for (int x = xa; x <= xb; ++x)
        put_px(img, h, w, x, y, b, g, r);
    }
  }
}

// --- alpha blending (addWeighted parity) ----------------------------------

void shim_blend(uint8_t* dst, const uint8_t* src, int64_t n, float wa,
                float wb) {
  // dst = clamp(dst * wa + src * wb)
  for (int64_t i = 0; i < n; ++i) {
    float v = dst[i] * wa + src[i] * wb;
    dst[i] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v + 0.5f));
  }
}

// --- text (generated bitmap font, integer scale) --------------------------

void shim_draw_text(uint8_t* img, int h, int w, int x0, int y0,
                    const char* s, int scale, uint8_t b, uint8_t g,
                    uint8_t r) {
  if (scale < 1) scale = 1;
  int x = x0;
  for (const char* c = s; *c; ++c) {
    unsigned ch = static_cast<unsigned char>(*c);
    if (ch < 32 || ch > 126) { x += kFontW * scale; continue; }
    const uint8_t* glyph = kFont[ch - 32];
    for (int gy = 0; gy < kFontH; ++gy) {
      uint8_t row = glyph[gy];
      for (int gx = 0; gx < kFontW; ++gx) {
        if (row & (0x80 >> gx)) {
          for (int sy = 0; sy < scale; ++sy)
            for (int sx = 0; sx < scale; ++sx)
              put_px(img, h, w, x + gx * scale + sx,
                     y0 + gy * scale + sy, b, g, r);
        }
      }
    }
    x += kFontW * scale;
  }
}

void shim_text_size(const char* s, int scale, int* out_w, int* out_h) {
  if (scale < 1) scale = 1;
  *out_w = static_cast<int>(std::strlen(s)) * kFontW * scale;
  *out_h = kFontH * scale;
}

// --- letterbox resize (bilinear, cv2.INTER_LINEAR parity) -----------------

void shim_resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                          int dh, int dw) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y0c = std::clamp(y0, 0, sh - 1);
    int y1c = std::clamp(y0 + 1, 0, sh - 1);
    const uint8_t* row0 = src + static_cast<size_t>(y0c) * sw * 3;
    const uint8_t* row1 = src + static_cast<size_t>(y1c) * sw * 3;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x0c = std::clamp(x0, 0, sw - 1);
      int x1c = std::clamp(x0 + 1, 0, sw - 1);
      for (int c = 0; c < 3; ++c) {
        float top = row0[x0c * 3 + c] * (1 - wx) + row0[x1c * 3 + c] * wx;
        float bot = row1[x0c * 3 + c] * (1 - wx) + row1[x1c * 3 + c] * wx;
        float v = top * (1 - wy) + bot * wy;
        out[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

void shim_letterbox(const uint8_t* src, int sh, int sw, uint8_t* dst,
                    int size, uint8_t pad_val) {
  const float gain = std::min(static_cast<float>(size) / sh,
                              static_cast<float>(size) / sw);
  const int nw = static_cast<int>(std::lround(sw * gain));
  const int nh = static_cast<int>(std::lround(sh * gain));
  const int top = static_cast<int>(std::lround((size - nh) / 2.0 - 0.1));
  const int left = static_cast<int>(std::lround((size - nw) / 2.0 - 0.1));
  std::memset(dst, pad_val, static_cast<size_t>(size) * size * 3);
  std::vector<uint8_t> tmp(static_cast<size_t>(nh) * nw * 3);
  shim_resize_bilinear(src, sh, sw, tmp.data(), nh, nw);
  for (int y = 0; y < nh; ++y) {
    std::memcpy(dst + ((static_cast<size_t>(top) + y) * size + left) * 3,
                tmp.data() + static_cast<size_t>(y) * nw * 3,
                static_cast<size_t>(nw) * 3);
  }
}

}  // extern "C"
