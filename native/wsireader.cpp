// wsireader: native pyramidal-slide I/O for the TPU WSI pipeline.
//
// Replaces the reference's OpenSlide dependency (reference:
// wsi_core/WholeSlideImage.py:31 `openslide.open_slide`, :165/:340
// `read_region`) with a C++ tiled-TIFF engine exposing a C ABI for ctypes:
//
//   - per-level metadata parsed once at open;
//   - read_region at any level with tile-cache-free direct decode;
//   - BATCHED multi-threaded region reads (ws_read_regions): the host-side
//     producer that keeps TPU HBM fed — the reference hides decode latency
//     behind 1-16 torch DataLoader workers (extract_features_fp.py:144-153);
//     here a std::thread pool decodes N regions concurrently into one
//     contiguous uint8 buffer ready for device transfer;
//   - a pyramid writer (box-filtered levels, deflate or JPEG tiles) used by
//     tests and benchmarks to fabricate synthetic slides.
//
// Build: make -C native   ->  native/libwsireader.so
#include "tiff_api.h"

#include <algorithm>
#include <atomic>
#include <csetjmp>
#include <cstdarg>
#include <cstdio>
#include <cstring>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

// libjpeg: raw quantized-coefficient access for the sparse DCT transfer
// path (ws_read_regions_dct below); the header needs <cstdio> for FILE.
#include <jpeglib.h>

namespace {

void quiet_handler(const char*, const char*, va_list) {}

struct LevelInfo {
  uint32_t width = 0, height = 0;
  uint32_t tile_w = 0, tile_h = 0;
  uint16_t dir = 0;
  uint16_t spp = 3;
  bool tiled = false;
};

struct Slide {
  std::string path;
  std::vector<LevelInfo> levels;  // sorted by area desc (level 0 = largest)
  std::mutex pool_mu;
  std::vector<TIFF*> pool;  // reusable handles for worker threads

  ~Slide() {
    for (TIFF* t : pool) TIFFClose(t);
  }

  TIFF* acquire() {
    {
      std::lock_guard<std::mutex> g(pool_mu);
      if (!pool.empty()) {
        TIFF* t = pool.back();
        pool.pop_back();
        return t;
      }
    }
    return TIFFOpen(path.c_str(), "rm");  // m: no mmap (keeps RSS bounded)
  }

  void release(TIFF* t) {
    std::lock_guard<std::mutex> g(pool_mu);
    pool.push_back(t);
  }
};

// Decode one tile (tx, ty are tile indices) into an RGB scratch buffer.
// Primary path: 8-bit contiguous RGB tiles via TIFFReadEncodedTile.
// Fallback: TIFFReadRGBATile (handles JPEG/YCbCr etc.), which returns
// bottom-up ABGR and needs a flip + channel swizzle.
bool decode_tile_rgb(TIFF* tif, const LevelInfo& L, uint32_t tx, uint32_t ty,
                     uint8_t* rgb /* tile_w*tile_h*3 */) {
  uint16_t photometric = 0, bps = 0, spp = 0, planar = 0, comp = 0;
  TIFFGetField(tif, TAG_PHOTOMETRIC, &photometric);
  TIFFGetField(tif, TAG_BITSPERSAMPLE, &bps);
  TIFFGetField(tif, TAG_SAMPLESPERPIXEL, &spp);
  TIFFGetField(tif, TAG_PLANARCONFIG, &planar);
  TIFFGetField(tif, TAG_COMPRESSION, &comp);
  const size_t npix = size_t(L.tile_w) * L.tile_h;

  if (photometric == PHOTOMETRIC_RGB_ && bps == 8 && spp == 3 &&
      planar == PLANARCONFIG_CONTIG_ && comp != COMPRESSION_JPEG_) {
    uint32_t tile = TIFFComputeTile(tif, tx * L.tile_w, ty * L.tile_h, 0, 0);
    tmsize_t n = TIFFReadEncodedTile(tif, tile, rgb, tmsize_t(npix * 3));
    return n > 0;
  }
  if (comp == COMPRESSION_JPEG_)  // the YUV raw reader may have left the
    TIFFSetField(tif, TAG_JPEGCOLORMODE,  // pooled handle in RAW mode
                 int32_t(JPEGCOLORMODE_RGB_));
  // RGBA fallback (bottom-up raster)
  std::vector<uint32_t> raster(npix);
  if (!TIFFReadRGBATile(tif, tx * L.tile_w, ty * L.tile_h, raster.data()))
    return false;
  for (uint32_t r = 0; r < L.tile_h; ++r) {
    const uint32_t* src = raster.data() + size_t(L.tile_h - 1 - r) * L.tile_w;
    uint8_t* dst = rgb + size_t(r) * L.tile_w * 3;
    for (uint32_t c = 0; c < L.tile_w; ++c) {
      uint32_t px = src[c];
      dst[c * 3 + 0] = px & 0xff;          // R
      dst[c * 3 + 1] = (px >> 8) & 0xff;   // G
      dst[c * 3 + 2] = (px >> 16) & 0xff;  // B
    }
  }
  return true;
}

// Read a (w x h) RGB region at `level`, top-left (x, y) in level coords,
// into out (row-major, white-padded past the slide boundary).
bool read_region_impl(Slide* s, TIFF* tif, int level, int64_t x, int64_t y,
                      int64_t w, int64_t h, uint8_t* out) {
  const LevelInfo& L = s->levels[level];
  if (!TIFFSetDirectory(tif, L.dir)) return false;
  std::memset(out, 0xff, size_t(w) * h * 3);  // white background
  if (!L.tiled) return false;

  const int64_t x0 = std::max<int64_t>(x, 0), y0 = std::max<int64_t>(y, 0);
  const int64_t x1 = std::min<int64_t>(x + w, L.width);
  const int64_t y1 = std::min<int64_t>(y + h, L.height);
  if (x0 >= x1 || y0 >= y1) return true;  // fully outside: stays white

  std::vector<uint8_t> tilebuf(size_t(L.tile_w) * L.tile_h * 3);
  const uint32_t tx0 = uint32_t(x0 / L.tile_w), tx1 = uint32_t((x1 - 1) / L.tile_w);
  const uint32_t ty0 = uint32_t(y0 / L.tile_h), ty1 = uint32_t((y1 - 1) / L.tile_h);
  for (uint32_t ty = ty0; ty <= ty1; ++ty) {
    for (uint32_t tx = tx0; tx <= tx1; ++tx) {
      if (!decode_tile_rgb(tif, L, tx, ty, tilebuf.data())) return false;
      const int64_t gx0 = std::max<int64_t>(int64_t(tx) * L.tile_w, x0);
      const int64_t gx1 = std::min<int64_t>(int64_t(tx + 1) * L.tile_w, x1);
      const int64_t gy0 = std::max<int64_t>(int64_t(ty) * L.tile_h, y0);
      const int64_t gy1 = std::min<int64_t>(int64_t(ty + 1) * L.tile_h, y1);
      const int64_t row_bytes = (gx1 - gx0) * 3;
      for (int64_t gy = gy0; gy < gy1; ++gy) {
        const uint8_t* src = tilebuf.data() +
            (size_t(gy - int64_t(ty) * L.tile_h) * L.tile_w +
             (gx0 - int64_t(tx) * L.tile_w)) * 3;
        uint8_t* dst = out + (size_t(gy - y) * w + (gx0 - x)) * 3;
        std::memcpy(dst, src, size_t(row_bytes));
      }
    }
  }
  return true;
}

}  // namespace

extern "C" {

void* ws_open(const char* path) {
  TIFFSetErrorHandler(quiet_handler);
  TIFFSetWarningHandler(quiet_handler);
  TIFF* tif = TIFFOpen(path, "rm");
  if (!tif) return nullptr;
  auto s = std::make_unique<Slide>();
  s->path = path;
  uint16_t ndirs = TIFFNumberOfDirectories(tif);
  for (uint16_t d = 0; d < ndirs; ++d) {
    if (!TIFFSetDirectory(tif, d)) break;
    LevelInfo L;
    L.dir = d;
    TIFFGetField(tif, TAG_IMAGEWIDTH, &L.width);
    TIFFGetField(tif, TAG_IMAGELENGTH, &L.height);
    L.tiled = TIFFGetField(tif, TAG_TILEWIDTH, &L.tile_w) &&
              TIFFGetField(tif, TAG_TILELENGTH, &L.tile_h);
    TIFFGetField(tif, TAG_SAMPLESPERPIXEL, &L.spp);
    if (L.tiled && L.width && L.height) s->levels.push_back(L);
  }
  if (s->levels.empty()) {
    TIFFClose(tif);
    return nullptr;
  }
  std::sort(s->levels.begin(), s->levels.end(),
            [](const LevelInfo& a, const LevelInfo& b) {
              return uint64_t(a.width) * a.height > uint64_t(b.width) * b.height;
            });
  s->pool.push_back(tif);
  return s.release();
}

void ws_close(void* handle) { delete static_cast<Slide*>(handle); }

int32_t ws_level_count(void* handle) {
  return int32_t(static_cast<Slide*>(handle)->levels.size());
}

void ws_level_dims(void* handle, int32_t level, int64_t* w, int64_t* h) {
  const auto& L = static_cast<Slide*>(handle)->levels[level];
  *w = L.width;
  *h = L.height;
}

// Single region read.
int32_t ws_read_region(void* handle, int32_t level, int64_t x, int64_t y,
                       int64_t w, int64_t h, uint8_t* out) {
  Slide* s = static_cast<Slide*>(handle);
  TIFF* tif = s->acquire();
  if (!tif) return -1;
  bool ok = read_region_impl(s, tif, level, x, y, w, h, out);
  s->release(tif);
  return ok ? 0 : -1;
}

// Batched, thread-pooled region reads: n regions of (w x h) at `level`,
// coords = int64[n*2] (x, y) pairs, out = uint8[n*h*w*3] contiguous.
int32_t ws_read_regions(void* handle, int32_t level, const int64_t* coords,
                        int32_t n, int64_t w, int64_t h, uint8_t* out,
                        int32_t n_threads) {
  Slide* s = static_cast<Slide*>(handle);
  if (n_threads <= 0) n_threads = int32_t(std::thread::hardware_concurrency());
  n_threads = std::max(1, std::min<int32_t>(n_threads, n));
  std::atomic<int32_t> next(0), failed(0);
  auto worker = [&]() {
    TIFF* tif = s->acquire();
    if (!tif) {
      failed.fetch_add(1);
      return;
    }
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) break;
      uint8_t* dst = out + size_t(i) * w * h * 3;
      if (!read_region_impl(s, tif, level, coords[2 * i], coords[2 * i + 1],
                            w, h, dst))
        failed.fetch_add(1);
    }
    s->release(tif);
  };
  std::vector<std::thread> threads;
  for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load() ? -int32_t(failed.load()) : 0;
}

// ---------------------------------------------------------------------------
// Raw YCbCr 4:2:0 region reads: the host-link diet for JPEG-YCbCr slides
// (TCGA .svs files store 4:2:0/4:2:2 JPEG). With JPEGCOLORMODE_RAW libtiff
// returns the codec's subsampled planes WITHOUT chroma upsampling or color
// conversion — 1.5 bytes/px instead of 3 — packed per TIFF 6.0 interleave:
// one 2x2 unit = Y00 Y01 Y10 Y11 Cb Cr. The accelerator reconstructs RGB
// (ops/yuv.py, fused into the encoder forward), so the host->device link
// carries HALF the bytes of an RGB transfer.
// ---------------------------------------------------------------------------
namespace {

// Decode one tile's raw 4:2:0 planes into region-plane buffers.
// Region (x, y, w, h) and tile sizes must all be even.
bool decode_tile_yuv420(TIFF* tif, const LevelInfo& L, uint32_t tx,
                        uint32_t ty, std::vector<uint8_t>& raw,
                        int64_t x, int64_t y, int64_t w, int64_t h,
                        int64_t x1, int64_t y1,
                        uint8_t* yp, uint8_t* cbp, uint8_t* crp) {
  TIFFSetField(tif, TAG_JPEGCOLORMODE, int32_t(JPEGCOLORMODE_RAW_));
  uint32_t tile = TIFFComputeTile(tif, tx * L.tile_w, ty * L.tile_h, 0, 0);
  if (TIFFReadEncodedTile(tif, tile, raw.data(),
                          tmsize_t(raw.size())) <= 0)
    return false;
  const int64_t tgx = int64_t(tx) * L.tile_w, tgy = int64_t(ty) * L.tile_h;
  const int64_t gx0 = std::max<int64_t>(tgx, x);
  const int64_t gx1 = std::min<int64_t>(tgx + L.tile_w, x1);
  const int64_t gy0 = std::max<int64_t>(tgy, y);
  const int64_t gy1 = std::min<int64_t>(tgy + L.tile_h, y1);
  const int64_t units_per_row = L.tile_w / 2;
  for (int64_t gy = gy0 & ~1; gy < gy1; gy += 2) {
    for (int64_t gx = gx0 & ~1; gx < gx1; gx += 2) {
      const int64_t ur = (gy - tgy) / 2, uc = (gx - tgx) / 2;
      const uint8_t* u = raw.data() + size_t(ur * units_per_row + uc) * 6;
      const int64_t ry = gy - y, rx = gx - x;  // region-relative (even)
      if (ry >= 0 && rx >= 0 && ry + 1 < h + 1 && rx + 1 < w + 1) {
        // the unit's second row/column must stay within BOTH the region
        // (w, h) and the slide edge (x1, y1): odd-dimension levels end
        // mid-unit, and the codec's edge-replica bytes there must not
        // overwrite the white background the RGB path leaves.
        uint8_t* d = yp + size_t(ry) * w + rx;
        d[0] = u[0];
        if (rx + 1 < w && gx + 1 < x1) d[1] = u[1];
        if (ry + 1 < h && gy + 1 < y1) {
          d += w;
          d[0] = u[2];
          if (rx + 1 < w && gx + 1 < x1) d[1] = u[3];
        }
        cbp[size_t(ry / 2) * (w / 2) + rx / 2] = u[4];
        crp[size_t(ry / 2) * (w / 2) + rx / 2] = u[5];
      }
    }
  }
  return true;
}

bool read_region_yuv420_impl(Slide* s, TIFF* tif, int level, int64_t x,
                             int64_t y, int64_t w, int64_t h, uint8_t* yp,
                             uint8_t* cbp, uint8_t* crp) {
  const LevelInfo& L = s->levels[level];
  if (!TIFFSetDirectory(tif, L.dir)) return false;
  uint16_t photometric = 0, comp = 0, sh = 0, sv = 0;
  TIFFGetField(tif, TAG_PHOTOMETRIC, &photometric);
  TIFFGetField(tif, TAG_COMPRESSION, &comp);
  TIFFGetField(tif, TAG_YCBCRSUBSAMPLING, &sh, &sv);
  if (photometric != PHOTOMETRIC_YCBCR_ || comp != COMPRESSION_JPEG_ ||
      sh != 2 || sv != 2 || (x | y | w | h | L.tile_w | L.tile_h) & 1)
    return false;  // caller falls back to the RGB path
  // white background (RGB 255,255,255 in JFIF YCbCr)
  std::memset(yp, 0xff, size_t(w) * h);
  std::memset(cbp, 0x80, size_t(w / 2) * (h / 2));
  std::memset(crp, 0x80, size_t(w / 2) * (h / 2));
  const int64_t x0 = std::max<int64_t>(x, 0), y0 = std::max<int64_t>(y, 0);
  const int64_t x1 = std::min<int64_t>(x + w, L.width);
  const int64_t y1 = std::min<int64_t>(y + h, L.height);
  if (x0 >= x1 || y0 >= y1) return true;
  // raw tile bytes: ceil(th/2) unit rows x (tw/2) units x 6 bytes
  std::vector<uint8_t> raw(size_t(L.tile_h / 2) * (L.tile_w / 2) * 6);
  const uint32_t tx0 = uint32_t(x0 / L.tile_w),
                 tx1 = uint32_t((x1 - 1) / L.tile_w);
  const uint32_t ty0 = uint32_t(y0 / L.tile_h),
                 ty1 = uint32_t((y1 - 1) / L.tile_h);
  for (uint32_t ty = ty0; ty <= ty1; ++ty)
    for (uint32_t tx = tx0; tx <= tx1; ++tx)
      if (!decode_tile_yuv420(tif, L, tx, ty, raw, x, y, w, h, x1, y1,
                              yp, cbp, crp))
        return false;
  return true;
}

}  // namespace

// Probe: does this level support the raw 4:2:0 fast path?
int32_t ws_supports_yuv420(void* handle, int32_t level) {
  Slide* s = static_cast<Slide*>(handle);
  TIFF* tif = s->acquire();
  if (!tif) return 0;
  const LevelInfo& L = s->levels[level];
  int32_t ok = 0;
  if (TIFFSetDirectory(tif, L.dir)) {
    uint16_t photometric = 0, comp = 0, sh = 0, sv = 0;
    TIFFGetField(tif, TAG_PHOTOMETRIC, &photometric);
    TIFFGetField(tif, TAG_COMPRESSION, &comp);
    TIFFGetField(tif, TAG_YCBCRSUBSAMPLING, &sh, &sv);
    ok = photometric == PHOTOMETRIC_YCBCR_ && comp == COMPRESSION_JPEG_ &&
         sh == 2 && sv == 2 && !(L.tile_w & 1) && !(L.tile_h & 1);
  }
  s->release(tif);
  return ok;
}

// Batched thread-pooled raw 4:2:0 reads. coords/w/h must be even.
// y_out: uint8[n*h*w]; cb_out/cr_out: uint8[n*(h/2)*(w/2)].
int32_t ws_read_regions_yuv420(void* handle, int32_t level,
                               const int64_t* coords, int32_t n, int64_t w,
                               int64_t h, uint8_t* y_out, uint8_t* cb_out,
                               uint8_t* cr_out, int32_t n_threads) {
  Slide* s = static_cast<Slide*>(handle);
  if (n_threads <= 0) n_threads = int32_t(std::thread::hardware_concurrency());
  n_threads = std::max(1, std::min<int32_t>(n_threads, n));
  std::atomic<int32_t> next(0), failed(0);
  auto worker = [&]() {
    TIFF* tif = s->acquire();
    if (!tif) {
      failed.fetch_add(1);
      return;
    }
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) break;
      if (!read_region_yuv420_impl(
              s, tif, level, coords[2 * i], coords[2 * i + 1], w, h,
              y_out + size_t(i) * w * h,
              cb_out + size_t(i) * (w / 2) * (h / 2),
              cr_out + size_t(i) * (w / 2) * (h / 2)))
        failed.fetch_add(1);
    }
    // restore RGB mode before the handle returns to the shared pool
    TIFFSetField(tif, TAG_JPEGCOLORMODE, int32_t(JPEGCOLORMODE_RGB_));
    s->release(tif);
  };
  std::vector<std::thread> threads;
  for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load() ? -int32_t(failed.load()) : 0;
}

// ---------------------------------------------------------------------------
// Sparse DCT-coefficient region reads: ship what the codec stores.
//
// The e2e pipeline is bound by the host->device wire; the YUV420 path
// (above) already halves RGB's bytes. This path goes below the pixel floor:
// the host does ONLY the entropy (Huffman) decode — the irreducibly serial
// part of JPEG — and ships the quantized DCT coefficients in a sparse pack
// (~0.5-0.9 bytes/px measured at quality 80 vs 1.5 for raw planes). The
// device dequantizes, runs the 8x8 IDCT as batched matmuls, upsamples and
// color-converts (ops/jpegdct.py + ops/yuv.py) — work the MXU/VPU does in
// noise time, removed from both the wire AND the 1-CPU host (no IDCT, no
// upsample, no color conversion here anymore).
//
// Pack format per region and component (block order = region row-major,
// coefficient order = natural row-major):
//   dc   int16[nblocks]     dense DC coefficients;
//   bm   uint8[nblocks*8]   AC bitmap, LSB-first bit j of byte i = coeff
//                           i*8+j nonzero (bit 0 = DC, always clear);
//   val  int8[cap]          AC values in bitmap order; |v|>127 or cap
//                           overflow flags the region for pixel fallback.
// Regions must be 16-aligned (the 4:2:0 MCU); the slide must store
// single-strip-of-tiles YCbCr 4:2:0 JPEG (TCGA .svs layout). Anything else
// gets status=1 and the caller re-reads those regions via the YUV/RGB path.
// ---------------------------------------------------------------------------
namespace {

struct DctErr {
  jpeg_error_mgr pub;
  jmp_buf env;
};

void dct_error_exit(j_common_ptr c) {
  longjmp(reinterpret_cast<DctErr*>(c->err)->env, 1);
}

// Decode every tile overlapping the region into dense per-component
// coefficient planes (region block grid), then sparse-pack. Returns 0 ok,
// 1 = fall back to a pixel path (unaligned / unsupported / cap overflow),
// -1 = hard read error.
int extract_region_dct(Slide* s, TIFF* tif, int level, int64_t x, int64_t y,
                       int64_t w, int64_t h, const uint8_t* jt,
                       uint32_t jtlen, int32_t cap_y, int32_t cap_c,
                       int16_t* dc_out[3], uint8_t* bm_out[3],
                       int8_t* val_out[3], int32_t nnz_out[3],
                       int32_t* valid2, std::vector<int16_t> dense[3],
                       std::vector<uint8_t>& rawbuf) {
  const LevelInfo& L = s->levels[level];
  if (!TIFFSetDirectory(tif, L.dir)) return -1;
  if ((x | y | w | h) & 15 || x < 0 || y < 0) return 1;
  if (L.tile_w % 16 || L.tile_h % 16) return 1;

  const int64_t ybw = w / 8, ybh = h / 8, ybl = ybw * ybh;
  const int64_t cbw = w / 16, cbh = h / 16, cbl = cbw * cbh;
  const int64_t bl[3] = {ybl, cbl, cbl};
  const int64_t bwid[3] = {ybw, cbw, cbw}, bhei[3] = {ybh, cbh, cbh};
  for (int c = 0; c < 3; ++c) {
    dense[c].assign(size_t(bl[c]) * 64, 0);
    std::memset(dc_out[c], 0, size_t(bl[c]) * 2);
    std::memset(bm_out[c], 0, size_t(bl[c]) * 8);
  }
  valid2[0] = int32_t(std::max<int64_t>(
      0, std::min<int64_t>(int64_t(L.width) - x, w)));
  valid2[1] = int32_t(std::max<int64_t>(
      0, std::min<int64_t>(int64_t(L.height) - y, h)));

  const int64_t tx0 = x / L.tile_w, ty0 = y / L.tile_h;
  const int64_t tx1 = std::min<int64_t>((x + w - 1) / L.tile_w,
                                        (int64_t(L.width) - 1) / L.tile_w);
  const int64_t ty1 = std::min<int64_t>((y + h - 1) / L.tile_h,
                                        (int64_t(L.height) - 1) / L.tile_h);
  for (int64_t ty = ty0; ty <= ty1; ++ty) {
    for (int64_t tx = tx0; tx <= tx1; ++tx) {
      uint32_t tile = TIFFComputeTile(tif, uint32_t(tx * L.tile_w),
                                      uint32_t(ty * L.tile_h), 0, 0);
      tmsize_t n = TIFFReadRawTile(tif, tile, rawbuf.data(),
                                   tmsize_t(rawbuf.size()));
      if (n <= 0) return -1;
      jpeg_decompress_struct ci;
      DctErr jerr;
      ci.err = jpeg_std_error(&jerr.pub);
      jerr.pub.error_exit = dct_error_exit;
      if (setjmp(jerr.env)) {
        jpeg_destroy_decompress(&ci);
        return 1;  // corrupt/unsupported stream: pixel path may still work
      }
      jpeg_create_decompress(&ci);
      if (jtlen > 4) {  // abbreviated streams: tables ride a separate field
        jpeg_mem_src(&ci, const_cast<uint8_t*>(jt), jtlen);
        jpeg_read_header(&ci, FALSE);
      }
      jpeg_mem_src(&ci, rawbuf.data(), (unsigned long)n);
      jpeg_read_header(&ci, TRUE);
      if (ci.num_components != 3 ||
          ci.comp_info[0].h_samp_factor != 2 ||
          ci.comp_info[0].v_samp_factor != 2 ||
          ci.comp_info[1].h_samp_factor != 1 ||
          ci.comp_info[1].v_samp_factor != 1) {
        jpeg_destroy_decompress(&ci);
        return 1;  // not 4:2:0
      }
      jvirt_barray_ptr* coefs = jpeg_read_coefficients(&ci);
      if (!coefs) {
        jpeg_destroy_decompress(&ci);
        return 1;
      }
      for (int c = 0; c < 3; ++c) {
        jpeg_component_info* comp = &ci.comp_info[c];
        const int sub = c == 0 ? 1 : 2;
        const int64_t cx = x / sub, cy = y / sub;
        const int64_t tgx = tx * L.tile_w / sub, tgy = ty * L.tile_h / sub;
        for (JDIMENSION br = 0; br < comp->height_in_blocks; ++br) {
          const int64_t rby = (tgy + 8 * int64_t(br) - cy) / 8;
          if (tgy + 8 * int64_t(br) < cy || rby >= bhei[c]) continue;
          JBLOCKARRAY rows = (ci.mem->access_virt_barray)(
              reinterpret_cast<j_common_ptr>(&ci), coefs[c], br, 1, FALSE);
          for (JDIMENSION bc = 0; bc < comp->width_in_blocks; ++bc) {
            const int64_t rbx = (tgx + 8 * int64_t(bc) - cx) / 8;
            if (tgx + 8 * int64_t(bc) < cx || rbx >= bwid[c]) continue;
            std::memcpy(dense[c].data() + (rby * bwid[c] + rbx) * 64,
                        rows[0][bc], 128);
          }
        }
      }
      jpeg_destroy_decompress(&ci);
    }
  }

  // sparse-pack in region block order
  const int64_t cap[3] = {cap_y, cap_c, cap_c};
  for (int c = 0; c < 3; ++c) {
    int64_t nnz = 0;
    for (int64_t bi = 0; bi < bl[c]; ++bi) {
      const int16_t* blk = dense[c].data() + bi * 64;
      dc_out[c][bi] = blk[0];
      uint8_t* b8 = bm_out[c] + bi * 8;
      for (int k = 1; k < 64; ++k) {
        const int v = blk[k];
        if (!v) continue;
        if (v < -128 || v > 127 || nnz >= cap[c]) return 1;
        b8[k >> 3] |= uint8_t(1u << (k & 7));
        val_out[c][nnz++] = int8_t(v);
      }
    }
    nnz_out[c] = int32_t(nnz);
  }
  return 0;
}

}  // namespace

// Probe: can `level` serve sparse DCT reads? Returns 1 and fills qt
// (uint16[3*64], natural order) on success.
int32_t ws_dct_probe(void* handle, int32_t level, uint16_t* qt) {
  Slide* s = static_cast<Slide*>(handle);
  if (level < 0 || level >= int32_t(s->levels.size())) return 0;
  TIFF* tif = s->acquire();
  if (!tif) return 0;
  const LevelInfo& L = s->levels[level];
  int32_t ok = 0;
  do {
    if (!TIFFSetDirectory(tif, L.dir)) break;
    uint16_t photometric = 0, comp = 0, sh = 0, sv = 0;
    TIFFGetField(tif, TAG_PHOTOMETRIC, &photometric);
    TIFFGetField(tif, TAG_COMPRESSION, &comp);
    TIFFGetField(tif, TAG_YCBCRSUBSAMPLING, &sh, &sv);
    if (photometric != PHOTOMETRIC_YCBCR_ || comp != COMPRESSION_JPEG_ ||
        sh != 2 || sv != 2 || !L.tiled || L.tile_w % 16 || L.tile_h % 16)
      break;
    uint8_t* jt = nullptr;
    uint32_t jtlen = 0;
    TIFFGetField(tif, TAG_JPEGTABLES, &jtlen, &jt);
    std::vector<uint8_t> raw(4 << 20);
    tmsize_t n = TIFFReadRawTile(tif, 0, raw.data(), tmsize_t(raw.size()));
    if (n <= 0) break;
    jpeg_decompress_struct ci;
    DctErr jerr;
    ci.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = dct_error_exit;
    if (setjmp(jerr.env)) {
      jpeg_destroy_decompress(&ci);
      break;
    }
    jpeg_create_decompress(&ci);
    if (jtlen > 4) {
      jpeg_mem_src(&ci, jt, jtlen);
      jpeg_read_header(&ci, FALSE);
    }
    jpeg_mem_src(&ci, raw.data(), (unsigned long)n);
    jpeg_read_header(&ci, TRUE);
    if (ci.num_components == 3) {
      ok = 1;
      for (int c = 0; c < 3; ++c) {
        JQUANT_TBL* q = ci.quant_tbl_ptrs[ci.comp_info[c].quant_tbl_no];
        if (!q) { ok = 0; break; }
        std::memcpy(qt + c * 64, q->quantval, 128);
      }
    }
    jpeg_destroy_decompress(&ci);
  } while (false);
  s->release(tif);
  return ok;
}

// Batched thread-pooled sparse-DCT reads. Layout per region i (regions of
// (w x h) at 16-aligned coords):
//   y_dc  int16[i*ybl .. ]        ybl = (h/8)*(w/8), cbl = (h/16)*(w/16)
//   y_bm  uint8[i*ybl*8 .. ]
//   y_val int8[i*cap_y .. ]       nnz in y_nnz[i]
//   cb_*/cr_* same with cbl/cap_c; valid int32[i*2] = in-slide (w, h);
//   status int8[i]: 0 ok, 1 = re-read via a pixel path, 2 = hard error.
// Returns the number of non-ok regions (0 = all packed).
int32_t ws_read_regions_dct(void* handle, int32_t level,
                            const int64_t* coords, int32_t n, int64_t w,
                            int64_t h, int32_t cap_y, int32_t cap_c,
                            int16_t* y_dc, uint8_t* y_bm, int8_t* y_val,
                            int32_t* y_nnz, int16_t* cb_dc, uint8_t* cb_bm,
                            int8_t* cb_val, int32_t* cb_nnz, int16_t* cr_dc,
                            uint8_t* cr_bm, int8_t* cr_val, int32_t* cr_nnz,
                            int32_t* valid, int8_t* status,
                            int32_t n_threads) {
  Slide* s = static_cast<Slide*>(handle);
  if ((w | h) & 15 || w <= 0 || h <= 0) {
    for (int32_t i = 0; i < n; ++i) status[i] = 1;
    return n;
  }
  const int64_t ybl = (w / 8) * (h / 8), cbl = (w / 16) * (h / 16);

  // JPEGTables bytes: fetched once (pointer is per-handle state)
  std::vector<uint8_t> jtables;
  {
    TIFF* tif = s->acquire();
    if (!tif) return -1;
    if (TIFFSetDirectory(tif, s->levels[level].dir)) {
      uint8_t* jt = nullptr;
      uint32_t jtlen = 0;
      if (TIFFGetField(tif, TAG_JPEGTABLES, &jtlen, &jt) && jtlen)
        jtables.assign(jt, jt + jtlen);
    }
    s->release(tif);
  }

  if (n_threads <= 0) n_threads = int32_t(std::thread::hardware_concurrency());
  n_threads = std::max(1, std::min<int32_t>(n_threads, n));
  std::atomic<int32_t> next(0), bad(0);
  auto worker = [&]() {
    TIFF* tif = s->acquire();
    if (!tif) {
      bad.fetch_add(1);
      return;
    }
    std::vector<int16_t> dense[3];
    std::vector<uint8_t> rawbuf(4 << 20);
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) break;
      int16_t* dc[3] = {y_dc + size_t(i) * ybl, cb_dc + size_t(i) * cbl,
                        cr_dc + size_t(i) * cbl};
      uint8_t* bm[3] = {y_bm + size_t(i) * ybl * 8,
                        cb_bm + size_t(i) * cbl * 8,
                        cr_bm + size_t(i) * cbl * 8};
      int8_t* val[3] = {y_val + size_t(i) * cap_y,
                        cb_val + size_t(i) * cap_c,
                        cr_val + size_t(i) * cap_c};
      int32_t nnz[3] = {0, 0, 0};
      int r = extract_region_dct(
          s, tif, level, coords[2 * i], coords[2 * i + 1], w, h,
          jtables.data(), uint32_t(jtables.size()), cap_y, cap_c, dc, bm,
          val, nnz, valid + 2 * i, dense, rawbuf);
      y_nnz[i] = nnz[0];
      cb_nnz[i] = nnz[1];
      cr_nnz[i] = nnz[2];
      status[i] = int8_t(r < 0 ? 2 : r);
      if (r) bad.fetch_add(1);
    }
    s->release(tif);
  };
  std::vector<std::thread> threads;
  for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return bad.load();
}

// ---------------------------------------------------------------------------
// Pyramid writer: level-0 RGB -> tiled multi-directory TIFF with 2x
// box-filtered levels. compression: 1=none, 7=jpeg, 8=deflate.
// ---------------------------------------------------------------------------
static bool write_level(TIFF* tif, const uint8_t* img, int64_t w, int64_t h,
                        uint32_t tile, uint16_t compression, int quality,
                        bool ycbcr420 = false) {
  TIFFSetField(tif, TAG_IMAGEWIDTH, uint32_t(w));
  TIFFSetField(tif, TAG_IMAGELENGTH, uint32_t(h));
  TIFFSetField(tif, TAG_BITSPERSAMPLE, uint16_t(8));
  TIFFSetField(tif, TAG_SAMPLESPERPIXEL, uint16_t(3));
  if (ycbcr420 && compression == COMPRESSION_JPEG_) {
    // TCGA-style storage: JPEG-coded YCbCr with 2x2 chroma subsampling.
    // JPEGCOLORMODE_RGB lets us feed RGB rows; libjpeg subsamples inside.
    TIFFSetField(tif, TAG_PHOTOMETRIC, uint16_t(PHOTOMETRIC_YCBCR_));
    TIFFSetField(tif, TAG_YCBCRSUBSAMPLING, uint16_t(2), uint16_t(2));
  } else {
    TIFFSetField(tif, TAG_PHOTOMETRIC, uint16_t(PHOTOMETRIC_RGB_));
  }
  TIFFSetField(tif, TAG_PLANARCONFIG, uint16_t(PLANARCONFIG_CONTIG_));
  TIFFSetField(tif, TAG_COMPRESSION, compression);
  TIFFSetField(tif, TAG_TILEWIDTH, tile);
  TIFFSetField(tif, TAG_TILELENGTH, tile);
  if (compression == COMPRESSION_JPEG_) {
    TIFFSetField(tif, TAG_JPEGQUALITY, quality);
    if (ycbcr420)
      TIFFSetField(tif, TAG_JPEGCOLORMODE, int32_t(JPEGCOLORMODE_RGB_));
  }

  std::vector<uint8_t> tilebuf(size_t(tile) * tile * 3, 0xff);
  for (int64_t ty = 0; ty < (h + tile - 1) / tile; ++ty) {
    for (int64_t tx = 0; tx < (w + tile - 1) / tile; ++tx) {
      std::fill(tilebuf.begin(), tilebuf.end(), 0xff);
      const int64_t x0 = tx * tile, y0 = ty * tile;
      const int64_t cw = std::min<int64_t>(tile, w - x0);
      const int64_t ch = std::min<int64_t>(tile, h - y0);
      for (int64_t r = 0; r < ch; ++r)
        std::memcpy(tilebuf.data() + size_t(r) * tile * 3,
                    img + (size_t(y0 + r) * w + x0) * 3, size_t(cw) * 3);
      uint32_t tnum =
          TIFFComputeTile(tif, uint32_t(x0), uint32_t(y0), 0, 0);
      if (TIFFWriteEncodedTile(tif, tnum, tilebuf.data(),
                               tmsize_t(tilebuf.size())) < 0)
        return false;
    }
  }
  return TIFFWriteDirectory(tif) == 1;
}

int32_t ws_write_pyramid2(const char* path, const uint8_t* level0, int64_t w,
                          int64_t h, int32_t tile, int32_t n_levels,
                          int32_t compression, int32_t quality,
                          int32_t ycbcr420) {
  TIFFSetErrorHandler(quiet_handler);
  TIFFSetWarningHandler(quiet_handler);
  TIFF* tif = TIFFOpen(path, "w");
  if (!tif) return -1;
  std::vector<uint8_t> cur(level0, level0 + size_t(w) * h * 3);
  int64_t cw = w, ch = h;
  for (int32_t lvl = 0; lvl < n_levels; ++lvl) {
    if (!write_level(tif, cur.data(), cw, ch, uint32_t(tile),
                     uint16_t(compression), quality, ycbcr420 != 0)) {
      TIFFClose(tif);
      return -2;
    }
    if (lvl + 1 < n_levels) {  // 2x box downsample
      int64_t nw = std::max<int64_t>(1, cw / 2), nh = std::max<int64_t>(1, ch / 2);
      std::vector<uint8_t> nxt(size_t(nw) * nh * 3);
      for (int64_t r = 0; r < nh; ++r)
        for (int64_t c = 0; c < nw; ++c)
          for (int k = 0; k < 3; ++k) {
            int sum = cur[(size_t(2 * r) * cw + 2 * c) * 3 + k] +
                      cur[(size_t(2 * r) * cw + std::min(2 * c + 1, cw - 1)) * 3 + k] +
                      cur[(size_t(std::min(2 * r + 1, ch - 1)) * cw + 2 * c) * 3 + k] +
                      cur[(size_t(std::min(2 * r + 1, ch - 1)) * cw +
                           std::min(2 * c + 1, cw - 1)) * 3 + k];
            nxt[(size_t(r) * nw + c) * 3 + k] = uint8_t(sum / 4);
          }
      cur.swap(nxt);
      cw = nw;
      ch = nh;
    }
  }
  TIFFClose(tif);
  return 0;
}

int32_t ws_write_pyramid(const char* path, const uint8_t* level0, int64_t w,
                         int64_t h, int32_t tile, int32_t n_levels,
                         int32_t compression, int32_t quality) {
  return ws_write_pyramid2(path, level0, w, h, tile, n_levels, compression,
                           quality, 0);
}

}  // extern "C"
