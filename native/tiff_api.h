// Minimal declarations for the stable libtiff C ABI (libtiff.so.6 ships in
// this image without dev headers). Only the symbols we call, with their
// canonical signatures; TIFF* is opaque and TIFFGetField/TIFFSetField are
// varargs, so the ABI is header-independent.
#pragma once
#include <cstdarg>
#include <cstdint>
#include <cstddef>

extern "C" {
typedef struct tiff TIFF;
typedef int64_t tmsize_t;

TIFF* TIFFOpen(const char* name, const char* mode);
void TIFFClose(TIFF* tif);
int TIFFGetField(TIFF* tif, uint32_t tag, ...);
int TIFFSetField(TIFF* tif, uint32_t tag, ...);
int TIFFSetDirectory(TIFF* tif, uint16_t dirnum);
uint16_t TIFFNumberOfDirectories(TIFF* tif);
int TIFFWriteDirectory(TIFF* tif);
tmsize_t TIFFTileSize(TIFF* tif);
uint32_t TIFFComputeTile(TIFF* tif, uint32_t x, uint32_t y, uint32_t z,
                         uint16_t s);
tmsize_t TIFFReadEncodedTile(TIFF* tif, uint32_t tile, void* buf,
                             tmsize_t size);
tmsize_t TIFFReadRawTile(TIFF* tif, uint32_t tile, void* buf, tmsize_t size);
tmsize_t TIFFWriteEncodedTile(TIFF* tif, uint32_t tile, void* data,
                              tmsize_t cc);
int TIFFReadRGBATile(TIFF* tif, uint32_t x, uint32_t y, uint32_t* raster);
int TIFFIsCODECConfigured(uint16_t scheme);
typedef void (*TIFFErrorHandler)(const char*, const char*, va_list);
TIFFErrorHandler TIFFSetErrorHandler(TIFFErrorHandler);
TIFFErrorHandler TIFFSetWarningHandler(TIFFErrorHandler);
}

// Tag constants (TIFF 6.0 spec)
enum : uint32_t {
  TAG_IMAGEWIDTH = 256,
  TAG_IMAGELENGTH = 257,
  TAG_BITSPERSAMPLE = 258,
  TAG_COMPRESSION = 259,
  TAG_PHOTOMETRIC = 262,
  TAG_SAMPLESPERPIXEL = 277,
  TAG_PLANARCONFIG = 284,
  TAG_TILEWIDTH = 322,
  TAG_TILELENGTH = 323,
  TAG_TILEBYTECOUNTS = 325,  // uint64[] via TIFFGetField (libtiff 4.x ABI)
  TAG_SAMPLEFORMAT = 339,
  TAG_JPEGTABLES = 347,
  TAG_YCBCRSUBSAMPLING = 530,
  TAG_JPEGQUALITY = 65537,   // pseudo-tag
  TAG_JPEGCOLORMODE = 65538,  // pseudo-tag
};

enum : uint16_t {
  COMPRESSION_NONE_ = 1,
  COMPRESSION_JPEG_ = 7,
  COMPRESSION_DEFLATE_ = 8,
  PHOTOMETRIC_RGB_ = 2,
  PHOTOMETRIC_YCBCR_ = 6,
  PLANARCONFIG_CONTIG_ = 1,
  JPEGCOLORMODE_RAW_ = 0,
  JPEGCOLORMODE_RGB_ = 1,
};
