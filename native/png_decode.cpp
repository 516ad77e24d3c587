#include "png_decode.h"

#include <zlib.h>

#include <cctype>
#include <cstring>

namespace svo_native {
namespace {

uint32_t ReadU32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int PaethPredictor(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool InflateAll(const std::vector<uint8_t>& in, std::vector<uint8_t>* out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  int ret;
  do {
    size_t old = out->size();
    out->resize(old + (1 << 16));
    zs.next_out = out->data() + old;
    zs.avail_out = 1 << 16;
    ret = inflate(&zs, Z_NO_FLUSH);
    out->resize(old + ((1 << 16) - zs.avail_out));
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
  } while (ret != Z_STREAM_END && zs.avail_in > 0);
  inflateEnd(&zs);
  return ret == Z_STREAM_END;
}

}  // namespace

bool DecodePngGray(const uint8_t* data, size_t size, GrayImage* out) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (size < 8 || std::memcmp(data, kSig, 8) != 0) return false;

  size_t pos = 8;
  int width = 0, height = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= size) {
    uint32_t len = ReadU32(data + pos);
    const char* type = reinterpret_cast<const char*>(data + pos + 4);
    const uint8_t* payload = data + pos + 8;
    if (pos + 12 + len > size) return false;
    if (std::memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return false;
      width = static_cast<int>(ReadU32(payload));
      height = static_cast<int>(ReadU32(payload + 4));
      bit_depth = payload[8];
      color_type = payload[9];
      interlace = payload[12];
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), payload, payload + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (width <= 0 || height <= 0 || bit_depth != 8 || interlace != 0)
    return false;
  int channels;
  switch (color_type) {
    case 0: channels = 1; break;
    case 2: channels = 3; break;
    case 4: channels = 2; break;
    case 6: channels = 4; break;
    default: return false;
  }

  std::vector<uint8_t> raw;
  if (!InflateAll(idat, &raw)) return false;
  const size_t stride = static_cast<size_t>(width) * channels;
  if (raw.size() < (stride + 1) * height) return false;

  // unfilter in place into a scanline buffer
  std::vector<uint8_t> prev(stride, 0), cur(stride, 0);
  out->width = width;
  out->height = height;
  out->pixels.resize(static_cast<size_t>(width) * height);
  for (int y = 0; y < height; ++y) {
    const uint8_t* line = raw.data() + y * (stride + 1);
    uint8_t filter = line[0];
    const uint8_t* src = line + 1;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= static_cast<size_t>(channels)
                  ? cur[x - channels] : 0;
      int b = prev[x];
      int c = x >= static_cast<size_t>(channels)
                  ? prev[x - channels] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += PaethPredictor(a, b, c); break;
        default: return false;
      }
      cur[x] = static_cast<uint8_t>(v & 0xFF);
    }
    float* dst = out->pixels.data() + static_cast<size_t>(y) * width;
    if (channels == 1) {
      for (int x = 0; x < width; ++x) dst[x] = cur[x];
    } else if (channels == 2) {
      for (int x = 0; x < width; ++x) dst[x] = cur[2 * x];
    } else {
      for (int x = 0; x < width; ++x) {
        const uint8_t* px = cur.data() + x * channels;
        dst[x] = 0.299f * px[0] + 0.587f * px[1] + 0.114f * px[2];
      }
    }
    std::swap(prev, cur);
  }
  return true;
}

bool DecodePgmGray(const uint8_t* data, size_t size, GrayImage* out) {
  if (size < 2 || data[0] != 'P' || data[1] != '5') return false;
  size_t pos = 2;
  auto skip_ws = [&]() {
    while (pos < size) {
      if (data[pos] == '#') {
        while (pos < size && data[pos] != '\n') ++pos;
      } else if (std::isspace(data[pos])) {
        ++pos;
      } else {
        break;
      }
    }
  };
  auto read_int = [&]() -> long {
    skip_ws();
    long v = 0;
    while (pos < size && std::isdigit(data[pos]))
      v = v * 10 + (data[pos++] - '0');
    return v;
  };
  long w = read_int(), h = read_int(), maxv = read_int();
  ++pos;  // single whitespace after maxval
  if (w <= 0 || h <= 0 || maxv != 255) return false;
  if (size - pos < static_cast<size_t>(w) * h) return false;
  out->width = static_cast<int>(w);
  out->height = static_cast<int>(h);
  out->pixels.resize(w * h);
  for (long i = 0; i < w * h; ++i)
    out->pixels[i] = static_cast<float>(data[pos + i]);
  return true;
}

}  // namespace svo_native
