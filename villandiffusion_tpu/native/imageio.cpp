// Native image IO runtime: threaded PNG codec over zlib.
//
// Replaces the reference's per-image PIL PNG round-trip in the measure path
// (/root/reference/model.py:496-502 writes 10k PNGs one-by-one through PIL;
// /root/reference/VillanDiffusion.py:1063-1078 reloads them through PIL) —
// SURVEY.md flags that disk boundary as "a known throughput sink".  Here the
// whole batch is encoded and written by a std::thread pool in one C call, and
// decode reads straight into the caller's NHWC buffer.
//
// Encoder: 8-bit gray/RGB/RGBA, adaptive per-row filter (min sum-of-abs
// heuristic over filters 0-4), zlib deflate.
// Decoder: 8-bit, color types 0/2/3/4/6, non-interlaced, full unfiltering,
// with gray<->RGB/alpha-drop conversion into the requested channel count.
//
// Build: g++ -O2 -shared -fPIC imageio.cpp -lz (see native/__init__.py).

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

constexpr uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

inline void put_u32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back((x >> 24) & 0xff);
  v.push_back((x >> 16) & 0xff);
  v.push_back((x >> 8) & 0xff);
  v.push_back(x & 0xff);
}

inline uint32_t get_u32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t len) {
  put_u32(out, static_cast<uint32_t>(len));
  size_t type_at = out.size();
  out.insert(out.end(), type, type + 4);
  out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0, out.data() + type_at, static_cast<uInt>(4 + len));
  put_u32(out, crc);
}

inline uint8_t paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return static_cast<uint8_t>(a);
  if (pb <= pc) return static_cast<uint8_t>(b);
  return static_cast<uint8_t>(c);
}

// Apply filter `f` to row `cur` (prev = row above or null), bpp bytes/pixel.
void filter_row(int f, const uint8_t* cur, const uint8_t* prev, int stride,
                int bpp, uint8_t* out) {
  for (int i = 0; i < stride; ++i) {
    int a = i >= bpp ? cur[i - bpp] : 0;
    int b = prev ? prev[i] : 0;
    int c = (prev && i >= bpp) ? prev[i - bpp] : 0;
    int x = cur[i];
    switch (f) {
      case 0: out[i] = static_cast<uint8_t>(x); break;
      case 1: out[i] = static_cast<uint8_t>(x - a); break;
      case 2: out[i] = static_cast<uint8_t>(x - b); break;
      case 3: out[i] = static_cast<uint8_t>(x - ((a + b) >> 1)); break;
      case 4: out[i] = static_cast<uint8_t>(x - paeth(a, b, c)); break;
    }
  }
}

int encode_png(const uint8_t* data, int h, int w, int c, int level,
               std::vector<uint8_t>& out) {
  if (c != 1 && c != 3 && c != 4) return -1;
  const int color_type = c == 1 ? 0 : (c == 3 ? 2 : 6);
  const int stride = w * c;

  // Filtered scanlines: adaptive min-sum-of-abs filter per row.
  std::vector<uint8_t> raw(static_cast<size_t>(h) * (stride + 1));
  std::vector<uint8_t> trial(stride);
  for (int y = 0; y < h; ++y) {
    const uint8_t* cur = data + static_cast<size_t>(y) * stride;
    const uint8_t* prev = y ? data + static_cast<size_t>(y - 1) * stride : nullptr;
    int best_f = 0;
    long best_sum = -1;
    uint8_t* dst = raw.data() + static_cast<size_t>(y) * (stride + 1);
    for (int f = 0; f < 5; ++f) {
      filter_row(f, cur, prev, stride, c, trial.data());
      long sum = 0;
      for (int i = 0; i < stride; ++i) {
        int8_t s = static_cast<int8_t>(trial[i]);
        sum += s < 0 ? -s : s;
      }
      if (best_sum < 0 || sum < best_sum) {
        best_sum = sum;
        best_f = f;
        dst[0] = static_cast<uint8_t>(f);
        std::memcpy(dst + 1, trial.data(), stride);
      }
    }
    (void)best_f;
  }

  uLongf bound = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> comp(bound);
  if (compress2(comp.data(), &bound, raw.data(),
                static_cast<uLong>(raw.size()), level) != Z_OK)
    return -2;
  comp.resize(bound);

  out.clear();
  out.reserve(comp.size() + 128);
  out.insert(out.end(), kSig, kSig + 8);
  uint8_t ihdr[13];
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;                                   // bit depth
  ihdr[9] = static_cast<uint8_t>(color_type);
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;      // deflate/adaptive/no interlace
  put_chunk(out, "IHDR", ihdr, 13);
  put_chunk(out, "IDAT", comp.data(), comp.size());
  put_chunk(out, "IEND", nullptr, 0);
  return 0;
}

int write_file(const char* path, const uint8_t* data, size_t len) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  size_t n = std::fwrite(data, 1, len, f);
  std::fclose(f);
  return n == len ? 0 : -2;
}

struct PngImage {
  int w = 0, h = 0, channels = 0;
  std::vector<uint8_t> pixels;  // unfiltered, h*w*channels
};

int decode_png(const uint8_t* buf, size_t len, PngImage& img) {
  if (len < 8 || std::memcmp(buf, kSig, 8) != 0) return -1;
  size_t pos = 8;
  int w = 0, h = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // 3*256
  bool saw_ihdr = false;

  while (pos + 8 <= len) {
    uint32_t clen = get_u32(buf + pos);
    const uint8_t* type = buf + pos + 4;
    const uint8_t* cdata = buf + pos + 8;
    if (pos + 12 + clen > len) return -2;
    if (!std::memcmp(type, "IHDR", 4)) {
      if (clen != 13) return -3;
      w = static_cast<int>(get_u32(cdata));
      h = static_cast<int>(get_u32(cdata + 4));
      bit_depth = cdata[8];
      color_type = cdata[9];
      interlace = cdata[12];
      saw_ihdr = true;
    } else if (!std::memcmp(type, "PLTE", 4)) {
      palette.assign(cdata, cdata + clen);
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), cdata, cdata + clen);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;
  }
  if (!saw_ihdr || w <= 0 || h <= 0) return -3;
  if (bit_depth != 8 || interlace != 0) return -4;  // caller falls back to PIL

  int src_c;
  switch (color_type) {
    case 0: src_c = 1; break;  // gray
    case 2: src_c = 3; break;  // RGB
    case 3: src_c = 1; break;  // palette index
    case 4: src_c = 2; break;  // gray+alpha
    case 6: src_c = 4; break;  // RGBA
    default: return -4;
  }
  const int stride = w * src_c;

  std::vector<uint8_t> raw(static_cast<size_t>(h) * (stride + 1));
  uLongf raw_len = static_cast<uLongf>(raw.size());
  if (uncompress(raw.data(), &raw_len, idat.data(),
                 static_cast<uLong>(idat.size())) != Z_OK ||
      raw_len != raw.size())
    return -5;

  // Unfilter in place into pixels.
  std::vector<uint8_t> pix(static_cast<size_t>(h) * stride);
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + static_cast<size_t>(y) * (stride + 1);
    uint8_t* cur = pix.data() + static_cast<size_t>(y) * stride;
    const uint8_t* up = y ? pix.data() + static_cast<size_t>(y - 1) * stride : nullptr;
    int f = src[0];
    const uint8_t* s = src + 1;
    for (int i = 0; i < stride; ++i) {
      int a = i >= src_c ? cur[i - src_c] : 0;
      int b = up ? up[i] : 0;
      int cc = (up && i >= src_c) ? up[i - src_c] : 0;
      int x = s[i];
      switch (f) {
        case 0: cur[i] = static_cast<uint8_t>(x); break;
        case 1: cur[i] = static_cast<uint8_t>(x + a); break;
        case 2: cur[i] = static_cast<uint8_t>(x + b); break;
        case 3: cur[i] = static_cast<uint8_t>(x + ((a + b) >> 1)); break;
        case 4: cur[i] = static_cast<uint8_t>(x + paeth(a, b, cc)); break;
        default: return -6;
      }
    }
  }

  if (color_type == 3) {  // palette -> RGB
    if (palette.empty()) return -7;
    img.channels = 3;
    img.pixels.resize(static_cast<size_t>(h) * w * 3);
    for (size_t i = 0; i < static_cast<size_t>(h) * w; ++i) {
      unsigned idx = pix[i];
      if (3 * idx + 2 >= palette.size()) return -7;
      img.pixels[3 * i + 0] = palette[3 * idx + 0];
      img.pixels[3 * i + 1] = palette[3 * idx + 1];
      img.pixels[3 * i + 2] = palette[3 * idx + 2];
    }
  } else {
    img.channels = src_c;
    img.pixels = std::move(pix);
  }
  img.w = w;
  img.h = h;
  return 0;
}

// Convert decoded image into `want_c` channels (1, 3) at the caller's buffer.
int convert_channels(const PngImage& img, int want_c, uint8_t* out) {
  const int n = img.w * img.h;
  const int sc = img.channels;
  if (sc == want_c) {
    std::memcpy(out, img.pixels.data(), static_cast<size_t>(n) * sc);
    return 0;
  }
  const uint8_t* p = img.pixels.data();
  if (want_c == 3) {
    for (int i = 0; i < n; ++i) {
      uint8_t g = p[i * sc];  // gray / gray+alpha / first of RGBA
      if (sc >= 3) {
        out[3 * i] = p[i * sc];
        out[3 * i + 1] = p[i * sc + 1];
        out[3 * i + 2] = p[i * sc + 2];
      } else {
        out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = g;
      }
    }
    return 0;
  }
  if (want_c == 1) {
    for (int i = 0; i < n; ++i) {
      if (sc >= 3) {
        // ITU-R 601 luma, integer arithmetic
        int y = (299 * p[i * sc] + 587 * p[i * sc + 1] + 114 * p[i * sc + 2] +
                 500) / 1000;
        out[i] = static_cast<uint8_t>(y);
      } else {
        out[i] = p[i * sc];
      }
    }
    return 0;
  }
  return -1;
}

int read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  if (sz < 0) { std::fclose(f); return -1; }
  std::fseek(f, 0, SEEK_SET);
  buf.resize(static_cast<size_t>(sz));
  size_t n = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  return n == buf.size() ? 0 : -2;
}

void parallel_for(int n, int n_threads, const std::function<void(int)>& fn) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  if (n_threads > n) n_threads = n;
  if (n_threads <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&]() {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}
}  // namespace

extern "C" {

// Write one PNG. Returns 0 on success.
int vd_write_png(const char* path, const uint8_t* data, int h, int w, int c,
                 int level) {
  std::vector<uint8_t> out;
  int rc = encode_png(data, h, w, c, level, out);
  if (rc) return rc;
  return write_file(path, out.data(), out.size());
}

// Encode+write a whole NHWC batch with a thread pool. Returns the number of
// failed images (0 = all ok).
int vd_write_png_batch(const char* const* paths, const uint8_t* data, int n,
                       int h, int w, int c, int level, int n_threads) {
  std::atomic<int> failures(0);
  const size_t img_sz = static_cast<size_t>(h) * w * c;
  parallel_for(n, n_threads, [&](int i) {
    if (vd_write_png(paths[i], data + img_sz * i, h, w, c, level) != 0)
      failures.fetch_add(1);
  });
  return failures.load();
}

// Probe dimensions. Returns 0 and fills h/w/c on success.
int vd_png_info(const char* path, int* h, int* w, int* c) {
  std::vector<uint8_t> buf;
  if (read_file(path, buf)) return -1;
  PngImage img;
  int rc = decode_png(buf.data(), buf.size(), img);
  if (rc) return rc;
  *h = img.h;
  *w = img.w;
  *c = img.channels == 2 ? 1 : (img.channels == 4 ? 3 : img.channels);
  return 0;
}

// Read one PNG into an h*w*want_c buffer (converting channels). Dimensions
// must match exactly. Returns 0 on success.
int vd_read_png(const char* path, uint8_t* out, int h, int w, int want_c) {
  std::vector<uint8_t> buf;
  if (read_file(path, buf)) return -1;
  PngImage img;
  int rc = decode_png(buf.data(), buf.size(), img);
  if (rc) return rc;
  if (img.h != h || img.w != w) return -8;
  return convert_channels(img, want_c, out);
}

// Threaded batch read into a preallocated n*h*w*want_c buffer. Returns the
// number of failed images (0 = all ok).
int vd_read_png_batch(const char* const* paths, uint8_t* out, int n, int h,
                      int w, int want_c, int n_threads) {
  std::atomic<int> failures(0);
  const size_t img_sz = static_cast<size_t>(h) * w * want_c;
  parallel_for(n, n_threads, [&](int i) {
    if (vd_read_png(paths[i], out + img_sz * i, h, w, want_c) != 0)
      failures.fetch_add(1);
  });
  return failures.load();
}

}  // extern "C"
