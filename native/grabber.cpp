// Native dataset loader for scavislam_tpu.
//
// C++ replacement for the reference's FileGrabber
// (/root/reference/scavislam/filegrabber.{h,cpp}): recursive regex scan of a
// dataset directory, image decode, and a producer thread that prefetches
// frames into a bounded ring buffer (the reference caps it at 50 frames,
// filegrabber.cpp:54-61) so disk latency never stalls the tracking loop.
//
// Formats: binary PGM (P5) and PPM (P6) — the New College sequences ship as
// .pnm — plus 8-bit non-interlaced PNG (gray / RGB / RGBA, all filter
// types; covers everything dump_sequence writes and typical dataset PNGs).
// Exotic PNGs (16-bit, palette, interlaced) and JPEG fall back to PIL on
// the Python side through the same prefetch queue.
//
// C ABI only (consumed via ctypes; no pybind11 in this image).

#include <atomic>
#include <zlib.h>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <mutex>
#include <queue>
#include <regex>
#include <string>
#include <sys/stat.h>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;
  std::vector<uint8_t> data;
};

bool load_pnm(const std::string &path, Image *out) {
  FILE *f = fopen(path.c_str(), "rb");
  if (!f) return false;
  char magic[3] = {0};
  if (fscanf(f, "%2s", magic) != 1) { fclose(f); return false; }
  int channels;
  if (strcmp(magic, "P5") == 0) channels = 1;
  else if (strcmp(magic, "P6") == 0) channels = 3;
  else { fclose(f); return false; }

  auto skip_ws_comments = [&]() {
    int c;
    while ((c = fgetc(f)) != EOF) {
      if (c == '#') { while ((c = fgetc(f)) != EOF && c != '\n') {} }
      else if (!isspace(c)) { ungetc(c, f); break; }
    }
  };
  int w, h, maxval;
  skip_ws_comments(); if (fscanf(f, "%d", &w) != 1) { fclose(f); return false; }
  skip_ws_comments(); if (fscanf(f, "%d", &h) != 1) { fclose(f); return false; }
  skip_ws_comments(); if (fscanf(f, "%d", &maxval) != 1) { fclose(f); return false; }
  fgetc(f);  // single whitespace after maxval
  if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) { fclose(f); return false; }

  out->width = w; out->height = h; out->channels = channels;
  out->data.resize(static_cast<size_t>(w) * h * channels);
  size_t got = fread(out->data.data(), 1, out->data.size(), f);
  fclose(f);
  return got == out->data.size();
}

// ---- minimal PNG decoder (8-bit, non-interlaced, color types 0/2/6) ------

inline int paeth(int a, int b, int c) {
  int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  return (pb <= pc) ? b : c;
}

bool load_png(const std::string &path, Image *out) {
  FILE *f = fopen(path.c_str(), "rb");
  if (!f) return false;
  uint8_t sig[8];
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (fread(sig, 1, 8, f) != 8 || memcmp(sig, kSig, 8) != 0) {
    fclose(f);
    return false;
  }
  auto rd32 = [&](uint32_t *v) {
    uint8_t b[4];
    if (fread(b, 1, 4, f) != 4) return false;
    *v = (uint32_t(b[0]) << 24) | (uint32_t(b[1]) << 16) |
         (uint32_t(b[2]) << 8) | b[3];
    return true;
  };
  uint32_t w = 0, h = 0;
  int channels = 0;
  std::vector<uint8_t> idat;
  bool seen_ihdr = false;
  for (;;) {
    uint32_t len, type;
    if (!rd32(&len) || !rd32(&type)) { fclose(f); return false; }
    if (type == 0x49484452u) {  // IHDR
      uint8_t hdr[13];
      if (len != 13 || fread(hdr, 1, 13, f) != 13) { fclose(f); return false; }
      w = (uint32_t(hdr[0]) << 24) | (uint32_t(hdr[1]) << 16) |
          (uint32_t(hdr[2]) << 8) | hdr[3];
      h = (uint32_t(hdr[4]) << 24) | (uint32_t(hdr[5]) << 16) |
          (uint32_t(hdr[6]) << 8) | hdr[7];
      int depth = hdr[8], color = hdr[9], interlace = hdr[12];
      if (depth != 8 || interlace != 0) { fclose(f); return false; }
      if (color == 0) channels = 1;
      else if (color == 2) channels = 3;
      else if (color == 6) channels = 4;
      else { fclose(f); return false; }  // palette/gray+alpha -> PIL
      seen_ihdr = true;
    } else if (type == 0x49444154u) {  // IDAT
      size_t off = idat.size();
      idat.resize(off + len);
      if (len && fread(idat.data() + off, 1, len, f) != len) {
        fclose(f);
        return false;
      }
    } else if (type == 0x49454E44u) {  // IEND
      fseek(f, 4, SEEK_CUR);
      break;
    } else {
      if (fseek(f, len, SEEK_CUR) != 0) { fclose(f); return false; }
    }
    fseek(f, 4, SEEK_CUR);  // CRC (not verified — decode, don't validate)
  }
  fclose(f);
  if (!seen_ihdr || w == 0 || h == 0 || idat.empty()) return false;

  const size_t stride = size_t(w) * channels;
  std::vector<uint8_t> raw(size_t(h) * (stride + 1));
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size())
    return false;

  out->width = int(w);
  out->height = int(h);
  out->channels = channels;
  out->data.assign(size_t(h) * stride, 0);
  const int bpp = channels;
  for (size_t y = 0; y < h; ++y) {
    const uint8_t *src = raw.data() + y * (stride + 1);
    uint8_t filt = src[0];
    const uint8_t *s = src + 1;
    uint8_t *dst = out->data.data() + y * stride;
    const uint8_t *up = y ? dst - stride : nullptr;
    switch (filt) {
      case 0:
        memcpy(dst, s, stride);
        break;
      case 1:  // Sub
        for (size_t i = 0; i < stride; ++i)
          dst[i] = uint8_t(s[i] + (i >= size_t(bpp) ? dst[i - bpp] : 0));
        break;
      case 2:  // Up
        for (size_t i = 0; i < stride; ++i)
          dst[i] = uint8_t(s[i] + (up ? up[i] : 0));
        break;
      case 3:  // Average
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= size_t(bpp) ? dst[i - bpp] : 0;
          int b = up ? up[i] : 0;
          dst[i] = uint8_t(s[i] + ((a + b) >> 1));
        }
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= size_t(bpp) ? dst[i - bpp] : 0;
          int b = up ? up[i] : 0;
          int c = (up && i >= size_t(bpp)) ? up[i - bpp] : 0;
          dst[i] = uint8_t(s[i] + paeth(a, b, c));
        }
        break;
      default:
        return false;
    }
  }
  return true;
}

bool load_image_any(const std::string &path, Image *out) {
  if (load_pnm(path, out)) return true;
  return load_png(path, out);
}

void scan_recursive(const std::string &dir, const std::regex &re,
                    std::vector<std::string> *out) {
  DIR *d = opendir(dir.c_str());
  if (!d) return;
  struct dirent *e;
  while ((e = readdir(d)) != nullptr) {
    std::string name = e->d_name;
    if (name == "." || name == "..") continue;
    std::string full = dir + "/" + name;
    struct stat st;
    if (stat(full.c_str(), &st) != 0) continue;
    if (S_ISDIR(st.st_mode)) {
      scan_recursive(full, re, out);
    } else if (std::regex_search(name, re)) {
      out->push_back(full);
    }
  }
  closedir(d);
}

// ---- prefetching sequence reader -----------------------------------------

struct Frame {
  int64_t index = -1;
  Image img;
  bool ok = false;
};

struct Sequence {
  std::vector<std::string> files;
  std::thread producer;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::queue<Frame> buffer;
  size_t max_buffer = 50;  // filegrabber.cpp:54-61
  std::atomic<bool> stop{false};
  int64_t next_to_produce = 0;

  void run() {
    for (size_t i = 0; i < files.size() && !stop.load(); ++i) {
      Frame fr;
      fr.index = static_cast<int64_t>(i);
      fr.ok = load_image_any(files[i], &fr.img);
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] { return buffer.size() < max_buffer || stop.load(); });
      if (stop.load()) return;
      buffer.push(std::move(fr));
      cv_pop.notify_one();
    }
  }
};

std::mutex g_registry_mu;
std::vector<Sequence *> g_sequences;
std::vector<std::string> g_scan_result;  // guarded by g_registry_mu

}  // namespace

extern "C" {

// ---- directory scanning ---------------------------------------------------

// Scan `dir` recursively for files matching `pattern` (ECMAScript regex on
// the basename). Returns the number of files found (sorted); retrieve with
// svt_scan_get. Thread-unsafe by design (single loader thread).
int svt_scan(const char *dir, const char *pattern) {
  std::lock_guard<std::mutex> lk(g_registry_mu);
  g_scan_result.clear();
  try {
    std::regex re(pattern);
    scan_recursive(dir, re, &g_scan_result);
  } catch (const std::regex_error &) {
    return -1;
  }
  std::sort(g_scan_result.begin(), g_scan_result.end());
  return static_cast<int>(g_scan_result.size());
}

int svt_scan_get(int idx, char *out, int cap) {
  std::lock_guard<std::mutex> lk(g_registry_mu);
  if (idx < 0 || idx >= static_cast<int>(g_scan_result.size())) return -1;
  const std::string &s = g_scan_result[idx];
  if (static_cast<int>(s.size()) + 1 > cap) return -1;
  memcpy(out, s.c_str(), s.size() + 1);
  return static_cast<int>(s.size());
}

// ---- single-image decode --------------------------------------------------

// Decode a PNM or 8-bit non-interlaced PNG into a caller-provided buffer.
// Returns 0 on success and fills w/h/c; if buf is null only probes the
// header. buf must hold w*h*c bytes. (Name kept for ctypes ABI compat.)
int svt_load_pnm(const char *path, uint8_t *buf, int64_t buf_cap,
                 int *w, int *h, int *c) {
  Image img;
  if (!load_image_any(path, &img)) return -1;
  *w = img.width; *h = img.height; *c = img.channels;
  if (buf == nullptr) return 0;
  if (static_cast<int64_t>(img.data.size()) > buf_cap) return -2;
  memcpy(buf, img.data.data(), img.data.size());
  return 0;
}

// ---- prefetching sequence -------------------------------------------------

// Open a prefetching sequence over the files matched by the LAST svt_scan
// call. Returns a handle (>= 0) or -1.
int svt_seq_open(int max_buffer) {
  std::lock_guard<std::mutex> lk(g_registry_mu);
  auto *s = new Sequence();
  s->files = g_scan_result;
  if (max_buffer > 0) s->max_buffer = static_cast<size_t>(max_buffer);
  s->producer = std::thread([s] { s->run(); });
  g_sequences.push_back(s);
  return static_cast<int>(g_sequences.size()) - 1;
}

int svt_seq_count(int handle) {
  std::lock_guard<std::mutex> lk(g_registry_mu);
  if (handle < 0 || handle >= static_cast<int>(g_sequences.size())) return -1;
  if (g_sequences[handle] == nullptr) return -1;
  return static_cast<int>(g_sequences[handle]->files.size());
}

// Blocking pop of the next frame in order. Returns frame index (>=0), -1 at
// end of sequence, -2 on decode failure. Caller buffer must be large enough.
int64_t svt_seq_next(int handle, uint8_t *buf, int64_t buf_cap,
                     int *w, int *h, int *c) {
  Sequence *s;
  {
    std::lock_guard<std::mutex> lk(g_registry_mu);
    if (handle < 0 || handle >= static_cast<int>(g_sequences.size())) return -1;
    s = g_sequences[handle];
    if (s == nullptr) return -1;
  }
  std::unique_lock<std::mutex> lk(s->mu);
  if (s->next_to_produce >= static_cast<int64_t>(s->files.size()) &&
      s->buffer.empty())
    return -1;
  s->cv_pop.wait(lk, [&] { return !s->buffer.empty(); });
  Frame fr = std::move(s->buffer.front());
  s->buffer.pop();
  s->next_to_produce = fr.index + 1;
  s->cv_push.notify_one();
  lk.unlock();
  if (!fr.ok) return -2;
  *w = fr.img.width; *h = fr.img.height; *c = fr.img.channels;
  int64_t n = static_cast<int64_t>(fr.img.data.size());
  if (n > buf_cap) return -2;
  memcpy(buf, fr.img.data.data(), n);
  return fr.index;
}

void svt_seq_close(int handle) {
  Sequence *s = nullptr;
  {
    std::lock_guard<std::mutex> lk(g_registry_mu);
    if (handle < 0 || handle >= static_cast<int>(g_sequences.size())) return;
    s = g_sequences[handle];
    g_sequences[handle] = nullptr;
  }
  if (!s) return;
  s->stop.store(true);
  s->cv_push.notify_all();
  if (s->producer.joinable()) s->producer.join();
  delete s;
}

}  // extern "C"
