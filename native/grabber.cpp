// Native dataset loader for scavislam_tpu.
//
// C++ replacement for the reference's FileGrabber
// (/root/reference/scavislam/filegrabber.{h,cpp}): recursive regex scan of a
// dataset directory, image decode, and a producer thread that prefetches
// frames into a bounded ring buffer (the reference caps it at 50 frames,
// filegrabber.cpp:54-61) so disk latency never stalls the tracking loop.
//
// Formats: binary PGM (P5) and PPM (P6) — the New College sequences ship as
// .pnm — plus raw float32 disparity dumps. PNG/JPEG decode stays on the
// Python side (PIL) through the same prefetch queue.
//
// C ABI only (consumed via ctypes; no pybind11 in this image).

#include <atomic>
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
      fr.ok = load_pnm(files[i], &fr.img);
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

// Decode a PNM into caller-provided buffer. Returns 0 on success and fills
// w/h/c; if buf is null only probes the header. buf must hold w*h*c bytes.
int svt_load_pnm(const char *path, uint8_t *buf, int64_t buf_cap,
                 int *w, int *h, int *c) {
  Image img;
  if (!load_pnm(path, &img)) return -1;
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
