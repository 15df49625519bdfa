// Native IO runtime for the OCT segmentation framework.
//
// The reference's only data pipeline is per-image Python cv2 reads inside
// the train loop (FourierNet/trainTestModels.py:13-59) — single-threaded
// host IO that cannot keep a TPU fed. This library provides the
// TPU-native equivalent of a framework data plane:
//
//   * MetaImage (.mhd/.mha + .raw) volume reader — RETOUCH's format —
//     with zlib decompression, implemented straight over pread/mmap-sized
//     buffers (no ITK dependency);
//   * a threaded prefetch pool: worker threads read + decompress volumes
//     ahead of the consumer into a bounded queue (the host-side double
//     buffer that overlaps disk IO with host->device transfer);
//   * fused per-image z-score normalization (the reference normalizes
//     per-image on the Python side, trainTestModels.py:17).
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (training/native_io.py); no pybind11 required.

#include <atomic>
#include <cctype>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct MhdHeader {
  long dims[3] = {0, 0, 0};  // X, Y, Z as written in the header
  int dtype_code = 0;        // 0 u8, 1 i8, 2 u16, 3 i16, 4 i32, 5 u32,
                             // 6 f32, 7 f64
  int compressed = 0;
  int local = 0;             // payload embedded after the header
  long payload_offset = 0;
  std::string data_file;
  std::string dir;
};

int dtype_size(int code) {
  static const int sizes[] = {1, 1, 2, 2, 4, 4, 4, 8};
  return (code >= 0 && code < 8) ? sizes[code] : 0;
}

int dtype_from_met(const std::string& met) {
  if (met == "MET_UCHAR") return 0;
  if (met == "MET_CHAR") return 1;
  if (met == "MET_USHORT") return 2;
  if (met == "MET_SHORT") return 3;
  if (met == "MET_INT") return 4;
  if (met == "MET_UINT") return 5;
  if (met == "MET_FLOAT") return 6;
  if (met == "MET_DOUBLE") return 7;
  return -1;
}

std::string trim(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

bool parse_header(const char* path, MhdHeader* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::string p(path);
  size_t slash = p.find_last_of('/');
  h->dir = slash == std::string::npos ? "." : p.substr(0, slash);
  char line[4096];
  while (std::fgets(line, sizeof line, f)) {
    std::string s(line);
    size_t eq = s.find('=');
    if (eq == std::string::npos) continue;
    std::string key = trim(s.substr(0, eq));
    std::string value = trim(s.substr(eq + 1));
    if (key == "DimSize") {
      std::sscanf(value.c_str(), "%ld %ld %ld", &h->dims[0], &h->dims[1],
                  &h->dims[2]);
    } else if (key == "ElementType") {
      h->dtype_code = dtype_from_met(value);
    } else if (key == "CompressedData") {
      h->compressed = (value == "True" || value == "true" || value == "1");
    } else if (key == "ElementDataFile") {
      if (value == "LOCAL" || value == "Local" || value == "local") {
        h->local = 1;
        h->payload_offset = std::ftell(f);
      } else {
        h->data_file = value;
      }
      break;  // ElementDataFile is last by spec
    }
  }
  std::fclose(f);
  return h->dims[0] > 0 && h->dtype_code >= 0;
}

bool read_file(const std::string& path, long offset, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f) - offset;
  if (size < 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, offset, SEEK_SET);
  out->resize(size);
  bool ok = std::fread(out->data(), 1, size, f) == static_cast<size_t>(size);
  std::fclose(f);
  return ok;
}

bool inflate_to(const std::vector<uint8_t>& in, uint8_t* out, long out_bytes) {
  z_stream zs;
  std::memset(&zs, 0, sizeof zs);
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = in.size();
  zs.next_out = out;
  zs.avail_out = out_bytes;
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END && zs.total_out == static_cast<uLong>(out_bytes);
}

bool read_volume(const char* path, uint8_t* out, long out_bytes) {
  MhdHeader h;
  if (!parse_header(path, &h)) return false;
  long need = h.dims[0] * h.dims[1] * (h.dims[2] ? h.dims[2] : 1) *
              dtype_size(h.dtype_code);
  if (need != out_bytes) return false;
  std::vector<uint8_t> raw;
  std::string src = h.local ? path : h.dir + "/" + h.data_file;
  if (!read_file(src, h.local ? h.payload_offset : 0, &raw)) return false;
  if (h.compressed) return inflate_to(raw, out, out_bytes);
  if (static_cast<long>(raw.size()) < out_bytes) return false;
  std::memcpy(out, raw.data(), out_bytes);
  return true;
}

// ---------------------------------------------------------------------------
// threaded prefetch pool
// ---------------------------------------------------------------------------

struct Item {
  int index = -1;
  std::vector<uint8_t> bytes;
  long dims[3] = {0, 0, 0};
  int dtype_code = 0;
  int ok = 0;
};

struct Prefetcher {
  std::vector<std::string> paths;
  std::atomic<int> next{0};
  size_t cap;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  // min-heap by index so the consumer sees deterministic file order
  struct Cmp {
    bool operator()(const Item* a, const Item* b) const {
      return a->index > b->index;
    }
  };
  std::priority_queue<Item*, std::vector<Item*>, Cmp> ready;
  int emitted = 0;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void worker() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= static_cast<int>(paths.size()) || stop.load()) return;
      Item* it = new Item;
      it->index = i;
      MhdHeader h;
      if (parse_header(paths[i].c_str(), &h)) {
        long bytes = h.dims[0] * h.dims[1] * (h.dims[2] ? h.dims[2] : 1) *
                     dtype_size(h.dtype_code);
        it->bytes.resize(bytes);
        it->ok = read_volume(paths[i].c_str(), it->bytes.data(), bytes);
        std::memcpy(it->dims, h.dims, sizeof h.dims);
        it->dtype_code = h.dtype_code;
      }
      std::unique_lock<std::mutex> lk(mu);
      // Window by INDEX, not queue size: a size bound can deadlock (queue
      // full of later items while the consumer waits for an earlier index
      // still being produced). At most cap + n_threads items live at once.
      cv_push.wait(lk, [&] {
        return it->index < emitted + static_cast<int>(cap) || stop.load();
      });
      if (stop.load()) {
        delete it;
        return;
      }
      ready.push(it);
      cv_pop.notify_all();
    }
  }

  Item* pop() {
    std::unique_lock<std::mutex> lk(mu);
    if (emitted >= static_cast<int>(paths.size())) return nullptr;
    cv_pop.wait(lk, [&] {
      return (!ready.empty() && ready.top()->index == emitted) || stop.load();
    });
    if (stop.load()) return nullptr;
    Item* it = ready.top();
    ready.pop();
    emitted++;
    cv_push.notify_all();
    return it;
  }
};

}  // namespace

extern "C" {

int octseg_mhd_info(const char* path, long dims[3], int* dtype_code,
                    int* compressed) {
  MhdHeader h;
  if (!parse_header(path, &h)) return -1;
  std::memcpy(dims, h.dims, sizeof h.dims);
  *dtype_code = h.dtype_code;
  *compressed = h.compressed;
  return 0;
}

int octseg_mhd_read(const char* path, void* out, long out_bytes) {
  return read_volume(path, static_cast<uint8_t*>(out), out_bytes) ? 0 : -1;
}

void* octseg_prefetch_create(const char** paths, int n, int n_threads,
                             int queue_cap) {
  auto* p = new Prefetcher;
  for (int i = 0; i < n; ++i) p->paths.emplace_back(paths[i]);
  p->cap = queue_cap > 0 ? queue_cap : 2;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int t = 0; t < nt; ++t)
    p->workers.emplace_back(&Prefetcher::worker, p);
  return p;
}

// Returns 1 with the next volume (file order), 0 at end, -1 on read error.
// Caller passes a buffer of `cap` bytes; *bytes gets the payload size and
// dims/dtype_code describe the array.
int octseg_prefetch_next(void* handle, void* out, long cap, long* bytes,
                         long dims[3], int* dtype_code, int* index) {
  auto* p = static_cast<Prefetcher*>(handle);
  Item* it = p->pop();
  if (!it) return 0;
  int rc = -1;
  if (it->ok && static_cast<long>(it->bytes.size()) <= cap) {
    std::memcpy(out, it->bytes.data(), it->bytes.size());
    *bytes = it->bytes.size();
    std::memcpy(dims, it->dims, sizeof it->dims);
    *dtype_code = it->dtype_code;
    *index = it->index;
    rc = 1;
  }
  delete it;
  return rc;
}

void octseg_prefetch_destroy(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  p->stop.store(true);
  p->cv_push.notify_all();
  p->cv_pop.notify_all();
  for (auto& t : p->workers) t.join();
  while (!p->ready.empty()) {
    delete p->ready.top();
    p->ready.pop();
  }
  delete p;
}

// Per-image z-score over a float32 image (the reference's per-image
// normalization, trainTestModels.py:17); eps guards constant images.
void octseg_zscore(float* data, long n) {
  double sum = 0.0, sumsq = 0.0;
  for (long i = 0; i < n; ++i) {
    sum += data[i];
    sumsq += static_cast<double>(data[i]) * data[i];
  }
  double mean = sum / n;
  double var = sumsq / n - mean * mean;
  float inv = 1.0f / std::sqrt(static_cast<float>(var) + 1e-7f);
  float m = static_cast<float>(mean);
  for (long i = 0; i < n; ++i) data[i] = (data[i] - m) * inv;
}

}  // extern "C"
