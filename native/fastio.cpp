// Fast parallel reader for per-image detection/label text files.
//
// The framework's on-disk contract (SURVEY.md section 2.9) stores one small
// whitespace-separated text file per image — COCO-scale runs touch ~15k tiny
// files per stage. This library scans and parses them with a thread pool and
// a hand-rolled float parser, returning one flat float buffer plus per-file
// row counts; Python binds it via ctypes (edgeml_tpu/data/fastio.py) with a
// pure-NumPy fallback.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfastio.so fastio.cpp -lpthread

#include <atomic>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// Parse all whitespace-separated floats in [p, end) into out (capacity cap).
// Returns the number parsed, or -1 on overflow / malformed input.
long parse_floats(const char* p, const char* end, float* out, long cap) {
  long n = 0;
  while (p < end) {
    while (p < end && std::isspace(static_cast<unsigned char>(*p))) ++p;
    if (p >= end) break;
    char* q = nullptr;
    double v = std::strtod(p, &q);
    if (q == p) return -1;  // not a number
    if (n >= cap) return -1;
    out[n++] = static_cast<float>(v);
    p = q;
  }
  return n;
}

struct FileTask {
  const char* path;
  float* out;      // destination slice
  long cap;        // capacity in floats
  long* rows;      // destination row count
  long cols;
};

void run_task(const FileTask& t) {
  FILE* f = std::fopen(t.path, "rb");
  if (!f) {
    *t.rows = -1;
    return;
  }
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(size), '\0');
  size_t got = size ? std::fread(&buf[0], 1, static_cast<size_t>(size), f) : 0;
  std::fclose(f);
  long n = parse_floats(buf.data(), buf.data() + got, t.out, t.cap);
  if (n < 0 || (t.cols > 0 && n % t.cols != 0)) {
    *t.rows = -1;  // caller falls back to the Python parser for this file
    return;
  }
  *t.rows = (t.cols > 0) ? n / t.cols : n;
}

}  // namespace

extern "C" {

// paths: n_files null-terminated strings, concatenated.
// cols: expected columns per row (file flagged -1 if its float count is not
//       a multiple); max_rows: per-file capacity in rows.
// out: (n_files * max_rows * cols) float buffer; rows: (n_files) counts.
// Returns 0 on success (individual file failures are flagged via rows[i]=-1).
int fastio_load_boxes(const char* paths, long n_files, long cols,
                      long max_rows, float* out, long* rows, int n_threads) {
  std::vector<const char*> ptrs;
  ptrs.reserve(static_cast<size_t>(n_files));
  const char* p = paths;
  for (long i = 0; i < n_files; ++i) {
    ptrs.push_back(p);
    p += std::strlen(p) + 1;
  }
  std::atomic<long> next(0);
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  auto worker = [&]() {
    for (;;) {
      long i = next.fetch_add(1);
      if (i >= n_files) break;
      FileTask t{ptrs[static_cast<size_t>(i)],
                 out + i * max_rows * cols,
                 max_rows * cols,
                 rows + i,
                 cols};
      run_task(t);
    }
  };
  std::vector<std::thread> threads;
  for (int i = 0; i < n_threads - 1; ++i) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"
