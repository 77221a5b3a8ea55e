// fastply: fast ASCII PLY vertex-block parser.
//
// The reference's dominant CPU cost is re-parsing 10k-point ASCII PLY files
// with np.loadtxt in DataLoader workers every epoch (SURVEY.md §3.1). The
// TPU stack ingests packed arrays instead, but PLY import still matters for
// dataset materialization and interchange; this parser is ~20x faster than
// np.loadtxt on those files.
//
// C ABI (consumed via ctypes from
// pointcloud_orientation_tpu/data/fastply.py):
//   float* fastply_read(const char* path, long long* n_out, long long* c_out);
//   long long fastply_read_bulk(const char** paths, long long n, int nthreads,
//                               float** outs, long long* ns, long long* cs);
//   void   fastply_free(float* ptr);
//
// Build: native/build.sh  (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// Parse the header: find vertex count and the number of float properties
// declared for the vertex element; position the file after end_header.
bool parse_header(FILE* f, long long* n_vertex, long long* n_props) {
  char line[4096];
  *n_vertex = -1;
  *n_props = 0;
  bool in_vertex_element = false;
  while (std::fgets(line, sizeof(line), f)) {
    if (std::strncmp(line, "element vertex", 14) == 0) {
      *n_vertex = std::atoll(line + 14);
      in_vertex_element = true;
    } else if (std::strncmp(line, "element ", 8) == 0) {
      in_vertex_element = false;
    } else if (in_vertex_element && std::strncmp(line, "property", 8) == 0) {
      ++*n_props;
    } else if (std::strncmp(line, "end_header", 10) == 0) {
      return *n_vertex > 0 && *n_props > 0;
    }
  }
  return false;
}

// Single-file parse; shared by the scalar and bulk entry points.
float* read_one(const char* path, long long* n_out, long long* c_out) {
  *n_out = 0;
  *c_out = 0;
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;

  long long n_vertex = 0, n_props = 0;
  if (!parse_header(f, &n_vertex, &n_props)) {
    std::fclose(f);
    return nullptr;
  }

  // Read the remainder of the file in one shot and parse floats with strtof
  // (no per-line regex / Python overhead).
  long long start = std::ftell(f);
  std::fseek(f, 0, SEEK_END);
  long long end = std::ftell(f);
  std::fseek(f, start, SEEK_SET);
  std::string buf;
  buf.resize(static_cast<size_t>(end - start));
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  buf.resize(got);

  const long long total = n_vertex * n_props;
  float* out = static_cast<float*>(std::malloc(sizeof(float) * total));
  if (!out) return nullptr;

  const char* p = buf.c_str();
  char* next = nullptr;
  long long i = 0;
  while (i < total) {
    float v = std::strtof(p, &next);
    if (next == p) break;  // no more parseable numbers
    out[i++] = v;
    p = next;
  }
  if (i != total) {
    std::free(out);
    return nullptr;
  }
  *n_out = n_vertex;
  *c_out = n_props;
  return out;
}

}  // namespace

extern "C" {

float* fastply_read(const char* path, long long* n_out, long long* c_out) {
  return read_one(path, n_out, c_out);
}

// Parse n files with a work-stealing thread pool (dataset materialization
// is parse-bound; the per-file work is independent and GIL-free through
// ctypes, so host cores scale it near-linearly). outs/ns/cs are
// caller-allocated length-n arrays; failed files get outs[i] = nullptr.
// Returns the number of successfully parsed files.
long long fastply_read_bulk(const char** paths, long long n, int nthreads,
                            float** outs, long long* ns, long long* cs) {
  if (n <= 0) return 0;
  unsigned hw = std::thread::hardware_concurrency();
  if (nthreads <= 0) nthreads = hw ? static_cast<int>(hw) : 4;
  if (nthreads > n) nthreads = static_cast<int>(n);

  std::atomic<long long> next(0), ok(0);
  auto worker = [&]() {
    for (;;) {
      long long i = next.fetch_add(1);
      if (i >= n) return;
      outs[i] = read_one(paths[i], &ns[i], &cs[i]);
      if (outs[i]) ok.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

void fastply_free(float* ptr) { std::free(ptr); }

}  // extern "C"
