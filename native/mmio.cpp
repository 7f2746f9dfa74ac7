// Matrix Market (.mtx) coordinate-format reader — native data-loader for
// the corpus harness (the reference loads SuiteSparse .mat files in
// MATLAB, test_restarted_ca_lanczos_all_matrices.m:24-32; here the
// interchange format is Matrix Market and the parser is C++ for
// production-rate ingest of multi-GB corpora).
//
// C ABI (ctypes-friendly):
//   mm_open(path) -> handle (parses header; <0 on error)
//   mm_info(handle, &rows, &cols, &nnz, &symmetric, &pattern)
//   mm_read(handle, row_idx*, col_idx*, values*) -> entries written
//       (symmetric inputs are expanded: both (i,j) and (j,i) emitted for
//        off-diagonal entries; caller sizes buffers with mm_expanded_nnz)
//   mm_expanded_nnz(handle) -> entry count after symmetric expansion
//   mm_close(handle)
//
// Build: g++ -O2 -shared -fPIC -o libmmio.so mmio.cpp   (see build.sh)

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct MMFile {
  std::string path;
  long data_offset = 0;
  int64_t rows = 0, cols = 0, nnz = 0;
  bool symmetric = false;  // symmetric or skew-symmetric
  bool skew = false;
  bool pattern = false;    // no value column; value = 1.0
  int64_t expanded = -1;   // cached expanded count
};

std::vector<MMFile*> g_handles;

bool parse_header(FILE* f, MMFile* mm) {
  char line[1024];
  if (!std::fgets(line, sizeof line, f)) return false;
  // %%MatrixMarket matrix coordinate <field> <symmetry>
  char banner[64], object[64], format[64], field[64], symmetry[64];
  if (std::sscanf(line, "%63s %63s %63s %63s %63s", banner, object, format,
                  field, symmetry) != 5)
    return false;
  if (std::strcmp(object, "matrix") != 0) return false;
  if (std::strcmp(format, "coordinate") != 0) return false;  // dense unsupported
  for (char* p = field; *p; ++p) *p = std::tolower(*p);
  for (char* p = symmetry; *p; ++p) *p = std::tolower(*p);
  if (std::strcmp(field, "complex") == 0) return false;  // out of scope
  mm->pattern = std::strcmp(field, "pattern") == 0;
  mm->symmetric = std::strcmp(symmetry, "symmetric") == 0 ||
                  std::strcmp(symmetry, "skew-symmetric") == 0;
  mm->skew = std::strcmp(symmetry, "skew-symmetric") == 0;
  // Skip comments.
  long pos = std::ftell(f);
  while (std::fgets(line, sizeof line, f)) {
    if (line[0] == '%') {
      pos = std::ftell(f);
      continue;
    }
    long long r, c, n;
    if (std::sscanf(line, "%lld %lld %lld", &r, &c, &n) != 3) return false;
    mm->rows = r;
    mm->cols = c;
    mm->nnz = n;
    mm->data_offset = std::ftell(f);
    return true;
  }
  return false;
}

}  // namespace

extern "C" {

int64_t mm_open(const char* path) {
  FILE* f = std::fopen(path, "r");
  if (!f) return -1;
  MMFile* mm = new MMFile();
  mm->path = path;
  bool ok = parse_header(f, mm);
  std::fclose(f);
  if (!ok) {
    delete mm;
    return -2;
  }
  g_handles.push_back(mm);
  return static_cast<int64_t>(g_handles.size()) - 1;
}

int mm_info(int64_t h, int64_t* rows, int64_t* cols, int64_t* nnz,
            int* symmetric, int* pattern) {
  if (h < 0 || h >= (int64_t)g_handles.size() || !g_handles[h]) return -1;
  MMFile* mm = g_handles[h];
  *rows = mm->rows;
  *cols = mm->cols;
  *nnz = mm->nnz;
  *symmetric = mm->symmetric ? 1 : 0;
  *pattern = mm->pattern ? 1 : 0;
  return 0;
}

int64_t mm_expanded_nnz(int64_t h) {
  if (h < 0 || h >= (int64_t)g_handles.size() || !g_handles[h]) return -1;
  MMFile* mm = g_handles[h];
  if (!mm->symmetric) return mm->nnz;
  if (mm->expanded >= 0) return mm->expanded;
  FILE* f = std::fopen(mm->path.c_str(), "r");
  if (!f) return -1;
  std::fseek(f, mm->data_offset, SEEK_SET);
  int64_t diag = 0;
  long long r, c;
  double v;
  for (int64_t k = 0; k < mm->nnz; ++k) {
    int got = mm->pattern ? std::fscanf(f, "%lld %lld", &r, &c)
                          : std::fscanf(f, "%lld %lld %lf", &r, &c, &v);
    if (got < 2) {
      std::fclose(f);
      return -1;
    }
    if (r == c) ++diag;
  }
  std::fclose(f);
  mm->expanded = 2 * mm->nnz - diag;
  return mm->expanded;
}

int64_t mm_read(int64_t h, int64_t* row_idx, int64_t* col_idx, double* values) {
  if (h < 0 || h >= (int64_t)g_handles.size() || !g_handles[h]) return -1;
  MMFile* mm = g_handles[h];
  FILE* f = std::fopen(mm->path.c_str(), "r");
  if (!f) return -1;
  std::fseek(f, mm->data_offset, SEEK_SET);
  int64_t out = 0;
  long long r, c;
  double v;
  for (int64_t k = 0; k < mm->nnz; ++k) {
    if (mm->pattern) {
      if (std::fscanf(f, "%lld %lld", &r, &c) != 2) break;
      v = 1.0;
    } else {
      if (std::fscanf(f, "%lld %lld %lf", &r, &c, &v) != 3) break;
    }
    row_idx[out] = r - 1;  // 1-based -> 0-based
    col_idx[out] = c - 1;
    values[out] = v;
    ++out;
    if (mm->symmetric && r != c) {
      row_idx[out] = c - 1;
      col_idx[out] = r - 1;
      values[out] = mm->skew ? -v : v;
      ++out;
    }
  }
  std::fclose(f);
  return out;
}

void mm_close(int64_t h) {
  if (h >= 0 && h < (int64_t)g_handles.size() && g_handles[h]) {
    delete g_handles[h];
    g_handles[h] = nullptr;
  }
}

}  // extern "C"
