// OpenMP CSR sparse x dense-panel multiply (f64) — the host-polish
// apply for general sparsity (ca_lanczos_tpu/solvers/polish.py
// rayleigh_ritz_polish_host).  scipy's csr_matvecs is single-threaded;
// at 84M nnz x 13 columns one apply costs ~8 s there, and the polish
// runs ~40 applies.  Row-parallel with row-major panels keeps the
// accumulator in registers/cache.
//
// C ABI (ctypes):
//   csr_spmm_f64(n_rows, indptr i64[n+1], indices i32[nnz],
//                data f64[nnz], X f64[n_cols_mat? -> n x k row-major],
//                k, Y f64[n x k row-major, caller-zeroed or not; we
//                overwrite])
//
// Build: g++ -O3 -fopenmp -shared -fPIC -o libspmm.so spmm.cpp

#include <cstdint>

extern "C" {

void csr_spmm_f64(int64_t n, const int64_t* indptr, const int32_t* indices,
                  const double* data, const double* X, int64_t k,
                  double* Y) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    double acc[64];  // k <= 64 in every polish use (k = n_wanted + pad)
    const int64_t kk = k > 64 ? 64 : k;
    for (int64_t j = 0; j < kk; ++j) acc[j] = 0.0;
    for (int64_t e = indptr[i]; e < indptr[i + 1]; ++e) {
      const double v = data[e];
      const double* xr = X + (int64_t)indices[e] * k;
      for (int64_t j = 0; j < kk; ++j) acc[j] += v * xr[j];
    }
    double* yr = Y + i * k;
    for (int64_t j = 0; j < kk; ++j) yr[j] = acc[j];
  }
}

}  // extern "C"
