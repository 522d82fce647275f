// Single-threaded CPU baseline for the CAVI sweep, restating the
// reference's computational pattern (hgaprec vb()/vb_hier(): per-nonzero
// K-vector phi with log-space normalization, double precision, scalar
// loops, digamma expectations) without copying its code. Used by bench.py
// to produce an honest same-host "reference-style" time per iteration.
//
// Input (binary, little endian): int64 n, m, k, nnz;
//   int64 row_ptr[n+1]; int32 col[nnz]; float y[nnz];
// Output: one line "iter_seconds <double>" (mean over iters).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <vector>

static double digamma(double x) {
  double r = 0.0;
  while (x < 6.0) { r -= 1.0 / x; x += 1.0; }
  const double inv = 1.0 / x, inv2 = inv * inv;
  r += std::log(x) - 0.5 * inv
     - inv2 * (1.0 / 12 - inv2 * (1.0 / 120 - inv2 / 252.0));
  return r;
}

int main(int argc, char **argv) {
  if (argc < 2) { std::fprintf(stderr, "usage: %s data.bin [iters]\n", argv[0]); return 1; }
  const int iters = argc > 2 ? std::atoi(argv[2]) : 2;
  FILE *f = std::fopen(argv[1], "rb");
  if (!f) { std::perror("open"); return 1; }
  int64_t hdr[4];
  if (std::fread(hdr, sizeof(int64_t), 4, f) != 4) return 1;
  const int64_t n = hdr[0], m = hdr[1], k = hdr[2], nnz = hdr[3];
  std::vector<int64_t> row_ptr(n + 1);
  std::vector<int32_t> col(nnz);
  std::vector<float> y(nnz);
  if (std::fread(row_ptr.data(), sizeof(int64_t), n + 1, f) != size_t(n + 1)) return 1;
  if (std::fread(col.data(), sizeof(int32_t), nnz, f) != size_t(nnz)) return 1;
  if (std::fread(y.data(), sizeof(float), nnz, f) != size_t(nnz)) return 1;
  std::fclose(f);

  const double a = 0.3;
  // state: theta [n,k], beta [m,k] shape/rate/E/Elog; xi [n], eta [m]
  std::vector<double> tsh(n * k, a), trt(n * k, 1.0), te(n * k), tl(n * k);
  std::vector<double> bsh(m * k, a), brt(m * k, 1.0), be(m * k), bl(m * k);
  std::vector<double> xe(n, 0.3 / (0.3 + k)), ee(m, 0.3 / (0.3 + k));
  srand(42);
  for (int64_t i = 0; i < n * k; ++i) {
    te[i] = (0.3 + 0.01 * (rand() / (double)RAND_MAX)) /
            (0.3 + 0.1 * (rand() / (double)RAND_MAX));
    tl[i] = std::log(te[i]);
  }
  for (int64_t i = 0; i < m * k; ++i) {
    be[i] = (0.3 + 0.01 * (rand() / (double)RAND_MAX)) /
            (0.3 + 0.1 * (rand() / (double)RAND_MAX));
    bl[i] = std::log(be[i]);
  }

  std::vector<double> phi(k), tacc(n * k), bacc(m * k);
  std::vector<double> brow(k), trow(k);
  double total = 0.0;
  for (int it = 0; it < iters; ++it) {
    auto t0 = std::chrono::steady_clock::now();
    std::memset(tacc.data(), 0, sizeof(double) * n * k);
    std::memset(bacc.data(), 0, sizeof(double) * m * k);
    // sweep: per-nonzero phi via log-space chain normalization, like the
    // reference's D1Array::logsum/lognormalize structure
    for (int64_t u = 0; u < n; ++u) {
      for (int64_t j = row_ptr[u]; j < row_ptr[u + 1]; ++j) {
        const int32_t v = col[j];
        const double yy = y[j];
        double lsum = 0.0;
        for (int64_t kk = 0; kk < k; ++kk) {
          phi[kk] = tl[u * k + kk] + bl[v * k + kk];
          if (kk == 0) lsum = phi[0];
          else if (phi[kk] < lsum) lsum = lsum + std::log1p(std::exp(phi[kk] - lsum));
          else lsum = phi[kk] + std::log1p(std::exp(lsum - phi[kk]));
        }
        const double sc = yy > 1.0 ? yy : 1.0;
        for (int64_t kk = 0; kk < k; ++kk) {
          const double p = sc * std::exp(phi[kk] - lsum);
          tacc[u * k + kk] += p;
          bacc[v * k + kk] += p;
        }
      }
    }
    // rate updates + expectations (hier-style per-row prior rates)
    for (int64_t kk = 0; kk < k; ++kk) { brow[kk] = 0; for (int64_t v = 0; v < m; ++v) brow[kk] += be[v * k + kk]; }
    for (int64_t u = 0; u < n; ++u)
      for (int64_t kk = 0; kk < k; ++kk) {
        const double sh = a + tacc[u * k + kk];
        const double rt = xe[u] + brow[kk];
        te[u * k + kk] = sh / rt;
        tl[u * k + kk] = digamma(sh) - std::log(rt);
      }
    for (int64_t kk = 0; kk < k; ++kk) { trow[kk] = 0; for (int64_t u = 0; u < n; ++u) trow[kk] += te[u * k + kk]; }
    for (int64_t v = 0; v < m; ++v)
      for (int64_t kk = 0; kk < k; ++kk) {
        const double sh = a + bacc[v * k + kk];
        const double rt = ee[v] + trow[kk];
        be[v * k + kk] = sh / rt;
        bl[v * k + kk] = digamma(sh) - std::log(rt);
      }
    for (int64_t u = 0; u < n; ++u) {
      double s = 0; for (int64_t kk = 0; kk < k; ++kk) s += te[u * k + kk];
      xe[u] = (0.3 + k * 0.3) / (0.3 + s);
    }
    for (int64_t v = 0; v < m; ++v) {
      double s = 0; for (int64_t kk = 0; kk < k; ++kk) s += be[v * k + kk];
      ee[v] = (0.3 + k * 0.3) / (0.3 + s);
    }
    auto t1 = std::chrono::steady_clock::now();
    total += std::chrono::duration<double>(t1 - t0).count();
  }
  std::printf("iter_seconds %.6f\n", total / iters);
  return 0;
}
