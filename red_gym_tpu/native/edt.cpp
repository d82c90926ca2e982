// Exact 2D Euclidean distance transform (Felzenszwalb-Huttenlocher).
//
// Native replacement for the scipy.ndimage.distance_transform_edt call in
// the map-loading pipeline (reference: gym/f110_gym/envs/laser_models.py:52
// uses scipy on every map load).  Exact squared-distance parabolas per
// column then per row, OpenMP-parallel across lines; produces the same
// distances as scipy's exact EDT for binary inputs.
//
// C ABI (ctypes):
//   void edt_f64(const unsigned char* occ, int h, int w, double resolution,
//                double* out)
//     occ: row-major binary map, nonzero = free space
//     out: row-major distances in meters (resolution * cell distance)

#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// 1-D squared distance transform of sampled function f; entries equal to
// kInf are not parabola sources.  Writes squared distances into d.
void dt_1d(const double* f, int n, double* d, int* v, double* z) {
  int k = -1;
  for (int q = 0; q < n; q++) {
    if (f[q] == kInf) continue;
    if (k < 0) {
      k = 0;
      v[0] = q;
      z[0] = -kInf;
      z[1] = kInf;
      continue;
    }
    double s;
    while (true) {
      int p = v[k];
      s = ((f[q] + q * (double)q) - (f[p] + p * (double)p)) / (2.0 * (q - p));
      if (s <= z[k] && k > 0) {
        k--;
      } else if (s <= z[k] && k == 0) {
        // new parabola dominates everywhere
        v[0] = q;
        z[0] = -kInf;
        z[1] = kInf;
        s = kInf;  // sentinel: already inserted
        break;
      } else {
        break;
      }
    }
    if (s != kInf) {
      k++;
      v[k] = q;
      z[k] = s;
      z[k + 1] = kInf;
    }
  }
  if (k < 0) {  // no sources at all
    for (int q = 0; q < n; q++) d[q] = kInf;
    return;
  }
  int j = 0;
  for (int q = 0; q < n; q++) {
    while (z[j + 1] < q) j++;
    double dq = q - (double)v[j];
    d[q] = dq * dq + f[v[j]];
  }
}

}  // namespace

extern "C" {

void edt_f64(const unsigned char* occ, int h, int w, double resolution,
             double* out) {
  std::vector<double> g((size_t)h * w);
  const int m = h > w ? h : w;

#pragma omp parallel
  {
    std::vector<double> f(m), d(m), z(m + 1);
    std::vector<int> v(m);

    // pass 1: per column, squared distance to nearest obstacle row
#pragma omp for
    for (int c = 0; c < w; c++) {
      for (int r = 0; r < h; r++)
        f[r] = occ[(size_t)r * w + c] == 0 ? 0.0 : kInf;
      dt_1d(f.data(), h, d.data(), v.data(), z.data());
      for (int r = 0; r < h; r++) g[(size_t)r * w + c] = d[r];
    }

    // pass 2: per row over the column-wise squared distances
#pragma omp for
    for (int r = 0; r < h; r++) {
      for (int c = 0; c < w; c++) f[c] = g[(size_t)r * w + c];
      dt_1d(f.data(), w, d.data(), v.data(), z.data());
      double* orow = &out[(size_t)r * w];
      for (int c = 0; c < w; c++)
        orow[c] = d[c] == kInf ? kInf : resolution * std::sqrt(d[c]);
    }
  }
}

}  // extern "C"
