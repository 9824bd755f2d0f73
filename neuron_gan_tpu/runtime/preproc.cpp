// Native host-side dataset preprocessing.
//
// Implements the reference's per-image load pipeline hot spots
// (reference data/NeuronDataset.py:84-110) in C++:
//   * multi_otsu: k-class Otsu thresholding via dynamic programming on
//     cumulative histogram moments (the skimage.threshold_multiotsu
//     equivalent the reference uses at NeuronDataset.py:93),
//   * pad_and_fill: zero-pad by `pad` and replace zero pixels with Gaussian
//     noise from the image's background statistics, producing the final
//     [0,1] float32 plane (NeuronDataset.py:13-20, :101-107).
//
// Exposed as a plain C ABI for ctypes; the Python side
// (neuron_gan_tpu/runtime/native.py) falls back to the numpy implementation
// when the shared library has not been built.
//
// Build: python -m neuron_gan_tpu.runtime.build   (or make -C neuron_gan_tpu/runtime)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

// xorshift128+ PRNG — fast, reproducible across platforms.
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    // splitmix64 seeding
    auto next = [&seed]() {
      seed += 0x9E3779B97f4A7C15ULL;
      uint64_t z = seed;
      z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
      z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
      return z ^ (z >> 31);
    };
    s0 = next();
    s1 = next();
  }
  uint64_t next_u64() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  double uniform() {  // [0, 1)
    return (next_u64() >> 11) * (1.0 / 9007199254740992.0);
  }
  // Box-Muller; one value per call (second discarded for simplicity)
  double normal() {
    double u1 = uniform(), u2 = uniform();
    if (u1 < 1e-300) u1 = 1e-300;
    return std::sqrt(-2.0 * std::log(u1)) * std::cos(2.0 * M_PI * u2);
  }
};

}  // namespace

extern "C" {

// Multi-Otsu thresholds over a histogram of `n_bins` counts with bin centers
// `centers`.  Writes `classes-1` thresholds into `out`.  Returns 0 on
// success.  DP: f[k][j] = max_{i<j} f[k-1][i] + (S(i+1,j))^2 / W(i+1,j).
int multi_otsu_hist(const double* hist, const double* centers, int n_bins,
                    int classes, double* out) {
  if (classes < 2 || n_bins < classes) return 1;
  const int n = n_bins;
  double total = 0;
  for (int i = 0; i < n; ++i) total += hist[i];
  if (total <= 0) return 2;

  std::vector<double> cp(n + 1, 0.0), cs(n + 1, 0.0);
  for (int i = 0; i < n; ++i) {
    const double p = hist[i] / total;
    cp[i + 1] = cp[i] + p;
    cs[i + 1] = cs[i] + p * centers[i];
  }
  auto seg = [&](int i, int j) {  // score of bins [i, j]
    const double w = cp[j + 1] - cp[i];
    const double s = cs[j + 1] - cs[i];
    return w > 0 ? (s * s) / w : 0.0;
  };

  const double neg_inf = -std::numeric_limits<double>::infinity();
  std::vector<std::vector<double>> f(classes, std::vector<double>(n, neg_inf));
  std::vector<std::vector<int>> arg(classes, std::vector<int>(n, 0));
  for (int j = 0; j < n; ++j) f[0][j] = seg(0, j);
  for (int k = 1; k < classes; ++k) {
    for (int j = k; j < n; ++j) {
      double best = neg_inf;
      int best_i = k - 1;
      for (int i = k - 1; i < j; ++i) {
        const double v = f[k - 1][i] + seg(i + 1, j);
        if (v > best) { best = v; best_i = i; }
      }
      f[k][j] = best;
      arg[k][j] = best_i;
    }
  }
  int j = n - 1;
  for (int k = classes - 1; k >= 1; --k) {
    const int i = arg[k][j];
    out[k - 1] = centers[i];
    j = i;
  }
  return 0;
}

// Noise statistics of pixels 0 < v < thresh (reference NeuronDataset.py:94-97).
// Returns count; writes mean/std.
long long noise_stats_u8(const uint8_t* img, long long n, double thresh,
                         double* mean, double* std_out) {
  double sum = 0, sum2 = 0;
  long long cnt = 0;
  for (long long i = 0; i < n; ++i) {
    const double v = img[i];
    if (v > 0.0 && v < thresh) {
      sum += v;
      sum2 += v * v;
      ++cnt;
    }
  }
  if (cnt == 0) { *mean = 0; *std_out = 0; return 0; }
  const double m = sum / cnt;
  double var = sum2 / cnt - m * m;
  if (var < 0) var = 0;
  *mean = m;
  *std_out = std::sqrt(var);
  return cnt;
}

// Pad a (h, w) uint8 image by `pad` zeros per side, fill zero pixels with
// N(mean, std) noise cast to uint8 (matching the reference's integer
// write-back, NeuronDataset.py:13-20), and write the final [0,1] float32
// plane of size (h+2p)*(w+2p).
int pad_and_fill_u8(const uint8_t* img, int h, int w, int pad, double mean,
                    double stddev, uint64_t seed, float* out) {
  const int H = h + 2 * pad, W = w + 2 * pad;
  Rng rng(seed);
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      int v;
      const int sy = y - pad, sx = x - pad;
      if (sy >= 0 && sy < h && sx >= 0 && sx < w) {
        v = img[(long long)sy * w + sx];
      } else {
        v = 0;
      }
      if (v == 0) {
        const double noise = stddev * rng.normal() + mean;
        // cast like numpy's astype(uint8): truncation of the double with
        // wraparound out of range — clamp instead (safer, same in practice
        // for background stats far from the uint8 limits)
        double c = noise < 0 ? 0 : (noise > 255 ? 255 : noise);
        v = (int)c;
      }
      out[(long long)y * W + x] = (float)(v / 255.0);
    }
  }
  return 0;
}

}  // extern "C"
