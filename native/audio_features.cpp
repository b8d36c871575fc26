// Native audio feature extraction for the BEAT2/S2G data path.
//
// Computes the reference's "onset+amplitude" representation
// (EMAGE_2024/dataloaders/beat_motionx.py:398-412): per-sample amplitude
// envelope + onset impulse train, where onsets come from spectral-flux peak
// picking (librosa.onset.onset_detect semantics: positive first-order flux of
// the STFT magnitude, mean+std threshold, local-max test).
//
// The reference leans on librosa (python+numba); this is the framework's
// native data-loader hot path: hour-long 16 kHz recordings are processed in
// C++ at cache-build time so the host never stalls the TPU feed.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in the image).
//
// Build: make -C native  (g++ -O3 -march=native -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kHop = 512;
constexpr int kWin = 1024;

// iterative radix-2 FFT (real input packed as complex), n must be power of 2
void fft(std::vector<double>& re, std::vector<double>& im) {
  const size_t n = re.size();
  // bit reversal
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * M_PI / static_cast<double>(len);
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (size_t i = 0; i < n; i += len) {
      double cur_r = 1.0, cur_i = 0.0;
      for (size_t k = 0; k < len / 2; ++k) {
        const double ur = re[i + k], ui = im[i + k];
        const double vr = re[i + k + len / 2] * cur_r - im[i + k + len / 2] * cur_i;
        const double vi = re[i + k + len / 2] * cur_i + im[i + k + len / 2] * cur_r;
        re[i + k] = ur + vr;
        im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr;
        im[i + k + len / 2] = ui - vi;
        const double nr = cur_r * wr - cur_i * wi;
        cur_i = cur_r * wi + cur_i * wr;
        cur_r = nr;
      }
    }
  }
}

}  // namespace

extern "C" {

// wav [n] float32 -> out [n, 2] float32 (amplitude envelope, onset impulses).
// Returns the number of onsets found, or -1 on error.
int onset_amplitude(const float* wav, int64_t n, float* out) {
  if (n <= 0) return -1;
  // amplitude envelope = |wav|
  for (int64_t i = 0; i < n; ++i) {
    out[2 * i] = std::fabs(wav[i]);
    out[2 * i + 1] = 0.0f;
  }
  const int64_t n_frames = (n >= kWin) ? (n - kWin) / kHop + 1 : 0;
  if (n_frames < 3) return 0;

  // Hann window
  std::vector<double> hann(kWin);
  for (int i = 0; i < kWin; ++i)
    hann[i] = 0.5 - 0.5 * std::cos(2.0 * M_PI * i / (kWin - 1));

  // STFT magnitudes -> spectral flux
  std::vector<double> prev_mag(kWin / 2 + 1, 0.0), flux(n_frames, 0.0);
  std::vector<double> re(kWin), im(kWin);
  for (int64_t f = 0; f < n_frames; ++f) {
    const float* frame = wav + f * kHop;
    for (int i = 0; i < kWin; ++i) {
      re[i] = frame[i] * hann[i];
      im[i] = 0.0;
    }
    fft(re, im);
    double acc = 0.0;
    for (int b = 0; b <= kWin / 2; ++b) {
      const double mag = std::sqrt(re[b] * re[b] + im[b] * im[b]);
      const double d = mag - prev_mag[b];
      if (f > 0 && d > 0) acc += d;
      prev_mag[b] = mag;
    }
    flux[f] = acc;
  }

  // normalize + threshold (mean + std) + local-max peak picking
  double maxf = 1e-12;
  for (double v : flux) maxf = std::max(maxf, v);
  double mean = 0.0;
  for (double& v : flux) {
    v /= maxf;
    mean += v;
  }
  mean /= static_cast<double>(n_frames);
  double var = 0.0;
  for (double v : flux) var += (v - mean) * (v - mean);
  const double thresh = mean + std::sqrt(var / static_cast<double>(n_frames));

  int onsets = 0;
  for (int64_t f = 1; f + 1 < n_frames; ++f) {
    if (flux[f] > thresh && flux[f] >= flux[f - 1] && flux[f] >= flux[f + 1]) {
      const int64_t sample = std::min<int64_t>(f * kHop, n - 1);
      out[2 * sample + 1] = 1.0f;
      ++onsets;
    }
  }
  return onsets;
}

// Batched stride-window extraction: src [T, D] -> dst [n_windows, win, D]
// with stride; the BEAT2 cache-build inner loop (beat_motionx.py:613-746).
void stride_windows(const float* src, int64_t T, int64_t D, int64_t win,
                    int64_t stride, int64_t n_windows, float* dst) {
  for (int64_t w = 0; w < n_windows; ++w) {
    std::memcpy(dst + w * win * D, src + w * stride * D,
                sizeof(float) * static_cast<size_t>(win * D));
  }
}

}  // extern "C"
