// pesq: P.862-inspired objective speech-quality CLI.
//
// Native-harness parity with the reference, whose only native component is
// the ITU-T P.862 PESQ C tool downloaded+compiled by
// egs/common/prepare_pesq.sh:8-26 and shelled out to at evaluation time
// (egs/wsj0-mix/common/src/driver.py:354-357). This container has zero
// egress, so the itu.int sources cannot be fetched; this tool implements
// the same measurement pipeline from the P.862 description (level
// alignment, cross-correlation time alignment, Bark-band loudness
// transform, asymmetric disturbance aggregation, logistic MOS mapping).
// It is NOT the certified ITU implementation; scores are P.862-like, and
// the CLI/output contract matches what the python harness parses:
//
//   ./pesq +<sample_rate> <reference.wav> <degraded.wav>
//   -> "P.862 Prediction (MOS-LQO):  = 3.214"
//
// Build: make (see Makefile) or egs/common/prepare_pesq.sh.

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Wav {
  int sample_rate = 0;
  std::vector<float> samples;  // mono, [-1, 1]
};

bool read_wav(const char* path, Wav* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || fread(&riff_size, 4, 1, f) != 1 ||
      fread(wave, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) || memcmp(wave, "WAVE", 4)) {
    fclose(f);
    return false;
  }
  uint16_t audio_format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  std::vector<int16_t> pcm;
  char chunk_id[4];
  uint32_t chunk_size;
  while (fread(chunk_id, 1, 4, f) == 4 && fread(&chunk_size, 4, 1, f) == 1) {
    if (!memcmp(chunk_id, "fmt ", 4)) {
      std::vector<char> buf(chunk_size);
      if (fread(buf.data(), 1, chunk_size, f) != chunk_size) break;
      memcpy(&audio_format, buf.data(), 2);
      memcpy(&channels, buf.data() + 2, 2);
      memcpy(&sample_rate, buf.data() + 4, 4);
      memcpy(&bits, buf.data() + 14, 2);
    } else if (!memcmp(chunk_id, "data", 4)) {
      pcm.resize(chunk_size / 2);
      if (fread(pcm.data(), 1, chunk_size, f) != chunk_size) break;
    } else {
      fseek(f, chunk_size + (chunk_size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  if (audio_format != 1 || bits != 16 || channels == 0 || sample_rate == 0) return false;
  out->sample_rate = static_cast<int>(sample_rate);
  size_t frames = pcm.size() / channels;
  out->samples.resize(frames);
  for (size_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) acc += pcm[i * channels + c];
    out->samples[i] = static_cast<float>(acc / (channels * 32768.0));
  }
  return true;
}

// Iterative radix-2 FFT (in-place).
void fft(std::vector<std::complex<double>>& a, bool invert) {
  const size_t n = a.size();
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    double ang = 2 * M_PI / static_cast<double>(len) * (invert ? 1 : -1);
    std::complex<double> wl(cos(ang), sin(ang));
    for (size_t i = 0; i < n; i += len) {
      std::complex<double> w(1);
      for (size_t j = 0; j < len / 2; ++j) {
        auto u = a[i + j], v = a[i + j + len / 2] * w;
        a[i + j] = u + v;
        a[i + j + len / 2] = u - v;
        w *= wl;
      }
    }
  }
  if (invert)
    for (auto& x : a) x /= static_cast<double>(n);
}

size_t next_pow2(size_t n) {
  size_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

// Global time alignment by FFT cross-correlation; returns delay of deg vs ref.
long align_delay(const std::vector<float>& ref, const std::vector<float>& deg) {
  size_t n = next_pow2(ref.size() + deg.size());
  std::vector<std::complex<double>> fa(n), fb(n);
  for (size_t i = 0; i < ref.size(); ++i) fa[i] = ref[i];
  for (size_t i = 0; i < deg.size(); ++i) fb[i] = deg[i];
  fft(fa, false);
  fft(fb, false);
  for (size_t i = 0; i < n; ++i) fa[i] = fb[i] * std::conj(fa[i]);
  fft(fa, true);
  long best = 0;
  double best_v = -1.0;
  long max_lag = static_cast<long>(std::min<size_t>(ref.size(), 16000));
  for (long lag = -max_lag; lag <= max_lag; ++lag) {
    size_t idx = lag >= 0 ? static_cast<size_t>(lag) : n + lag;
    double v = std::abs(fa[idx]);
    if (v > best_v) {
      best_v = v;
      best = lag;
    }
  }
  return best;
}

double active_rms(const std::vector<float>& x) {
  // Active-speech level: RMS over frames above a -45 dB activity floor.
  const size_t frame = 256;
  double peak = 0;
  for (float v : x) peak = std::max(peak, static_cast<double>(fabs(v)));
  if (peak <= 0) return 1e-9;
  double thr = peak * 0.005;
  double acc = 0;
  size_t count = 0;
  for (size_t i = 0; i + frame <= x.size(); i += frame) {
    double e = 0;
    for (size_t j = 0; j < frame; ++j) e += x[i + j] * x[i + j];
    double rms = sqrt(e / frame);
    if (rms > thr) {
      acc += e;
      count += frame;
    }
  }
  return count ? sqrt(acc / count) : 1e-9;
}

// Bark-band power spectrum of one frame (Hann windowed), 42 bands.
constexpr int kBands = 42;

double hz_to_bark(double hz) { return 6.0 * asinh(hz / 600.0); }

void frame_bark_power(const std::vector<float>& x, size_t start, size_t n_fft,
                      int sample_rate, double* bands) {
  std::vector<std::complex<double>> buf(n_fft);
  for (size_t i = 0; i < n_fft; ++i) {
    double w = 0.5 - 0.5 * cos(2 * M_PI * static_cast<double>(i) / static_cast<double>(n_fft));
    double v = (start + i < x.size()) ? x[start + i] : 0.0;
    buf[i] = v * w;
  }
  fft(buf, false);
  double max_bark = hz_to_bark(sample_rate / 2.0);
  for (int b = 0; b < kBands; ++b) bands[b] = 0.0;
  for (size_t k = 1; k < n_fft / 2; ++k) {
    double hz = static_cast<double>(k) * sample_rate / static_cast<double>(n_fft);
    int b = static_cast<int>(hz_to_bark(hz) / max_bark * kBands);
    if (b >= kBands) b = kBands - 1;
    bands[b] += std::norm(buf[k]);
  }
}

double loudness(double power) {
  // Zwicker-style power-law loudness with a hearing threshold.
  const double p0 = 1e-9;
  return pow(std::max(power, p0) / p0, 0.23);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 4 || argv[1][0] != '+') {
    fprintf(stderr, "usage: %s +<sample_rate> <reference.wav> <degraded.wav>\n", argv[0]);
    return 2;
  }
  int want_sr = atoi(argv[1] + 1);
  Wav ref, deg;
  if (!read_wav(argv[2], &ref) || !read_wav(argv[3], &deg)) {
    fprintf(stderr, "error: cannot read wav files\n");
    return 1;
  }
  if (want_sr && (ref.sample_rate != want_sr || deg.sample_rate != want_sr)) {
    fprintf(stderr, "warning: sample rate mismatch (%d vs %d requested)\n",
            ref.sample_rate, want_sr);
  }

  // 1) Level alignment to a common active-speech level.
  double ref_rms = active_rms(ref.samples), deg_rms = active_rms(deg.samples);
  for (auto& v : ref.samples) v = static_cast<float>(v / ref_rms * 0.05);
  for (auto& v : deg.samples) v = static_cast<float>(v / deg_rms * 0.05);

  // 2) Time alignment.
  long delay = align_delay(ref.samples, deg.samples);
  std::vector<float> deg_al;
  if (delay >= 0) {
    deg_al.assign(deg.samples.begin() + std::min<size_t>(delay, deg.samples.size()),
                  deg.samples.end());
  } else {
    deg_al.assign(static_cast<size_t>(-delay), 0.0f);
    deg_al.insert(deg_al.end(), deg.samples.begin(), deg.samples.end());
  }
  size_t T = std::min(ref.samples.size(), deg_al.size());

  // 3) Perceptual (Bark loudness) disturbance per 32 ms frame, 50% overlap.
  size_t n_fft = next_pow2(static_cast<size_t>(0.032 * ref.sample_rate));
  size_t hop = n_fft / 2;
  double d_acc = 0.0, da_acc = 0.0;
  size_t n_frames = 0;
  double ref_b[kBands], deg_b[kBands];
  for (size_t s = 0; s + n_fft <= T; s += hop) {
    frame_bark_power(ref.samples, s, n_fft, ref.sample_rate, ref_b);
    frame_bark_power(deg_al, s, n_fft, ref.sample_rate, deg_b);
    double d = 0.0, da = 0.0;
    for (int b = 0; b < kBands; ++b) {
      double lr = loudness(ref_b[b]);
      double ld = loudness(deg_b[b]);
      double diff = fabs(ld - lr);
      // center-clipping of small differences (masking), as in P.862.
      double m = 0.25 * std::min(lr, ld);
      diff = std::max(0.0, diff - m);
      d += diff * diff;
      // Asymmetry: additive (new) distortions weigh more than omissions.
      double asym = pow((deg_b[b] + 50.0) / (ref_b[b] + 50.0), 1.2);
      if (asym > 12.0) asym = 12.0;
      if (asym >= 3.0) da += diff * asym;
    }
    d_acc += sqrt(d / kBands);
    da_acc += da / kBands;
    ++n_frames;
  }
  if (n_frames == 0) {
    fprintf(stderr, "error: signals too short\n");
    return 1;
  }
  double d_mean = d_acc / static_cast<double>(n_frames);
  if (getenv("PESQ_DEBUG")) fprintf(stderr, "d_mean=%.4f da_mean=%.4f\n", d_mean, da_acc / static_cast<double>(n_frames));
  double da_mean = da_acc / static_cast<double>(n_frames);

  // 4) Logistic MOS mapping (P.862.1-style). The disturbance->raw map is
  // fitted on separation-like degradations (interfering-speaker residue at
  // controlled SI-SDR, scripts/pesq_calibrate.py) against published
  // certified-PESQ bands for speech separation: SI-SDR 0/5/10/15/20/30 dB
  // -> MOS ~2.0/2.4/2.8/3.2/3.6/4.15. The power law captures the convex
  // d<->MOS relation; identical signals (d=0) still hit the 4.549 ceiling.
  // Dead zone 0.5 keeps tiny re-quantization disturbances (identical
  // signals under gain/level alignment) at the ceiling.
  double raw = 4.5 - 0.368184 * sqrt(std::max(d_mean - 0.5, 0.0)) - 0.01 * da_mean;
  if (raw < -0.5) raw = -0.5;
  if (raw > 4.5) raw = 4.5;
  double mos_lqo = 0.999 + 4.0 / (1.0 + exp(-1.4945 * raw + 4.6607));

  printf("P.862 Prediction (Raw MOS, MOS-LQO):  = %.3f\t%.3f\n", raw, mos_lqo);
  return 0;
}
