// Native WAV segment loader (C ABI for ctypes).
//
// TPU-native counterpart of the reference's torchaudio.load-per-segment
// data path (egs/wsj0-mix/common/src/dataset.py:60-65): a small C++ library
// the python DataLoader calls through ctypes to read 16-bit PCM segments
// straight into float32 buffers without per-call python parsing overhead.
//
// Build: make -> libwavloader.so
//
// C ABI:
//   int wav_info(const char* path, int* sample_rate, long* n_frames, int* n_channels);
//   int wav_read_f32(const char* path, long start, long frames, float* out);
//     - reads `frames` frames starting at `start` (mono-mixes channels),
//       zero-pads past EOF; returns 0 on success.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct WavHeader {
  int sample_rate = 0;
  int channels = 0;
  int bits = 0;
  long data_offset = 0;
  long data_bytes = 0;
};

bool parse_header(FILE* f, WavHeader* h) {
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || fread(&riff_size, 4, 1, f) != 1 ||
      fread(wave, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) || memcmp(wave, "WAVE", 4))
    return false;
  char chunk_id[4];
  uint32_t chunk_size;
  uint16_t audio_format = 0;
  while (fread(chunk_id, 1, 4, f) == 4 && fread(&chunk_size, 4, 1, f) == 1) {
    if (!memcmp(chunk_id, "fmt ", 4)) {
      std::vector<char> buf(chunk_size);
      if (fread(buf.data(), 1, chunk_size, f) != chunk_size) return false;
      uint16_t ch, bits;
      uint32_t sr;
      memcpy(&audio_format, buf.data(), 2);
      memcpy(&ch, buf.data() + 2, 2);
      memcpy(&sr, buf.data() + 4, 4);
      memcpy(&bits, buf.data() + 14, 2);
      h->channels = ch;
      h->sample_rate = static_cast<int>(sr);
      h->bits = bits;
    } else if (!memcmp(chunk_id, "data", 4)) {
      h->data_offset = ftell(f);
      h->data_bytes = chunk_size;
      return audio_format == 1 && h->bits == 16 && h->channels > 0;
    } else {
      fseek(f, chunk_size + (chunk_size & 1), SEEK_CUR);
    }
  }
  return false;
}

}  // namespace

extern "C" {

int wav_info(const char* path, int* sample_rate, long* n_frames, int* n_channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavHeader h;
  bool ok = parse_header(f, &h);
  fclose(f);
  if (!ok) return -2;
  *sample_rate = h.sample_rate;
  *n_channels = h.channels;
  *n_frames = h.data_bytes / (2 * h.channels);
  return 0;
}

int wav_read_f32(const char* path, long start, long frames, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavHeader h;
  if (!parse_header(f, &h)) {
    fclose(f);
    return -2;
  }
  long total = h.data_bytes / (2 * h.channels);
  if (start < 0) start = 0;
  long avail = start < total ? total - start : 0;
  long to_read = frames < avail ? frames : avail;

  fseek(f, h.data_offset + start * 2 * h.channels, SEEK_SET);
  std::vector<int16_t> buf(static_cast<size_t>(to_read) * h.channels);
  size_t got = fread(buf.data(), 2 * h.channels, to_read, f);
  fclose(f);

  const float scale = 1.0f / 32768.0f;
  for (long i = 0; i < static_cast<long>(got); ++i) {
    float acc = 0.0f;
    for (int c = 0; c < h.channels; ++c) acc += buf[i * h.channels + c];
    out[i] = acc * scale / static_cast<float>(h.channels);
  }
  for (long i = static_cast<long>(got); i < frames; ++i) out[i] = 0.0f;
  return 0;
}

int wav_read_f32_multichannel(const char* path, long start, long frames, float* out) {
  // Channel-major output (C, frames).
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavHeader h;
  if (!parse_header(f, &h)) {
    fclose(f);
    return -2;
  }
  long total = h.data_bytes / (2 * h.channels);
  if (start < 0) start = 0;
  long avail = start < total ? total - start : 0;
  long to_read = frames < avail ? frames : avail;

  fseek(f, h.data_offset + start * 2 * h.channels, SEEK_SET);
  std::vector<int16_t> buf(static_cast<size_t>(to_read) * h.channels);
  size_t got = fread(buf.data(), 2 * h.channels, to_read, f);
  fclose(f);

  const float scale = 1.0f / 32768.0f;
  for (int c = 0; c < h.channels; ++c) {
    float* row = out + static_cast<long>(c) * frames;
    for (long i = 0; i < static_cast<long>(got); ++i)
      row[i] = buf[i * h.channels + c] * scale;
    for (long i = static_cast<long>(got); i < frames; ++i) row[i] = 0.0f;
  }
  return 0;
}

int wav_read_batch_f32(const char** paths, const long* starts, long frames,
                       int n, int n_threads, float* out) {
  // Parallel batch read: item i -> out + i*frames (mono-mixed), GIL-free.
  // The counterpart of torch DataLoader worker processes for the fixed-
  // window training path: one native call assembles the whole batch.
  // Returns the number of failed items (their rows are zero-filled).
  if (n <= 0) return 0;
  unsigned hw = std::thread::hardware_concurrency();
  int workers = n_threads > 0 ? n_threads : static_cast<int>(hw ? hw : 4);
  if (workers > n) workers = n;
  std::atomic<int> next(0), failures(0);
  auto work = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      if (wav_read_f32(paths[i], starts[i], frames, out + static_cast<long>(i) * frames) != 0) {
        memset(out + static_cast<long>(i) * frames, 0, sizeof(float) * frames);
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int w = 1; w < workers; ++w) pool.emplace_back(work);
  work();
  for (auto& t : pool) t.join();
  return failures.load();
}

}  // extern "C"
