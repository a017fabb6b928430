// Native batch decoder: thread-pool parallel audio decoding (WAV + MP3).
//
// The data loader's hot host path — decodes a batch of files concurrently
// (the reference leans on tf.data AUTOTUNE threads around torchaudio;
// here it is an explicit std::thread pool around our own decoders).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <strings.h>
#include <thread>
#include <vector>

extern "C" {

struct WavInfo {
  int32_t sample_rate;
  int32_t channels;
  int64_t frames;
  int32_t bits_per_sample;
  int32_t format;
};

int mfpa_read_wav(const char* path, float** out, WavInfo* info);
int mfpa_read_mp3(const char* path, float** out, WavInfo* info);

// Extension-dispatched single-file decode (wav by default, .mp3 -> mpg123).
int mfpa_read_audio(const char* path, float** out, WavInfo* info) {
  const char* dot = strrchr(path, '.');
  if (dot && strcasecmp(dot, ".mp3") == 0) return mfpa_read_mp3(path, out, info);
  return mfpa_read_wav(path, out, info);
}

// Decode n files in parallel with up to `num_threads` workers.
// outs[i] receives a malloc'd interleaved float32 buffer (or nullptr on
// error), infos[i] the per-file metadata, rcs[i] the per-file return code.
void mfpa_read_wav_batch(const char** paths, int n, float** outs,
                         WavInfo* infos, int* rcs, int num_threads) {
  if (num_threads <= 0) num_threads = (int)std::thread::hardware_concurrency();
  if (num_threads <= 0) num_threads = 4;
  if (num_threads > n) num_threads = n;

  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      outs[i] = nullptr;
      rcs[i] = mfpa_read_audio(paths[i], &outs[i], &infos[i]);
    }
  };
  std::vector<std::thread> threads;
  threads.reserve((size_t)num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
