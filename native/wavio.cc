// Native audio IO for musicfpaugment_tpu.
//
// Role: the host-side decode path of the data loader (the reference delegates
// decoding to torchaudio's C++ backend; this image has no torchaudio, so the
// framework ships its own). Exposed to Python via ctypes (no pybind11 in the
// image). RIFF/WAVE parsing supports PCM 8/16/24/32-bit and IEEE float32/64,
// mono or multichannel, with a streaming metadata path that reads only the
// header.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Error codes
enum WavError {
  WAV_OK = 0,
  WAV_EOPEN = -1,
  WAV_EFORMAT = -2,
  WAV_EUNSUPPORTED = -3,
  WAV_EALLOC = -4,
};

struct WavInfo {
  int32_t sample_rate;
  int32_t channels;
  int64_t frames;
  int32_t bits_per_sample;
  int32_t format;  // 1 = PCM, 3 = IEEE float
};

static int read_header(FILE* f, WavInfo* info, long* data_offset,
                       uint32_t* data_size) {
  char id[4];
  uint32_t sz;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "RIFF", 4) != 0) return WAV_EFORMAT;
  if (fread(&sz, 4, 1, f) != 1) return WAV_EFORMAT;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "WAVE", 4) != 0) return WAV_EFORMAT;

  bool have_fmt = false, have_data = false;
  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  while (!have_data) {
    if (fread(id, 1, 4, f) != 4 || fread(&sz, 4, 1, f) != 1) return WAV_EFORMAT;
    if (memcmp(id, "fmt ", 4) == 0) {
      uint8_t buf[40];
      uint32_t n = sz < sizeof(buf) ? sz : (uint32_t)sizeof(buf);
      if (fread(buf, 1, n, f) != n) return WAV_EFORMAT;
      if (sz > n && fseek(f, sz - n, SEEK_CUR) != 0) return WAV_EFORMAT;
      memcpy(&format, buf + 0, 2);
      memcpy(&channels, buf + 2, 2);
      memcpy(&rate, buf + 4, 4);
      memcpy(&bits, buf + 14, 2);
      if (format == 0xFFFE && sz >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        uint16_t sub;
        memcpy(&sub, buf + 24, 2);
        format = sub;
      }
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      *data_offset = ftell(f);
      *data_size = sz;
      have_data = true;
    } else {
      // skip unknown chunk (word-aligned)
      if (fseek(f, sz + (sz & 1), SEEK_CUR) != 0) return WAV_EFORMAT;
    }
  }
  if (!have_fmt || channels == 0 || bits == 0) return WAV_EFORMAT;
  info->sample_rate = (int32_t)rate;
  info->channels = (int32_t)channels;
  info->bits_per_sample = (int32_t)bits;
  info->format = (int32_t)format;
  int bytes_per_frame = channels * (bits / 8);
  info->frames = bytes_per_frame ? (int64_t)(*data_size) / bytes_per_frame : 0;
  return WAV_OK;
}

// Read only the header. Returns WAV_OK or an error code.
int mfpa_wav_metadata(const char* path, WavInfo* info) {
  FILE* f = fopen(path, "rb");
  if (!f) return WAV_EOPEN;
  long off;
  uint32_t dsz;
  int rc = read_header(f, info, &off, &dsz);
  fclose(f);
  return rc;
}

// Decode the full file into interleaved float32 in [-1, 1].
// *out is malloc'd (channels * frames floats); free with mfpa_free.
int mfpa_read_wav(const char* path, float** out, WavInfo* info) {
  FILE* f = fopen(path, "rb");
  if (!f) return WAV_EOPEN;
  long off;
  uint32_t dsz;
  int rc = read_header(f, info, &off, &dsz);
  if (rc != WAV_OK) {
    fclose(f);
    return rc;
  }
  const int ch = info->channels;
  const int64_t frames = info->frames;
  const int bits = info->bits_per_sample;
  const int fmt = info->format;
  const int64_t n = frames * ch;

  float* dst = (float*)malloc(sizeof(float) * (size_t)n);
  if (!dst) {
    fclose(f);
    return WAV_EALLOC;
  }
  uint8_t* raw = (uint8_t*)malloc((size_t)dsz);
  if (!raw) {
    free(dst);
    fclose(f);
    return WAV_EALLOC;
  }
  if (fseek(f, off, SEEK_SET) != 0 || fread(raw, 1, dsz, f) != dsz) {
    free(dst);
    free(raw);
    fclose(f);
    return WAV_EFORMAT;
  }
  fclose(f);

  rc = WAV_OK;
  if (fmt == 1 && bits == 16) {
    const int16_t* s = (const int16_t*)raw;
    for (int64_t i = 0; i < n; ++i) dst[i] = (float)s[i] / 32768.0f;
  } else if (fmt == 1 && bits == 8) {
    for (int64_t i = 0; i < n; ++i) dst[i] = ((float)raw[i] - 128.0f) / 128.0f;
  } else if (fmt == 1 && bits == 24) {
    for (int64_t i = 0; i < n; ++i) {
      const uint8_t* p = raw + 3 * i;
      int32_t v = (int32_t)((uint32_t)p[0] << 8 | (uint32_t)p[1] << 16 |
                            (uint32_t)p[2] << 24) >> 8;
      dst[i] = (float)v / 8388608.0f;
    }
  } else if (fmt == 1 && bits == 32) {
    const int32_t* s = (const int32_t*)raw;
    for (int64_t i = 0; i < n; ++i) dst[i] = (float)s[i] / 2147483648.0f;
  } else if (fmt == 3 && bits == 32) {
    memcpy(dst, raw, sizeof(float) * (size_t)n);
  } else if (fmt == 3 && bits == 64) {
    const double* s = (const double*)raw;
    for (int64_t i = 0; i < n; ++i) dst[i] = (float)s[i];
  } else {
    rc = WAV_EUNSUPPORTED;
  }
  free(raw);
  if (rc != WAV_OK) {
    free(dst);
    return rc;
  }
  *out = dst;
  return WAV_OK;
}

void mfpa_free(void* p) { free(p); }

}  // extern "C"
