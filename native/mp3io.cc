// MP3 decode via the system libmpg123 (dlopen'd at runtime — the image ships
// libmpg123.so.0 but no headers or dev symlink, so prototypes are declared
// here against the stable mpg123 ABI).
//
// Role: mp3 ingestion for the data loader. The reference decodes mp3 through
// torchaudio (ref: augmentation/utils.py:353, training/dataset.py:20-65); the
// MTG-Jamendo / FMA-large / DCASE corpora are mp3, so this is the path that
// makes the real-dataset loaders live. Output convention matches wavio.cc:
// malloc'd interleaved float32 in [-1, 1] + WavInfo.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <dlfcn.h>

extern "C" {

struct WavInfo {
  int32_t sample_rate;
  int32_t channels;
  int64_t frames;
  int32_t bits_per_sample;
  int32_t format;  // 1 = PCM, 3 = IEEE float
};

enum Mp3Error {
  MP3_OK = 0,
  MP3_ENOLIB = -10,   // libmpg123 unavailable
  MP3_EOPEN = -11,
  MP3_EFORMAT = -12,
  MP3_EALLOC = -13,
  MP3_EDECODE = -14,
};

// --- mpg123 ABI (subset) ---------------------------------------------------
typedef void mpg123_handle;
#define MPG123_OK 0
#define MPG123_DONE (-12)
#define MPG123_NEW_FORMAT (-11)
#define MPG123_ENC_FLOAT_32 0x200
#define MPG123_ADD_FLAGS 2
#define MPG123_FLAG_QUIET 0x20
#define MPG123_FORCE_FLOAT 0x400

namespace {

struct Mpg123Api {
  int (*init)(void);
  mpg123_handle* (*newh)(const char*, int*);
  void (*del)(mpg123_handle*);
  int (*param)(mpg123_handle*, int, long, double);
  int (*open)(mpg123_handle*, const char*);
  int (*close)(mpg123_handle*);
  int (*getformat)(mpg123_handle*, long*, int*, int*);
  int (*format_none)(mpg123_handle*);
  int (*format)(mpg123_handle*, long, int, int);
  int (*read)(mpg123_handle*, void*, size_t, size_t*);
  int (*scan)(mpg123_handle*);
  int64_t (*length)(mpg123_handle*);  // mpg123_length_64 / mpg123_length
  bool ok = false;
};

Mpg123Api* api() {
  static Mpg123Api a;
  static bool tried = false;
  if (tried) return a.ok ? &a : nullptr;
  tried = true;
  void* lib = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_GLOBAL);
  if (!lib) lib = dlopen("libmpg123.so", RTLD_NOW | RTLD_GLOBAL);
  if (!lib) return nullptr;
  auto sym = [&](const char* n) { return dlsym(lib, n); };
  a.init = (int (*)(void))sym("mpg123_init");
  a.newh = (mpg123_handle * (*)(const char*, int*)) sym("mpg123_new");
  a.del = (void (*)(mpg123_handle*))sym("mpg123_delete");
  a.param = (int (*)(mpg123_handle*, int, long, double))sym("mpg123_param");
  a.open = (int (*)(mpg123_handle*, const char*))sym("mpg123_open");
  a.close = (int (*)(mpg123_handle*))sym("mpg123_close");
  a.getformat =
      (int (*)(mpg123_handle*, long*, int*, int*))sym("mpg123_getformat");
  a.format_none = (int (*)(mpg123_handle*))sym("mpg123_format_none");
  a.format = (int (*)(mpg123_handle*, long, int, int))sym("mpg123_format");
  a.read = (int (*)(mpg123_handle*, void*, size_t, size_t*))sym("mpg123_read");
  a.scan = (int (*)(mpg123_handle*))sym("mpg123_scan");
  // 64-bit-offset name first (large-file builds), plain name as fallback
  a.length = (int64_t (*)(mpg123_handle*))sym("mpg123_length_64");
  if (!a.length) a.length = (int64_t (*)(mpg123_handle*))sym("mpg123_length");
  if (!a.init || !a.newh || !a.del || !a.open || !a.close || !a.getformat ||
      !a.format_none || !a.format || !a.read)
    return nullptr;
  if (a.init() != MPG123_OK) return nullptr;
  a.ok = true;
  return &a;
}

mpg123_handle* open_mp3(Mpg123Api* m, const char* path, long* rate, int* ch) {
  int err = 0;
  mpg123_handle* h = m->newh(nullptr, &err);
  if (!h) return nullptr;
  // FORCE_FLOAT must be set before open so the decoder negotiates float32
  // from the first frame (renegotiating after getformat leaves the initial
  // 16-bit lock in place).
  if (m->param)
    m->param(h, MPG123_ADD_FLAGS, MPG123_FLAG_QUIET | MPG123_FORCE_FLOAT, 0.0);
  if (m->open(h, path) != MPG123_OK) {
    m->del(h);
    return nullptr;
  }
  int enc = 0;
  if (m->getformat(h, rate, ch, &enc) != MPG123_OK || *rate <= 0 || *ch <= 0 ||
      enc != MPG123_ENC_FLOAT_32) {
    m->close(h);
    m->del(h);
    return nullptr;
  }
  // pin the negotiated format so mid-stream changes surface as NEW_FORMAT
  m->format_none(h);
  if (m->format(h, *rate, *ch, MPG123_ENC_FLOAT_32) != MPG123_OK) {
    m->close(h);
    m->del(h);
    return nullptr;
  }
  return h;
}

}  // namespace

int mfpa_mp3_available(void) { return api() != nullptr; }

// Header/stream-scan metadata (frame count at native rate, no PCM decode).
int mfpa_mp3_metadata(const char* path, WavInfo* info) {
  Mpg123Api* m = api();
  if (!m) return MP3_ENOLIB;
  long rate = 0;
  int ch = 0;
  mpg123_handle* h = open_mp3(m, path, &rate, &ch);
  if (!h) return MP3_EOPEN;
  int64_t frames = -1;
  if (m->scan && m->scan(h) == MPG123_OK && m->length) frames = m->length(h);
  m->close(h);
  m->del(h);
  if (frames < 0) return MP3_EFORMAT;
  info->sample_rate = (int32_t)rate;
  info->channels = (int32_t)ch;
  info->frames = frames;
  info->bits_per_sample = 32;
  info->format = 3;
  return MP3_OK;
}

// Decode the full file into interleaved float32. *out is malloc'd
// (channels * frames floats); free with mfpa_free.
int mfpa_read_mp3(const char* path, float** out, WavInfo* info) {
  Mpg123Api* m = api();
  if (!m) return MP3_ENOLIB;
  long rate = 0;
  int ch = 0;
  mpg123_handle* h = open_mp3(m, path, &rate, &ch);
  if (!h) return MP3_EOPEN;

  // pre-size from the scanned length when available; grow as needed
  size_t cap_frames = 1 << 16;
  if (m->scan && m->scan(h) == MPG123_OK && m->length) {
    int64_t est = m->length(h);
    if (est > 0) cap_frames = (size_t)est + 4096;
  }
  float* buf = (float*)malloc(sizeof(float) * cap_frames * (size_t)ch);
  if (!buf) {
    m->close(h);
    m->del(h);
    return MP3_EALLOC;
  }
  size_t filled = 0;  // floats
  const size_t chunk = 65536;  // floats per read
  int rc2 = MP3_OK;
  while (true) {
    if (filled + chunk > cap_frames * (size_t)ch) {
      cap_frames = cap_frames * 2 + chunk;
      float* nb = (float*)realloc(buf, sizeof(float) * cap_frames * (size_t)ch);
      if (!nb) {
        rc2 = MP3_EALLOC;
        break;
      }
      buf = nb;
    }
    size_t done = 0;
    int r = m->read(h, buf + filled, chunk * sizeof(float), &done);
    filled += done / sizeof(float);
    if (r == MPG123_DONE) break;
    if (r == MPG123_NEW_FORMAT) continue;  // format locked; keep reading
    if (r != MPG123_OK) {
      if (done == 0) {
        rc2 = MP3_EDECODE;
      }
      break;
    }
  }
  m->close(h);
  m->del(h);
  if (rc2 != MP3_OK || filled == 0) {
    free(buf);
    return rc2 == MP3_OK ? MP3_EDECODE : rc2;
  }
  info->sample_rate = (int32_t)rate;
  info->channels = (int32_t)ch;
  info->frames = (int64_t)(filled / (size_t)ch);
  info->bits_per_sample = 32;
  info->format = 3;
  *out = buf;
  return MP3_OK;
}

}  // extern "C"
