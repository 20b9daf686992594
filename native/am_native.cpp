// am_native — host-side media I/O runtime for audio_matcher_tpu.
//
// Native equivalent of the reference's L0 codec layer (reference
// src/matcher/mp3_reader.rs: minimp3 decode → f32 mono PCM with
// (l+r)*0.5/(2^16-1) downmix), built as a small C-ABI shared library that
// Python binds via ctypes (zero-copy: buffers are handed to numpy and freed
// by am_free).
//
// Codecs are loaded with dlopen at runtime (libmpg123 for mp3 decode,
// libopus + a built-in Ogg demuxer/muxer for opus, libmp3lame for mp3
// encode) so the library builds with no dev headers installed. Encoding
// exists so the test-suite can synthesize its own fixtures — the reference
// ships private fixtures we must regenerate (SURVEY.md §2 note).
//
// Build: native/build.sh → audio_matcher_tpu/hostio/_am_native.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dlfcn.h>
#include <string>
#include <vector>

namespace {

constexpr float kPcmFactor = 1.0f / 65535.0f;  // parity: mp3_reader.rs:12
constexpr float kFloatToI16Scale = 32768.0f * kPcmFactor;

char g_error[512] = {0};

void set_error(const char* fmt, const char* a = "", const char* b = "") {
  snprintf(g_error, sizeof(g_error), fmt, a, b);
}

void* try_dlopen(const char* const* names) {
  for (const char* const* n = names; *n; ++n) {
    void* h = dlopen(*n, RTLD_NOW | RTLD_GLOBAL);
    if (h) return h;
  }
  return nullptr;
}

template <typename T>
bool load_sym(void* lib, const char* name, T* out) {
  *out = reinterpret_cast<T>(dlsym(lib, name));
  if (!*out) {
    set_error("missing symbol %s", name);
    return false;
  }
  return true;
}

// ---------------------------------------------------------------- mpg123
struct Mpg123Api {
  void* lib = nullptr;
  int (*init)() = nullptr;
  void* (*make)(const char*, int*) = nullptr;
  int (*open)(void*, const char*) = nullptr;
  int (*getformat)(void*, long*, int*, int*) = nullptr;
  int (*format_none)(void*) = nullptr;
  int (*format)(void*, long, int, int) = nullptr;
  int (*read)(void*, void*, size_t, size_t*) = nullptr;
  int (*close)(void*) = nullptr;
  void (*del)(void*) = nullptr;
  // optional (duration probe — frame-header scan without decode); absent
  // on ancient libmpg123 builds, probed at call time
  int (*scan)(void*) = nullptr;
  long (*length)(void*) = nullptr;

  bool ok() const { return lib != nullptr; }
};

Mpg123Api& mpg123() {
  static Mpg123Api api = [] {
    Mpg123Api a;
    const char* names[] = {"libmpg123.so.0", "libmpg123.so", nullptr};
    void* lib = try_dlopen(names);
    if (!lib) return a;
    bool good = load_sym(lib, "mpg123_init", &a.init) &&
                load_sym(lib, "mpg123_new", &a.make) &&
                load_sym(lib, "mpg123_open", &a.open) &&
                load_sym(lib, "mpg123_getformat", &a.getformat) &&
                load_sym(lib, "mpg123_format_none", &a.format_none) &&
                load_sym(lib, "mpg123_format", &a.format) &&
                load_sym(lib, "mpg123_read", &a.read) &&
                load_sym(lib, "mpg123_close", &a.close) &&
                load_sym(lib, "mpg123_delete", &a.del);
    if (!good) return a;
    // optional symbols: plain dlsym so a miss doesn't clobber g_error
    a.scan = reinterpret_cast<int (*)(void*)>(dlsym(lib, "mpg123_scan"));
    a.length = reinterpret_cast<long (*)(void*)>(dlsym(lib, "mpg123_length"));
    a.init();
    a.lib = lib;
    return a;
  }();
  return api;
}

constexpr int MPG123_OK = 0;
constexpr int MPG123_DONE = -12;
constexpr int MPG123_NEW_FORMAT = -11;
constexpr int MPG123_ERR = -1;
constexpr int MPG123_ENC_SIGNED_16 = 0xD0;

// ------------------------------------------------------------------ opus
struct OpusApi {
  void* lib = nullptr;
  void* (*dec_create)(int32_t, int, int*) = nullptr;
  int (*dec_float)(void*, const uint8_t*, int32_t, float*, int, int) = nullptr;
  void (*dec_destroy)(void*) = nullptr;
  void* (*enc_create)(int32_t, int, int, int*) = nullptr;
  int32_t (*encode)(void*, const int16_t*, int, uint8_t*, int32_t) = nullptr;
  int (*enc_ctl)(void*, int, ...) = nullptr;
  void (*enc_destroy)(void*) = nullptr;

  bool ok() const { return lib != nullptr; }
};

OpusApi& opus() {
  static OpusApi api = [] {
    OpusApi a;
    const char* names[] = {"libopus.so.0", "libopus.so", nullptr};
    void* lib = try_dlopen(names);
    if (!lib) return a;
    bool good = load_sym(lib, "opus_decoder_create", &a.dec_create) &&
                load_sym(lib, "opus_decode_float", &a.dec_float) &&
                load_sym(lib, "opus_decoder_destroy", &a.dec_destroy) &&
                load_sym(lib, "opus_encoder_create", &a.enc_create) &&
                load_sym(lib, "opus_encode", &a.encode) &&
                load_sym(lib, "opus_encoder_ctl", &a.enc_ctl) &&
                load_sym(lib, "opus_encoder_destroy", &a.enc_destroy);
    if (!good) return a;
    a.lib = lib;
    return a;
  }();
  return api;
}

// ------------------------------------------------------------------ lame
struct LameApi {
  void* lib = nullptr;
  void* (*init)() = nullptr;
  int (*set_in_samplerate)(void*, int) = nullptr;
  int (*set_num_channels)(void*, int) = nullptr;
  int (*set_quality)(void*, int) = nullptr;
  int (*init_params)(void*) = nullptr;
  int (*encode)(void*, const int16_t*, const int16_t*, int, uint8_t*, int) = nullptr;
  int (*flush)(void*, uint8_t*, int) = nullptr;
  int (*close)(void*) = nullptr;

  bool ok() const { return lib != nullptr; }
};

LameApi& lame() {
  static LameApi api = [] {
    LameApi a;
    const char* names[] = {"libmp3lame.so.0", "libmp3lame.so", nullptr};
    void* lib = try_dlopen(names);
    if (!lib) return a;
    bool good = load_sym(lib, "lame_init", &a.init) &&
                load_sym(lib, "lame_set_in_samplerate", &a.set_in_samplerate) &&
                load_sym(lib, "lame_set_num_channels", &a.set_num_channels) &&
                load_sym(lib, "lame_set_quality", &a.set_quality) &&
                load_sym(lib, "lame_init_params", &a.init_params) &&
                load_sym(lib, "lame_encode_buffer", &a.encode) &&
                load_sym(lib, "lame_encode_flush", &a.flush) &&
                load_sym(lib, "lame_close", &a.close);
    if (!good) return a;
    a.lib = lib;
    return a;
  }();
  return api;
}

// ------------------------------------------------------------- Ogg layer
// Minimal Ogg page reader/writer — enough to demux/mux Opus streams.

uint32_t ogg_crc_table[256];
bool ogg_crc_init_done = [] {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t r = i << 24;
    for (int j = 0; j < 8; ++j)
      r = (r & 0x80000000u) ? (r << 1) ^ 0x04c11db7u : (r << 1);
    ogg_crc_table[i] = r;
  }
  return true;
}();

uint32_t ogg_crc(const uint8_t* data, size_t len) {
  uint32_t crc = 0;
  for (size_t i = 0; i < len; ++i)
    crc = (crc << 8) ^ ogg_crc_table[((crc >> 24) & 0xff) ^ data[i]];
  return crc;
}

struct OggPacket {
  std::vector<uint8_t> data;
  uint64_t granule = 0;  // granule of the page the packet *ends* on
};

// Demux all packets of the first logical stream in an Ogg file.
bool ogg_demux(const uint8_t* buf, size_t len, std::vector<OggPacket>* out) {
  size_t off = 0;
  std::vector<uint8_t> partial;
  bool have_serial = false;
  uint32_t serial = 0;
  while (off + 27 <= len) {
    if (memcmp(buf + off, "OggS", 4) != 0) {
      ++off;  // resync
      continue;
    }
    const uint8_t* p = buf + off;
    uint64_t granule;
    memcpy(&granule, p + 6, 8);
    uint32_t ser;
    memcpy(&ser, p + 14, 4);
    uint8_t nsegs = p[26];
    if (off + 27 + nsegs > len) break;
    const uint8_t* segtab = p + 27;
    size_t body = 0;
    for (int i = 0; i < nsegs; ++i) body += segtab[i];
    if (off + 27 + nsegs + body > len) break;
    if (!have_serial) {
      serial = ser;
      have_serial = true;
    }
    if (ser == serial) {
      const uint8_t* seg = p + 27 + nsegs;
      for (int i = 0; i < nsegs; ++i) {
        uint8_t l = segtab[i];
        partial.insert(partial.end(), seg, seg + l);
        seg += l;
        if (l < 255) {
          OggPacket pk;
          pk.data = std::move(partial);
          partial.clear();
          pk.granule = granule;
          out->push_back(std::move(pk));
        }
      }
    }
    off += 27 + nsegs + body;
  }
  return !out->empty();
}

// Writes one packet as one or more pages. A page holds at most 255 lacing
// values; packets >= 255*255 bytes spill onto continuation pages (flag 0x01,
// granule -1 on pages where the packet doesn't end), mirroring the Python
// muxer's _make_pages_for_packet so the two agree on large OpusTags packets.
size_t ogg_write_page(std::vector<uint8_t>* out, uint32_t serial, uint32_t seq,
                      uint64_t granule, uint8_t flags,
                      const uint8_t* body, size_t body_len) {
  // lacing values for the whole packet: 255s then a final short (possibly 0)
  size_t total_segs = body_len / 255 + 1;
  size_t seg_done = 0, body_off = 0;
  bool first = true;
  while (seg_done < total_segs) {
    size_t nsegs = total_segs - seg_done;
    if (nsegs > 255) nsegs = 255;
    bool last = (seg_done + nsegs == total_segs);
    size_t page_body = 0;
    for (size_t i = 0; i < nsegs; ++i) {
      size_t idx = seg_done + i;
      page_body += (idx + 1 < total_segs) ? 255 : body_len % 255;
    }
    uint8_t page_flags = first ? flags : static_cast<uint8_t>((flags & 0x04) | 0x01);
    uint64_t page_granule = last ? granule : ~0ULL;
    std::vector<uint8_t> page;
    page.reserve(27 + nsegs + page_body);
    const char magic[4] = {'O', 'g', 'g', 'S'};
    page.insert(page.end(), magic, magic + 4);
    page.push_back(0);           // version
    page.push_back(page_flags);  // header type
    const uint8_t* g = reinterpret_cast<const uint8_t*>(&page_granule);
    page.insert(page.end(), g, g + 8);
    const uint8_t* s = reinterpret_cast<const uint8_t*>(&serial);
    page.insert(page.end(), s, s + 4);
    const uint8_t* q = reinterpret_cast<const uint8_t*>(&seq);
    page.insert(page.end(), q, q + 4);
    page.insert(page.end(), 4, 0);  // crc placeholder
    page.push_back(static_cast<uint8_t>(nsegs));
    for (size_t i = 0; i < nsegs; ++i) {
      size_t idx = seg_done + i;
      page.push_back(static_cast<uint8_t>(idx + 1 < total_segs ? 255 : body_len % 255));
    }
    page.insert(page.end(), body + body_off, body + body_off + page_body);
    uint32_t crc = ogg_crc(page.data(), page.size());
    memcpy(page.data() + 22, &crc, 4);
    out->insert(out->end(), page.begin(), page.end());
    seg_done += nsegs;
    body_off += page_body;
    seq++;
    first = false;
  }
  return total_segs == 0 ? 0 : (total_segs + 254) / 255;
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    set_error("can't open %s", path);
    return false;
  }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(sz);
  size_t got = fread(out->data(), 1, sz, f);
  fclose(f);
  if (static_cast<long>(got) != sz) {
    set_error("short read on %s", path);
    return false;
  }
  return true;
}

bool write_file(const char* path, const std::vector<uint8_t>& data) {
  FILE* f = fopen(path, "wb");
  if (!f) {
    set_error("can't create %s", path);
    return false;
  }
  size_t put = fwrite(data.data(), 1, data.size(), f);
  fclose(f);
  return put == data.size();
}

}  // namespace

extern "C" {

const char* am_last_error() { return g_error; }

void am_free(float* p) { free(p); }

// capability probes for the Python side
int am_has_mp3_decode() { return mpg123().ok() ? 1 : 0; }
int am_has_opus() { return opus().ok() ? 1 : 0; }
int am_has_mp3_encode() { return lame().ok() ? 1 : 0; }
int am_has_mp3_duration() {
  Mpg123Api& m = mpg123();
  return (m.ok() && m.scan && m.length) ? 1 : 0;
}

// Fast mp3 duration probe: mpg123's frame-header scan, NO decode — the
// role of the reference's `mp3-duration` crate stage (mp3_reader.rs:76)
// between the tag cache and the full-decode fallback.
int am_mp3_duration(const char* path, int64_t* out_samples,
                    int32_t* out_sr) {
  Mpg123Api& m = mpg123();
  if (!m.ok() || !m.scan || !m.length) {
    set_error("mpg123 scan/length unavailable");
    return -1;
  }
  int err = 0;
  void* h = m.make(nullptr, &err);
  if (!h) {
    set_error("mpg123_new failed");
    return -1;
  }
  if (m.open(h, path) != MPG123_OK) {
    set_error("no valid mp3 data in %s", path);
    m.del(h);
    return -1;
  }
  long rate = 0;
  int channels = 0, enc = 0;
  if (m.getformat(h, &rate, &channels, &enc) != MPG123_OK ||
      m.scan(h) != MPG123_OK) {
    set_error("no valid mp3 data in %s", path);
    m.close(h);
    m.del(h);
    return -1;
  }
  long len = m.length(h);  // samples per channel
  m.close(h);
  m.del(h);
  if (len < 0) {
    set_error("mpg123_length failed for %s", path);
    return -1;
  }
  *out_samples = static_cast<int64_t>(len);
  *out_sr = static_cast<int32_t>(rate);
  return 0;
}

// Decode an mp3 to mono int16 on the (l+r)/2 grid — the wire format for
// device staging (the f32 reference scaling ×1/65535 is applied on device).
// Max deviation from the f32 path: 0.5/65535 of full scale (rounding the
// half-steps of the stereo average).
int am_decode_mp3_i16(const char* path, int16_t** out, int64_t* out_n,
                      int32_t* out_sr) {
  Mpg123Api& m = mpg123();
  if (!m.ok()) {
    set_error("libmpg123 not available");
    return -1;
  }
  int err = 0;
  void* h = m.make(nullptr, &err);
  if (!h) {
    set_error("mpg123_new failed");
    return -1;
  }
  if (m.open(h, path) != MPG123_OK) {
    set_error("no valid mp3 data in %s", path);
    m.del(h);
    return -1;
  }
  long rate = 0;
  int channels = 0, enc = 0;
  if (m.getformat(h, &rate, &channels, &enc) != MPG123_OK) {
    set_error("no valid mp3 data in %s", path);
    m.close(h);
    m.del(h);
    return -1;
  }
  m.format_none(h);
  m.format(h, rate, channels, MPG123_ENC_SIGNED_16);

  std::vector<int16_t> mono;
  std::vector<uint8_t> buf(1 << 18);
  for (;;) {
    size_t done = 0;
    int r = m.read(h, buf.data(), buf.size(), &done);
    size_t nsamp = done / sizeof(int16_t);
    const int16_t* s = reinterpret_cast<const int16_t*>(buf.data());
    if (channels == 2) {
      for (size_t i = 0; i + 1 < nsamp; i += 2) {
        int v = (static_cast<int>(s[i]) + static_cast<int>(s[i + 1]));
        // round-half-away of v/2, staying in int16 range
        mono.push_back(static_cast<int16_t>((v + (v >= 0 ? 1 : -1)) / 2));
      }
    } else {
      for (size_t i = 0; i < nsamp; ++i) mono.push_back(s[i]);
    }
    if (r == MPG123_DONE) break;
    if (r == MPG123_NEW_FORMAT) {
      set_error("sample rate changed mid-stream in %s", path);
      m.close(h);
      m.del(h);
      return -1;
    }
    if (r == MPG123_ERR) {
      // a truncated/corrupt stream must NOT pass as a short success: the
      // wrong duration would be cached into the file's Length tag
      set_error("mp3 decode error mid-stream in %s", path);
      m.close(h);
      m.del(h);
      return -1;
    }
    if (r != MPG123_OK && done == 0) break;
  }
  m.close(h);
  m.del(h);

  int16_t* arr = static_cast<int16_t*>(malloc(mono.size() * sizeof(int16_t)));
  if (!arr) {
    set_error("out of memory decoding %s", path);
    return -1;
  }
  memcpy(arr, mono.data(), mono.size() * sizeof(int16_t));
  *out = arr;
  *out_n = static_cast<int64_t>(mono.size());
  *out_sr = static_cast<int32_t>(rate);
  return 0;
}

void am_free_i16(int16_t* p) { free(p); }

// Decode an mp3 to mono f32, (l+r)*0.5/65535 downmix (reference parity).
// Returns 0 on success; fills *out (malloc'd, caller frees via am_free),
// *out_n and *out_sr.
int am_decode_mp3(const char* path, float** out, int64_t* out_n,
                  int32_t* out_sr) {
  Mpg123Api& m = mpg123();
  if (!m.ok()) {
    set_error("libmpg123 not available");
    return -1;
  }
  int err = 0;
  void* h = m.make(nullptr, &err);
  if (!h) {
    set_error("mpg123_new failed");
    return -1;
  }
  if (m.open(h, path) != MPG123_OK) {
    set_error("no valid mp3 data in %s", path);
    m.del(h);
    return -1;
  }
  long rate = 0;
  int channels = 0, enc = 0;
  if (m.getformat(h, &rate, &channels, &enc) != MPG123_OK) {
    set_error("no valid mp3 data in %s", path);
    m.close(h);
    m.del(h);
    return -1;
  }
  m.format_none(h);
  m.format(h, rate, channels, MPG123_ENC_SIGNED_16);

  std::vector<float> mono;
  std::vector<uint8_t> buf(1 << 18);
  for (;;) {
    size_t done = 0;
    int r = m.read(h, buf.data(), buf.size(), &done);
    size_t nsamp = done / sizeof(int16_t);
    const int16_t* s = reinterpret_cast<const int16_t*>(buf.data());
    if (channels == 2) {
      for (size_t i = 0; i + 1 < nsamp; i += 2)
        mono.push_back((static_cast<float>(s[i]) + static_cast<float>(s[i + 1])) *
                       0.5f * kPcmFactor);
    } else {
      for (size_t i = 0; i < nsamp; ++i)
        mono.push_back(static_cast<float>(s[i]) * kPcmFactor);
    }
    if (r == MPG123_DONE) break;
    if (r == MPG123_NEW_FORMAT) {
      set_error("sample rate changed mid-stream in %s", path);
      m.close(h);
      m.del(h);
      return -1;
    }
    if (r == MPG123_ERR) {
      set_error("mp3 decode error mid-stream in %s", path);
      m.close(h);
      m.del(h);
      return -1;
    }
    if (r != MPG123_OK && done == 0) break;
  }
  m.close(h);
  m.del(h);

  float* arr = static_cast<float*>(malloc(mono.size() * sizeof(float)));
  if (!arr) {
    set_error("out of memory decoding %s", path);
    return -1;
  }
  memcpy(arr, mono.data(), mono.size() * sizeof(float));
  *out = arr;
  *out_n = static_cast<int64_t>(mono.size());
  *out_sr = static_cast<int32_t>(rate);
  return 0;
}

// Decode an Ogg/Opus file to mono f32 at 48 kHz. Honors pre-skip and the
// final granule trim. Output scaled to the same int16-derived range as mp3
// (×32768/65535) so cross-codec correlation scores stay comparable.
int am_decode_opus(const char* path, float** out, int64_t* out_n,
                   int32_t* out_sr) {
  OpusApi& o = opus();
  if (!o.ok()) {
    set_error("libopus not available");
    return -1;
  }
  std::vector<uint8_t> file;
  if (!read_file(path, &file)) return -1;
  std::vector<OggPacket> packets;
  if (!ogg_demux(file.data(), file.size(), &packets) || packets.size() < 2) {
    set_error("no ogg packets in %s", path);
    return -1;
  }
  const OggPacket& head = packets[0];
  if (head.data.size() < 19 || memcmp(head.data.data(), "OpusHead", 8) != 0) {
    set_error("%s is not an opus stream", path);
    return -1;
  }
  int channels = head.data[9];
  if (channels < 1 || channels > 2 || head.data[18] != 0) {
    // mapping family != 0 frames packets for the multistream decoder —
    // opus_decode on them yields garbage/empty output, not audio
    set_error("unsupported opus channel layout in %s", path);
    return -1;
  }
  uint16_t preskip;
  memcpy(&preskip, head.data.data() + 10, 2);

  int err = 0;
  void* dec = o.dec_create(48000, channels, &err);
  if (!dec) {
    set_error("opus_decoder_create failed");
    return -1;
  }
  std::vector<float> pcm(5760 * channels);
  std::vector<float> mono;
  uint64_t last_granule = 0;
  for (size_t i = 2; i < packets.size(); ++i) {  // skip OpusHead + OpusTags
    const OggPacket& pk = packets[i];
    int n = o.dec_float(dec, pk.data.data(),
                        static_cast<int32_t>(pk.data.size()), pcm.data(), 5760, 0);
    if (n < 0) {
      // skipping would desync the sample count from the granule trim
      // and could return rc=0 with empty output for a corrupt file
      set_error("an opus packet failed to decode in %s", path);
      o.dec_destroy(dec);
      return -1;
    }
    if (channels == 2) {
      for (int j = 0; j < n; ++j)
        mono.push_back((pcm[2 * j] + pcm[2 * j + 1]) * 0.5f * kFloatToI16Scale);
    } else {
      for (int j = 0; j < n; ++j) mono.push_back(pcm[j] * kFloatToI16Scale);
    }
    last_granule = pk.granule;
  }
  o.dec_destroy(dec);

  // trim pre-skip + tail beyond final granule
  size_t start = preskip < mono.size() ? preskip : mono.size();
  size_t end = mono.size();
  if (last_granule > 0 && last_granule >= preskip) {
    size_t playable = static_cast<size_t>(last_granule - preskip);
    if (start + playable < end) end = start + playable;
  }
  size_t n = end - start;
  float* arr = static_cast<float*>(malloc(n * sizeof(float)));
  if (!arr) {
    set_error("out of memory decoding %s", path);
    return -1;
  }
  memcpy(arr, mono.data() + start, n * sizeof(float));
  *out = arr;
  *out_n = static_cast<int64_t>(n);
  *out_sr = 48000;
  return 0;
}

// Encode mono f32 (reference scale) to mp3, duplicating to stereo —
// fixture generator for tests/benches (the reference's fixtures are private).
int am_encode_mp3(const char* path, const float* samples, int64_t n,
                  int32_t sr) {
  LameApi& l = lame();
  if (!l.ok()) {
    set_error("libmp3lame not available");
    return -1;
  }
  void* h = l.init();
  l.set_in_samplerate(h, sr);
  l.set_num_channels(h, 2);
  l.set_quality(h, 2);
  if (l.init_params(h) < 0) {
    set_error("lame_init_params failed");
    l.close(h);
    return -1;
  }
  std::vector<int16_t> ch(n);
  for (int64_t i = 0; i < n; ++i) {
    float v = samples[i] / kPcmFactor;  // undo reference scaling
    if (v > 32767.f) v = 32767.f;
    if (v < -32768.f) v = -32768.f;
    ch[i] = static_cast<int16_t>(v);
  }
  std::vector<uint8_t> outbuf;
  std::vector<uint8_t> tmp(1 << 20);
  int64_t pos = 0;
  while (pos < n) {
    int take = static_cast<int>(n - pos > 65536 ? 65536 : n - pos);
    int w = l.encode(h, ch.data() + pos, ch.data() + pos, take, tmp.data(),
                     static_cast<int>(tmp.size()));
    if (w < 0) {
      set_error("lame encode failed");
      l.close(h);
      return -1;
    }
    outbuf.insert(outbuf.end(), tmp.data(), tmp.data() + w);
    pos += take;
  }
  int w = l.flush(h, tmp.data(), static_cast<int>(tmp.size()));
  if (w > 0) outbuf.insert(outbuf.end(), tmp.data(), tmp.data() + w);
  l.close(h);
  return write_file(path, outbuf) ? 0 : -1;
}

// Encode mono f32 to Ogg/Opus at 48 kHz (input must be 48 kHz).
int am_encode_opus(const char* path, const float* samples, int64_t n,
                   int32_t sr) {
  OpusApi& o = opus();
  if (!o.ok()) {
    set_error("libopus not available");
    return -1;
  }
  if (sr != 48000) {
    set_error("opus encode requires 48 kHz input");
    return -1;
  }
  int err = 0;
  void* enc = o.enc_create(48000, 1, 2049 /*OPUS_APPLICATION_AUDIO*/, &err);
  if (!enc) {
    set_error("opus_encoder_create failed");
    return -1;
  }
  int32_t lookahead = 0;
  o.enc_ctl(enc, 4027 /*OPUS_GET_LOOKAHEAD*/, &lookahead);
  uint16_t preskip = static_cast<uint16_t>(lookahead);

  std::vector<uint8_t> ogg;
  uint32_t serial = 0x616d7470;  // "amtp"
  uint32_t seq = 0;

  uint8_t head[19];
  memcpy(head, "OpusHead", 8);
  head[8] = 1;  // version
  head[9] = 1;  // channels
  memcpy(head + 10, &preskip, 2);
  uint32_t in_sr = static_cast<uint32_t>(sr);
  memcpy(head + 12, &in_sr, 4);
  head[16] = head[17] = 0;  // output gain
  head[18] = 0;             // mapping family
  seq += ogg_write_page(&ogg, serial, seq, 0, 0x02 /*BOS*/, head, sizeof(head));

  const char vendor[] = "audio_matcher_tpu";
  std::vector<uint8_t> tags;
  tags.insert(tags.end(), (const uint8_t*)"OpusTags", (const uint8_t*)"OpusTags" + 8);
  uint32_t vlen = sizeof(vendor) - 1;
  tags.insert(tags.end(), (uint8_t*)&vlen, (uint8_t*)&vlen + 4);
  tags.insert(tags.end(), vendor, vendor + vlen);
  uint32_t ncomments = 0;
  tags.insert(tags.end(), (uint8_t*)&ncomments, (uint8_t*)&ncomments + 4);
  seq += ogg_write_page(&ogg, serial, seq, 0, 0, tags.data(), tags.size());

  constexpr int kFrame = 960;  // 20 ms @ 48 kHz
  std::vector<int16_t> frame(kFrame);
  std::vector<uint8_t> pkt(4096);
  int64_t pos = 0;
  uint64_t granule = preskip;
  // pad by the lookahead: the encoder delays output by preskip samples,
  // so without flush frames the final preskip input samples never leave
  // its internal buffer (the decode-side granule trim expects exactly
  // preskip + n total samples)
  int64_t total_frames = (n + preskip + kFrame - 1) / kFrame;
  for (int64_t f = 0; f < total_frames; ++f) {
    for (int j = 0; j < kFrame; ++j) {
      int64_t idx = pos + j;
      float v = idx < n ? samples[idx] / kFloatToI16Scale : 0.0f;
      v *= 32767.0f;
      if (v > 32767.f) v = 32767.f;
      if (v < -32768.f) v = -32768.f;
      frame[j] = static_cast<int16_t>(v);
    }
    int32_t w = o.encode(enc, frame.data(), kFrame, pkt.data(),
                         static_cast<int32_t>(pkt.size()));
    if (w < 0) {
      set_error("opus encode failed");
      o.enc_destroy(enc);
      return -1;
    }
    pos += kFrame;
    int64_t consumed = pos < n ? pos : n;
    granule = preskip + static_cast<uint64_t>(consumed);
    uint8_t flags = (f == total_frames - 1) ? 0x04 /*EOS*/ : 0;
    seq += ogg_write_page(&ogg, serial, seq, granule, flags, pkt.data(), w);
  }
  o.enc_destroy(enc);
  return write_file(path, ogg) ? 0 : -1;
}

}  // extern "C"
