// v2m_native — C++ host-side data-loading kernels for the TPU framework.
//
// The dataset pipeline's host cost is dominated by text parsing of per-video
// feature files (.lab/.csv — the reference parses them line-by-line in
// Python inside VevoDataset.createSample, reference:
// dataset/vevo_dataset.py:241-554, eagerly for the whole split at startup
// :187-191). These C functions parse straight into caller-provided numpy
// buffers, release-the-GIL friendly (pure C ABI, no Python API), and are
// bound via ctypes in video2music_tpu/data/native.py with a transparent
// Python fallback.
//
// Build: g++ -O3 -shared -fPIC -o libv2m_native.so v2m_native.cpp
//
// Chord-id layout matches core/vocab.py exactly: ids 1..156 are
// root*13 + quality + 1 over ROOTS x QUALITIES; "N"=0; END=157; PAD=158.

#include <cstdint>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>

namespace {

const char* kRoots[12] = {"C", "C#", "D", "D#", "E", "F",
                          "F#", "G", "G#", "A", "A#", "B"};
const char* kQualities[13] = {"maj", "dim", "sus4", "min7", "min", "sus2",
                              "aug", "dim7", "maj6", "hdim7", "7", "min6",
                              "maj7"};

struct Vocab {
  std::unordered_map<std::string, int32_t> chord;
  std::unordered_map<std::string, int32_t> root;
  std::unordered_map<std::string, int32_t> attr;
  Vocab() {
    chord["N"] = 0;
    root["N"] = 0;
    attr["N"] = 0;
    for (int r = 0; r < 12; ++r) {
      root[kRoots[r]] = r + 1;
      for (int q = 0; q < 13; ++q) {
        std::string sym = (q == 0)
            ? std::string(kRoots[r])
            : std::string(kRoots[r]) + ":" + kQualities[q];
        chord[sym] = 1 + r * 13 + q;
      }
    }
    for (int q = 0; q < 13; ++q) attr[kQualities[q]] = q + 1;
  }
};

const Vocab& vocab() {
  static Vocab v;
  return v;
}

// Reads a whole file; returns malloc'd buffer (caller frees) or nullptr.
char* read_file(const char* path, size_t* size_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  char* buf = static_cast<char*>(std::malloc(size + 1));
  size_t got = std::fread(buf, 1, size, f);
  std::fclose(f);
  buf[got] = '\0';
  *size_out = got;
  return buf;
}

}  // namespace

extern "C" {

// Parse "<sec> <float>" lines into out[max_seq] (pre-filled by caller).
// Lines starting with non-digits (headers, "key ...") are skipped.
// Returns number of values written, or -1 on IO error.
int32_t v2m_parse_scalar_lab(const char* path, float* out, int32_t max_seq,
                             float offset) {
  size_t size;
  char* buf = read_file(path, &size);
  if (!buf) return -1;
  int32_t count = 0;
  char* p = buf;
  while (*p) {
    char* line_end = std::strchr(p, '\n');
    if (!line_end) line_end = buf + size;
    if (*p >= '0' && *p <= '9') {
      char* after = nullptr;
      long t = std::strtol(p, &after, 10);
      if (after && after != p && t >= 0 && t < max_seq) {
        float v = std::strtof(after, nullptr);
        out[t] = v + offset;
        ++count;
      } else if (t >= max_seq) {
        break;
      }
    }
    if (line_end >= buf + size) break;
    p = line_end + 1;
  }
  std::free(buf);
  return count;
}

// Parse an emotion .lab ("time ..." header + per-second probabilities) into
// out[max_seq * n_emotions]. Returns rows written or -1.
int32_t v2m_parse_emotion_lab(const char* path, float* out, int32_t max_seq,
                              int32_t n_emotions) {
  size_t size;
  char* buf = read_file(path, &size);
  if (!buf) return -1;
  int32_t count = 0;
  char* p = buf;
  while (*p) {
    char* line_end = std::strchr(p, '\n');
    if (!line_end) line_end = buf + size;
    if (*p >= '0' && *p <= '9') {
      char* cur = nullptr;
      long t = std::strtol(p, &cur, 10);
      if (t >= max_seq) break;
      if (t >= 0) {
        // Stay within this line: a short row (fewer than n_emotions values,
        // e.g. a 5-class file read with n_emotions=6) must leave the missing
        // columns at the caller's prefill instead of consuming the next
        // line's timestamp as a probability.
        for (int e = 0; e < n_emotions; ++e) {
          while (cur < line_end &&
                 (*cur == ' ' || *cur == '\t' || *cur == '\r')) {
            ++cur;
          }
          if (cur >= line_end) break;
          out[t * n_emotions + e] = std::strtof(cur, &cur);
        }
        ++count;
      }
    }
    if (line_end >= buf + size) break;
    p = line_end + 1;
  }
  std::free(buf);
  return count;
}

// Parse a chord .lab into chord/root/attr id arrays (pre-filled with PAD).
// key_out receives 0 (major) / 1 (minor); last_time_out the final parsed
// second (for END insertion). Returns chords written or -1.
int32_t v2m_parse_chord_lab(const char* path, int64_t* chord_out,
                            int64_t* root_out, int64_t* attr_out,
                            int32_t max_seq, int32_t* key_out,
                            int32_t* last_time_out) {
  size_t size;
  char* buf = read_file(path, &size);
  if (!buf) return -1;
  const Vocab& v = vocab();
  int32_t count = 0;
  // default minor: the Python path tests 'major' in key-string, and an
  // absent key header ("") therefore yields minor (1)
  *key_out = 1;
  *last_time_out = max_seq;
  char* p = buf;
  while (*p) {
    char* line_end = std::strchr(p, '\n');
    if (!line_end) line_end = buf + size;
    if (std::strncmp(p, "key ", 4) == 0) {
      // "key <tonic> <mode>": minor unless "major" appears
      *key_out = (std::strstr(p, "major") &&
                  std::strstr(p, "major") < line_end) ? 0 : 1;
    } else if (*p >= '0' && *p <= '9') {
      char* after = nullptr;
      long t = std::strtol(p, &after, 10);
      if (t >= max_seq) break;
      if (t >= 0 && after && *after == ' ') {
        const char* sym_start = after + 1;
        const char* sym_end = line_end;
        while (sym_end > sym_start &&
               (sym_end[-1] == '\r' || sym_end[-1] == ' ')) --sym_end;
        std::string sym(sym_start, sym_end - sym_start);
        auto it = v.chord.find(sym);
        if (it != v.chord.end()) {
          chord_out[t] = it->second;
          *last_time_out = static_cast<int32_t>(t);
          size_t colon = sym.find(':');
          if (colon == std::string::npos) {
            if (sym == "N") {
              root_out[t] = 0;
              attr_out[t] = 0;
            } else {
              root_out[t] = v.root.at(sym);
              attr_out[t] = 1;
            }
          } else {
            root_out[t] = v.root.at(sym.substr(0, colon));
            attr_out[t] = v.attr.at(sym.substr(colon + 1));
          }
          ++count;
        }
      }
    }
    if (line_end >= buf + size) break;
    p = line_end + 1;
  }
  std::free(buf);
  return count;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Scene-content scorer: fused uint8 HSV conversion + |delta| mean vs the
// previous frame's HSV planes, in ONE strided pass over the source frame.
//
// Replaces the per-frame cv2 chain in features/scene.py:ContentScorer
// (ascontiguousarray copy -> cvtColor -> absdiff -> np.mean: four passes and
// three temporaries per frame; the scorer was ~1.3 s of the 60 s-clip e2e
// budget on the 1-core host). The HSV math is bit-exact OpenCV RGB2HSV_b
// fixed-point semantics (hsv_shift=12 rounding tables, no hue wraparound in
// the delta — the scenedetect 0.6.1 quirk lives in the |h1-h2| delta, which
// this reproduces by storing the same integer H plane cv2 would produce).
// Parity is enforced by tests/test_features.py against the cv2 path.

namespace {

struct HsvTables {
  int sdiv[256];
  int hdiv[256];
  HsvTables() {
    // OpenCV builds these with saturate_cast<int>(double) == cvRound:
    // round-to-nearest (ties to even), NOT truncation — lrint under the
    // default FE_TONEAREST mode matches it bit-for-bit.
    sdiv[0] = hdiv[0] = 0;
    for (int i = 1; i < 256; ++i) {
      sdiv[i] = static_cast<int>(std::lrint((255 << 12) / (1.0 * i)));
      hdiv[i] = static_cast<int>(std::lrint((180 << 12) / (6.0 * i)));
    }
  }
};

inline void pixel_to_hsv(int r, int g, int b, const HsvTables& t,
                         uint8_t* dst) {
  int v = b > g ? b : g;
  if (r > v) v = r;
  int vmin = b < g ? b : g;
  if (r < vmin) vmin = r;
  int diff = v - vmin;
  int vr = v == r ? -1 : 0;
  int vg = v == g ? -1 : 0;
  int s = (diff * t.sdiv[v] + (1 << 11)) >> 12;
  int h = (vr & (g - b)) +
          (~vr & ((vg & (b - r + 2 * diff)) + (~vg & (r - g + 4 * diff))));
  h = (h * t.hdiv[diff] + (1 << 11)) >> 12;
  h += h < 0 ? 180 : 0;
  dst[0] = static_cast<uint8_t>(h);
  dst[1] = static_cast<uint8_t>(s);
  dst[2] = static_cast<uint8_t>(v);
}

void convert_row_scalar(const uint8_t* src, uint8_t* dst, int32_t x0,
                        int32_t w, int64_t col_stride, int ridx, int bidx,
                        const HsvTables& t) {
  for (int32_t x = x0; x < w; ++x) {
    const uint8_t* px = src + x * col_stride;
    pixel_to_hsv(px[ridx], px[1], px[bidx], t, dst + x * 3);
  }
}

}  // namespace

// --- AVX2 fast path ---------------------------------------------------------
// Per 8 pixels: ONE vpgatherdd pulls whole little-endian BGR dwords straight
// off the strided source row (no deinterleave, no contiguous copy), two more
// gathers do the sdiv/hdiv fixed-point table lookups, and the 3 output bytes
// per lane are packed with an in-lane byte shuffle + overlapping 16-byte
// stores. The |cur - prev| reduction is a second contiguous pass using
// max/min(epu8) + vpsadbw. Bit-exact with the scalar path (and cv2) —
// dispatched at runtime, scalar fallback kept for non-AVX2 hosts.

#pragma GCC push_options
#pragma GCC target("avx2")
#include <immintrin.h>

namespace {

// Convert pixels [0, bound) of one row; caller finishes [bound, w) scalar.
// bound must satisfy: gathers read 4 bytes at (x+7)*col_stride and the
// second 16-byte store reaches dst + (x*3 + 28) — callers pick bound so
// both stay inside the frame / cur_hsv allocations.
__attribute__((target("avx2")))
void convert_row_avx2(const uint8_t* src, uint8_t* dst, int32_t bound,
                      int64_t col_stride, int ridx, int bidx,
                      const HsvTables& t) {
  const __m256i lane_off = _mm256_mullo_epi32(
      _mm256_set1_epi32(static_cast<int32_t>(col_stride)),
      _mm256_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7));
  const __m256i c255 = _mm256_set1_epi32(255);
  const __m256i c2048 = _mm256_set1_epi32(1 << 11);
  const __m256i c180 = _mm256_set1_epi32(180);
  // pack byte 0,1,2 of each dword lane into 12 contiguous bytes (per
  // 128-bit half)
  const __m256i pack3 = _mm256_setr_epi8(
      0, 1, 2, 4, 5, 6, 8, 9, 10, 12, 13, 14, -1, -1, -1, -1,
      0, 1, 2, 4, 5, 6, 8, 9, 10, 12, 13, 14, -1, -1, -1, -1);
  for (int32_t x = 0; x + 8 <= bound; x += 8) {
    const uint8_t* base = src + x * col_stride;
    __m256i px = _mm256_i32gather_epi32(
        reinterpret_cast<const int*>(base), lane_off, 1);
    __m256i r = _mm256_and_si256(
        _mm256_srli_epi32(px, 8 * ridx), c255);
    __m256i g = _mm256_and_si256(_mm256_srli_epi32(px, 8), c255);
    __m256i b = _mm256_and_si256(
        _mm256_srli_epi32(px, 8 * bidx), c255);
    __m256i v = _mm256_max_epi32(_mm256_max_epi32(r, g), b);
    __m256i vmin = _mm256_min_epi32(_mm256_min_epi32(r, g), b);
    __m256i diff = _mm256_sub_epi32(v, vmin);
    __m256i sdiv = _mm256_i32gather_epi32(t.sdiv, v, 4);
    __m256i hdiv = _mm256_i32gather_epi32(t.hdiv, diff, 4);
    __m256i s = _mm256_srli_epi32(
        _mm256_add_epi32(_mm256_mullo_epi32(diff, sdiv), c2048), 12);
    __m256i vr = _mm256_cmpeq_epi32(v, r);
    __m256i vg = _mm256_cmpeq_epi32(v, g);
    __m256i t2 = _mm256_add_epi32(_mm256_sub_epi32(b, r),
                                  _mm256_slli_epi32(diff, 1));
    __m256i t3 = _mm256_add_epi32(_mm256_sub_epi32(r, g),
                                  _mm256_slli_epi32(diff, 2));
    __m256i hnum = _mm256_blendv_epi8(
        _mm256_blendv_epi8(t3, t2, vg), _mm256_sub_epi32(g, b), vr);
    __m256i hh = _mm256_srai_epi32(
        _mm256_add_epi32(_mm256_mullo_epi32(hnum, hdiv), c2048), 12);
    hh = _mm256_add_epi32(
        hh, _mm256_and_si256(_mm256_srai_epi32(hh, 31), c180));
    __m256i hsv = _mm256_or_si256(
        hh, _mm256_or_si256(_mm256_slli_epi32(s, 8),
                            _mm256_slli_epi32(v, 16)));
    __m256i packed = _mm256_shuffle_epi8(hsv, pack3);
    uint8_t* out = dst + x * 3;
    // overlapping stores: bytes 12..15 of each half are garbage and get
    // overwritten by the next store / scalar tail (bound guarantees room)
    _mm_storeu_si128(reinterpret_cast<__m128i*>(out),
                     _mm256_castsi256_si128(packed));
    _mm_storeu_si128(reinterpret_cast<__m128i*>(out + 12),
                     _mm256_extracti128_si256(packed, 1));
  }
}

// sum of |a - b| over n bytes (both contiguous)
__attribute__((target("avx2")))
int64_t absdiff_sum_avx2(const uint8_t* a, const uint8_t* b, int64_t n) {
  __m256i acc = _mm256_setzero_si256();
  int64_t i = 0;
  for (; i + 32 <= n; i += 32) {
    __m256i va = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(a + i));
    __m256i vb = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(b + i));
    __m256i d = _mm256_sub_epi8(_mm256_max_epu8(va, vb),
                                _mm256_min_epu8(va, vb));
    acc = _mm256_add_epi64(acc, _mm256_sad_epu8(d, _mm256_setzero_si256()));
  }
  alignas(32) int64_t lanes[4];
  _mm256_store_si256(reinterpret_cast<__m256i*>(lanes), acc);
  int64_t total = lanes[0] + lanes[1] + lanes[2] + lanes[3];
  for (; i < n; ++i) {
    int d = static_cast<int>(a[i]) - static_cast<int>(b[i]);
    total += d < 0 ? -d : d;
  }
  return total;
}

}  // namespace
#pragma GCC pop_options

extern "C" {

// frame: 8-bit 3-channel, arbitrary row/col strides in BYTES (channel
// stride must be 1) — downscaled numpy views pass straight through, no
// contiguous copy. prev_hsv/cur_hsv: caller-owned h*w*3 C-contiguous
// buffers. Fills cur_hsv with the OpenCV-exact integer HSV planes and
// returns sum(|cur - prev|) over all channels (caller divides for the
// mean), or 0 when has_prev == 0.
int64_t v2m_hsv_score(const uint8_t* frame, int32_t h, int32_t w,
                      int64_t row_stride, int64_t col_stride,
                      int32_t is_bgr, const uint8_t* prev_hsv,
                      uint8_t* cur_hsv, int32_t has_prev) {
  static const HsvTables tables;
  static const bool have_avx2 = __builtin_cpu_supports("avx2");
  const int ridx = is_bgr ? 2 : 0;  // red channel offset within a pixel
  const int bidx = 2 - ridx;
  // positive strides only (flipped views take the scalar path — the
  // last-row bounds reasoning below assumes memory order == index order);
  // col_stride capped so the 8-lane epi32 gather offsets cannot overflow
  const bool avx2 = have_avx2 && col_stride > 0 && row_stride > 0 &&
                    col_stride <= (1 << 28);
  for (int32_t y = 0; y < h; ++y) {
    const uint8_t* src = frame + y * row_stride;
    uint8_t* dst = cur_hsv + static_cast<int64_t>(y) * w * 3;
    if (avx2) {
      // Last row: the 8-px source gather reads 4 bytes at the last lane
      // (1 past its pixel) and the packed store writes 16 bytes from
      // x*3+12 — keep both inside the allocations by finishing the final
      // pixels scalar. Inner rows have following data, so only the store
      // constraint (next row of cur_hsv exists: +4 slack) applies.
      int32_t bound = (y == h - 1) ? (w > 10 ? w - 10 : 0) : w;
      convert_row_avx2(src, dst, bound, col_stride, ridx, bidx, tables);
      convert_row_scalar(src, dst, bound & ~7, w, col_stride, ridx, bidx,
                         tables);
    } else {
      convert_row_scalar(src, dst, 0, w, col_stride, ridx, bidx, tables);
    }
  }
  if (!has_prev) return 0;
  const int64_t n = static_cast<int64_t>(h) * w * 3;
  if (avx2) return absdiff_sum_avx2(cur_hsv, prev_hsv, n);
  int64_t total = 0;
  for (int64_t i = 0; i < n; ++i) {
    int d = static_cast<int>(cur_hsv[i]) - static_cast<int>(prev_hsv[i]);
    total += d < 0 ? -d : d;
  }
  return total;
}

}  // extern "C"

extern "C" {

// Parse an instrument csv (header + binary rows) into
// out[max_seq * n_cols]. Returns rows written or -1.
int32_t v2m_parse_instrument_csv(const char* path, float* out,
                                 int32_t max_seq, int32_t n_cols) {
  size_t size;
  char* buf = read_file(path, &size);
  if (!buf) return -1;
  int32_t row = -1;  // first line is the header
  char* p = buf;
  while (*p) {
    char* line_end = std::strchr(p, '\n');
    if (!line_end) line_end = buf + size;
    if (row >= 0 && row < max_seq && line_end > p) {
      char* cur = p;
      for (int c = 0; c < n_cols && cur < line_end; ++c) {
        out[row * n_cols + c] = std::strtof(cur, &cur);
        if (*cur == ',') ++cur;
      }
    }
    ++row;
    if (row >= max_seq) break;
    if (line_end >= buf + size) break;
    p = line_end + 1;
  }
  std::free(buf);
  return row < 0 ? 0 : (row > max_seq ? max_seq : row);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Native per-clip MIDI render.
//
// Byte-identical replacement for the render hot loop of
// pipeline/api._postprocess: midi/arpeggio.add_chord note emission (the
// reference's addChord if-chains, video2music.py:476-585) into
// midi/writer.MIDIFile event lists, the stable (tick, order) sort, the
// variable-length-quantity delta encoding and the SMF assembly — for the
// main chord file AND every per-instrument stem in one call. Profiled at
// ~51 ms/clip in pure Python on the 1-core serving host (46% VLQ+sort,
// 45% the add_chord/addNote loop); the same work here is <2 ms.
//
// Numerics matched to Python exactly:
//   * tick = int(round(beats * 960)) -> llrint (round-half-even, the
//     default FE_TONEAREST mode, == Python float round);
//   * velocity = int(velocity * factor) -> (int) cast (both truncate
//     toward zero);
//   * stable sort keeps insertion order for (tick, order) ties, like
//     Python's sorted().
// Policy (pan values, arpeggio instrument sets, velocity factors, emotion
// gates) stays in Python and arrives as per-instrument arrays.

#include <vector>
#include <algorithm>
#include <cmath>

namespace {

struct MidiEv {
  int64_t tick;
  uint8_t order, len, b[6];
};

const double RF1 = 1.1, RF2 = 0.95, RF3 = 0.98, RF4 = 1.0, RF5 = 0.95;
const double RDIM = 0.6;

struct PatNote { int idx; double dt; double f; };
// density -> even/odd arpeggio patterns + fifth-note beat offset
// (midi/arpeggio._PATTERNS; reference video2music.py:476-585)
const PatNote PAT_EVEN[5][8] = {
  {{0, 0.0, RF1}, {1, 1.0, RF2}},
  {{0, 0.0, RF1}, {1, 0.5, RF2}, {2, 1.0, RF3}},
  {{0, 0.0, RF1}, {1, 0.5, RF2}, {2, 1.0, RF3}, {3, 1.5, RF4}},
  {{0, 0.0, RF1}, {1, 0.25, RF2}, {2, 0.5, RF3}, {1, 0.75, RF2},
   {3, 1.0, RF4}, {2, 1.5, RF3}},
  {{0, 0.0, RF1}, {1, 0.25, RF2}, {2, 0.5, RF3}, {1, 0.75, RF2},
   {3, 1.0, RF4}, {2, 1.25, RF3}, {1, 1.5, RF2}, {2, 1.75, RF3}},
};
const PatNote PAT_ODD[5][8] = {
  {{2, 0.0, RF3}, {3, 1.0, RF4}},
  {{3, 0.0, RF4}, {1, 0.5, RF2}, {2, 1.0, RF3}},
  {{2, 0.0, RF3}, {1, 0.5, RF2}, {2, 1.0, RF3}, {3, 1.5, RF4}},
  {{1, 0.0, RF2}, {0, 0.25, RF1}, {1, 0.5, RF2}, {2, 0.75, RF3},
   {3, 1.0, RF4}, {2, 1.5, RF3}},
  {{1, 0.0, RF2}, {0, 0.25, RF1}, {1, 0.5, RF2}, {2, 0.75, RF3},
   {3, 1.0, RF4}, {2, 1.25, RF3}, {1, 1.5, RF2}, {2, 1.75, RF3}},
};
const int PAT_LEN[5] = {2, 3, 4, 6, 8};
const double PAT_FIFTH_T[5] = {2.0, 1.5, 2.0, 2.0, 2.0};

inline int64_t beat_tick(double beats) {
  return (int64_t)llrint(beats * 960.0);
}

inline void add_note(std::vector<MidiEv>& ev, int pitch, double time,
                     double dur, double vel) {
  if (pitch < 0) pitch = 0; else if (pitch > 127) pitch = 127;
  int v = (int)vel;  // trunc toward zero, == Python int()
  if (v < 0) v = 0; else if (v > 127) v = 127;
  int64_t t0 = beat_tick(time);
  int64_t t1 = beat_tick(time + dur);
  if (t1 <= t0) t1 = t0 + 1;
  ev.push_back({t0, 3, 3, {(uint8_t)0x90, (uint8_t)pitch, (uint8_t)v}});
  ev.push_back({t1, 2, 3, {(uint8_t)0x80, (uint8_t)pitch, 0}});
}

// midi/arpeggio.add_chord with the live-path trans_val quirk applied by
// the CALLER (trans arrives pre-zeroed from Python)
inline void add_chord_notes(std::vector<MidiEv>& ev, const int32_t* chord,
                            int eff_len, int offset, int density, int trans,
                            double time, double dur, double vel, bool arp) {
  if (eff_len < 4) return;
  if (arp) {
    const PatNote* pat = (offset % 2 == 0) ? PAT_EVEN[density]
                                           : PAT_ODD[density];
    for (int j = 0; j < PAT_LEN[density]; ++j)
      add_note(ev, chord[pat[j].idx] + trans, time + pat[j].dt, dur,
               vel * pat[j].f);
    if (eff_len == 5)
      add_note(ev, chord[4] + trans, time + PAT_FIFTH_T[density], dur,
               vel * RF5);
  } else {
    const double fs[4] = {RF1, RF2, RF3, RF4};
    for (int j = 0; j < 4; ++j)
      add_note(ev, chord[j] + trans, time, dur, vel * fs[j] * RDIM);
    if (eff_len == 5)
      add_note(ev, chord[4] + trans, time, dur, vel * RF5 * RDIM);
  }
}

inline void push_vlq(std::vector<uint8_t>& out, int64_t value) {
  if (value < 0) value = 0;
  if (value < 128) { out.push_back((uint8_t)value); return; }
  uint8_t tmp[10];
  int n = 0;
  tmp[n++] = value & 0x7F;
  value >>= 7;
  while (value) { tmp[n++] = 0x80 | (value & 0x7F); value >>= 7; }
  while (n) out.push_back(tmp[--n]);
}

// one single-track SMF (writer.MIDIFile.writeFile, fmt 0, 960 TPQN)
void write_smf(std::vector<MidiEv>& ev, std::vector<uint8_t>& out) {
  std::stable_sort(ev.begin(), ev.end(),
                   [](const MidiEv& a, const MidiEv& b) {
                     return a.tick != b.tick ? a.tick < b.tick
                                             : a.order < b.order;
                   });
  std::vector<uint8_t> track;
  track.reserve(ev.size() * 5 + 8);
  int64_t last = 0;
  for (const MidiEv& e : ev) {
    push_vlq(track, e.tick - last);
    for (int j = 0; j < e.len; ++j) track.push_back(e.b[j]);
    last = e.tick;
  }
  track.push_back(0); track.push_back(0xFF); track.push_back(0x2F);
  track.push_back(0x00);
  const uint8_t hdr[14] = {'M', 'T', 'h', 'd', 0, 0, 0, 6, 0, 0, 0, 1,
                           (uint8_t)(960 >> 8), (uint8_t)(960 & 0xFF)};
  out.insert(out.end(), hdr, hdr + 14);
  uint32_t tl = (uint32_t)track.size();
  const uint8_t th[8] = {'M', 'T', 'r', 'k', (uint8_t)(tl >> 24),
                         (uint8_t)(tl >> 16), (uint8_t)(tl >> 8),
                         (uint8_t)tl};
  out.insert(out.end(), th, th + 8);
  out.insert(out.end(), track.begin(), track.end());
}

inline void add_tempo(std::vector<MidiEv>& ev, double tempo_bpm) {
  // FF 51 03 + 3-byte usec/quarter (writer.addTempo)
  int64_t usec = (int64_t)llrint(60000000.0 /
                                 (tempo_bpm > 1e-6 ? tempo_bpm : 1e-6));
  ev.push_back({0, 0, 6, {0xFF, 0x51, 0x03, (uint8_t)((usec >> 16) & 0xFF),
                          (uint8_t)((usec >> 8) & 0xFF),
                          (uint8_t)(usec & 0xFF)}});
}

}  // namespace

extern "C" {

// Render one clip: the main chord SMF plus one stem per selected
// instrument. Outputs concatenate into out[cap]; sizes[0] = main bytes,
// sizes[1 + inst] = that stem's bytes (0 when the instrument never
// fires). Returns total bytes written, or -1 when cap is too small.
int64_t v2m_render_clip(
    const int32_t* chords,      // (n_sec, 5) voiced MIDI notes
    const int32_t* eff_len,     // (n_sec,) 0=skip, 4, or 5 (Python len map)
    const int32_t* offsets,     // (n_sec,) run offsets
    const int32_t* densities,   // (n_sec,) 0-4
    const int32_t* velocities,  // (n_sec,) base velocity ints
    const uint8_t* arp_emo,     // (n_sec,) emotion forces arpeggio on stems
    const uint8_t* inst_bin,    // (n_sec, n_inst) selection mask
    int32_t n_sec, int32_t n_inst, int32_t trans,
    const uint8_t* arp_inst,    // (n_inst,) always-arpeggio instruments
    const double* vel_factor,   // (n_inst,) stem velocity scale
    const int32_t* pan_ctrl,    // (n_inst,) controller number at creation
    const int32_t* pan_param,   // (n_inst,) controller parameter
    double chord_dur, double tempo,
    uint8_t* out, int64_t cap, int64_t* sizes) {
  std::vector<MidiEv> main_ev;
  main_ev.reserve(n_sec * 18 + 2);
  add_tempo(main_ev, tempo);
  std::vector<std::vector<MidiEv>> stems(n_inst);

  for (int32_t i = 0; i < n_sec; ++i) {
    const int32_t* ch = chords + (int64_t)i * 5;
    double t = i * chord_dur;
    add_chord_notes(main_ev, ch, eff_len[i], offsets[i], densities[i],
                    trans, t, chord_dur, (double)velocities[i], true);
    const uint8_t* row = inst_bin + (int64_t)i * n_inst;
    for (int32_t inst = 0; inst < n_inst; ++inst) {
      if (!row[inst]) continue;
      std::vector<MidiEv>& ev = stems[inst];
      if (ev.empty()) {
        add_tempo(ev, tempo);
        int c = pan_ctrl[inst], p = pan_param[inst];
        if (c < 0) c = 0; else if (c > 127) c = 127;
        if (p < 0) p = 0; else if (p > 127) p = 127;
        ev.push_back({0, 1, 3, {0xB0, (uint8_t)c, (uint8_t)p}});
      }
      bool arp = arp_inst[inst] || arp_emo[i];
      add_chord_notes(ev, ch, eff_len[i], offsets[i], densities[i], trans,
                      t, chord_dur, (double)velocities[i] * vel_factor[inst],
                      arp);
    }
  }

  std::vector<uint8_t> buf;
  buf.reserve(main_ev.size() * 5 + 64);
  write_smf(main_ev, buf);
  sizes[0] = (int64_t)buf.size();
  int64_t total = (int64_t)buf.size();
  if (total > cap) return -1;
  std::memcpy(out, buf.data(), buf.size());
  for (int32_t inst = 0; inst < n_inst; ++inst) {
    if (stems[inst].empty()) { sizes[1 + inst] = 0; continue; }
    std::vector<uint8_t> sb;
    sb.reserve(stems[inst].size() * 5 + 64);
    write_smf(stems[inst], sb);
    sizes[1 + inst] = (int64_t)sb.size();
    if (total + (int64_t)sb.size() > cap) return -1;
    std::memcpy(out + total, sb.data(), sb.size());
    total += (int64_t)sb.size();
  }
  return total;
}

}  // extern "C"
