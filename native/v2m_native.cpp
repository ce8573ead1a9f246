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
