// Native CSV tokenizer + validator for spotify_recommender_tpu.
//
// Behavioral rebuild (not a copy) of the reference preprocessing front half
// (reference DataManager.cpp:72-253): quote-toggle field splitting with
// trim, BOM strip, strtod full-consumption numeric validation, symbolic
// key/mode coding, per-row skip-on-invalid, and genre -> dense id mapping.
//
// Differences by design:
//  - std::thread work-stealing over row ranges replaces OpenMP
//    `schedule(dynamic, 1000)` (reference DataManager.cpp:164-168); the
//    chunk size is the same 1000 rows.
//  - genre ids are assigned in a *serial* second pass over valid rows in
//    row order, making the mapping deterministic (the reference assigns
//    inside an `omp critical` during the parallel loop, so its ids depend
//    on thread interleaving — DataManager.cpp:244-251).
//
// C ABI for ctypes; see spotify_recommender_tpu/data/native_ingest.py.

#include <atomic>
#include <string_view>
#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kNumFeatures = 11;
constexpr size_t kChunk = 1000;  // reference OpenMP chunk (DataManager.cpp:168)

// Required columns (reference DataManager.cpp:121-125); feature order
// matches DataManager.cpp:156-159.
const char* kFeatureCols[kNumFeatures] = {
    "danceability", "energy",       "key",       "loudness",
    "mode",         "speechiness",  "acousticness",
    "instrumentalness", "liveness", "valence",   "tempo"};

struct Row {
  bool valid = false;
  std::string track_id, track_name, artists, genre;
  float features[kNumFeatures] = {0};
};

inline bool is_trim(char c) {
  return c == ' ' || c == '\t' || c == '\r' || c == '\n';
}

inline std::string_view trim_view(const char* b, const char* e) {
  while (b < e && is_trim(*b)) ++b;
  while (e > b && is_trim(e[-1])) --e;
  return std::string_view(b, static_cast<size_t>(e - b));
}

// Quote-toggle splitting; quotes dropped (reference DataManager.cpp:72-92).
// Zero-copy fast path when the line has no quotes; quoted lines rebuild
// fields into `scratch` (reserved to line length so views stay valid).
void parse_line(const char* p, size_t len,
                std::vector<std::string_view>* out, std::string* scratch) {
  out->clear();
  const char* end = p + len;
  if (memchr(p, '"', len) == nullptr) {
    const char* field = p;
    for (const char* c = p; c < end; ++c) {
      if (*c == ',') {
        out->push_back(trim_view(field, c));
        field = c + 1;
      }
    }
    out->push_back(trim_view(field, end));
    return;
  }
  scratch->clear();
  scratch->reserve(len);
  std::vector<size_t> bounds;  // field start offsets into scratch
  bounds.push_back(0);
  bool in_quotes = false;
  for (const char* c = p; c < end; ++c) {
    if (*c == '"') {
      in_quotes = !in_quotes;
    } else if (*c == ',' && !in_quotes) {
      bounds.push_back(scratch->size());
    } else {
      scratch->push_back(*c);
    }
  }
  bounds.push_back(scratch->size());
  const char* base = scratch->data();
  for (size_t i = 0; i + 1 < bounds.size(); ++i) {
    out->push_back(trim_view(base + bounds[i], base + bounds[i + 1]));
  }
}

// strtod full-consumption check (reference DataManager.cpp:64-69).
// string_view is not NUL-terminated; copy into a small stack buffer.
bool parse_number(std::string_view s, float* v) {
  if (s.empty() || s.size() >= 63) return false;
  char buf[64];
  memcpy(buf, s.data(), s.size());
  buf[s.size()] = '\0';
  char* end = nullptr;
  double d = strtod(buf, &end);
  if (end == buf || *end != '\0') return false;
  *v = static_cast<float>(d);
  return true;
}

// Musical key -> 0-11 (reference DataManager.cpp:25-43).
int key_to_number(std::string_view key) {
  std::string u;
  u.reserve(key.size());
  for (char c : key) u += static_cast<char>(std::toupper(static_cast<unsigned char>(c)));
  if (u == "C") return 0;
  if (u == "C#" || u == "DB") return 1;
  if (u == "D") return 2;
  if (u == "D#" || u == "EB") return 3;
  if (u == "E") return 4;
  if (u == "F") return 5;
  if (u == "F#" || u == "GB") return 6;
  if (u == "G") return 7;
  if (u == "G#" || u == "AB") return 8;
  if (u == "A") return 9;
  if (u == "A#" || u == "BB") return 10;
  if (u == "B") return 11;
  return -1;
}

// Mode -> Major=1/Minor=0 (reference DataManager.cpp:46-54).
int mode_to_number(std::string_view mode) {
  std::string l;
  l.reserve(mode.size());
  for (char c : mode) l += static_cast<char>(std::tolower(static_cast<unsigned char>(c)));
  if (l == "major" || l == "1") return 1;
  if (l == "minor" || l == "0") return 0;
  return -1;
}

struct ParseResult {
  // flattened valid rows
  std::vector<float> features;       // (n_valid * 11)
  std::vector<int32_t> genre_ids;    // (n_valid)
  std::string id_arena, name_arena, artist_arena, genre_arena;
  std::vector<int64_t> id_offs, name_offs, artist_offs, genre_offs;
  int64_t n_input = 0;
  int64_t n_valid = 0;
  int64_t n_genres = 0;
  std::string error;
};

}  // namespace

extern "C" {

// Parse a full CSV buffer (header + rows). Returns an opaque handle
// (nullptr never returned; check srt_error for failures).
void* srt_parse_csv(const char* data, int64_t len, int32_t num_threads) {
  auto* res = new ParseResult();

  // split into lines
  std::vector<std::pair<const char*, size_t>> lines;
  const char* p = data;
  const char* end = data + len;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    size_t l = nl ? static_cast<size_t>(nl - p) : static_cast<size_t>(end - p);
    lines.emplace_back(p, l);
    p = nl ? nl + 1 : end;
  }
  if (lines.empty()) {
    res->error = "Empty CSV file";
    return res;
  }

  // header: BOM strip (reference DataManager.cpp:14-22) + column map
  std::string header(lines[0].first, lines[0].second);
  if (header.size() >= 3 && static_cast<unsigned char>(header[0]) == 0xEF &&
      static_cast<unsigned char>(header[1]) == 0xBB &&
      static_cast<unsigned char>(header[2]) == 0xBF) {
    header = header.substr(3);
  }
  std::vector<std::string_view> header_views;
  std::string header_scratch;
  parse_line(header.data(), header.size(), &header_views, &header_scratch);
  std::map<std::string, int> col;
  for (size_t i = 0; i < header_views.size(); ++i)
    col[std::string(header_views[i])] = static_cast<int>(i);
  const size_t n_headers = header_views.size();

  const char* required[] = {"track_id", "track_name", "artists", "track_genre"};
  for (const char* r : required) {
    if (!col.count(r)) {
      res->error = std::string("Required column '") + r + "' not found in CSV";
      return res;
    }
  }
  int feat_idx[kNumFeatures];
  for (int j = 0; j < kNumFeatures; ++j) {
    auto it = col.find(kFeatureCols[j]);
    if (it == col.end()) {
      res->error = std::string("Required column '") + kFeatureCols[j] +
                   "' not found in CSV";
      return res;
    }
    feat_idx[j] = it->second;
  }
  const int id_i = col["track_id"], name_i = col["track_name"],
            art_i = col["artists"], genre_i = col["track_genre"];
  const size_t ncols = n_headers;

  // data rows (skip empties, reference DataManager.cpp:137-141)
  std::vector<std::pair<const char*, size_t>> rows;
  rows.reserve(lines.size() - 1);
  for (size_t i = 1; i < lines.size(); ++i) {
    // raw emptiness check only: a lone '\r' on CRLF files counts as a data
    // row for the reference too (getline keeps it, DataManager.cpp:137-141;
    // it is later skipped as a short row) — field-level trim handles '\r'
    if (lines[i].second) rows.push_back(lines[i]);
  }
  res->n_input = static_cast<int64_t>(rows.size());

  // phase 1: parallel tokenize + validate
  std::vector<Row> parsed(rows.size());
  std::atomic<size_t> next{0};
  int nthreads = num_threads > 0
                     ? num_threads
                     : static_cast<int>(std::thread::hardware_concurrency());
  if (nthreads < 1) nthreads = 1;
  auto worker = [&]() {
    std::vector<std::string_view> fields;
    std::string scratch;
    for (;;) {
      size_t start = next.fetch_add(kChunk);
      if (start >= rows.size()) break;
      size_t stop = std::min(start + kChunk, rows.size());
      for (size_t i = start; i < stop; ++i) {
        parse_line(rows[i].first, rows[i].second, &fields, &scratch);
        if (fields.size() < ncols) continue;  // short row (ref :172-174)
        Row& r = parsed[i];
        r.track_id = fields[id_i];
        r.track_name = fields[name_i];
        if (r.track_id.empty() || r.track_name.empty()) continue;  // ref :184-186
        r.artists = fields[art_i];
        bool ok = true;
        for (int j = 0; j < kNumFeatures && ok; ++j) {
          std::string_view v = fields[feat_idx[j]];
          if (j == 2) {  // key (ref :194-206)
            int k = key_to_number(v);
            if (k >= 0) r.features[j] = static_cast<float>(k);
            else ok = parse_number(v, &r.features[j]);
          } else if (j == 4) {  // mode (ref :207-219)
            int m = mode_to_number(v);
            if (m >= 0) r.features[j] = static_cast<float>(m);
            else ok = parse_number(v, &r.features[j]);
          } else {
            ok = parse_number(v, &r.features[j]);  // ref :222-227
          }
        }
        if (!ok) continue;
        r.genre = fields[genre_i];
        if (r.genre.empty()) continue;  // ref :232-234
        r.valid = true;
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();

  // phase 2: serial compaction + deterministic genre ids
  std::map<std::string, int32_t> genre_to_id;
  std::vector<const std::string*> genre_names;
  res->id_offs.push_back(0);
  res->name_offs.push_back(0);
  res->artist_offs.push_back(0);
  for (auto& r : parsed) {
    if (!r.valid) continue;
    auto it = genre_to_id.find(r.genre);
    int32_t gid;
    if (it == genre_to_id.end()) {
      gid = static_cast<int32_t>(genre_to_id.size());
      genre_to_id.emplace(r.genre, gid);
      genre_names.push_back(nullptr);  // filled after map settles
    } else {
      gid = it->second;
    }
    res->genre_ids.push_back(gid);
    res->features.insert(res->features.end(), r.features,
                         r.features + kNumFeatures);
    res->id_arena += r.track_id;
    res->name_arena += r.track_name;
    res->artist_arena += r.artists;
    res->id_offs.push_back(static_cast<int64_t>(res->id_arena.size()));
    res->name_offs.push_back(static_cast<int64_t>(res->name_arena.size()));
    res->artist_offs.push_back(static_cast<int64_t>(res->artist_arena.size()));
  }
  res->n_valid = static_cast<int64_t>(res->genre_ids.size());
  res->n_genres = static_cast<int64_t>(genre_to_id.size());
  // genre name arena in id order
  std::vector<const std::string*> by_id(genre_to_id.size());
  for (auto& kv : genre_to_id) by_id[kv.second] = &kv.first;
  res->genre_offs.push_back(0);
  for (auto* g : by_id) {
    res->genre_arena += *g;
    res->genre_offs.push_back(static_cast<int64_t>(res->genre_arena.size()));
  }
  return res;
}

void srt_free(void* h) { delete static_cast<ParseResult*>(h); }

const char* srt_error(void* h) {
  auto* r = static_cast<ParseResult*>(h);
  return r->error.empty() ? nullptr : r->error.c_str();
}

int64_t srt_num_input(void* h) { return static_cast<ParseResult*>(h)->n_input; }
int64_t srt_num_valid(void* h) { return static_cast<ParseResult*>(h)->n_valid; }
int64_t srt_num_genres(void* h) { return static_cast<ParseResult*>(h)->n_genres; }

const float* srt_features(void* h) {
  return static_cast<ParseResult*>(h)->features.data();
}
const int32_t* srt_genre_ids(void* h) {
  return static_cast<ParseResult*>(h)->genre_ids.data();
}

#define ARENA_GETTERS(field)                                        \
  const char* srt_##field##_arena(void* h) {                        \
    return static_cast<ParseResult*>(h)->field##_arena.data();      \
  }                                                                 \
  const int64_t* srt_##field##_offs(void* h) {                      \
    return static_cast<ParseResult*>(h)->field##_offs.data();       \
  }
ARENA_GETTERS(id)
ARENA_GETTERS(name)
ARENA_GETTERS(artist)
ARENA_GETTERS(genre)

}  // extern "C"
