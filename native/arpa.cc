// Fast ARPA n-gram parser -> packed binary arrays (.lmbin).
//
// Native counterpart of the framework's pure-python ARPA reader
// (rasr_tpu/models/lm/arpa.py), covering the role of the reference's
// C++ LM loading (ref: src/Lm/ArpaLm.* / BackingOff.* image caching):
// multi-gigabyte ARPA files parse at C++ speed into flat arrays the
// packed LM and the device-table compiler consume without building
// python dicts.
//
// .lmbin layout (little endian):
//   char[8]  magic "RLMB1\0\0\0"
//   u32      order
//   u32      vocab_size
//   per word: u32 len, bytes            (word id = position)
//   per n in 1..order:
//     u64    count
//     i32    ids[count*n]               (rows sorted lexicographically)
//     f32    cost[count]                (-log_e prob)
//     f32    backoff[count]             (-log_e backoff, 0 if absent)
//
// Built as librasr_native.so; entry points use C linkage for ctypes.

#include <zlib.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kLn10 = 2.302585092994046;

struct Gram {
  std::vector<int32_t> ids;
  std::vector<float> cost;
  std::vector<float> backoff;
  size_t n = 0;
  size_t count() const { return cost.size(); }
};

struct Parser {
  std::unordered_map<std::string, int32_t> vocab;
  std::vector<std::string> words;
  std::vector<Gram> grams;  // index 0 unused
  std::string error;

  int32_t wid(const char* tok, size_t len) {
    std::string key(tok, len);
    auto it = vocab.find(key);
    if (it != vocab.end()) return it->second;
    int32_t id = static_cast<int32_t>(words.size());
    vocab.emplace(std::move(key), id);
    words.emplace_back(tok, len);
    return id;
  }
};

// split on spaces/tabs in place; returns token count
int tokenize(char* line, char** toks, int max_toks) {
  int n = 0;
  char* p = line;
  while (*p && n < max_toks) {
    while (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n') ++p;
    if (!*p) break;
    toks[n++] = p;
    while (*p && *p != ' ' && *p != '\t' && *p != '\r' && *p != '\n') ++p;
    if (*p) *p++ = '\0';
  }
  return n;
}

bool parse_file(const char* path, Parser* P) {
  gzFile f = gzopen(path, "rb");
  if (!f) {
    P->error = std::string("cannot open ") + path;
    return false;
  }
  std::vector<char> buf(1 << 20);
  int section = 0;
  P->grams.resize(1);
  char* toks[64];
  while (gzgets(f, buf.data(), static_cast<int>(buf.size()))) {
    char* line = buf.data();
    // strip leading whitespace
    while (*line == ' ' || *line == '\t') ++line;
    if (line[0] == '\0' || line[0] == '\r' || line[0] == '\n') continue;
    if (line[0] == '\\') {
      if (!strncmp(line, "\\data\\", 6)) {
        section = 0;
      } else if (!strncmp(line, "\\end\\", 5)) {
        break;
      } else {
        int n = atoi(line + 1);
        if (n > 0) {
          section = n;
          if (static_cast<size_t>(n) >= P->grams.size()) P->grams.resize(n + 1);
          P->grams[n].n = n;
        }
      }
      continue;
    }
    if (section == 0) continue;  // "ngram N=count"
    int nt = tokenize(line, toks, 64);
    if (nt < section + 1) continue;
    double logp = strtod(toks[0], nullptr);
    Gram& g = P->grams[section];
    for (int i = 0; i < section; ++i) {
      g.ids.push_back(P->wid(toks[1 + i], strlen(toks[1 + i])));
    }
    g.cost.push_back(static_cast<float>(-logp * kLn10));
    double backoff = (nt > section + 1) ? strtod(toks[1 + section], nullptr) : 0.0;
    g.backoff.push_back(static_cast<float>(-backoff * kLn10));
  }
  gzclose(f);
  if (P->grams.size() <= 1) {
    P->error = "no n-gram sections found";
    return false;
  }
  return true;
}

void sort_gram(Gram* g) {
  const size_t n = g->n, count = g->count();
  if (count == 0) return;
  std::vector<uint32_t> idx(count);
  for (size_t i = 0; i < count; ++i) idx[i] = static_cast<uint32_t>(i);
  const int32_t* ids = g->ids.data();
  std::sort(idx.begin(), idx.end(), [&](uint32_t a, uint32_t b) {
    const int32_t* ra = ids + a * n;
    const int32_t* rb = ids + b * n;
    for (size_t k = 0; k < n; ++k) {
      if (ra[k] != rb[k]) return ra[k] < rb[k];
    }
    return false;
  });
  std::vector<int32_t> nids(count * n);
  std::vector<float> ncost(count), nbo(count);
  for (size_t i = 0; i < count; ++i) {
    memcpy(&nids[i * n], ids + idx[i] * n, n * sizeof(int32_t));
    ncost[i] = g->cost[idx[i]];
    nbo[i] = g->backoff[idx[i]];
  }
  g->ids.swap(nids);
  g->cost.swap(ncost);
  g->backoff.swap(nbo);
}

bool write_lmbin(const char* path, const Parser& P) {
  FILE* f = fopen(path, "wb");
  if (!f) return false;
  fwrite("RLMB1\0\0\0", 1, 8, f);
  uint32_t order = static_cast<uint32_t>(P.grams.size() - 1);
  uint32_t vs = static_cast<uint32_t>(P.words.size());
  fwrite(&order, 4, 1, f);
  fwrite(&vs, 4, 1, f);
  for (const auto& w : P.words) {
    uint32_t len = static_cast<uint32_t>(w.size());
    fwrite(&len, 4, 1, f);
    fwrite(w.data(), 1, len, f);
  }
  for (uint32_t n = 1; n <= order; ++n) {
    const Gram& g = P.grams[n];
    uint64_t count = g.count();
    fwrite(&count, 8, 1, f);
    fwrite(g.ids.data(), sizeof(int32_t), g.ids.size(), f);
    fwrite(g.cost.data(), sizeof(float), g.cost.size(), f);
    fwrite(g.backoff.data(), sizeof(float), g.backoff.size(), f);
  }
  fclose(f);
  return true;
}

std::string g_last_error;

}  // namespace

extern "C" {

// Parse ARPA (optionally .gz) into a .lmbin file. Returns 0 on success.
int rasr_arpa_to_lmbin(const char* arpa_path, const char* out_path) {
  Parser P;
  if (!parse_file(arpa_path, &P)) {
    g_last_error = P.error;
    return 1;
  }
  for (size_t n = 1; n < P.grams.size(); ++n) sort_gram(&P.grams[n]);
  if (!write_lmbin(out_path, P)) {
    g_last_error = std::string("cannot write ") + out_path;
    return 2;
  }
  return 0;
}

const char* rasr_last_error() { return g_last_error.c_str(); }

}  // extern "C"
