// RTAR1 cache-archive native fast path: index scan + entry decompress.
//
// Same on-disk format as rasr_tpu/utils/archive.py (the format's source
// of truth). Covers the role of the reference's C++ archive layer
// (ref: src/Core/Archive.*, FileArchive.*): scanning multi-gigabyte
// feature/alignment caches and inflating entries at native speed; the
// python layer falls back to its own implementation when this library
// is absent.

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Entry {
  std::string name;
  uint64_t offset;   // position of payload in file
  uint8_t flags;
  uint64_t raw_len;
  uint64_t comp_len;
};

struct Index {
  std::vector<Entry> entries;
  std::string error;
};

constexpr uint8_t kCompressed = 1;
constexpr uint8_t kTombstone = 2;

bool scan(const char* path, Index* out) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    out->error = std::string("cannot open ") + path;
    return false;
  }
  char magic[6];
  if (fread(magic, 1, 6, f) != 6 || memcmp(magic, "RTAR1\n", 6) != 0) {
    fclose(f);
    out->error = "not a RTAR1 archive";
    return false;
  }
  std::vector<char> name_buf;
  for (;;) {
    uint32_t name_len;
    if (fread(&name_len, 4, 1, f) != 1) break;  // EOF
    name_buf.resize(name_len);
    if (fread(name_buf.data(), 1, name_len, f) != name_len) break;
    uint8_t flags;
    uint64_t raw_len, comp_len;
    if (fread(&flags, 1, 1, f) != 1) break;
    if (fread(&raw_len, 8, 1, f) != 1) break;
    if (fread(&comp_len, 8, 1, f) != 1) break;
    std::string name(name_buf.data(), name_len);
    if (flags & kTombstone) {
      for (auto it = out->entries.begin(); it != out->entries.end(); ++it) {
        if (it->name == name) {
          out->entries.erase(it);
          break;
        }
      }
    } else {
      // later entries with the same name shadow earlier ones
      bool replaced = false;
      for (auto& e : out->entries) {
        if (e.name == name) {
          e = Entry{name, static_cast<uint64_t>(ftell(f)), flags, raw_len, comp_len};
          replaced = true;
          break;
        }
      }
      if (!replaced) {
        out->entries.push_back(
            Entry{name, static_cast<uint64_t>(ftell(f)), flags, raw_len, comp_len});
      }
    }
    fseek(f, static_cast<long>(comp_len), SEEK_CUR);
  }
  fclose(f);
  return true;
}

std::string g_error;

}  // namespace

extern "C" {

// Scan: writes a text index "name\toffset\tflags\traw\tcomp\n" per entry
// into out_buf (caller-allocated). Returns needed size, or -1 on error.
long rasr_rtar_scan(const char* path, char* out_buf, long out_cap) {
  Index idx;
  if (!scan(path, &idx)) {
    g_error = idx.error;
    return -1;
  }
  std::string text;
  char line[512];
  for (const auto& e : idx.entries) {
    snprintf(line, sizeof(line), "%llu\t%u\t%llu\t%llu\n",
             (unsigned long long)e.offset, (unsigned)e.flags,
             (unsigned long long)e.raw_len, (unsigned long long)e.comp_len);
    text += e.name;
    text += '\t';
    text += line;
  }
  long need = static_cast<long>(text.size());
  if (out_buf && out_cap >= need) memcpy(out_buf, text.data(), need);
  return need;
}

// Read one entry's payload (decompressed) into out (raw_len bytes).
int rasr_rtar_read(const char* path, uint64_t offset, int flags,
                   uint64_t raw_len, uint64_t comp_len, char* out) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    g_error = std::string("cannot open ") + path;
    return 1;
  }
  if (fseek(f, static_cast<long>(offset), SEEK_SET) != 0) {
    fclose(f);
    g_error = "seek failed";
    return 2;
  }
  if (flags & kCompressed) {
    std::vector<char> comp(comp_len);
    if (fread(comp.data(), 1, comp_len, f) != comp_len) {
      fclose(f);
      g_error = "short read";
      return 3;
    }
    uLongf dest_len = static_cast<uLongf>(raw_len);
    if (uncompress(reinterpret_cast<Bytef*>(out), &dest_len,
                   reinterpret_cast<const Bytef*>(comp.data()),
                   static_cast<uLong>(comp_len)) != Z_OK ||
        dest_len != raw_len) {
      fclose(f);
      g_error = "inflate failed";
      return 4;
    }
  } else {
    if (fread(out, 1, raw_len, f) != raw_len) {
      fclose(f);
      g_error = "short read";
      return 3;
    }
  }
  fclose(f);
  return 0;
}

const char* rasr_rtar_last_error() { return g_error.c_str(); }

}  // extern "C"
