// C ABI for the extraction layer (consumed from Python via ctypes —
// pybind11 is not available in this environment, see repo docs).
//
// Two-call protocol per window:
//   1) ix_extract(...) runs the projection and returns a result handle plus
//      the matrix dimensions;
//   2) ix_copy_geno / ix_name / ix_site_key read the data out;
//   3) ix_result_free releases it.
#include "extract.h"

#include <cstring>
#include <vector>
#include <string>

extern "C" {

struct IxHandle {
  impop::Extractor* extractor;
  std::string error;
};

struct IxResult {
  impop::WindowMatrix wm;
  std::string names_blob;      // lazily built '\n'-joined caches: one ctypes
  std::string site_keys_blob;  // call instead of n/s per-element round trips
};

void* ix_open(const char* paf_path, const char* fasta_path) {
  auto* h = new IxHandle{nullptr, ""};
  try {
    h->extractor = new impop::Extractor(paf_path, fasta_path);
  } catch (const std::exception& e) {
    h->error = e.what();
  }
  return h;
}

const char* ix_error(void* handle) {
  auto* h = static_cast<IxHandle*>(handle);
  return h->error.empty() ? nullptr : h->error.c_str();
}

void ix_close(void* handle) {
  auto* h = static_cast<IxHandle*>(handle);
  delete h->extractor;
  delete h;
}

void* ix_extract(void* handle, const char* target, long long start,
                 long long end, long long* n_out, long long* s_out) {
  auto* h = static_cast<IxHandle*>(handle);
  if (!h->extractor) return nullptr;
  try {
    auto* res = new IxResult{h->extractor->extract(target, start, end), {}, {}};
    *n_out = res->wm.n;
    *s_out = res->wm.s;
    h->error.clear();
    return res;
  } catch (const std::exception& e) {
    h->error = e.what();
    return nullptr;
  }
}

void ix_copy_geno(void* result, signed char* out) {
  auto* r = static_cast<IxResult*>(result);
  if (!r->wm.geno.empty()) {
    std::memcpy(out, r->wm.geno.data(), r->wm.geno.size());
  }
}

const char* ix_name(void* result, long long row) {
  auto* r = static_cast<IxResult*>(result);
  if (row < 0 || row >= r->wm.n) return nullptr;
  return r->wm.names[static_cast<size_t>(row)].c_str();
}

const char* ix_site_key(void* result, long long col) {
  auto* r = static_cast<IxResult*>(result);
  if (col < 0 || col >= r->wm.s) return nullptr;
  return r->wm.site_keys[static_cast<size_t>(col)].c_str();
}

long long ix_site_pos(void* result, long long col) {
  auto* r = static_cast<IxResult*>(result);
  if (col < 0 || col >= r->wm.s) return -1;
  return r->wm.site_pos[static_cast<size_t>(col)];
}

void ix_copy_site_pos(void* result, long long* out) {
  auto* r = static_cast<IxResult*>(result);
  for (size_t c = 0; c < r->wm.site_pos.size(); ++c) {
    out[c] = r->wm.site_pos[c];
  }
}

static const char* join_blob(std::string* blob,
                             const std::vector<std::string>& items) {
  if (blob->empty() && !items.empty()) {
    size_t total = 0;
    for (const auto& s : items) total += s.size() + 1;
    blob->reserve(total);
    for (const auto& s : items) {
      blob->append(s);
      blob->push_back('\n');
    }
  }
  return blob->c_str();
}

const char* ix_names_blob(void* result) {
  auto* r = static_cast<IxResult*>(result);
  return join_blob(&r->names_blob, r->wm.names);
}

const char* ix_site_keys_blob(void* result) {
  auto* r = static_cast<IxResult*>(result);
  return join_blob(&r->site_keys_blob, r->wm.site_keys);
}

void ix_result_free(void* result) {
  delete static_cast<IxResult*>(result);
}

}  // extern "C"
