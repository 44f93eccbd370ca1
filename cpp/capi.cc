// C ABI for the extraction layer (consumed from Python via ctypes —
// pybind11 is not available in this environment, see repo docs).
//
// Two-call protocol per window:
//   1) ix_extract(...) runs the projection and returns a result handle plus
//      the matrix dimensions;
//   2) ix_copy_geno / ix_name / ix_site_key read the data out;
//   3) ix_result_free releases it.
#include "extract.h"

#include <atomic>
#include <algorithm>
#include <cstring>
#include <thread>
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

// ---------------------------------------------------------------- batch API
//
// One call extracts a whole window batch, parallelised over WINDOWS (each
// window's per-record walk runs serially): at scan batch sizes the window
// axis has far more parallelism than the per-window record axis, and one
// ctypes round trip replaces W of them.  The batch owns its results;
// ix_batch_free releases everything.

struct IxBatch {
  std::vector<IxResult*> results;  // null where extraction failed
  std::vector<std::string> errors;  // per-window message ("" on success)
};

void* ix_extract_batch(void* handle, const char* target,
                       const long long* starts, const long long* ends,
                       long long count, int threads) {
  auto* h = static_cast<IxHandle*>(handle);
  if (!h->extractor || count <= 0) return nullptr;
  auto* batch = new IxBatch;
  batch->results.assign(static_cast<size_t>(count), nullptr);
  batch->errors.assign(static_cast<size_t>(count), "");

  // Fast path: a sorted, non-overlapping batch goes through the range
  // walker (one CIGAR walk per record for the WHOLE batch).
  bool range_ok = true;
  for (long long i = 0; i < count && range_ok; ++i) {
    if (ends[i] <= starts[i]) range_ok = false;
    if (i > 0 && starts[i] < ends[i - 1]) range_ok = false;
  }
  if (range_ok) {
    try {
      std::vector<std::pair<int64_t, int64_t>> wins;
      wins.reserve(static_cast<size_t>(count));
      for (long long i = 0; i < count; ++i) wins.emplace_back(starts[i], ends[i]);
      auto mats = h->extractor->extract_windows(target, wins, threads);
      for (long long i = 0; i < count; ++i) {
        batch->results[static_cast<size_t>(i)] =
            new IxResult{std::move(mats[static_cast<size_t>(i)]), {}, {}};
      }
      return batch;
    } catch (const std::exception& e) {
      // fall through to per-window extraction so one bad window fails alone
      for (IxResult*& r : batch->results) { delete r; r = nullptr; }
    }
  }

  // General path: per-window extraction, parallel over windows.
  threads = impop::resolve_threads(threads);
  threads = static_cast<int>(std::min<long long>(threads, count));
  std::atomic<long long> next{0};
  auto worker = [&]() {
    for (;;) {
      const long long i = next.fetch_add(1);
      if (i >= count) break;
      try {
        auto wm = h->extractor->extract(target, starts[i], ends[i],
                                        /*inner_threads=*/1);
        batch->results[static_cast<size_t>(i)] =
            new IxResult{std::move(wm), {}, {}};
      } catch (const std::exception& e) {
        batch->errors[static_cast<size_t>(i)] = e.what();
      }
    }
  };
  if (threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(static_cast<size_t>(threads));
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return batch;
}

// Dims for window i; returns 0 on success, -1 if that window failed.
int ix_batch_dims(void* batch, long long i, long long* n_out,
                  long long* s_out) {
  auto* b = static_cast<IxBatch*>(batch);
  IxResult* r = b->results[static_cast<size_t>(i)];
  if (!r) return -1;
  *n_out = r->wm.n;
  *s_out = r->wm.s;
  return 0;
}

const char* ix_batch_error(void* batch, long long i) {
  auto* b = static_cast<IxBatch*>(batch);
  return b->errors[static_cast<size_t>(i)].c_str();
}

// Result handle for the existing per-result accessors (ix_copy_geno,
// ix_names_blob, ...).  Owned by the batch — do NOT ix_result_free it.
void* ix_batch_result(void* batch, long long i) {
  auto* b = static_cast<IxBatch*>(batch);
  return b->results[static_cast<size_t>(i)];
}

// Column-mode identity weight from a variant key ("pos:ref>alt"): a SNP
// weighs 1 alignment column, an indel of k bases weighs k — the C++ side
// of impop_tpu.extract.site_weights_from_keys, kept bit-identical.
static float key_weight(const std::string& key) {
  const size_t colon = key.find(':');
  const size_t gt = key.find('>', colon + 1);
  long long ref_len = static_cast<long long>(gt - colon - 1);
  long long alt_len = static_cast<long long>(key.size() - gt - 1);
  // "<INSk>" placeholder (window without query sequence): weight = k
  if (alt_len > 5 && key.compare(gt + 1, 4, "<INS") == 0 &&
      key.back() == '>') {
    alt_len = std::atoll(key.c_str() + gt + 5);
  }
  return static_cast<float>(std::max({ref_len, alt_len, 1LL}));
}

// Copy window i's matrix into a padded [cap_n, cap_s] int8 tile pre-filled
// by the caller (uncovered cells are -1); also sets member/site masks and,
// when `wts` is non-null, the per-column identity weights.  Keeps the
// padding + key-parsing loops out of Python.
void ix_batch_fill(void* batch, long long i, signed char* geno,
                   unsigned char* member, unsigned char* smask, float* wts,
                   long long cap_n, long long cap_s) {
  auto* b = static_cast<IxBatch*>(batch);
  IxResult* r = b->results[static_cast<size_t>(i)];
  if (!r) return;
  const auto& wm = r->wm;
  (void)cap_n;
  for (long long row = 0; row < wm.n; ++row) {
    std::memcpy(geno + row * cap_s,
                wm.geno.data() + row * std::max<int64_t>(wm.s, 1),
                static_cast<size_t>(wm.s));
    member[row] = 1;
  }
  std::memset(smask, 1, static_cast<size_t>(wm.s));
  if (wts) {
    for (long long c = 0; c < wm.s; ++c) {
      wts[c] = key_weight(wm.site_keys[static_cast<size_t>(c)]);
    }
  }
}

// Fill EVERY window of the batch into caller-allocated padded tiles
// ([count, cap_n, cap_s] geno pre-filled -1, [count, cap_n] member and
// [count, cap_s] smask pre-zeroed, optional [count, cap_s] wts pre-one) —
// one call + a parallel loop instead of `count` ctypes round trips.
void ix_batch_fill_all(void* batch, signed char* geno, unsigned char* member,
                       unsigned char* smask, float* wts, long long cap_n,
                       long long cap_s, int threads) {
  auto* b = static_cast<IxBatch*>(batch);
  const long long count = static_cast<long long>(b->results.size());
  threads = impop::resolve_threads(threads);
  threads = static_cast<int>(std::min<long long>(threads, count));
  std::atomic<long long> next{0};
  auto worker = [&]() {
    for (;;) {
      const long long i = next.fetch_add(1);
      if (i >= count) break;
      ix_batch_fill(batch, i, geno + i * cap_n * cap_s,
                    member + i * cap_n, smask + i * cap_s,
                    wts ? wts + i * cap_s : nullptr, cap_n, cap_s);
    }
  };
  if (threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(static_cast<size_t>(threads));
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
}

// Pack windows of the batch DIRECTLY into the scan's fused uint8 wire
// buffer (layout: impop_tpu.cli._scan_buf_layout) — 2-bit allele codes at
// row offset 0, member bitmask at o_m, site bitmask at o_sm and, when
// o_w >= 0, f32 column-mode identity weights at o_w.  The caller
// pre-zeroes the buffer (code 0 decodes to allele -1, so padding is free),
// fills the panel-bitmask and length segments itself (panel membership is
// host metadata the library does not know), and maps batch window i to
// buffer row out_rows[i] (< 0 = skip, e.g. failed windows).  One parallel
// C call replaces the ~6 numpy passes of the Python pack_scan_batch on the
// scan's hot path (which ran on the CPU-starved build worker).
void ix_batch_pack_all(void* batch, unsigned char* out, long long stride,
                       const long long* out_rows, long long cap_n,
                       long long cap_s, long long o_m, long long o_sm,
                       long long o_w, int threads) {
  auto* b = static_cast<IxBatch*>(batch);
  const long long count = static_cast<long long>(b->results.size());
  (void)cap_n;
  threads = impop::resolve_threads(threads);
  threads = static_cast<int>(std::min<long long>(threads, count));
  std::atomic<long long> next{0};
  auto worker = [&]() {
    for (;;) {
      const long long i = next.fetch_add(1);
      if (i >= count) break;
      if (out_rows[i] < 0) continue;
      IxResult* r = b->results[static_cast<size_t>(i)];
      if (!r) continue;
      const auto& wm = r->wm;
      unsigned char* p = out + out_rows[i] * stride;
      const long long gb = cap_s / 4;  // bytes per geno row (4 codes/byte)
      for (long long row = 0; row < wm.n; ++row) {
        const signed char* src =
            wm.geno.data() + row * std::max<int64_t>(wm.s, 1);
        unsigned char* dst = p + row * gb;
        const long long s4 = wm.s & ~3LL;
        // codes: -1 -> 0, 0 -> 1, 1 -> 2 (2 bits each, LSB-first).
        // PRECONDITION: wm.geno is biallelic (codes in [-1, 1]) — the
        // native extractor emits one column per (pos, ref, alt) so this
        // always holds; the `& 3u` field mask makes a contract-violating
        // code corrupt at most ITS OWN site instead of ORing a stray bit
        // into the neighbouring field (the Python pack path rejects such
        // input loudly — cli.pack_scan_batch).
        for (long long sq = 0; sq < s4; sq += 4) {
          dst[sq >> 2] = static_cast<unsigned char>(
              (static_cast<unsigned char>(src[sq] + 1) & 3u) |
              ((static_cast<unsigned char>(src[sq + 1] + 1) & 3u) << 2) |
              ((static_cast<unsigned char>(src[sq + 2] + 1) & 3u) << 4) |
              ((static_cast<unsigned char>(src[sq + 3] + 1) & 3u) << 6));
        }
        for (long long sq = s4; sq < wm.s; ++sq) {
          dst[sq >> 2] = static_cast<unsigned char>(
              dst[sq >> 2] | ((static_cast<unsigned char>(src[sq] + 1) & 3u)
                              << ((sq & 3) * 2)));
        }
        p[o_m + (row >> 3)] = static_cast<unsigned char>(
            p[o_m + (row >> 3)] | (1u << (row & 7)));
      }
      std::memset(p + o_sm, 0xFF, static_cast<size_t>(wm.s >> 3));
      for (long long sq = wm.s & ~7LL; sq < wm.s; ++sq) {
        p[o_sm + (sq >> 3)] = static_cast<unsigned char>(
            p[o_sm + (sq >> 3)] | (1u << (sq & 7)));
      }
      if (o_w >= 0) {
        float* w = reinterpret_cast<float*>(p + o_w);
        for (long long c = 0; c < wm.s; ++c) {
          w[c] = key_weight(wm.site_keys[static_cast<size_t>(c)]);
        }
        for (long long c = wm.s; c < cap_s; ++c) w[c] = 1.0f;
      }
    }
  };
  if (threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(static_cast<size_t>(threads));
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
}

void ix_batch_free(void* batch) {
  auto* b = static_cast<IxBatch*>(batch);
  for (IxResult* r : b->results) delete r;
  delete b;
}

}  // extern "C"
