// Window projection: CIGAR walk -> variant calls -> allele matrix.
//
// The capability equivalent of the reference's per-window native pipeline
// (impg query -> odgi build/sort/view -> povu gfa2vcf, run_tajd.sh:126-148,
// and impg similarity, run_pica2_impg.sh:162-168): a window's variation is
// derived once, directly from the PAF alignments, as per-haplotype variant
// calls against the reference; the haplotype-by-site matrix then feeds every
// TPU statistic (identity, pi, S, AFS) without further native calls.
#include "extract.h"

#include <algorithm>
#include <cstring>
#include <map>
#include <cstdlib>
#include <stdexcept>
#include <thread>

namespace impop {

namespace {

char comp(char c) {
  switch (c) {
    case 'A': return 'T';
    case 'C': return 'G';
    case 'G': return 'C';
    case 'T': return 'A';
    case 'a': return 't';
    case 'c': return 'g';
    case 'g': return 'c';
    case 't': return 'a';
    default: return 'N';
  }
}

std::string revcomp(const std::string& s) {
  std::string out(s.rbegin(), s.rend());
  for (char& c : out) c = comp(c);
  return out;
}

struct Variant {
  int64_t pos;       // target position (0-based)
  std::string ref;   // reference allele ("" for pure insertion)
  std::string alt;   // alternate allele ("" for pure deletion)
  bool operator<(const Variant& o) const {
    if (pos != o.pos) return pos < o.pos;
    if (ref != o.ref) return ref < o.ref;
    return alt < o.alt;
  }
  bool operator==(const Variant& o) const {
    return pos == o.pos && ref == o.ref && alt == o.alt;
  }
};

// The walk emits variants in non-decreasing target order, so a vector +
// one sort/unique pass (needed only when a row has several PAF records)
// replaces the former std::set — red-black node churn dominated extraction
// profiles at genome scale.
struct HapState {
  int64_t cover_start = INT64_MAX;
  int64_t cover_end = INT64_MIN;
  std::vector<Variant> variants;
};

}  // namespace

Extractor::Extractor(const std::string& paf_path, const std::string& fasta_path)
    : paf_(paf_path), fasta_(fasta_path) {}

WindowMatrix Extractor::extract(const std::string& target, int64_t start,
                                int64_t end) const {
  if (end <= start) {
    throw std::runtime_error("empty window");
  }
  const std::string tseq =
      fasta_.has(target) ? fasta_.fetch(target, start, end) : std::string();
  auto target_base = [&](int64_t pos) -> char {
    int64_t off = pos - start;
    if (off < 0 || off >= static_cast<int64_t>(tseq.size())) return 'N';
    return static_cast<char>(std::toupper(tseq[static_cast<size_t>(off)]));
  };

  std::map<std::string, HapState> haps;

  const std::vector<const PafRecord*> recs =
      paf_.overlapping(target, start, end);

  // Per-record walks are independent until the site-union merge, so they
  // fan out over a thread shard each (FASTA access is pread-based and
  // thread-safe); shards merge by row name afterwards, making the result
  // independent of the thread count.
  auto walk_record = [&](const PafRecord* rec,
                         std::map<std::string, HapState>& shard) {
    if (rec->cigar.empty()) return;  // need cg:Z for projection

    // Row identity mirrors impg's "contig:qstart-qend" naming
    // (h-fst.py:24-26 shows the consumed form).
    std::string row_name = rec->query_name + ":" +
                           std::to_string(rec->query_start) + "-" +
                           std::to_string(rec->query_end);
    HapState& hap = shard[row_name];

    int64_t tpos = rec->target_start;
    int64_t qi = 0;
    hap.cover_start =
        std::min(hap.cover_start, std::max(start, rec->target_start));

    size_t first_op = rec->seek(start, &tpos, &qi);

    // Pass 1 (no sequence): find the query extent [q_lo, q_hi) this
    // window's walk touches, so only that slice is fetched — fetching the
    // whole contig per window is O(contig) per record per window.
    int64_t q_lo = qi;
    int64_t q_hi = qi;
    {
      int64_t t2 = tpos, q2 = qi;
      for (size_t oi = first_op; oi < rec->cigar.size(); ++oi) {
        const CigarOp& op = rec->cigar[oi];
        if (t2 >= end && op.op != 'I') break;
        switch (op.op) {
          case '=': case 'M': case 'X': t2 += op.len; q2 += op.len; break;
          case 'I': case 'S': q2 += op.len; break;
          case 'D': case 'N': t2 += op.len; break;
          case 'H': break;
          default: t2 += op.len; q2 += op.len; break;
        }
      }
      q_hi = q2;
    }

    // Query slice in alignment orientation (walked forward alongside the
    // target). Missing query sequences degrade M ops to "no variant" and
    // X alts to 'N'.
    std::string qslice;
    bool have_q = fasta_.has(rec->query_name);
    if (have_q && q_hi > q_lo) {
      if (!rec->reverse) {
        qslice = fasta_.fetch(rec->query_name, rec->query_start + q_lo,
                              rec->query_start + q_hi);
      } else {
        // qi indexes the reverse complement of [query_start, query_end);
        // RC index qi maps to original position query_end - 1 - qi
        qslice = revcomp(fasta_.fetch(rec->query_name,
                                      rec->query_end - q_hi,
                                      rec->query_end - q_lo));
      }
    }
    auto query_base = [&](int64_t q) -> char {
      int64_t off = q - q_lo;
      if (!have_q || off < 0 || off >= static_cast<int64_t>(qslice.size()))
        return 'N';
      return static_cast<char>(
          std::toupper(qslice[static_cast<size_t>(off)]));
    };
    for (size_t oi = first_op; oi < rec->cigar.size(); ++oi) {
      const CigarOp& op = rec->cigar[oi];
      if (tpos >= end && op.op != 'I') break;
      switch (op.op) {
        case '=':
          tpos += op.len;
          qi += op.len;
          break;
        case 'M': {
          // resolve match-or-mismatch against the sequences
          for (int64_t k = 0; k < op.len; ++k) {
            int64_t p = tpos + k;
            if (p >= start && p < end && have_q) {
              char tb = target_base(p);
              char qb = query_base(qi + k);
              if (tb != qb && tb != 'N' && qb != 'N') {
                hap.variants.push_back({p, std::string(1, tb),
                                        std::string(1, qb)});
              }
            }
          }
          tpos += op.len;
          qi += op.len;
          break;
        }
        case 'X': {
          for (int64_t k = 0; k < op.len; ++k) {
            int64_t p = tpos + k;
            if (p >= start && p < end) {
              char tb = target_base(p);
              char qb = query_base(qi + k);
              hap.variants.push_back({p, std::string(1, tb),
                                      std::string(1, qb)});
            }
          }
          tpos += op.len;
          qi += op.len;
          break;
        }
        case 'I': {
          if (tpos > start && tpos <= end) {
            std::string alt;
            int64_t off = qi - q_lo;
            if (have_q && off >= 0 &&
                off + op.len <= static_cast<int64_t>(qslice.size())) {
              alt = qslice.substr(static_cast<size_t>(off),
                                  static_cast<size_t>(op.len));
              for (char& c : alt) c = std::toupper(c);
            } else {
              alt = "<INS" + std::to_string(op.len) + ">";
            }
            hap.variants.push_back({tpos, "", alt});
          }
          qi += op.len;
          break;
        }
        case 'D':
        case 'N': {
          int64_t del_start = std::max(tpos, start);
          int64_t del_end = std::min(tpos + op.len, end);
          if (op.op == 'D' && del_start < del_end) {
            std::string ref;
            for (int64_t p = del_start; p < del_end; ++p)
              ref += target_base(p);
            hap.variants.push_back({del_start, ref, ""});
          }
          tpos += op.len;
          break;
        }
        case 'S':
          qi += op.len;
          break;
        case 'H':
          break;
        default:
          // unknown op: assume it consumes both (safest for M-like ops)
          tpos += op.len;
          qi += op.len;
          break;
      }
    }
    hap.cover_end = std::max(hap.cover_end, std::min(end, tpos));
  };

  int n_threads = 1;
  if (const char* env = std::getenv("IMPOP_EXTRACT_THREADS")) {
    n_threads = std::max(1, std::atoi(env));
  } else {
    n_threads = std::max(1u, std::thread::hardware_concurrency());
  }
  n_threads = static_cast<int>(
      std::min<size_t>(static_cast<size_t>(n_threads),
                       std::max<size_t>(recs.size() / 4, 1)));
  if (n_threads <= 1) {
    for (const PafRecord* rec : recs) walk_record(rec, haps);
  } else {
    std::vector<std::map<std::string, HapState>> shards(
        static_cast<size_t>(n_threads));
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) {
      pool.emplace_back([&, t]() {
        for (size_t i = static_cast<size_t>(t); i < recs.size();
             i += static_cast<size_t>(n_threads)) {
          walk_record(recs[i], shards[static_cast<size_t>(t)]);
        }
      });
    }
    for (auto& th : pool) th.join();
    for (auto& shard : shards) {
      for (auto& [name, hs] : shard) {
        auto [it, fresh] = haps.try_emplace(name, std::move(hs));
        if (!fresh) {
          HapState& dst = it->second;
          dst.cover_start = std::min(dst.cover_start, hs.cover_start);
          dst.cover_end = std::max(dst.cover_end, hs.cover_end);
          dst.variants.insert(dst.variants.end(), hs.variants.begin(),
                              hs.variants.end());
        }
      }
    }
  }

  // Reference row: covers the whole window, no variants (impg similarity
  // includes the reference sequence among the groups).
  {
    HapState& ref_row = haps[target + ":" + std::to_string(start) + "-" +
                             std::to_string(end)];
    ref_row.cover_start = start;
    ref_row.cover_end = end;
  }

  // Per-hap variants arrive in walk order; sort+unique covers rows built
  // from several PAF records.
  for (auto& [_, hap] : haps) {
    if (!std::is_sorted(hap.variants.begin(), hap.variants.end()))
      std::sort(hap.variants.begin(), hap.variants.end());
    hap.variants.erase(
        std::unique(hap.variants.begin(), hap.variants.end()),
        hap.variants.end());
  }

  // Union of variant keys -> site axis: one flat sort/unique instead of the
  // former std::set merge + std::map column lookup (string-keyed tree nodes
  // dominated at ~1e6 sites).
  std::vector<Variant> all_variants;
  {
    size_t total = 0;
    for (const auto& [_, hap] : haps) total += hap.variants.size();
    all_variants.reserve(total);
    for (const auto& [_, hap] : haps) {
      all_variants.insert(all_variants.end(), hap.variants.begin(),
                          hap.variants.end());
    }
    std::sort(all_variants.begin(), all_variants.end());
    all_variants.erase(
        std::unique(all_variants.begin(), all_variants.end()),
        all_variants.end());
  }

  WindowMatrix wm;
  wm.site_keys.reserve(all_variants.size());
  wm.site_pos.reserve(all_variants.size());
  for (const Variant& v : all_variants) {
    wm.site_keys.push_back(std::to_string(v.pos) + ":" + v.ref + ">" + v.alt);
    wm.site_pos.push_back(v.pos);
  }
  wm.s = static_cast<int64_t>(wm.site_keys.size());
  wm.n = static_cast<int64_t>(haps.size());
  wm.geno.assign(static_cast<size_t>(wm.n * std::max<int64_t>(wm.s, 1)), -1);

  // Column coverage: insertion columns (empty ref) sit *between* bases, so
  // a haplotype covers them iff cover_start < pos <= cover_end; base-anchored
  // variants use cover_start <= pos < cover_end.  Both rules agree on the
  // open interval (cover_start, cover_end), so coverage is one contiguous
  // fill plus the two boundary positions — the former per-cell loop was
  // O(n*s) (~5e8 cells at genome scale).
  const int64_t s_count = wm.s;
  auto pos_lower = [&](int64_t pos) {
    return std::lower_bound(wm.site_pos.begin(), wm.site_pos.end(), pos) -
           wm.site_pos.begin();
  };
  auto pos_upper = [&](int64_t pos) {
    return std::upper_bound(wm.site_pos.begin(), wm.site_pos.end(), pos) -
           wm.site_pos.begin();
  };

  int64_t row = 0;
  for (const auto& [name, hap] : haps) {  // std::map: sorted row names
    wm.names.push_back(name);
    int8_t* g = wm.geno.data() + static_cast<size_t>(row) *
                                     static_cast<size_t>(std::max<int64_t>(s_count, 1));
    if (hap.cover_start <= hap.cover_end && s_count > 0) {
      // interior: cover_start < pos < cover_end — covered under both rules
      int64_t lo = pos_upper(hap.cover_start);
      int64_t hi = pos_lower(hap.cover_end);
      if (hi > lo) std::memset(g + lo, 0, static_cast<size_t>(hi - lo));
      // boundary pos == cover_start: base-anchored columns only
      for (int64_t c = pos_lower(hap.cover_start);
           c < s_count && wm.site_pos[static_cast<size_t>(c)] == hap.cover_start;
           ++c) {
        if (!all_variants[static_cast<size_t>(c)].ref.empty()) g[c] = 0;
      }
      // boundary pos == cover_end: insertion columns only
      for (int64_t c = pos_lower(hap.cover_end);
           c < s_count && wm.site_pos[static_cast<size_t>(c)] == hap.cover_end;
           ++c) {
        if (all_variants[static_cast<size_t>(c)].ref.empty()) g[c] = 0;
      }
    }
    // variant cells: binary search into the sorted union
    for (const Variant& v : hap.variants) {
      auto it = std::lower_bound(all_variants.begin(), all_variants.end(), v);
      g[it - all_variants.begin()] = 1;
    }
    ++row;
  }
  return wm;
}

}  // namespace impop
