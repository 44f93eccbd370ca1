// PAF parsing (plain or gzip) with cg:Z CIGAR, indexed by target interval.
#include "extract.h"

#include <algorithm>
#include <cstring>
#include <stdexcept>
#include <zlib.h>
#include <atomic>
#include <thread>

namespace impop {

static std::vector<CigarOp> parse_cigar(const char* s) {
  std::vector<CigarOp> ops;
  int64_t len = 0;
  for (; *s; ++s) {
    char c = *s;
    if (c >= '0' && c <= '9') {
      len = len * 10 + (c - '0');
    } else {
      ops.push_back({c, len});
      len = 0;
    }
  }
  return ops;
}

static bool parse_line(const std::string& line, PafRecord* rec) {
  // 12 mandatory columns, then tags.
  std::vector<std::string> cols;
  size_t start = 0;
  while (start <= line.size()) {
    size_t tab = line.find('\t', start);
    if (tab == std::string::npos) {
      cols.push_back(line.substr(start));
      break;
    }
    cols.push_back(line.substr(start, tab - start));
    start = tab + 1;
  }
  if (cols.size() < 12) return false;
  try {
    rec->query_name = cols[0];
    rec->query_len = std::stoll(cols[1]);
    rec->query_start = std::stoll(cols[2]);
    rec->query_end = std::stoll(cols[3]);
    rec->reverse = (cols[4] == "-");
    rec->target_name = cols[5];
    rec->target_len = std::stoll(cols[6]);
    rec->target_start = std::stoll(cols[7]);
    rec->target_end = std::stoll(cols[8]);
  } catch (const std::exception&) {
    return false;
  }
  for (size_t i = 12; i < cols.size(); ++i) {
    if (cols[i].rfind("cg:Z:", 0) == 0) {
      rec->cigar = parse_cigar(cols[i].c_str() + 5);
    }
  }
  return true;
}

void PafRecord::build_checkpoints() {
  ckpt_tpos.clear();
  ckpt_qpos.clear();
  int64_t tpos = target_start, qpos = 0;
  for (size_t i = 0; i < cigar.size(); ++i) {
    if (i % static_cast<size_t>(kCkptStride) == 0) {
      ckpt_tpos.push_back(tpos);
      ckpt_qpos.push_back(qpos);
    }
    const CigarOp& op = cigar[i];
    switch (op.op) {
      case '=': case 'M': case 'X': tpos += op.len; qpos += op.len; break;
      case 'I': case 'S': qpos += op.len; break;
      case 'D': case 'N': tpos += op.len; break;
      case 'H': break;
      default: tpos += op.len; qpos += op.len; break;
    }
  }
}

size_t PafRecord::seek(int64_t start, int64_t* tpos, int64_t* qpos) const {
  *tpos = target_start;
  *qpos = 0;
  if (ckpt_tpos.empty()) return 0;
  // binary search: last checkpoint with tpos <= start
  size_t lo = 0, hi = ckpt_tpos.size();
  while (lo + 1 < hi) {
    size_t mid = (lo + hi) / 2;
    if (ckpt_tpos[mid] <= start) lo = mid; else hi = mid;
  }
  if (ckpt_tpos[lo] > start) return 0;
  *tpos = ckpt_tpos[lo];
  *qpos = ckpt_qpos[lo];
  return lo * static_cast<size_t>(kCkptStride);
}

PafIndex::PafIndex(const std::string& path) {
  gzFile gz = gzopen(path.c_str(), "rb");  // handles plain files too
  if (!gz) {
    throw std::runtime_error("cannot open PAF: " + path);
  }
  // Streaming batches of lines, parsed in parallel: CIGAR parsing +
  // checkpoint builds dominate index construction (~1 s per chromosome
  // of 466 alignments), and batching bounds memory to ~64 raw lines.
  const unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::string> batch;
  auto flush_batch = [&]() {
    if (batch.empty()) return;
    const size_t base = records_.size();
    records_.resize(base + batch.size());
    std::vector<char> ok(batch.size(), 0);
    const unsigned nt =
        std::min<size_t>(hw, batch.size());
    std::atomic<size_t> next{0};
    auto worker = [&]() {
      for (;;) {
        const size_t i = next.fetch_add(1);
        if (i >= batch.size()) break;
        PafRecord rec;
        if (parse_line(batch[i], &rec)) {
          rec.build_checkpoints();
          records_[base + i] = std::move(rec);
          ok[i] = 1;
        }
      }
    };
    if (nt <= 1) {
      worker();
    } else {
      std::vector<std::thread> pool;
      pool.reserve(nt);
      for (unsigned t = 0; t < nt; ++t) pool.emplace_back(worker);
      for (auto& th : pool) th.join();
    }
    // compact out failed parses, preserving order
    size_t keep = base;
    for (size_t i = 0; i < batch.size(); ++i) {
      if (!ok[i]) continue;
      if (keep != base + i) records_[keep] = std::move(records_[base + i]);
      ++keep;
    }
    records_.resize(keep);
    batch.clear();
  };
  std::string line;
  std::vector<char> buf(1 << 20);
  while (true) {
    char* got = gzgets(gz, buf.data(), static_cast<int>(buf.size()));
    if (!got) break;
    line.assign(got);
    // handle lines longer than the buffer
    while (!line.empty() && line.back() != '\n' && !gzeof(gz)) {
      got = gzgets(gz, buf.data(), static_cast<int>(buf.size()));
      if (!got) break;
      line += got;
    }
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r')) {
      line.pop_back();
    }
    if (line.empty()) continue;
    batch.push_back(std::move(line));
    line.clear();
    if (batch.size() >= 64) flush_batch();
  }
  flush_batch();
  gzclose(gz);
  for (size_t i = 0; i < records_.size(); ++i) {
    by_target_[records_[i].target_name].push_back(i);
  }
  for (auto& [_, idxs] : by_target_) {
    std::sort(idxs.begin(), idxs.end(), [&](size_t a, size_t b) {
      return records_[a].target_start < records_[b].target_start;
    });
  }
}

std::vector<const PafRecord*> PafIndex::overlapping(const std::string& target,
                                                    int64_t start,
                                                    int64_t end) const {
  std::vector<const PafRecord*> out;
  auto it = by_target_.find(target);
  if (it == by_target_.end()) return out;
  for (size_t idx : it->second) {
    const PafRecord& r = records_[idx];
    if (r.target_start >= end) break;  // sorted by start
    if (r.target_end > start) out.push_back(&r);
  }
  return out;
}

}  // namespace impop
