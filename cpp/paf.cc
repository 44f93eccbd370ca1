// PAF parsing (plain or gzip) with cg:Z CIGAR, indexed by target interval.
#include "extract.h"

#include <algorithm>
#include <cstring>
#include <stdexcept>
#include <zlib.h>

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
    PafRecord rec;
    if (parse_line(line, &rec)) {
      rec.build_checkpoints();
      records_.push_back(std::move(rec));
    }
  }
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
