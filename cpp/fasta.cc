// FAI-indexed FASTA random access (samtools faidx-compatible index).
#include "extract.h"

#include <cstdio>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

namespace impop {

static bool file_exists(const std::string& p) {
  struct stat st;
  return stat(p.c_str(), &st) == 0;
}

FastaReader::FastaReader(const std::string& path) : path_(path) {
  if (!file_exists(path_)) {
    throw std::runtime_error("FASTA not found: " + path_);
  }
  build_or_load_index();
  fd_ = ::open(path_.c_str(), O_RDONLY);
  if (fd_ < 0) {
    throw std::runtime_error("cannot open FASTA: " + path_);
  }
}

FastaReader::~FastaReader() {
  if (fd_ >= 0) ::close(fd_);
}

void FastaReader::build_or_load_index() {
  const std::string fai = path_ + ".fai";
  if (file_exists(fai)) {
    std::ifstream in(fai);
    std::string line;
    while (std::getline(in, line)) {
      if (line.empty()) continue;
      std::istringstream ss(line);
      std::string name;
      Entry e;
      ss >> name >> e.length >> e.offset >> e.line_bases >> e.line_bytes;
      index_[name] = e;
    }
    if (!index_.empty()) return;
  }
  // Build the index in one pass.
  std::ifstream in(path_, std::ios::binary);
  std::string line;
  std::string name;
  Entry cur{0, 0, 0, 0};
  int64_t offset = 0;
  bool have = false;
  auto flush = [&]() {
    if (have) index_[name] = cur;
  };
  while (std::getline(in, line)) {
    int64_t line_bytes = static_cast<int64_t>(line.size()) + 1;
    if (!line.empty() && line[0] == '>') {
      flush();
      std::istringstream ss(line.substr(1));
      ss >> name;
      cur = Entry{0, offset + line_bytes, 0, 0};
      have = true;
    } else if (have && !line.empty()) {
      if (cur.line_bases == 0) {
        cur.line_bases = static_cast<int64_t>(line.size());
        cur.line_bytes = line_bytes;
      }
      cur.length += static_cast<int64_t>(line.size());
    }
    offset += line_bytes;
  }
  flush();
  // Persist for reuse (best effort).
  std::ofstream out(fai);
  if (out) {
    for (const auto& [n, e] : index_) {
      out << n << '\t' << e.length << '\t' << e.offset << '\t' << e.line_bases
          << '\t' << e.line_bytes << '\n';
    }
  }
}

bool FastaReader::has(const std::string& name) const {
  return index_.count(name) != 0;
}

int64_t FastaReader::length(const std::string& name) const {
  auto it = index_.find(name);
  return it == index_.end() ? -1 : it->second.length;
}

std::string FastaReader::fetch(const std::string& name, int64_t start,
                               int64_t end) const {
  auto it = index_.find(name);
  if (it == index_.end()) {
    throw std::runtime_error("sequence not in FASTA: " + name);
  }
  const Entry& e = it->second;
  if (start < 0) start = 0;
  if (end > e.length) end = e.length;
  if (start >= end) return "";
  // One bulk pread of the covering byte range (thread-safe: no shared seek
  // state), then strip line terminators in memory — a seek+read per
  // 60-base FASTA line costs ~8k syscall pairs per 500 kb slice and
  // dominated genome-scale extraction profiles.
  const int64_t line0 = start / e.line_bases;
  const int64_t line1 = (end - 1) / e.line_bases;
  const int64_t byte0 = e.offset + line0 * e.line_bytes + start % e.line_bases;
  const int64_t byte1 =
      e.offset + line1 * e.line_bytes + (end - 1) % e.line_bases + 1;
  std::string raw(static_cast<size_t>(byte1 - byte0), '\0');
  int64_t got = 0;
  while (got < byte1 - byte0) {
    ssize_t r = ::pread(fd_, &raw[static_cast<size_t>(got)],
                        static_cast<size_t>(byte1 - byte0 - got),
                        static_cast<off_t>(byte0 + got));
    if (r <= 0) break;
    got += r;
  }
  raw.resize(static_cast<size_t>(got));
  std::string out;
  out.reserve(static_cast<size_t>(end - start));
  for (char c : raw) {
    if (c != '\n' && c != '\r') out.push_back(c);
  }
  return out;
}

}  // namespace impop
