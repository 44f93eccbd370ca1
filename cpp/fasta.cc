// FAI-indexed FASTA random access (samtools faidx-compatible index) over
// plain text, BGZF (bgzip) and plain-gzip storage.  See extract.h for the
// kind-detection contract.
#include "extract.h"

#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <zlib.h>

namespace impop {

static bool file_exists(const std::string& p) {
  struct stat st;
  return stat(p.c_str(), &st) == 0;
}

FastaReader::FastaReader(const std::string& path) : path_(path) {
  if (!file_exists(path_)) {
    throw std::runtime_error("FASTA not found: " + path_);
  }
  fd_ = ::open(path_.c_str(), O_RDONLY);
  if (fd_ < 0) {
    throw std::runtime_error("cannot open FASTA: " + path_);
  }
  detect_kind();
  if (kind_ == Kind::kBgzf) build_or_load_block_index();
  build_or_load_index();
  if (kind_ == Kind::kPlain) {
    struct stat st;
    if (fstat(fd_, &st) == 0 && st.st_size > 0) {
      void* m = ::mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ,
                       MAP_PRIVATE, fd_, 0);
      if (m != MAP_FAILED) {
        map_ = static_cast<const char*>(m);
        map_size_ = static_cast<int64_t>(st.st_size);
      }
    }
  }
}

FastaReader::~FastaReader() {
  if (map_) ::munmap(const_cast<char*>(map_), static_cast<size_t>(map_size_));
  if (fd_ >= 0) ::close(fd_);
}

FastaReader::BaseView FastaReader::base_view(const std::string& name) const {
  BaseView v;
  auto it = index_.find(name);
  if (it == index_.end()) return v;
  const Entry& e = it->second;
  const char* base = nullptr;
  if (kind_ == Kind::kPlain && map_) {
    base = map_ + e.offset;
  } else if (kind_ == Kind::kGzMem) {
    base = mem_.data() + e.offset;
  } else {
    return v;  // BGZF: no O(1) access; caller falls back to fetch()
  }
  v.data_ = base;
  v.len_ = e.length;
  v.line_bases_ = std::max<int64_t>(e.line_bases, 1);
  v.line_bytes_ = std::max<int64_t>(e.line_bytes, v.line_bases_);
  return v;
}

// ------------------------------------------------------------- kind detect

// BGZF block: gzip member whose FEXTRA contains subfield SI1='B' SI2='C'
// with a 2-byte little-endian BSIZE (total block size - 1).  Returns the
// total block size, or -1 if the bytes at `off` are not a BGZF block head.
static int64_t bgzf_block_size(int fd, int64_t off) {
  unsigned char head[12];
  if (::pread(fd, head, 12, static_cast<off_t>(off)) != 12) return -1;
  if (head[0] != 0x1f || head[1] != 0x8b || head[2] != 8) return -1;
  if (!(head[3] & 4)) return -1;  // no FEXTRA -> not BGZF
  const int xlen = head[10] | (head[11] << 8);
  if (xlen <= 0 || xlen > 1 << 16) return -1;
  std::string extra(static_cast<size_t>(xlen), '\0');
  if (::pread(fd, extra.data(), static_cast<size_t>(xlen),
              static_cast<off_t>(off + 12)) != xlen) {
    return -1;
  }
  for (int i = 0; i + 4 <= xlen;) {
    const unsigned char si1 = static_cast<unsigned char>(extra[i]);
    const unsigned char si2 = static_cast<unsigned char>(extra[i + 1]);
    const int slen = static_cast<unsigned char>(extra[i + 2]) |
                     (static_cast<unsigned char>(extra[i + 3]) << 8);
    if (si1 == 66 && si2 == 67 && slen == 2 && i + 6 <= xlen) {
      const int bsize = static_cast<unsigned char>(extra[i + 4]) |
                        (static_cast<unsigned char>(extra[i + 5]) << 8);
      return static_cast<int64_t>(bsize) + 1;
    }
    i += 4 + slen;
  }
  return -1;
}

void FastaReader::detect_kind() {
  unsigned char magic[2] = {0, 0};
  if (::pread(fd_, magic, 2, 0) != 2) {
    kind_ = Kind::kPlain;
    return;
  }
  if (magic[0] != 0x1f || magic[1] != 0x8b) {
    kind_ = Kind::kPlain;
    return;
  }
  kind_ = bgzf_block_size(fd_, 0) > 0 ? Kind::kBgzf : Kind::kGzMem;
  if (kind_ == Kind::kGzMem) {
    // Single-member gzip has no random-access structure: inflate the whole
    // file once (gzread transparently walks members) and serve from memory.
    gzFile gz = gzopen(path_.c_str(), "rb");
    if (!gz) throw std::runtime_error("cannot gzopen FASTA: " + path_);
    std::vector<char> buf(1 << 20);
    int got;
    while ((got = gzread(gz, buf.data(), static_cast<unsigned>(buf.size()))) >
           0) {
      mem_.append(buf.data(), static_cast<size_t>(got));
    }
    gzclose(gz);
  }
}

// ------------------------------------------------------------- block index

void FastaReader::build_or_load_block_index() {
  struct stat st;
  if (fstat(fd_, &st) != 0) {
    throw std::runtime_error("cannot stat FASTA: " + path_);
  }
  const int64_t fsize = static_cast<int64_t>(st.st_size);

  // samtools .gzi: u64 count, then count (compressed, uncompressed) u64
  // pairs for every block AFTER the first (which is implicitly (0, 0)).
  const std::string gzi = path_ + ".gzi";
  if (file_exists(gzi)) {
    std::ifstream in(gzi, std::ios::binary);
    uint64_t count = 0;
    in.read(reinterpret_cast<char*>(&count), 8);
    if (in && count < (1ull << 40)) {
      blocks_.clear();
      blocks_.push_back({0, 0});
      bool ok = true;
      for (uint64_t i = 0; i < count; ++i) {
        uint64_t c = 0, u = 0;
        in.read(reinterpret_cast<char*>(&c), 8);
        in.read(reinterpret_cast<char*>(&u), 8);
        if (!in) {
          ok = false;
          break;
        }
        blocks_.push_back({static_cast<int64_t>(c), static_cast<int64_t>(u)});
      }
      if (ok && !blocks_.empty()) {
        // total uncompressed size = last block's uoffset + its ISIZE
        unsigned char tail[4];
        const int64_t last_c = blocks_.back().coffset;
        const int64_t bs = bgzf_block_size(fd_, last_c);
        if (bs > 0 &&
            ::pread(fd_, tail, 4, static_cast<off_t>(last_c + bs - 4)) == 4) {
          const int64_t isize = tail[0] | (tail[1] << 8) | (tail[2] << 16) |
                                (static_cast<int64_t>(tail[3]) << 24);
          total_usize_ = blocks_.back().uoffset + isize;
          return;
        }
      }
    }
    blocks_.clear();  // unreadable .gzi: rebuild below
  }

  // One header-only pass: BSIZE from each block head, ISIZE from its tail.
  int64_t coff = 0, uoff = 0;
  while (coff < fsize) {
    const int64_t bs = bgzf_block_size(fd_, coff);
    if (bs <= 0) {
      throw std::runtime_error("corrupt BGZF block in " + path_);
    }
    unsigned char tail[4];
    if (::pread(fd_, tail, 4, static_cast<off_t>(coff + bs - 4)) != 4) {
      throw std::runtime_error("truncated BGZF block in " + path_);
    }
    const int64_t isize = tail[0] | (tail[1] << 8) | (tail[2] << 16) |
                          (static_cast<int64_t>(tail[3]) << 24);
    if (isize > 0) blocks_.push_back({coff, uoff});  // skip EOF marker block
    coff += bs;
    uoff += isize;
  }
  total_usize_ = uoff;
  if (blocks_.empty()) blocks_.push_back({0, 0});

  // Persist (best effort, samtools-compatible).
  std::ofstream out(gzi, std::ios::binary);
  if (out) {
    const uint64_t count = blocks_.size() - 1;
    out.write(reinterpret_cast<const char*>(&count), 8);
    for (size_t i = 1; i < blocks_.size(); ++i) {
      const uint64_t c = static_cast<uint64_t>(blocks_[i].coffset);
      const uint64_t u = static_cast<uint64_t>(blocks_[i].uoffset);
      out.write(reinterpret_cast<const char*>(&c), 8);
      out.write(reinterpret_cast<const char*>(&u), 8);
    }
  }
}

// -------------------------------------------------------------- raw access

int64_t FastaReader::read_raw(int64_t off, int64_t len, char* out) const {
  if (len <= 0) return 0;
  switch (kind_) {
    case Kind::kPlain: {
      int64_t got = 0;
      while (got < len) {
        ssize_t r = ::pread(fd_, out + got, static_cast<size_t>(len - got),
                            static_cast<off_t>(off + got));
        if (r <= 0) break;
        got += r;
      }
      return got;
    }
    case Kind::kGzMem: {
      if (off >= static_cast<int64_t>(mem_.size())) return 0;
      const int64_t take =
          std::min<int64_t>(len, static_cast<int64_t>(mem_.size()) - off);
      std::memcpy(out, mem_.data() + off, static_cast<size_t>(take));
      return take;
    }
    case Kind::kBgzf: {
      if (off >= total_usize_) return 0;
      len = std::min(len, total_usize_ - off);
      // last block with uoffset <= off
      size_t lo = 0, hi = blocks_.size();
      while (lo + 1 < hi) {
        const size_t mid = (lo + hi) / 2;
        if (blocks_[mid].uoffset <= off) lo = mid; else hi = mid;
      }
      struct stat st;
      fstat(fd_, &st);
      const int64_t fsize = static_cast<int64_t>(st.st_size);
      int64_t got = 0;
      for (size_t bi = lo; bi < blocks_.size() && got < len; ++bi) {
        const int64_t c0 = blocks_[bi].coffset;
        const int64_t c1 =
            bi + 1 < blocks_.size() ? blocks_[bi + 1].coffset : fsize;
        const int64_t u0 = blocks_[bi].uoffset;
        std::string comp(static_cast<size_t>(c1 - c0), '\0');
        int64_t cg = 0;
        while (cg < c1 - c0) {
          ssize_t r = ::pread(fd_, comp.data() + cg,
                              static_cast<size_t>(c1 - c0 - cg),
                              static_cast<off_t>(c0 + cg));
          if (r <= 0) break;
          cg += r;
        }
        // Inflate the block (auto gzip-header mode); local z_stream keeps
        // fetch() thread-safe alongside the threaded record walk.
        z_stream zs;
        std::memset(&zs, 0, sizeof(zs));
        if (inflateInit2(&zs, 15 + 32) != Z_OK) return got;
        zs.next_in = reinterpret_cast<Bytef*>(comp.data());
        zs.avail_in = static_cast<uInt>(cg);
        std::string ubuf(1 << 16, '\0');  // BGZF blocks are <= 64 KiB
        zs.next_out = reinterpret_cast<Bytef*>(ubuf.data());
        zs.avail_out = static_cast<uInt>(ubuf.size());
        const int rc = inflate(&zs, Z_FINISH);
        const int64_t usz = static_cast<int64_t>(zs.total_out);
        inflateEnd(&zs);
        if (rc != Z_STREAM_END && rc != Z_OK && rc != Z_BUF_ERROR) return got;
        const int64_t want0 = std::max<int64_t>(off + got - u0, 0);
        const int64_t take = std::min(usz - want0, len - got);
        if (take <= 0) continue;
        std::memcpy(out + got, ubuf.data() + want0,
                    static_cast<size_t>(take));
        got += take;
      }
      return got;
    }
  }
  return 0;
}

// --------------------------------------------------------------- fai index

void FastaReader::build_or_load_index() {
  const std::string fai = path_ + ".fai";
  // samtools-faidx staleness rule: an index older than its FASTA is
  // rebuilt, not trusted (a regenerated-in-place FASTA with a leftover
  // .fai silently mis-offsets every read — caught by
  // tests/test_extract.py's cache-invalidation differential).
  struct stat src_st, fai_st;
  const bool fresh =
      ::stat(path_.c_str(), &src_st) == 0 &&
      ::stat(fai.c_str(), &fai_st) == 0 &&
      (fai_st.st_mtim.tv_sec > src_st.st_mtim.tv_sec ||
       (fai_st.st_mtim.tv_sec == src_st.st_mtim.tv_sec &&
        fai_st.st_mtim.tv_nsec >= src_st.st_mtim.tv_nsec));
  if (file_exists(fai) && fresh) {
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
  // Build the index in one streaming pass over the UNCOMPRESSED text
  // (gzgets handles plain, gzip and BGZF transparently).
  gzFile gz = gzopen(path_.c_str(), "rb");
  if (!gz) throw std::runtime_error("cannot open FASTA: " + path_);
  std::vector<char> buf(1 << 20);
  std::string line;
  std::string name;
  Entry cur{0, 0, 0, 0};
  int64_t offset = 0;
  bool have = false;
  auto flush = [&]() {
    if (have) index_[name] = cur;
  };
  while (true) {
    char* got = gzgets(gz, buf.data(), static_cast<int>(buf.size()));
    if (!got) break;
    line.assign(got);
    while (!line.empty() && line.back() != '\n' && !gzeof(gz)) {
      got = gzgets(gz, buf.data(), static_cast<int>(buf.size()));
      if (!got) break;
      line += got;
    }
    const int64_t line_bytes = static_cast<int64_t>(line.size());
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r')) {
      line.pop_back();
    }
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
  gzclose(gz);
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
  // One bulk range read of the covering (uncompressed) byte range, then
  // strip line terminators in memory — a seek+read per 60-base FASTA line
  // costs ~8k syscall pairs per 500 kb slice and dominated genome-scale
  // extraction profiles.
  const int64_t line0 = start / e.line_bases;
  const int64_t line1 = (end - 1) / e.line_bases;
  const int64_t byte0 = e.offset + line0 * e.line_bytes + start % e.line_bases;
  const int64_t byte1 =
      e.offset + line1 * e.line_bytes + (end - 1) % e.line_bases + 1;
  std::string raw(static_cast<size_t>(byte1 - byte0), '\0');
  const int64_t got = read_raw(byte0, byte1 - byte0, raw.data());
  raw.resize(static_cast<size_t>(got));
  if (line0 == line1) return raw;  // slice within one line: no terminators
  // Line geometry is regular (FAI contract), so the payload runs can be
  // memcpy'd at known offsets — the former per-byte filter loop was 60%+ of
  // genome-scale extraction profiles (2.4 ns/byte of branch+push_back).
  std::string out;
  out.resize(static_cast<size_t>(end - start));
  const int64_t term = e.line_bytes - e.line_bases;  // terminator width
  char* dst = out.data();
  const char* src = raw.data();
  const char* src_end = raw.data() + raw.size();
  int64_t col = start % e.line_bases;  // column within the current line
  while (src < src_end) {
    const int64_t run =
        std::min<int64_t>(e.line_bases - col, src_end - src);
    std::memcpy(dst, src, static_cast<size_t>(run));
    dst += run;
    src += run + term;  // skip the terminator (may overshoot past the end)
    col = 0;
  }
  out.resize(static_cast<size_t>(dst - out.data()));
  return out;
}

}  // namespace impop
