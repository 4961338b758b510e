// Native I/O hot path: FASTQ/FASTA(.gz) reading + 2-bit-friendly encoding.
//
// The reference pipeline's only native component is minigraph (C), which
// also owns gzip decompression of the read files (SURVEY §2.1). In this
// framework the compute path is JAX/Pallas on TPU; the native runtime piece
// is the host-side read loader feeding it: zlib streaming decompression,
// record parsing, and ASCII→code conversion (A,C,G,T → 0..3, other → 4) in
// one pass. Exposed as a C ABI consumed via ctypes
// (svjedi_tpu/utils/native.py) with a pure-Python fallback.
//
// Build: make -C native   (produces libsvtfastio.so)

#include <zlib.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Result {
  std::vector<std::string> names;
  std::vector<int8_t> codes;
  std::vector<int64_t> offsets;  // size = names.size() + 1
};

int8_t g_lut[256];

struct LutInit {
  LutInit() {
    memset(g_lut, 4, sizeof(g_lut));
    g_lut[(unsigned)'A'] = g_lut[(unsigned)'a'] = 0;
    g_lut[(unsigned)'C'] = g_lut[(unsigned)'c'] = 1;
    g_lut[(unsigned)'G'] = g_lut[(unsigned)'g'] = 2;
    g_lut[(unsigned)'T'] = g_lut[(unsigned)'t'] = 3;
  }
} g_lut_init;

class LineReader {
 public:
  explicit LineReader(gzFile file) : file_(file), pos_(0), len_(0), eof_(false) {}

  // Reads one line (without trailing newline) into out. Returns false at EOF.
  bool getline(std::string* out) {
    out->clear();
    for (;;) {
      if (pos_ == len_) {
        if (eof_) return !out->empty();
        len_ = gzread(file_, buf_, sizeof(buf_));
        pos_ = 0;
        if (len_ <= 0) {
          eof_ = true;
          len_ = 0;
          return !out->empty();
        }
      }
      char* nl = static_cast<char*>(memchr(buf_ + pos_, '\n', len_ - pos_));
      if (nl != nullptr) {
        size_t n = nl - (buf_ + pos_);
        out->append(buf_ + pos_, n);
        pos_ += n + 1;
        if (!out->empty() && out->back() == '\r') out->pop_back();
        return true;
      }
      out->append(buf_ + pos_, len_ - pos_);
      pos_ = len_;
    }
  }

 private:
  gzFile file_;
  char buf_[1 << 16];
  int pos_, len_;
  bool eof_;
};

void append_encoded(const std::string& seq, std::vector<int8_t>* codes) {
  size_t old = codes->size();
  codes->resize(old + seq.size());
  int8_t* dst = codes->data() + old;
  for (size_t i = 0; i < seq.size(); ++i) {
    dst[i] = g_lut[(unsigned char)seq[i]];
  }
}

std::string first_token(const std::string& header, size_t skip) {
  size_t end = header.find_first_of(" \t", skip);
  if (end == std::string::npos) return header.substr(skip);
  return header.substr(skip, end - skip);
}

}  // namespace

extern "C" {

// Returns an opaque Result*, or nullptr on open/parse failure.
void* svt_read_sequences(const char* path) {
  gzFile file = gzopen(path, "rb");
  if (file == nullptr) return nullptr;
  // Larger internal buffer helps gz throughput.
  gzbuffer(file, 1 << 20);

  LineReader reader(file);
  auto* result = new Result();
  result->offsets.push_back(0);

  std::string line;
  if (!reader.getline(&line)) {
    gzclose(file);
    return result;  // empty file → empty result
  }

  if (!line.empty() && line[0] == '@') {
    // FASTQ: header / seq / '+' / quals.
    std::string seq, plus, quals;
    for (;;) {
      if (line.empty() || line[0] != '@') break;
      if (!reader.getline(&seq)) break;
      reader.getline(&plus);
      reader.getline(&quals);
      result->names.push_back(first_token(line, 1));
      append_encoded(seq, &result->codes);
      result->offsets.push_back((int64_t)result->codes.size());
      if (!reader.getline(&line)) break;
    }
  } else if (!line.empty() && line[0] == '>') {
    // FASTA (possibly multi-line sequences).
    std::string name = first_token(line, 1);
    for (;;) {
      bool more = reader.getline(&line);
      if (!more || (!line.empty() && line[0] == '>')) {
        result->names.push_back(name);
        result->offsets.push_back((int64_t)result->codes.size());
        if (!more) break;
        name = first_token(line, 1);
      } else {
        append_encoded(line, &result->codes);
      }
    }
  } else {
    delete result;
    gzclose(file);
    return nullptr;
  }

  gzclose(file);
  return result;
}

int64_t svt_result_n_reads(void* handle) {
  return (int64_t) static_cast<Result*>(handle)->names.size();
}

int64_t svt_result_total_bases(void* handle) {
  return (int64_t) static_cast<Result*>(handle)->codes.size();
}

void svt_result_copy(void* handle, int8_t* codes_out, int64_t* offsets_out) {
  auto* r = static_cast<Result*>(handle);
  if (!r->codes.empty())
    memcpy(codes_out, r->codes.data(), r->codes.size());
  memcpy(offsets_out, r->offsets.data(), r->offsets.size() * sizeof(int64_t));
}

const char* svt_result_name(void* handle, int64_t i) {
  return static_cast<Result*>(handle)->names[i].c_str();
}

void svt_result_free(void* handle) { delete static_cast<Result*>(handle); }

// ---------------------------------------------------------------------------
// Minimizer extraction (the host-side seeding hot loop).
//
// Canonical k-mer minimizers with murmur3-fmix32 hashing, identical to the
// numpy implementation in svjedi_tpu/align/minimizer.py (same constants,
// same leftmost-argmin-per-window selection via a monotonic deque), so the
// native and fallback paths produce the same anchors.
// ---------------------------------------------------------------------------

namespace {

struct MinimizerResult {
  std::vector<int32_t> read_id;
  std::vector<int32_t> pos;     // local to the read
  std::vector<uint32_t> hash;
  std::vector<int8_t> strand;
};

inline uint32_t fmix32(uint32_t x) {
  x ^= x >> 16;
  x *= 0x85EBCA6Bu;
  x ^= x >> 13;
  x *= 0xC2B2AE35u;
  x ^= x >> 16;
  return x;
}

constexpr uint32_t kInvalid = 0xFFFFFFFFu;

}  // namespace

namespace {

// Scans reads [r0, r1) appending minimizers to *result. When bitmap is
// non-null, only hashes whose bit (hash masked to bitmap_bits) is set are
// emitted — the caller sets bits for every panel-index hash, so ~99% of
// read minimizers (which never hit the panel) are dropped here instead of
// surviving into the numpy seeding stage. False positives are resolved by
// the exact hash lookup downstream.
void scan_minimizers(const int8_t* codes, const int64_t* offsets, int64_t r0,
                     int64_t r1, int32_t k, int32_t w, const uint8_t* bitmap,
                     uint32_t bitmap_mask, MinimizerResult* result) {
  const uint32_t mask = (1u << (2 * k)) - 1;
  const int shift = 2 * (k - 1);

  struct Entry {
    uint32_t hash;
    int64_t kstart;
    int8_t strand;
  };
  // Monotonic queue: ring-free array with compaction; <= w live entries.
  std::vector<Entry> queue(2 * w + 2);

  for (int64_t r = r0; r < r1; ++r) {
    const int64_t lo = offsets[r], hi = offsets[r + 1];
    const int64_t n_kmers = hi - lo - k + 1;
    if (n_kmers <= 0) continue;
    uint32_t fwd = 0, rc = 0;
    int run = 0;  // consecutive non-N bases ending at i
    int head = 0, tail = 0;
    int64_t last_emitted = -1;
    for (int64_t i = lo; i < hi; ++i) {
      const int8_t c = codes[i];
      if (c < 4) {
        fwd = ((fwd << 2) | (uint32_t)c) & mask;
        rc = (rc >> 2) | ((uint32_t)(3 - c) << shift);
        ++run;
      } else {
        fwd = rc = 0;
        run = 0;
      }
      const int64_t kstart = i - k + 1;
      if (kstart < lo) continue;
      uint32_t h = kInvalid;
      int8_t strand = 0;
      if (run >= k && fwd != rc) {
        strand = (int8_t)(rc < fwd ? 1 : 0);
        h = fmix32(rc < fwd ? rc : fwd);
        // A real hash colliding with the sentinel stays invalid, matching
        // the numpy path's post-hoc `hash != INVALID` filter.
      }
      // Evict out-of-window entries, then push keeping the queue
      // non-decreasing (strict pops retain the leftmost tie).
      while (tail > head && queue[head].kstart <= kstart - w) ++head;
      while (tail > head && queue[tail - 1].hash > h) --tail;
      if (tail == (int)queue.size()) {
        std::copy(queue.begin() + head, queue.begin() + tail, queue.begin());
        tail -= head;
        head = 0;
      }
      queue[tail++] = {h, kstart, strand};
      const bool window_full =
          (kstart >= lo + w - 1) || (kstart == hi - k && n_kmers < w);
      if (window_full) {
        const Entry& best = queue[head];
        if (best.hash != kInvalid && best.kstart != last_emitted) {
          last_emitted = best.kstart;
          if (bitmap != nullptr) {
            const uint32_t b = best.hash & bitmap_mask;
            if (((bitmap[b >> 3] >> (b & 7)) & 1) == 0) continue;
          }
          result->read_id.push_back((int32_t)r);
          result->pos.push_back((int32_t)(best.kstart - lo));
          result->hash.push_back(best.hash);
          result->strand.push_back(best.strand);
        }
      }
    }
  }
}

}  // namespace

// Returns an opaque MinimizerResult* for the concatenated read set.
void* svt_minimizers(const int8_t* codes, int64_t n_bases,
                     const int64_t* offsets, int64_t n_reads, int32_t k,
                     int32_t w) {
  (void)n_bases;
  auto* result = new MinimizerResult();
  if (k <= 0 || k > 15 || w <= 0) return result;
  scan_minimizers(codes, offsets, 0, n_reads, k, w, nullptr, 0, result);
  return result;
}

// Thread-parallel + bitmap-prefiltered variant. bitmap may be null (no
// filter); bitmap_log2 is the log2 of the bitmap size in BITS. n_threads
// <= 0 picks the hardware concurrency.
void* svt_minimizers2(const int8_t* codes, int64_t n_bases,
                      const int64_t* offsets, int64_t n_reads, int32_t k,
                      int32_t w, const uint8_t* bitmap, int32_t bitmap_log2,
                      int32_t n_threads) {
  (void)n_bases;
  auto* result = new MinimizerResult();
  if (k <= 0 || k > 15 || w <= 0 || n_reads <= 0) return result;
  const uint32_t bitmap_mask =
      bitmap ? ((bitmap_log2 >= 32) ? 0xFFFFFFFFu
                                    : ((1u << bitmap_log2) - 1))
             : 0;
  int T = n_threads > 0 ? n_threads
                        : (int)std::thread::hardware_concurrency();
  if (T < 1) T = 1;
  if ((int64_t)T > n_reads) T = (int)n_reads;
  if (T == 1) {
    scan_minimizers(codes, offsets, 0, n_reads, k, w, bitmap, bitmap_mask,
                    result);
    return result;
  }
  // Balance shards by base count, not read count (read lengths vary).
  const int64_t total = offsets[n_reads] - offsets[0];
  std::vector<int64_t> bounds(T + 1, n_reads);
  bounds[0] = 0;
  int64_t r = 0;
  for (int t = 1; t < T; ++t) {
    const int64_t target = offsets[0] + total * t / T;
    while (r < n_reads && offsets[r] < target) ++r;
    bounds[t] = r;
  }
  std::vector<MinimizerResult> parts(T);
  std::vector<std::thread> threads;
  threads.reserve(T);
  for (int t = 0; t < T; ++t) {
    threads.emplace_back([&, t]() {
      scan_minimizers(codes, offsets, bounds[t], bounds[t + 1], k, w, bitmap,
                      bitmap_mask, &parts[t]);
    });
  }
  for (auto& th : threads) th.join();
  size_t n = 0;
  for (const auto& p : parts) n += p.hash.size();
  result->read_id.reserve(n);
  result->pos.reserve(n);
  result->hash.reserve(n);
  result->strand.reserve(n);
  for (const auto& p : parts) {
    result->read_id.insert(result->read_id.end(), p.read_id.begin(),
                           p.read_id.end());
    result->pos.insert(result->pos.end(), p.pos.begin(), p.pos.end());
    result->hash.insert(result->hash.end(), p.hash.begin(), p.hash.end());
    result->strand.insert(result->strand.end(), p.strand.begin(),
                          p.strand.end());
  }
  return result;
}

// ---------------------------------------------------------------------------
// Full seeding: minimizers -> index lookup -> diagonal voting, one call.
//
// Replicates svjedi_tpu/align/seed.py:seed_candidates exactly: anchors are
// grouped by (read, path, strand), binned by diagonal, each bin's support
// is its count plus the counts of adjacent bins of the same group, the
// first maximal-support bin wins, and d0 is the middle element (in anchor
// order) of the winning bin itself. Threaded over read ranges.
// ---------------------------------------------------------------------------

namespace {

struct SeedResult {
  std::vector<int32_t> read;
  std::vector<int32_t> path;
  std::vector<int8_t> strand;
  std::vector<int32_t> d0;
  std::vector<int32_t> support;
};

struct SeedIndex {
  const uint32_t* uniq_hash;
  int64_t n_uniq;
  const int64_t* hit_start;
  const int32_t* hit_path;
  const int32_t* hit_pos;
  const int8_t* hit_strand;
};

void seed_reads(const int8_t* codes, const int64_t* offsets, int64_t r0,
                int64_t r1, int32_t k, int32_t w, const uint8_t* bitmap,
                uint32_t bitmap_mask, const SeedIndex& idx, int32_t diag_bin,
                int32_t min_anchors, SeedResult* out) {
  struct Anchor {
    int64_t key;   // (path << 1 | strand) — group within the read
    int64_t bin;
    int32_t diag;
    int32_t ord;   // original anchor order (stable tie-break + median)
  };
  std::vector<Anchor> anchors;
  MinimizerResult mins;
  const int64_t two30 = 1LL << 30;

  for (int64_t r = r0; r < r1; ++r) {
    mins.read_id.clear();
    mins.pos.clear();
    mins.hash.clear();
    mins.strand.clear();
    scan_minimizers(codes, offsets, r, r + 1, k, w, bitmap, bitmap_mask,
                    &mins);
    anchors.clear();
    const int64_t rlen = offsets[r + 1] - offsets[r];
    for (size_t i = 0; i < mins.hash.size(); ++i) {
      const uint32_t h = mins.hash[i];
      const uint32_t* lo =
          std::lower_bound(idx.uniq_hash, idx.uniq_hash + idx.n_uniq, h);
      if (lo == idx.uniq_hash + idx.n_uniq || *lo != h) continue;
      const int64_t u = lo - idx.uniq_hash;
      for (int64_t j = idx.hit_start[u]; j < idx.hit_start[u + 1]; ++j) {
        const int8_t strand = (int8_t)(mins.strand[i] ^ idx.hit_strand[j]);
        const int64_t rpos_eff =
            strand == 0 ? (int64_t)mins.pos[i]
                        : rlen - k - (int64_t)mins.pos[i];
        const int32_t diag = (int32_t)(idx.hit_pos[j] - rpos_eff);
        anchors.push_back({((int64_t)idx.hit_path[j] << 1) | strand,
                           (diag + two30) / diag_bin, diag,
                           (int32_t)anchors.size()});
      }
    }
    if (anchors.empty()) continue;
    std::sort(anchors.begin(), anchors.end(),
              [](const Anchor& a, const Anchor& b) {
                if (a.key != b.key) return a.key < b.key;
                if (a.bin != b.bin) return a.bin < b.bin;
                return a.ord < b.ord;
              });
    //

    // Segment walk: one segment per (key, bin).
    size_t n = anchors.size();
    size_t s = 0;
    while (s < n) {
      const int64_t key = anchors[s].key;
      // Collect this group's segments.
      size_t g_end = s;
      while (g_end < n && anchors[g_end].key == key) ++g_end;
      // Find modal segment: support = count + adjacent-bin counts.
      int64_t best_support = -1;
      size_t best_s = s, best_e = s;
      size_t a = s;
      while (a < g_end) {
        size_t e = a;
        while (e < g_end && anchors[e].bin == anchors[a].bin) ++e;
        int64_t support = (int64_t)(e - a);
        // left neighbor segment
        if (a > s) {
          size_t pl = a;  // find start of previous segment
          size_t pstart = a;
          while (pstart > s && anchors[pstart - 1].bin == anchors[a - 1].bin)
            --pstart;
          if (anchors[a - 1].bin == anchors[a].bin - 1)
            support += (int64_t)(pl - pstart);
        }
        if (e < g_end && anchors[e].bin == anchors[a].bin + 1) {
          size_t ne = e;
          while (ne < g_end && anchors[ne].bin == anchors[e].bin) ++ne;
          support += (int64_t)(ne - e);
        }
        if (support > best_support) {
          best_support = support;
          best_s = a;
          best_e = e;
        }
        a = e;
      }
      if (best_support >= min_anchors) {
        const Anchor& med = anchors[best_s + (best_e - 1 - best_s) / 2];
        out->read.push_back((int32_t)r);
        out->path.push_back((int32_t)(key >> 1));
        out->strand.push_back((int8_t)(key & 1));
        out->d0.push_back(med.diag);
        out->support.push_back((int32_t)best_support);
      }
      s = g_end;
    }
  }
}

}  // namespace

void* svt_seed(const int8_t* codes, int64_t n_bases, const int64_t* offsets,
               int64_t n_reads, int32_t k, int32_t w, const uint8_t* bitmap,
               int32_t bitmap_log2, const uint32_t* uniq_hash, int64_t n_uniq,
               const int64_t* hit_start, const int32_t* hit_path,
               const int32_t* hit_pos, const int8_t* hit_strand,
               int32_t diag_bin, int32_t min_anchors, int32_t n_threads) {
  (void)n_bases;
  auto* result = new SeedResult();
  if (k <= 0 || k > 15 || w <= 0 || n_reads <= 0) return result;
  const uint32_t bitmap_mask =
      bitmap ? ((bitmap_log2 >= 32) ? 0xFFFFFFFFu
                                    : ((1u << bitmap_log2) - 1))
             : 0;
  SeedIndex idx{uniq_hash, n_uniq, hit_start, hit_path, hit_pos, hit_strand};
  int T = n_threads > 0 ? n_threads
                        : (int)std::thread::hardware_concurrency();
  if (T < 1) T = 1;
  if ((int64_t)T > n_reads) T = (int)n_reads;
  if (T == 1) {
    seed_reads(codes, offsets, 0, n_reads, k, w, bitmap, bitmap_mask, idx,
               diag_bin, min_anchors, result);
    return result;
  }
  const int64_t total = offsets[n_reads] - offsets[0];
  std::vector<int64_t> bounds(T + 1, n_reads);
  bounds[0] = 0;
  int64_t r = 0;
  for (int t = 1; t < T; ++t) {
    const int64_t target = offsets[0] + total * t / T;
    while (r < n_reads && offsets[r] < target) ++r;
    bounds[t] = r;
  }
  std::vector<SeedResult> parts(T);
  std::vector<std::thread> threads;
  threads.reserve(T);
  for (int t = 0; t < T; ++t) {
    threads.emplace_back([&, t]() {
      seed_reads(codes, offsets, bounds[t], bounds[t + 1], k, w, bitmap,
                 bitmap_mask, idx, diag_bin, min_anchors, &parts[t]);
    });
  }
  for (auto& th : threads) th.join();
  size_t n = 0;
  for (const auto& p : parts) n += p.read.size();
  result->read.reserve(n);
  result->path.reserve(n);
  result->strand.reserve(n);
  result->d0.reserve(n);
  result->support.reserve(n);
  for (const auto& p : parts) {
    result->read.insert(result->read.end(), p.read.begin(), p.read.end());
    result->path.insert(result->path.end(), p.path.begin(), p.path.end());
    result->strand.insert(result->strand.end(), p.strand.begin(),
                          p.strand.end());
    result->d0.insert(result->d0.end(), p.d0.begin(), p.d0.end());
    result->support.insert(result->support.end(), p.support.begin(),
                           p.support.end());
  }
  return result;
}

int64_t svt_seed_count(void* handle) {
  return (int64_t) static_cast<SeedResult*>(handle)->read.size();
}

void svt_seed_copy(void* handle, int32_t* read, int32_t* path, int8_t* strand,
                   int32_t* d0, int32_t* support) {
  auto* r = static_cast<SeedResult*>(handle);
  const size_t n = r->read.size();
  if (n == 0) return;
  memcpy(read, r->read.data(), n * sizeof(int32_t));
  memcpy(path, r->path.data(), n * sizeof(int32_t));
  memcpy(strand, r->strand.data(), n * sizeof(int8_t));
  memcpy(d0, r->d0.data(), n * sizeof(int32_t));
  memcpy(support, r->support.data(), n * sizeof(int32_t));
}

void svt_seed_free(void* handle) { delete static_cast<SeedResult*>(handle); }

int64_t svt_minimizers_count(void* handle) {
  return (int64_t) static_cast<MinimizerResult*>(handle)->hash.size();
}

void svt_minimizers_copy(void* handle, int32_t* read_id, int32_t* pos,
                         uint32_t* hash, int8_t* strand) {
  auto* r = static_cast<MinimizerResult*>(handle);
  const size_t n = r->hash.size();
  if (n == 0) return;
  memcpy(read_id, r->read_id.data(), n * sizeof(int32_t));
  memcpy(pos, r->pos.data(), n * sizeof(int32_t));
  memcpy(hash, r->hash.data(), n * sizeof(uint32_t));
  memcpy(strand, r->strand.data(), n * sizeof(int8_t));
}

void svt_minimizers_free(void* handle) {
  delete static_cast<MinimizerResult*>(handle);
}

}  // extern "C"
