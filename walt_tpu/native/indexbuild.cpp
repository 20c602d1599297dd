// Index CSR construction at C speed: the reference's two-pass counting
// build (CountBucketSize reference.cpp:192-229, HashToBucket :231-256)
// restructured as a parallel batch pass.
//
// The Python path used one global radix argsort over every (key, position)
// pair, whose temporaries peak at ~10x the final index bytes (round-2
// verdict weak #6).  Counting sort is O(n) time AND O(n) memory: pass 1
// computes per-thread bucket histograms over contiguous position ranges,
// the caller prefix-sums them into CSR offsets, and pass 2 scatters each
// position directly to its final slot.  Per-thread histograms make the fill
// order deterministic: thread t's range writes at
// counter[key] + sum(histograms[<t][key]), preserving the reference's
// position-ascending within-bucket pre-sort order exactly.
//
// Keys are computed on the fly (12 byte loads per position at spaced-seed
// offsets, util.hpp:175-182) so no (n,) key array is ever materialized.

#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

// hash key of the seed starting at seq[pos] (util.hpp:175-182)
inline uint32_t seed_key(const uint8_t* seq, int64_t pos,
                         const uint32_t* cared, int32_t kw) {
  uint32_t k = 0;
  for (int32_t i = 0; i < kw; ++i) k = (k << 2) | seq[pos + cared[i]];
  return k;
}

struct Range {
  int64_t begin, end;  // global position range [begin, end)
};

// valid seed start positions per chromosome (reference.cpp:199-207),
// chopped into ~equal chunks for the thread pool
std::vector<Range> split_ranges(const uint32_t* chrom_start, int32_t n_chroms,
                                int32_t min_seed_len, int32_t nthreads) {
  std::vector<Range> chrom_ranges;
  int64_t total = 0;
  for (int32_t c = 0; c < n_chroms; ++c) {
    int64_t a = chrom_start[c];
    int64_t b = (int64_t)chrom_start[c + 1] - min_seed_len;
    if (b > a) {
      chrom_ranges.push_back({a, b});
      total += b - a;
    }
  }
  std::vector<Range> out;
  if (!total) return out;
  int64_t per = (total + nthreads - 1) / nthreads;
  for (const Range& r : chrom_ranges) {
    for (int64_t a = r.begin; a < r.end; a += per) {
      int64_t b = a + per < r.end ? a + per : r.end;
      out.push_back({a, b});
    }
  }
  return out;
}

}  // namespace

extern "C" {

// Pass 1: per-range bucket histograms.  ``hist`` is (n_ranges, n_buckets)
// u32, zeroed by the caller.  Returns the number of ranges used (<= the
// caller-provided capacity n_ranges_cap); call with hist=nullptr to query.
int32_t csr_count(const uint8_t* seq, const uint32_t* chrom_start,
                  int32_t n_chroms, const uint32_t* cared, int32_t key_weight,
                  int32_t min_seed_len, int32_t nthreads,
                  uint32_t* hist, int32_t n_ranges_cap) {
  auto ranges = split_ranges(chrom_start, n_chroms, min_seed_len, nthreads);
  if (hist == nullptr) return (int32_t)ranges.size();
  if ((int32_t)ranges.size() > n_ranges_cap) return -1;
  const int64_t nb = 1LL << (2 * key_weight);
  std::vector<std::thread> ts;
  std::atomic<int32_t> next{0};
  auto worker = [&]() {
    for (;;) {
      int32_t r = next.fetch_add(1);
      if (r >= (int32_t)ranges.size()) return;
      uint32_t* h = hist + (int64_t)r * nb;
      for (int64_t p = ranges[r].begin; p < ranges[r].end; ++p)
        ++h[seed_key(seq, p, cared, key_weight)];
    }
  };
  int nt = nthreads < 1 ? 1 : nthreads;
  for (int t = 0; t < nt; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
  return (int32_t)ranges.size();
}

// Pass 2: scatter positions to their CSR slots.  ``base`` is
// (n_ranges, n_buckets) u32: the caller-computed write offset of each
// (range, key) pair (counter[key] + counts of key in earlier ranges).
// ``erased`` marks >=500k buckets (reference.cpp:211-218) to skip.
// ``base`` is consumed (incremented in place).
void csr_fill(const uint8_t* seq, const uint32_t* chrom_start,
              int32_t n_chroms, const uint32_t* cared, int32_t key_weight,
              int32_t min_seed_len, int32_t nthreads,
              uint32_t* base, int32_t n_ranges_cap,
              const uint8_t* erased, uint32_t* index_out) {
  auto ranges = split_ranges(chrom_start, n_chroms, min_seed_len, nthreads);
  if ((int32_t)ranges.size() > n_ranges_cap) return;
  const int64_t nb = 1LL << (2 * key_weight);
  std::vector<std::thread> ts;
  std::atomic<int32_t> next{0};
  auto worker = [&]() {
    for (;;) {
      int32_t r = next.fetch_add(1);
      if (r >= (int32_t)ranges.size()) return;
      uint32_t* b = base + (int64_t)r * nb;
      for (int64_t p = ranges[r].begin; p < ranges[r].end; ++p) {
        uint32_t k = seed_key(seq, p, cared, key_weight);
        if (erased[k]) continue;
        index_out[b[k]++] = (uint32_t)p;
      }
    }
  };
  int nt = nthreads < 1 ? 1 : nthreads;
  for (int t = 0; t < nt; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
}

}  // extern "C"
