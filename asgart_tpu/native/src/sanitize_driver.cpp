// Sanitizer exercise of the native runtime's THREADED paths
// (VERDICT r3 #7): built with -fsanitize=thread / address,undefined by
// scripts/sanitize_native.sh and run standalone (no Python, so the
// sanitizer runtimes need no LD_PRELOAD gymnastics).
//
// Covers every std::thread user in asgart_native.cpp:
//   * bpi_codes_impl - the parallel k-mer-radix + prefix-doubling
//     position-index builder (histogram merge, bucket sorts, doubling
//     rounds with per-thread update queues)
//   * asgart_pack_kmers / asgart_pack_at - blocked parallel packing
//   * asgart_build_bucket_table + asgart_batch_equal_range_bucketed -
//     the threaded searcher
//   * asgart_filter_ns / asgart_reduce_overlap - post-processing pools
//   * asgart_levenshtein_myers called from concurrent threads (the
//     Python Myers pool calls it with the GIL released)
//
// Exits 0 iff every result matches a single-threaded reference run;
// the sanitizers abort on any race/UB/overflow they see.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

extern "C" {
int asgart_build_position_index_codes2(const uint8_t*, int64_t, int64_t,
                                       int64_t*, int32_t*, int64_t*,
                                       int64_t);
int asgart_pack_kmers(const uint8_t*, int64_t, int64_t, int64_t*, int64_t);
int asgart_pack_at(const uint8_t*, int64_t, int64_t, const int64_t*,
                   int64_t, int64_t*, int64_t);
int asgart_build_bucket_table(const int64_t*, int64_t, int64_t, int64_t,
                              int64_t*);
int asgart_batch_equal_range_bucketed(const int64_t*, int64_t,
                                      const int64_t*, int64_t,
                                      const int64_t*, int64_t, int64_t,
                                      int64_t*, int64_t*, int64_t);
int asgart_filter_ns(const int64_t*, int64_t, const uint8_t*, int64_t,
                     uint8_t*, int64_t);
int asgart_reduce_overlap(const int64_t*, const int64_t*, int64_t,
                          int64_t*, int64_t*, int64_t);
int64_t asgart_levenshtein_myers(const uint8_t*, int64_t, const uint8_t*,
                                 int64_t);
}

static int fail(const char* what) {
  std::fprintf(stderr, "MISMATCH: %s\n", what);
  return 1;
}

int main() {
  std::mt19937_64 rng(42);
  const int64_t n = 1 << 20;  // 1 Mbp: big enough for real bucket fanout
  const int64_t k = 20;

  // genome codes (3-bit symbol ranks 1..5 like CODE[]), with planted
  // repeats so the prefix-doubling rounds do real multi-round work, an
  // N run, and a '$' (rank 0) terminator
  std::vector<uint8_t> codes(n);
  const uint8_t ranks[4] = {1, 2, 3, 5};
  for (int64_t i = 0; i < n; ++i) codes[i] = ranks[rng() & 3];
  for (int r = 0; r < 200; ++r) {  // tandem-ish repeat block
    int64_t src = 1000 + (rng() % 1000), dst = 200000 + r * 3000;
    std::memcpy(codes.data() + dst, codes.data() + src, 2000);
  }
  for (int64_t i = 600000; i < 606000; ++i) codes[i] = 4;  // N run
  codes[n - 1] = 0;  // '$'

  const int64_t T = 4;  // racy enough; TSan history stays tractable

  // --- parallel position-index builder vs single-threaded ------------
  std::vector<int64_t> sa1(n), saT(n), keys1(n), keysT(n);
  // pos_lo is an interleaved [n][2] (lo, hi) table -> 2n int32
  std::vector<int32_t> lo1(2 * n), loT(2 * n);
  asgart_build_position_index_codes2(codes.data(), n, k, sa1.data(),
                                     lo1.data(), keys1.data(), 1);
  asgart_build_position_index_codes2(codes.data(), n, k, saT.data(),
                                     loT.data(), keysT.data(), T);
  if (sa1 != saT) return fail("builder sa");
  if (lo1 != loT) return fail("builder pos_lo");
  if (keys1 != keysT) return fail("builder keys");

  // --- parallel packing ----------------------------------------------
  std::vector<int64_t> km1(n), kmT(n);
  asgart_pack_kmers(codes.data(), n, k, km1.data(), 1);
  asgart_pack_kmers(codes.data(), n, k, kmT.data(), T);
  if (km1 != kmT) return fail("pack_kmers");
  std::vector<int64_t> pos(5000), at1(5000), atT(5000);
  for (auto& p : pos) p = rng() % n;
  asgart_pack_at(codes.data(), n, k, pos.data(), 5000, at1.data(), 1);
  asgart_pack_at(codes.data(), n, k, pos.data(), 5000, atT.data(), T);
  if (at1 != atT) return fail("pack_at");

  // --- bucketed equal-range (threaded searcher) ----------------------
  // sorted keys = the builder's keys gathered in sa order
  std::vector<int64_t> sorted(n);
  for (int64_t i = 0; i < n; ++i) sorted[i] = keys1[sa1[i]];
  const int64_t topb = 12;
  std::vector<int64_t> buckets((int64_t(1) << topb) + 1);
  asgart_build_bucket_table(sorted.data(), n, k, topb, buckets.data());
  std::vector<int64_t> probes(20000);
  for (auto& p : probes) p = km1[rng() % n];
  std::vector<int64_t> elo1(20000), ehi1(20000), eloT(20000), ehiT(20000);
  asgart_batch_equal_range_bucketed(sorted.data(), n, probes.data(),
                                    20000, buckets.data(), k, topb,
                                    elo1.data(), ehi1.data(), 1);
  asgart_batch_equal_range_bucketed(sorted.data(), n, probes.data(),
                                    20000, buckets.data(), k, topb,
                                    eloT.data(), ehiT.data(), T);
  if (elo1 != eloT || ehi1 != ehiT) return fail("equal_range");

  // --- post-processing pools ------------------------------------------
  std::vector<uint8_t> strand(n);
  const char* acgt = "ACGT";
  for (int64_t i = 0; i < n; ++i) strand[i] = uint8_t(acgt[rng() & 3]);
  for (int64_t i = 600000; i < 606000; ++i) strand[i] = 'N';
  const int64_t n_sds = 4000;
  std::vector<int64_t> sds(4 * n_sds);
  for (int64_t i = 0; i < n_sds; ++i) {
    sds[4 * i] = rng() % (n - 4000);
    sds[4 * i + 1] = rng() % (n - 4000);
    sds[4 * i + 2] = 1000 + rng() % 2000;
    sds[4 * i + 3] = 1000 + rng() % 2000;
  }
  std::vector<uint8_t> keep1(n_sds), keepT(n_sds);
  asgart_filter_ns(sds.data(), n_sds, strand.data(), n, keep1.data(), 1);
  asgart_filter_ns(sds.data(), n_sds, strand.data(), n, keepT.data(), T);
  if (keep1 != keepT) return fail("filter_ns");

  const int64_t n_fams = 50;
  std::vector<int64_t> offs(n_fams + 1);
  for (int64_t f = 0; f <= n_fams; ++f) offs[f] = f * (n_sds / n_fams);
  std::vector<int64_t> out1(4 * n_sds), outT(4 * n_sds);
  std::vector<int64_t> ooff1(n_fams + 1), ooffT(n_fams + 1);
  asgart_reduce_overlap(sds.data(), offs.data(), n_fams, out1.data(),
                        ooff1.data(), 1);
  asgart_reduce_overlap(sds.data(), offs.data(), n_fams, outT.data(),
                        ooffT.data(), T);
  if (ooff1 != ooffT) return fail("reduce_overlap offsets");
  if (std::memcmp(out1.data(), outT.data(),
                  sizeof(int64_t) * 4 * ooff1[n_fams]) != 0)
    return fail("reduce_overlap sds");

  // --- concurrent Myers pool (read-only shared inputs) ----------------
  std::vector<int64_t> dists(8, -1);
  {
    std::vector<std::thread> ts;
    for (int t = 0; t < 8; ++t)
      ts.emplace_back([&, t]() {
        dists[t] = asgart_levenshtein_myers(strand.data() + 100 * t,
                                            5000, strand.data() + 7777,
                                            4800);
      });
    for (auto& th : ts) th.join();
  }
  for (int t = 0; t < 8; ++t) {
    int64_t want = asgart_levenshtein_myers(
        strand.data() + 100 * t, 5000, strand.data() + 7777, 4800);
    if (dists[t] != want) return fail("myers pool");
  }

  std::puts("sanitize_driver: all threaded paths match single-threaded");
  return 0;
}
