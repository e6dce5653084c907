// Multi-threaded stress test for the host core (VERDICT r3 #7).
//
// Production runs the per-table host prepare on a global thread pool
// (mt_prepare_wire_multi, batching.cc) while Python-side control-plane
// calls — eviction, touched-key drain, serving lookups, checkpoint save —
// land on the SAME stores from other threads. This binary hammers exactly
// that mix and checks invariants; built with -fsanitize=thread (`make
// tsan`) it is the race detector the reference gets from its 60 colocated
// cc_tests (ref embedding_hash_table_test.h concurrency harness,
// cuckoo_embedding_hash_table_test.cc).
//
// Usage: stress_test [rounds] [tables]   (defaults 200 x 8)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <thread>
#include <vector>

extern "C" {
void* mt_store_new(int64_t, int32_t, int64_t, int32_t, int32_t, uint64_t);
void mt_store_free(void*);
void* mt_batcher_new(int64_t);
void mt_batcher_free(void*);
int64_t mt_prepare_wire_multi(int32_t, void**, void**, const int64_t* const*,
                              const int64_t*, const int64_t*, const int64_t*,
                              uint32_t, const int64_t*, const int64_t*,
                              int32_t, int32_t*, int64_t*);
int64_t mt_store_evict_expired2(void*, uint32_t, int32_t*, int64_t*, int64_t);
int64_t mt_store_size(void*);
int64_t mt_store_save(void*, int64_t*, int32_t*, uint32_t*, uint32_t*);
void mt_store_lookup(void*, const int64_t*, int64_t, int32_t*);
int64_t mt_store_drain_touched(void*, int64_t*, int64_t);
int64_t mt_store_touched_size(void*);
int64_t mt_store_filter_estimate(void*, int64_t);
int32_t mt_host_threads();
}

namespace {

constexpr int64_t kCap = 4096;       // rows per store
constexpr int64_t kUniqueCap = 512;  // per-step unique budget
constexpr int64_t kNewCap = 512;
constexpr int kStreams = 3;  // feature streams per table
constexpr int64_t kIdsPerStream = 256;

struct Fail {
  std::atomic<long> count{0};
  void Check(bool ok, const char* what) {
    if (!ok) {
      std::fprintf(stderr, "FAIL: %s\n", what);
      count.fetch_add(1);
    }
  }
};

}  // namespace

int main(int argc, char** argv) {
  const int rounds = argc > 1 ? std::atoi(argv[1]) : 200;
  const int T = argc > 2 ? std::atoi(argv[2]) : 8;
  Fail fail;

  std::vector<void*> stores(T), batchers(T);
  for (int t = 0; t < T; ++t) {
    // alternate filter modes so the filter paths race too
    int32_t kind = t % 4;  // NONE / SLIDING / PROB / PROB_UNEQUAL
    stores[t] = mt_store_new(kCap, kind, /*filter_capacity=*/1 << 16,
                             /*filter_splits=*/4, /*admit_threshold=*/1,
                             /*seed=*/42 + t);
    batchers[t] = mt_batcher_new(kUniqueCap);
  }

  std::atomic<bool> stop{false};
  std::atomic<uint32_t> now{1};

  // control-plane threads racing the training rounds -------------------
  std::thread evictor([&] {
    std::mt19937_64 rng(7);
    std::vector<int32_t> rows(kCap);
    std::vector<int64_t> fids(kCap);
    while (!stop.load()) {
      int t = (int)(rng() % T);
      uint32_t cutoff = now.load() > 4 ? now.load() - 4 : 0;
      int64_t n = mt_store_evict_expired2(stores[t], cutoff, rows.data(),
                                          fids.data(), kCap);
      fail.Check(n >= 0 && n <= kCap, "evict count in range");
      for (int64_t i = 0; i < n; ++i)
        fail.Check(rows[i] >= 0 && rows[i] < kCap, "evicted row in range");
      std::this_thread::yield();
    }
  });

  std::thread drainer([&] {
    std::vector<int64_t> out(kCap);
    while (!stop.load()) {
      int64_t pending = mt_store_touched_size(stores[0]);
      fail.Check(pending >= 0, "touched size non-negative");
      int64_t n = mt_store_drain_touched(stores[0], out.data(), kCap);
      fail.Check(n >= 0 && n <= kCap, "drained count in range");
      std::this_thread::yield();
    }
  });

  std::thread reader([&] {
    std::mt19937_64 rng(11);
    std::vector<int64_t> fids(64);
    std::vector<int32_t> rows(64);
    std::vector<int64_t> sfids(kCap);
    std::vector<int32_t> srows(kCap);
    std::vector<uint32_t> stss(kCap), scnt(kCap);
    while (!stop.load()) {
      int t = (int)(rng() % T);
      for (auto& f : fids) f = (int64_t)(rng() % 4000);
      mt_store_lookup(stores[t], fids.data(), 64, rows.data());
      for (int i = 0; i < 64; ++i)
        fail.Check(rows[i] >= -1 && rows[i] < kCap, "lookup row in range");
      int64_t sz = mt_store_size(stores[t]);
      fail.Check(sz >= 0 && sz <= kCap, "size in range");
      // checkpoint-style snapshot read racing training
      int64_t n = mt_store_save(stores[t], sfids.data(), srows.data(),
                                stss.data(), scnt.data());
      fail.Check(n >= 0 && n <= kCap, "save count in range");
      mt_store_filter_estimate(stores[t], (int64_t)(rng() % 4000));
      std::this_thread::yield();
    }
  });

  // training rounds: the thread-pooled multi-table prepare -------------
  std::mt19937_64 rng(3);
  std::vector<int64_t> ids(T * kStreams * kIdsPerStream);
  std::vector<const int64_t*> stream_ptrs(T * kStreams);
  std::vector<int64_t> sizes(T * kStreams, kIdsPerStream);
  std::vector<int64_t> stream_offsets(T + 1), wire_offsets(T + 1);
  // wire per table: U rows + per stream ceil(n/2) index words
  const int64_t words_per_table =
      kUniqueCap + kStreams * ((kIdsPerStream + 1) / 2);
  for (int t = 0; t <= T; ++t) {
    stream_offsets[t] = (int64_t)t * kStreams;
    wire_offsets[t] = (int64_t)t * words_per_table;
  }
  std::vector<int64_t> ucaps(T, kUniqueCap), ncaps(T, kNewCap);
  std::vector<int32_t> wire(wire_offsets[T]);
  std::vector<int64_t> stats(T * 5);

  for (int r = 0; r < rounds; ++r) {
    uint32_t ts = now.fetch_add(1);
    for (int t = 0; t < T; ++t) {
      for (int s = 0; s < kStreams; ++s) {
        int64_t* dst = ids.data() + (t * kStreams + s) * kIdsPerStream;
        for (int64_t i = 0; i < kIdsPerStream; ++i) {
          // churning id universe so admission + eviction + recycling all
          // stay hot; ~25% padding sentinels like real ragged batches
          uint64_t x = rng();
          dst[i] = (x % 4 == 0) ? -1 : (int64_t)(x % 3000) + r / 8;
        }
        stream_ptrs[t * kStreams + s] = dst;
      }
    }
    int64_t words = mt_prepare_wire_multi(
        T, batchers.data(), stores.data(), stream_ptrs.data(), sizes.data(),
        stream_offsets.data(), wire_offsets.data(), ts, ucaps.data(),
        ncaps.data(), /*record_touch=*/1, wire.data(), stats.data());
    fail.Check(words == wire_offsets[T], "wire word total");
    for (int t = 0; t < T; ++t) {
      // stats: [overflow, new, unique, filtered, new_rejected]
      fail.Check(stats[t * 5 + 2] >= 0 && stats[t * 5 + 2] <= kUniqueCap,
                 "unique count in budget");
      int64_t u = stats[t * 5 + 2];
      for (int64_t i = 0; i < u; ++i) {
        int32_t raw = wire[wire_offsets[t] + i];
        int32_t row = raw & ~(1 << 30);  // bit 30 flags new rows
        fail.Check(raw == -1 || (row >= 0 && row < kCap),
                   "wire row in range");
      }
    }
  }

  stop.store(true);
  evictor.join();
  drainer.join();
  reader.join();

  for (int t = 0; t < T; ++t) {
    int64_t sz = mt_store_size(stores[t]);
    fail.Check(sz >= 0 && sz <= kCap, "final size in range");
    mt_store_free(stores[t]);
    mt_batcher_free(batchers[t]);
  }
  long f = fail.count.load();
  std::printf("stress: %d rounds x %d tables on %d pool threads, %ld "
              "failures\n", rounds, T, mt_host_threads(), f);
  return f == 0 ? 0 : 1;
}
