// Batch dedup + shard bucketing, the host half of the embedding step.
//
// TPU-native rebuild of ref ShardingSparseFidsOp
// (data/kernels/parse_sparse_feature.h:42) + fused_reorder_by_indices
// (runtime/ops/fused_reorder_by_indices.cc): given the flat fid stream of a
// batch for ONE merged table, emit
//   - a [num_shards, shard_cap] buffer of unique fids grouped by shard
//     (shard = mix64(fid) % num_shards), padded with kPad,
//   - for every input position, an index into that flattened buffer
//     (-1 for padding / dropped-overflow ids),
//   - per-shard unique counts.
// The device step then gathers rows per shard, all_to_alls embeddings, and
// gathers per-position with mode='fill' so -1 indices yield zeros.
//
// A Batcher object owns reusable scratch so the hot path is allocation-free.
// The fused single-shard entry `mt_prepare_wire` runs the WHOLE host prepare
// (dedup + store map + wire pack) in one pass, writing the final int32 wire
// buffer directly (rows | new_bit<<30, then int16 index words per feature) —
// the host-side counterpart of the reference's fused kernels
// (runtime/ops/hash_table_op.cc fused_lookup, parse_sparse_feature.h).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <vector>

#include "threadpool.h"

// store.cc's C ABI (linked into the same .so)
extern "C" void mt_store_map_train_pos(void* s, const int64_t* fids, int64_t n,
                                       uint32_t ts, int32_t* out_rows,
                                       int32_t* out_new_rows,
                                       int64_t* out_new_fids,
                                       int32_t* out_new_pos, int64_t new_cap,
                                       int64_t* out_new_count,
                                       int32_t record_touch);
extern "C" void mt_store_map_train_pos2(void* s, const int64_t* fids,
                                        int64_t n, uint32_t ts,
                                        const int32_t* counts,
                                        int32_t* out_rows,
                                        int32_t* out_new_rows,
                                        int64_t* out_new_fids,
                                        int32_t* out_new_pos, int64_t new_cap,
                                        int64_t* out_new_count,
                                        int32_t record_touch);

namespace {

inline uint64_t mix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ULL;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
  return x ^ (x >> 31);
}

constexpr int64_t kPadFid = -1;  // padding sentinel in input fid streams

class Batcher {
 public:
  explicit Batcher(int64_t expected_unique) {
    scratch_size_ = 1024;
    while (scratch_size_ < (uint64_t)expected_unique * 2) scratch_size_ <<= 1;
    slots_.assign(scratch_size_, Slot{kPadFid, -1, 0});
    epoch_ = 0;
  }

  // Streaming API: Begin() opens an epoch sized for `n_total` ids, then
  // AddStream() folds each feature's fid stream in, writing per-position
  // indices (int16 or int32) as it goes. Dedup state is shared across the
  // streams of one Begin() — the same fid in two features maps to one slot.
  // `out_occurrence`: optional per-unique-slot batch occurrence counts
  // (length num_shards*shard_cap, follows out_unique's layout) — the
  // probabilistic admission filters consume them (ref ShouldBeFiltered's
  // `count` argument, probabilistic_filter.h:48).
  void Begin(int64_t n_total, int32_t num_shards, int64_t shard_cap,
             int64_t* out_unique, int32_t* out_shard_counts,
             int32_t* out_occurrence = nullptr) {
    ++epoch_;
    if (epoch_ == 0) {  // wrapped: hard reset
      for (Slot& s : slots_) s.stamp = 0;
      epoch_ = 1;
    }
    // Size for UNIQUE ids, not stream length: the scratch grows lazily by
    // live count (see AddStream), keeping the working set L2-resident when
    // the stream is dominated by repeats. shard_cap bounds admitted uniques;
    // dropped-overflow ids still occupy slots, so only a lower bound.
    live_ = 0;
    (void)n_total;
    num_shards_ = num_shards;
    shard_cap_ = shard_cap;
    out_unique_ = out_unique;
    out_counts_ = out_shard_counts;
    for (int32_t s = 0; s < num_shards; ++s) out_counts_[s] = 0;
    std::fill(out_unique, out_unique + (int64_t)num_shards * shard_cap,
              kPadFid);
    occurrence_ = out_occurrence;
    if (occurrence_)
      std::fill(occurrence_, occurrence_ + (int64_t)num_shards * shard_cap, 0);
    overflow_ = 0;
  }

  template <typename IdxT>
  void AddStream(const int64_t* values, int64_t n, IdxT* out_index) {
    constexpr int64_t kPrefetch = 8;  // hide DRAM latency of random probes
    uint64_t mask = scratch_size_ - 1;
    for (int64_t i = 0; i < n; ++i) {
      if (i + kPrefetch < n) {
        int64_t pf = values[i + kPrefetch];
        if (pf != kPadFid)
          __builtin_prefetch(&slots_[mix64((uint64_t)pf) & mask], 0, 1);
      }
      int64_t fid = values[i];
      if (fid == kPadFid) { out_index[i] = (IdxT)-1; continue; }
      uint64_t h = mix64((uint64_t)fid);
      uint64_t pos = h & mask;
      for (;;) {
        Slot& s = slots_[pos];
        if (s.stamp != epoch_) {  // fresh slot this epoch
          // grow at 50% LIVE load (only checked on insert), preserving this
          // epoch's entries via rehash; then re-probe this fid
          if ((live_ + 1) * 2 > (int64_t)scratch_size_) {
            Rehash(scratch_size_ * 2);
            mask = scratch_size_ - 1;
            pos = h & mask;
            continue;
          }
          s.stamp = epoch_;
          s.key = fid;
          ++live_;
          int32_t shard = (int32_t)(h % (uint64_t)num_shards_);
          int32_t c = out_counts_[shard];
          if (c >= shard_cap_) {  // bucket overflow: drop id this step
            s.val = -1;
            ++overflow_;
          } else {
            int32_t idx = shard * (int32_t)shard_cap_ + c;
            out_unique_[idx] = fid;
            out_counts_[shard] = c + 1;
            s.val = idx;
          }
          out_index[i] = (IdxT)s.val;
          if (occurrence_ && s.val >= 0) ++occurrence_[s.val];
          break;
        }
        if (s.key == fid) {
          out_index[i] = (IdxT)s.val;
          if (occurrence_ && s.val >= 0) ++occurrence_[s.val];
          break;
        }
        pos = (pos + 1) & mask;
      }
    }
  }

  int64_t overflow() const { return overflow_; }

  // --- two-level dedup (stream-local scratch + global merge) ------------
  //
  // AddStream probes the GLOBAL scratch once per position; at dozens of
  // slots that is ~500k random probes into a multi-MB table — cache-miss
  // bound (~35 ns each, the dominant host cost of the merged-table wire
  // prepare, PERF.md). A single stream has few uniques (a scalar slot is
  // one fid per example), so dedup it against a tiny stream-LOCAL scratch
  // (L1/L2-resident probes), then touch the global table only once per
  // LOCAL UNIQUE and rewrite the just-written int16 indices through a
  // local->global remap (sequential pass). Order and semantics match
  // AddStream exactly: local idx order is first-occurrence order, merge
  // happens immediately after the stream, so global first-occurrence
  // order — and with it unique_cap overflow behavior — is unchanged.
  //
  // Requires n <= 32767 so local indices fit the int16 wire field.
  void LocalAddStream(const int64_t* values, int64_t n, int16_t* out_index) {
    ++lepoch_;
    if (lepoch_ == 0) {
      for (Slot& s : lslots_) s.stamp = 0;
      lepoch_ = 1;
    }
    lunique_.clear();
    locc_.clear();
    uint64_t mask = lsize_ - 1;
    constexpr int64_t kPrefetch = 8;
    for (int64_t i = 0; i < n; ++i) {
      if (i + kPrefetch < n) {
        int64_t pf = values[i + kPrefetch];
        if (pf != kPadFid)
          __builtin_prefetch(&lslots_[mix64((uint64_t)pf) & mask], 0, 1);
      }
      int64_t fid = values[i];
      if (fid == kPadFid) { out_index[i] = (int16_t)-1; continue; }
      uint64_t h = mix64((uint64_t)fid);
      uint64_t pos = h & mask;
      for (;;) {
        Slot& s = lslots_[pos];
        if (s.stamp != lepoch_) {
          if ((int64_t)(lunique_.size() + 1) * 2 > (int64_t)lsize_) {
            RehashLocal(lsize_ * 2);
            mask = lsize_ - 1;
            pos = h & mask;
            continue;
          }
          s.stamp = lepoch_;
          s.key = fid;
          s.val = (int32_t)lunique_.size();
          lunique_.push_back(fid);
          locc_.push_back(1);
          out_index[i] = (int16_t)s.val;
          break;
        }
        if (s.key == fid) {
          out_index[i] = (int16_t)s.val;
          ++locc_[s.val];
          break;
        }
        pos = (pos + 1) & mask;
      }
    }
    // merge local uniques into the global table (one probe per UNIQUE),
    // carrying batch occurrence counts; remap[l] = global idx or -1
    int64_t nu = (int64_t)lunique_.size();
    lremap_.resize(nu);
    mask = scratch_size_ - 1;
    for (int64_t l = 0; l < nu; ++l) {
      if (l + kPrefetch < nu)
        __builtin_prefetch(
            &slots_[mix64((uint64_t)lunique_[l + kPrefetch]) & mask], 0, 1);
      int64_t fid = lunique_[l];
      uint64_t h = mix64((uint64_t)fid);
      uint64_t pos = h & mask;
      for (;;) {
        Slot& s = slots_[pos];
        if (s.stamp != epoch_) {
          if ((live_ + 1) * 2 > (int64_t)scratch_size_) {
            Rehash(scratch_size_ * 2);
            mask = scratch_size_ - 1;
            pos = h & mask;
            continue;
          }
          s.stamp = epoch_;
          s.key = fid;
          ++live_;
          int32_t shard = (int32_t)(h % (uint64_t)num_shards_);
          int32_t c = out_counts_[shard];
          if (c >= shard_cap_) {
            s.val = -1;
            ++overflow_;
          } else {
            int32_t idx = shard * (int32_t)shard_cap_ + c;
            out_unique_[idx] = fid;
            out_counts_[shard] = c + 1;
            s.val = idx;
          }
          break;
        }
        if (s.key == fid) break;
        pos = (pos + 1) & mask;
      }
      int32_t g = slots_[pos].val;
      lremap_[l] = g;
      if (occurrence_ && g >= 0) occurrence_[g] += locc_[l];
    }
    // rewrite int16 indices local -> global (sequential; remap is L1-hot)
    const int32_t* remap = lremap_.data();
    for (int64_t i = 0; i < n; ++i) {
      int16_t v = out_index[i];
      if (v < 0) continue;  // pad
      int32_t g = remap[v];
      out_index[i] = (int16_t)(g < 0 ? -1 : g);  // wire decodes unsigned
    }
  }

  // One-shot variant (original API, int32 indices).
  int64_t Dedup(const int64_t* values, int64_t n, int32_t num_shards,
                int64_t shard_cap, int64_t* out_unique, int32_t* out_index,
                int32_t* out_shard_counts,
                int32_t* out_occurrence = nullptr) {
    Begin(n, num_shards, shard_cap, out_unique, out_shard_counts,
          out_occurrence);
    AddStream<int32_t>(values, n, out_index);
    return overflow_;
  }

  std::vector<int64_t>& unique_scratch(int64_t n) {
    if ((int64_t)unique_scratch_.size() < n) unique_scratch_.resize(n);
    return unique_scratch_;
  }

  std::vector<int32_t>& occurrence_scratch(int64_t n) {
    if ((int64_t)occurrence_scratch_.size() < n) occurrence_scratch_.resize(n);
    return occurrence_scratch_;
  }

  // Guards the epoch-stamped scratch: JAX async dispatch can have two
  // in-flight steps invoke the same host callback concurrently (the
  // multi-host io_callback path), and the pool runs tables on worker
  // threads — an unlocked Begin/AddStream interleave would corrupt the
  // dedup state silently. Uncontended lock cost is negligible vs the scan.
  std::mutex& mu() { return mu_; }

 private:
  std::mutex mu_;
  struct Slot {        // 16 bytes: one probe touches one cache line half
    int64_t key;
    int32_t val;
    uint32_t stamp;
  };

  // Grow mid-epoch, rehashing the current epoch's live entries (older
  // epochs' slots are garbage and dropped; zero-stamps read as stale since
  // epoch_ >= 1).
  void Rehash(uint64_t new_size) {
    std::vector<Slot> old;
    old.swap(slots_);
    scratch_size_ = new_size;
    slots_.assign(scratch_size_, Slot{kPadFid, -1, 0});
    const uint64_t mask = scratch_size_ - 1;
    for (const Slot& s : old) {
      if (s.stamp != epoch_) continue;
      uint64_t pos = mix64((uint64_t)s.key) & mask;
      while (slots_[pos].stamp == epoch_) pos = (pos + 1) & mask;
      slots_[pos] = s;
    }
  }

  void RehashLocal(uint64_t new_size) {
    std::vector<Slot> old;
    old.swap(lslots_);
    lsize_ = new_size;
    lslots_.assign(lsize_, Slot{kPadFid, -1, 0});
    const uint64_t mask = lsize_ - 1;
    for (const Slot& s : old) {
      if (s.stamp != lepoch_) continue;
      uint64_t pos = mix64((uint64_t)s.key) & mask;
      while (lslots_[pos].stamp == lepoch_) pos = (pos + 1) & mask;
      lslots_[pos] = s;
    }
  }

  uint64_t scratch_size_;
  uint32_t epoch_;
  int32_t num_shards_ = 1;
  int64_t shard_cap_ = 0;
  int64_t live_ = 0;
  int64_t overflow_ = 0;
  int64_t* out_unique_ = nullptr;
  int32_t* out_counts_ = nullptr;
  int32_t* occurrence_ = nullptr;
  std::vector<Slot> slots_;
  std::vector<int64_t> unique_scratch_;
  std::vector<int32_t> occurrence_scratch_;
  // stream-local dedup scratch (LocalAddStream); starts tiny, grows to the
  // largest per-stream unique count seen and stays L1/L2-resident
  uint64_t lsize_ = 1024;
  uint32_t lepoch_ = 0;
  std::vector<Slot> lslots_ = std::vector<Slot>(1024, Slot{kPadFid, -1, 0});
  std::vector<int64_t> lunique_;
  std::vector<int32_t> locc_;
  std::vector<int32_t> lremap_;
};

// Single-table prepare body, shared by the one-call and multi-table C
// entries. Locks the batcher for the whole pass (see Batcher::mu()).
int64_t PrepareWireOne(Batcher* b, void* store, const int64_t* const* streams,
                       const int64_t* sizes, int32_t n_streams, uint32_t ts,
                       int64_t unique_cap, int64_t new_cap,
                       int32_t record_touch, int32_t* wire, int64_t* stats) {
  std::lock_guard<std::mutex> g(b->mu());
  int64_t n_total = 0;
  for (int32_t i = 0; i < n_streams; ++i) n_total += sizes[i];

  std::vector<int64_t>& unique = b->unique_scratch(unique_cap);
  std::vector<int32_t>& occ = b->occurrence_scratch(unique_cap);
  int32_t count = 0;
  b->Begin(n_total, /*num_shards=*/1, unique_cap, unique.data(), &count,
           occ.data());

  // MT_TWO_LEVEL=0 disables the stream-local dedup (A/B instrumentation)
  static const bool two_level = [] {
    const char* e = getenv("MT_TWO_LEVEL");
    return !e || e[0] != '0';
  }();
  int64_t off = unique_cap;  // wire word offset past the rows block
  for (int32_t i = 0; i < n_streams; ++i) {
    int16_t* idx16 = reinterpret_cast<int16_t*>(wire + off);
    if (two_level && sizes[i] <= 32767) {
      // two-level: local L1-resident dedup + one global probe per UNIQUE
      // (vs per position) — the dominant host cost at dozens of slots
      b->LocalAddStream(streams[i], sizes[i], idx16);
    } else {
      // long streams (sequence features) can exceed int16 local indices;
      // their unique set is global-sized anyway, so probe globally
      b->AddStream<int16_t>(streams[i], sizes[i], idx16);
    }
    if (sizes[i] & 1) idx16[sizes[i]] = -1;  // pad odd tail
    off += (sizes[i] + 1) / 2;
  }

  // Map the unique fids through the store, writing rows straight into the
  // wire head; stamp bit 30 on newly-admitted positions.
  std::fill(wire, wire + unique_cap, -1);
  thread_local std::vector<int32_t> new_rows, new_pos;
  thread_local std::vector<int64_t> new_fids;
  if ((int64_t)new_rows.size() < new_cap) {
    new_rows.resize(new_cap);
    new_pos.resize(new_cap);
    new_fids.resize(new_cap);
  }
  int64_t n_new = 0;
  mt_store_map_train_pos2(store, unique.data(), count, ts, occ.data(), wire,
                          new_rows.data(), new_fids.data(), new_pos.data(),
                          new_cap, &n_new, record_touch);
  int64_t n_marked = n_new < new_cap ? n_new : new_cap;
  for (int64_t i = 0; i < n_marked; ++i) wire[new_pos[i]] |= (1 << 30);

  int64_t filtered = 0;
  for (int64_t i = 0; i < count; ++i)
    if (wire[i] == -1) ++filtered;

  stats[0] = b->overflow();
  stats[1] = n_marked;  // admissions (the store caps these at new_cap)
  stats[2] = count;
  // budget-rejected ids also read -1 rows; keep the two counters disjoint
  stats[4] = n_new - n_marked;  // rejected: admission budget exhausted
  stats[3] = filtered - stats[4];
  return off;
}

}  // namespace

extern "C" {

void* mt_batcher_new(int64_t expected_unique) {
  return new Batcher(expected_unique);
}

void mt_batcher_free(void* b) { delete static_cast<Batcher*>(b); }

int64_t mt_batcher_dedup(void* b, const int64_t* values, int64_t n,
                         int32_t num_shards, int64_t shard_cap,
                         int64_t* out_unique, int32_t* out_index,
                         int32_t* out_shard_counts) {
  Batcher* bb = static_cast<Batcher*>(b);
  std::lock_guard<std::mutex> g(bb->mu());
  return bb->Dedup(values, n, num_shards, shard_cap, out_unique, out_index,
                   out_shard_counts);
}

// Dedup that also emits per-unique batch occurrence counts.
int64_t mt_batcher_dedup2(void* b, const int64_t* values, int64_t n,
                          int32_t num_shards, int64_t shard_cap,
                          int64_t* out_unique, int32_t* out_index,
                          int32_t* out_shard_counts,
                          int32_t* out_occurrence) {
  Batcher* bb = static_cast<Batcher*>(b);
  std::lock_guard<std::mutex> g(bb->mu());
  return bb->Dedup(values, n, num_shards, shard_cap, out_unique, out_index,
                   out_shard_counts, out_occurrence);
}

// Shard-of-fid helper so Python-side tests can cross-check bucketing.
int32_t mt_shard_of(int64_t fid, int32_t num_shards) {
  return (int32_t)(mix64((uint64_t)fid) % (uint64_t)num_shards);
}

// Fused single-shard host prepare (engine.prepare_wire): dedup all feature
// streams, map unique fids through the store (admission + row alloc), and
// emit the packed wire buffer in one pass:
//   wire[0:U)            int32 rows; -1 invalid; bit 30 set on new rows
//   then per stream      ceil(n_i/2) int32 words of int16 indices into the
//                        unique list (-1 pad), odd tails padded with -1
// stats out: [overflow, new_count, unique_count, filtered_count,
//             new_rejected] — new_rejected counts ids that passed admission
// but exceeded the per-step new_cap budget (rejected this step, retried on
// the next; see Store::MapForTraining).
// Returns total wire words written.
int64_t mt_prepare_wire(void* batcher, void* store,
                        const int64_t* const* streams, const int64_t* sizes,
                        int32_t n_streams, uint32_t ts, int64_t unique_cap,
                        int64_t new_cap, int32_t record_touch, int32_t* wire,
                        int64_t* stats) {
  return PrepareWireOne(static_cast<Batcher*>(batcher), store, streams, sizes,
                        n_streams, ts, unique_cap, new_cap, record_touch,
                        wire, stats);
}

// Multi-table fused prepare: ONE native call per step covering ALL tables,
// each table's (dedup + store map + wire pack) running as one task on the
// global host thread pool (ref: ShardingSparseFidsOp parallel parse,
// data/kernels/parse_sparse_feature.h:42 + runtime/concurrency/thread_pool).
// Tables share no mutable state (one Batcher + Store per table; stores have
// their own mutexes), so this is embarrassingly parallel.
//   batchers/stores:  [n_tables] handles
//   streams/sizes:    flattened per-table feature streams
//   stream_offsets:   [n_tables+1] table t owns streams[so[t]..so[t+1])
//   wire_offsets:     [n_tables+1] word offsets of each table's wire region
//   unique_caps/new_caps: [n_tables] per-table step capacities (dozens-of-
//                     slots models size a history table differently from
//                     scalar slots)
//   stats:            [n_tables * 5], layout as mt_prepare_wire
// Returns total wire words (== wire_offsets[n_tables]).
int64_t mt_prepare_wire_multi(int32_t n_tables, void** batchers, void** stores,
                              const int64_t* const* streams,
                              const int64_t* sizes,
                              const int64_t* stream_offsets,
                              const int64_t* wire_offsets, uint32_t ts,
                              const int64_t* unique_caps,
                              const int64_t* new_caps,
                              int32_t record_touch, int32_t* wire,
                              int64_t* stats) {
  ThreadPool::Global().ParallelFor(n_tables, [&](int64_t t) {
    int64_t s0 = stream_offsets[t];
    PrepareWireOne(static_cast<Batcher*>(batchers[t]), stores[t], streams + s0,
                   sizes + s0, (int32_t)(stream_offsets[t + 1] - s0), ts,
                   unique_caps[t], new_caps[t], record_touch,
                   wire + wire_offsets[t], stats + t * 5);
  });
  return wire_offsets[n_tables];
}

// How many worker threads the host pool runs (0 = everything inline).
int32_t mt_host_threads() { return ThreadPool::Global().size(); }

}  // extern "C"
