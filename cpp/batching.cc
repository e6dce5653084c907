// Batch dedup + shard bucketing, the host half of the embedding step.
//
// TPU-native rebuild of ref ShardingSparseFidsOp
// (data/kernels/parse_sparse_feature.h:42) + fused_reorder_by_indices
// (runtime/ops/fused_reorder_by_indices.cc): given the flat fid stream of a
// batch for ONE merged table, emit
//   - a [num_shards, shard_cap] buffer of unique fids grouped by shard
//     (shard = mix64(fid) % num_shards), padded with kPad,
//   - for every input position, an int32 index into that flattened buffer
//     (-1 for padding / dropped-overflow ids),
//   - per-shard unique counts.
// The device step then gathers rows per shard, all_to_alls embeddings, and
// gathers per-position with mode='fill' so -1 indices yield zeros.
//
// A Batcher object owns reusable scratch so the hot path is allocation-free.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

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
    keys_.assign(scratch_size_, kPadFid);
    vals_.assign(scratch_size_, -1);
    stamp_.assign(scratch_size_, 0);
    epoch_ = 0;
  }

  // Returns number of overflowed (dropped) unique ids.
  int64_t Dedup(const int64_t* values, int64_t n, int32_t num_shards,
                int64_t shard_cap, int64_t* out_unique, int32_t* out_index,
                int32_t* out_shard_counts) {
    // epoch trick: stamping avoids clearing the scratch map every step
    ++epoch_;
    if (epoch_ == 0) {  // wrapped: hard reset
      std::fill(stamp_.begin(), stamp_.end(), 0);
      epoch_ = 1;
    }
    // ensure scratch is large enough (load factor <= 0.5)
    if ((uint64_t)n * 2 > scratch_size_) Grow((uint64_t)n * 2);

    for (int32_t s = 0; s < num_shards; ++s) out_shard_counts[s] = 0;
    std::fill(out_unique, out_unique + (int64_t)num_shards * shard_cap, kPadFid);

    const uint64_t mask = scratch_size_ - 1;
    int64_t overflow = 0;
    for (int64_t i = 0; i < n; ++i) {
      int64_t fid = values[i];
      if (fid == kPadFid) { out_index[i] = -1; continue; }
      uint64_t h = mix64((uint64_t)fid);
      uint64_t pos = h & mask;
      for (;;) {
        if (stamp_[pos] != epoch_) {  // fresh slot this epoch
          stamp_[pos] = epoch_;
          keys_[pos] = fid;
          int32_t shard = (int32_t)(h % (uint64_t)num_shards);
          int32_t c = out_shard_counts[shard];
          if (c >= shard_cap) {  // bucket overflow: drop id this step
            vals_[pos] = -1;
            ++overflow;
          } else {
            int32_t idx = shard * (int32_t)shard_cap + c;
            out_unique[idx] = fid;
            out_shard_counts[shard] = c + 1;
            vals_[pos] = idx;
          }
          out_index[i] = vals_[pos];
          break;
        }
        if (keys_[pos] == fid) {
          out_index[i] = vals_[pos];
          break;
        }
        pos = (pos + 1) & mask;
      }
    }
    return overflow;
  }

 private:
  void Grow(uint64_t need) {
    while (scratch_size_ < need) scratch_size_ <<= 1;
    keys_.assign(scratch_size_, kPadFid);
    vals_.assign(scratch_size_, -1);
    // keep epoch_ (>= 1) so cleared zero-stamps read as fresh even when Grow
    // runs mid-Dedup
    stamp_.assign(scratch_size_, 0);
  }

  uint64_t scratch_size_;
  uint64_t epoch_;
  std::vector<int64_t> keys_;
  std::vector<int32_t> vals_;
  std::vector<uint64_t> stamp_;
};

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
  return static_cast<Batcher*>(b)->Dedup(values, n, num_shards, shard_cap,
                                         out_unique, out_index,
                                         out_shard_counts);
}

// Shard-of-fid helper so Python-side tests can cross-check bucketing.
int32_t mt_shard_of(int64_t fid, int32_t num_shards) {
  return (int32_t)(mix64((uint64_t)fid) % (uint64_t)num_shards);
}

}  // extern "C"
