// Two-level dedup for bucketed all-to-all embedding exchange.
//
// Extends batching.cc for the sharded trainer's a2a path (ref
// distributed_ps_sync.py:95: per-worker dedup + per-destination bucketing,
// ShardingSparseFidsOp): the flat fid stream is split into `num_batch_shards`
// contiguous groups (one per device's batch shard). Outputs:
//   - per TABLE shard s: the global unique fid list across all batch shards
//     (rows for the host store), [S, global_cap], padded -1
//   - per (table shard s, batch shard d): a bucket of positions into shard
//     s's global unique list — the ids batch shard d needs from s,
//     [S, D, bucket_cap], padded -1
//   - per input position: an index into its batch shard's local receive
//     buffer [S * bucket_cap] (-1 for padding/overflow)
// The device step gathers per-bucket embeddings, all_to_alls them, and pools
// with the per-position indices; gradients reverse through the same maps.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

inline uint64_t mix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ULL;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
  return x ^ (x >> 31);
}

constexpr int64_t kPad = -1;

struct Map {
  // epoch-stamped open-addressing scratch map fid -> value
  std::vector<int64_t> keys;
  std::vector<int64_t> vals;
  std::vector<uint64_t> stamp;
  uint64_t size = 0, mask = 0, epoch = 0;

  void Ensure(uint64_t need) {
    uint64_t want = 1024;
    while (want < need * 2) want <<= 1;
    if (want <= size) return;
    size = want;
    mask = size - 1;
    keys.assign(size, kPad);
    vals.assign(size, -1);
    stamp.assign(size, 0);
  }

  void NewEpoch() {
    if (++epoch == 0) {
      std::fill(stamp.begin(), stamp.end(), 0);
      epoch = 1;
    }
  }

  // returns pointer to value slot; *fresh set if newly inserted this epoch
  int64_t* FindOrInsert(int64_t fid, uint64_t h, bool* fresh) {
    uint64_t pos = h & mask;
    for (;;) {
      if (stamp[pos] != epoch) {
        stamp[pos] = epoch;
        keys[pos] = fid;
        vals[pos] = -1;
        *fresh = true;
        return &vals[pos];
      }
      if (keys[pos] == fid) {
        *fresh = false;
        return &vals[pos];
      }
      pos = (pos + 1) & mask;
    }
  }
};

class Batcher2D {
 public:
  explicit Batcher2D(int64_t expected_unique) {
    global_.Ensure((uint64_t)expected_unique);
    bucket_.Ensure((uint64_t)expected_unique);
  }

  // Guards the epoch-stamped scratch against concurrent callers (async
  // dispatch can overlap two in-flight steps' host callbacks).
  std::mutex& mu() { return mu_; }

  // `out_occurrence` (optional, [S, global_cap] aligned with out_unique):
  // per-unique batch occurrence counts across ALL batch shards — consumed
  // by the count-proportional admission filters (ref ShouldBeFiltered's
  // count arg, probabilistic_filter.h:48) so frequency filtering behaves
  // identically on the bucketed-a2a path and the single-shard path.
  int64_t Dedup(const int64_t* values, int64_t n, int32_t num_batch_shards,
                int32_t num_shards, int64_t global_cap, int64_t bucket_cap,
                int64_t* out_unique, int32_t* out_counts,
                int32_t* out_bucket_idx, int32_t* out_bucket_counts,
                int32_t* out_index, int32_t* out_occurrence = nullptr) {
    const int32_t S = num_shards, D = num_batch_shards;
    global_.Ensure((uint64_t)n);
    bucket_.Ensure((uint64_t)n / std::max(D, 1) + 16);
    global_.NewEpoch();

    std::fill(out_unique, out_unique + (int64_t)S * global_cap, kPad);
    std::fill(out_counts, out_counts + S, 0);
    std::fill(out_bucket_idx, out_bucket_idx + (int64_t)S * D * bucket_cap, -1);
    std::fill(out_bucket_counts, out_bucket_counts + (int64_t)S * D, 0);
    if (out_occurrence)
      std::fill(out_occurrence, out_occurrence + (int64_t)S * global_cap, 0);

    const int64_t per_shard = n / D;
    int64_t overflow = 0;
    for (int32_t d = 0; d < D; ++d) {
      bucket_.NewEpoch();
      const int64_t* vs = values + (int64_t)d * per_shard;
      int32_t* idx_out = out_index + (int64_t)d * per_shard;
      for (int64_t i = 0; i < per_shard; ++i) {
        int64_t fid = vs[i];
        if (fid == kPad) { idx_out[i] = -1; continue; }
        uint64_t h = mix64((uint64_t)fid);
        int32_t s = (int32_t)(h % (uint64_t)S);

        bool fresh_b;
        int64_t* bslot = bucket_.FindOrInsert(fid, h, &fresh_b);
        if (!fresh_b) {  // bucket position already assigned for this d
          if (*bslot == -1) { idx_out[i] = -1; continue; }  // global overflow
          if (*bslot < -1) {
            // bucket-dropped but globally assigned (-(gj+2)): the id may be
            // delivered from other batch shards, so its occurrences here
            // still count toward admission (ref semantics: counts are ALL
            // batch occurrences, embedding_hash_table_tf_bridge.cc:183)
            if (out_occurrence)
              ++out_occurrence[(int64_t)s * global_cap + (-*bslot - 2)];
            idx_out[i] = -1;
            continue;
          }
          // bslot packs (global unique slot gj << 32) | recv-buffer index
          idx_out[i] = (int32_t)(*bslot & 0xFFFFFFFF);
          if (out_occurrence)
            ++out_occurrence[(int64_t)s * global_cap + (*bslot >> 32)];
          continue;
        }
        // need a global position for (s, fid)
        bool fresh_g;
        int64_t* gslot = global_.FindOrInsert(fid, h, &fresh_g);
        if (fresh_g) {
          int32_t c = out_counts[s];
          if (c >= global_cap) {
            *gslot = -1;
            ++overflow;
          } else {
            out_unique[(int64_t)s * global_cap + c] = fid;
            out_counts[s] = c + 1;
            *gslot = ((int64_t)s << 32) | (uint32_t)c;
          }
        }
        if (*gslot < 0) {  // globally overflowed
          *bslot = -1;
          idx_out[i] = -1;
          continue;
        }
        int32_t gj = (int32_t)(*gslot & 0xFFFFFFFF);
        if (out_occurrence)
          ++out_occurrence[(int64_t)s * global_cap + gj];
        int32_t bc = out_bucket_counts[(int64_t)s * D + d];
        if (bc >= bucket_cap) {  // bucket overflow: drop for this batch shard
          *bslot = -((int64_t)gj + 2);  // keep gj so repeats still count
          idx_out[i] = -1;
          ++overflow;
          continue;
        }
        out_bucket_idx[((int64_t)s * D + d) * bucket_cap + bc] = gj;
        out_bucket_counts[(int64_t)s * D + d] = bc + 1;
        int64_t local = (int64_t)s * bucket_cap + bc;  // recv-buffer index
        *bslot = ((int64_t)gj << 32) | (uint32_t)local;
        idx_out[i] = (int32_t)local;
      }
    }
    return overflow;
  }

 private:
  std::mutex mu_;
  Map global_, bucket_;
};

}  // namespace

extern "C" {

void* mt_batcher2d_new(int64_t expected_unique) {
  return new Batcher2D(expected_unique);
}

void mt_batcher2d_free(void* b) { delete static_cast<Batcher2D*>(b); }

int64_t mt_batcher2d_dedup(void* b, const int64_t* values, int64_t n,
                           int32_t num_batch_shards, int32_t num_shards,
                           int64_t global_cap, int64_t bucket_cap,
                           int64_t* out_unique, int32_t* out_counts,
                           int32_t* out_bucket_idx, int32_t* out_bucket_counts,
                           int32_t* out_index) {
  Batcher2D* bb = static_cast<Batcher2D*>(b);
  std::lock_guard<std::mutex> g(bb->mu());
  return bb->Dedup(values, n, num_batch_shards, num_shards, global_cap,
                   bucket_cap, out_unique, out_counts, out_bucket_idx,
                   out_bucket_counts, out_index);
}

// Dedup that also emits per-unique batch occurrence counts (see
// Batcher2D::Dedup's out_occurrence).
int64_t mt_batcher2d_dedup2(void* b, const int64_t* values, int64_t n,
                            int32_t num_batch_shards, int32_t num_shards,
                            int64_t global_cap, int64_t bucket_cap,
                            int64_t* out_unique, int32_t* out_counts,
                            int32_t* out_bucket_idx,
                            int32_t* out_bucket_counts,
                            int32_t* out_index, int32_t* out_occurrence) {
  Batcher2D* bb = static_cast<Batcher2D*>(b);
  std::lock_guard<std::mutex> g(bb->mu());
  return bb->Dedup(values, n, num_batch_shards, num_shards, global_cap,
                   bucket_cap, out_unique, out_counts, out_bucket_idx,
                   out_bucket_counts, out_index, out_occurrence);
}

}  // extern "C"
