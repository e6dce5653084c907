// monolith_tpu host-side sparse core.
//
// TPU-native rebuild of the reference's host sparse machinery
// (bytedance/monolith):
//   - collisionless fid -> row map          (ref: runtime/hash_table/cuckoohash/*,
//                                            embedding_hash_table_interface.h:34)
//   - frequency admission filters           (ref: runtime/hash_filter/sliding_hash_filter.h:26,
//                                            probabilistic_filter.h:25)
//   - expiry-based eviction                 (ref: cuckoo_embedding_hash_table.cc Evict)
//   - touched-key set for online param sync (ref: runtime/hopscotch/hopscotch_hash_set.h:52)
//
// Design difference vs reference: embedding rows live in TPU HBM as fixed
// capacity row pools, so the host map stores only (fid -> row index, ts,
// count) and hands the device a dense int32 row vector per step. All float
// math (init, optimize) happens on-device; this file is pure bookkeeping and
// must be allocation-free on the hot path.
//
// Exposed as a C ABI for ctypes (pybind11 is not available in this image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <memory>
#include <mutex>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Hashing
// ---------------------------------------------------------------------------

inline uint64_t mix64(uint64_t x) {
  // splitmix64 finalizer: cheap, well distributed.
  x += 0x9e3779b97f4a7c15ULL;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
  return x ^ (x >> 31);
}

// xorshift128+ rng for the probabilistic filter
// (ref: runtime/concurrency/xorshift.h).
struct XorShift {
  uint64_t s0 = 0x123456789abcdefULL, s1 = 0xfedcba987654321ULL;
  inline uint64_t next() {
    uint64_t x = s0;
    const uint64_t y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  // uniform in [0,1)
  inline double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

// ---------------------------------------------------------------------------
// Sliding hash filter: ring of count-min splits with 4-bit counters.
// Mirrors the semantics of ref runtime/hash_filter/sliding_hash_filter.h:26
// (HashFilter<uint16> splits, count_bit=4): an approximate sliding window of
// per-fid occurrence counts. An id is admitted once its estimated occurrence
// count reaches `threshold`.
// ---------------------------------------------------------------------------

class SlidingHashFilter {
 public:
  SlidingHashFilter(int64_t capacity_per_split, int num_splits)
      : num_splits_(std::max(2, num_splits)),
        split_counters_(std::max(2, num_splits)),
        split_fill_(std::max(2, num_splits), 0) {
    // 4-bit counters, 2 per byte. round capacity up to a power of two.
    n_counters_ = 64;
    while (n_counters_ < (uint64_t)capacity_per_split) n_counters_ <<= 1;
    mask_ = n_counters_ - 1;
    for (auto& s : split_counters_) s.assign(n_counters_ / 2, 0);
    max_fill_per_split_ = n_counters_ / 2;  // rotate at 50% nonzero fill
  }

  static constexpr int kProbes = 3;
  static constexpr uint32_t kMaxCount = 15;  // 4-bit saturation

  // Add `count` occurrences of fid; return estimated total occurrences across
  // the sliding window AFTER the add.
  uint32_t AddAndEstimate(int64_t fid, uint32_t count) {
    uint64_t h = mix64((uint64_t)fid);
    uint64_t idx[kProbes];
    for (int p = 0; p < kProbes; ++p) {
      idx[p] = (h >> (p * 21)) & mask_;
    }
    // conservative count-min increment on the head split
    auto& head = split_counters_[head_];
    uint32_t cur = kMaxCount;
    for (int p = 0; p < kProbes; ++p) cur = std::min(cur, Get(head, idx[p]));
    uint32_t target = std::min(cur + count, kMaxCount);
    for (int p = 0; p < kProbes; ++p) {
      uint32_t v = Get(head, idx[p]);
      if (v < target) {
        if (v == 0) ++split_fill_[head_];
        Set(head, idx[p], target);
      }
    }
    if (split_fill_[head_] >= max_fill_per_split_) Rotate();
    // estimate = sum of per-split count-min estimates
    uint32_t total = 0;
    for (int s = 0; s < num_splits_; ++s) {
      auto& sp = split_counters_[s];
      uint32_t mn = kMaxCount;
      for (int p = 0; p < kProbes; ++p) mn = std::min(mn, Get(sp, idx[p]));
      total += mn;
    }
    return total;
  }

  uint32_t Estimate(int64_t fid) const {
    uint64_t h = mix64((uint64_t)fid);
    uint32_t total = 0;
    for (int s = 0; s < num_splits_; ++s) {
      const auto& sp = split_counters_[s];
      uint32_t mn = kMaxCount;
      for (int p = 0; p < kProbes; ++p) {
        uint64_t i = (h >> (p * 21)) & mask_;
        mn = std::min(mn, Get(sp, i));
      }
      total += mn;
    }
    return total;
  }

  // serialization: raw counter bytes per split + head index
  size_t ByteSize() const {
    return sizeof(int32_t) * 2 + num_splits_ * (n_counters_ / 2 + sizeof(int64_t));
  }
  size_t Save(uint8_t* out) const {
    uint8_t* p = out;
    int32_t ns = num_splits_, hd = head_;
    memcpy(p, &ns, 4); p += 4;
    memcpy(p, &hd, 4); p += 4;
    for (int s = 0; s < num_splits_; ++s) {
      int64_t fill = split_fill_[s];
      memcpy(p, &fill, 8); p += 8;
      memcpy(p, split_counters_[s].data(), n_counters_ / 2);
      p += n_counters_ / 2;
    }
    return p - out;
  }
  bool Restore(const uint8_t* in, size_t len) {
    if (len < 8) return false;
    int32_t ns, hd;
    memcpy(&ns, in, 4);
    memcpy(&hd, in + 4, 4);
    if (ns != num_splits_) return false;
    const uint8_t* p = in + 8;
    if (len != ByteSize()) return false;
    head_ = hd;
    for (int s = 0; s < num_splits_; ++s) {
      int64_t fill;
      memcpy(&fill, p, 8); p += 8;
      split_fill_[s] = fill;
      memcpy(split_counters_[s].data(), p, n_counters_ / 2);
      p += n_counters_ / 2;
    }
    return true;
  }

 private:
  static inline uint32_t Get(const std::vector<uint8_t>& v, uint64_t i) {
    uint8_t b = v[i >> 1];
    return (i & 1) ? (b >> 4) : (b & 0xF);
  }
  static inline void Set(std::vector<uint8_t>& v, uint64_t i, uint32_t val) {
    uint8_t& b = v[i >> 1];
    if (i & 1) b = (uint8_t)((b & 0x0F) | (val << 4));
    else b = (uint8_t)((b & 0xF0) | val);
  }
  void Rotate() {
    head_ = (head_ + 1) % num_splits_;
    std::fill(split_counters_[head_].begin(), split_counters_[head_].end(), 0);
    split_fill_[head_] = 0;
  }

  int num_splits_;
  int head_ = 0;
  uint64_t n_counters_ = 0, mask_ = 0;
  int64_t max_fill_per_split_ = 0;
  std::vector<std::vector<uint8_t>> split_counters_;
  std::vector<int64_t> split_fill_;
};

// ---------------------------------------------------------------------------
// Store: open-addressing collisionless fid -> row map + row free list +
// admission + eviction + touched-key set.
// ---------------------------------------------------------------------------

struct Slot {
  int64_t fid;     // kEmpty if free, kTombstone if deleted
  uint32_t row;
  uint32_t ts;     // seconds
  uint32_t count;  // occurrences seen (saturating)
  uint32_t pad;
};

constexpr int64_t kEmpty = INT64_MIN;
constexpr int64_t kTombstone = INT64_MIN + 1;

enum FilterKind : int32_t {
  kNoFilter = 0,
  kSlidingFilter = 1,
  kProbabilisticFilter = 2,         // equal-probability mode
  kProbabilisticUnequalFilter = 3,  // admit prob proportional to count
};

class Store {
 public:
  Store(int64_t row_capacity, int32_t filter_kind, int64_t filter_capacity,
        int32_t filter_splits, int32_t admit_threshold, uint64_t seed)
      : row_capacity_(row_capacity),
        filter_kind_(filter_kind),
        admit_threshold_(std::max(1, admit_threshold)) {
    table_size_ = 64;
    while (table_size_ * 3 < (uint64_t)row_capacity * 4) table_size_ <<= 1;
    slots_.assign(table_size_, Slot{kEmpty, 0, 0, 0, 0});
    mask_ = table_size_ - 1;
    if (filter_kind_ == kSlidingFilter) {
      filter_.reset(new SlidingHashFilter(
          filter_capacity > 0 ? filter_capacity : row_capacity * 4,
          filter_splits > 0 ? filter_splits : 5));
    }
    // equal-probability per-occurrence admit chance, calibrated so that
    // after `threshold` occurrences P(admitted) = 1 - epsilon (ref
    // probabilistic_filter.cc:29-36, epsilon = 0.05)
    equal_p1_ = 1.0 - std::pow(0.05, 1.0 / (double)admit_threshold_);
    rng_.s0 ^= seed;
    rng_.s1 ^= mix64(seed + 1);
  }

  // Map fids to rows, admitting new ids subject to the filter.
  // out_rows[i] = row index, or -1 if filtered / out of capacity.
  // New ids admitted this call are appended to out_new_rows/out_new_fids
  // (up to new_cap). Once the new_cap budget is spent, further new ids are
  // REJECTED for this call (row -1, retried next step) — admitting them
  // would hand out device rows the caller never initializes, which for
  // rows recycled off the free list means inheriting stale params and
  // optimizer state (the reference cannot lose init because its C++ table
  // initializes on insert, entry_accessor.cc Init). *out_new_count returns
  // admitted + rejected, so callers read rejected = count - new_cap.
  // `record_touch`: also record fids whose rows exist (for param sync).
  void MapForTraining(const int64_t* fids, int64_t n, uint32_t ts,
                      int32_t* out_rows, int32_t* out_new_rows,
                      int64_t* out_new_fids, int64_t new_cap,
                      int64_t* out_new_count, int32_t record_touch,
                      int32_t* out_new_pos = nullptr,
                      const int32_t* counts = nullptr) {
    std::lock_guard<std::mutex> g(mu_);
    int64_t n_new = 0;
    constexpr int64_t kPrefetch = 12;  // hide DRAM latency of random probes
    for (int64_t i = 0; i < n; ++i) {
      if (i + kPrefetch < n) {
        int64_t pf = fids[i + kPrefetch];
        if (pf > kTombstone)
          __builtin_prefetch(&slots_[mix64((uint64_t)pf) & mask_], 0, 1);
      }
      int64_t fid = fids[i];
      if (fid <= kTombstone) { out_rows[i] = -1; continue; }  // reserved sentinels
      uint64_t pos;
      bool found = Find(fid, &pos);
      if (found) {
        Slot& s = slots_[pos];
        s.ts = ts;
        uint32_t add = counts ? (uint32_t)counts[i] : 1u;
        s.count = (s.count > UINT32_MAX - add) ? UINT32_MAX : s.count + add;
        out_rows[i] = (int32_t)s.row;
        if (record_touch) touched_.push_back(fid);
        continue;
      }
      // admission
      if (!Admit(fid, counts ? (int64_t)counts[i] : 1)) {
        out_rows[i] = -1;
        continue;
      }
      if (n_new >= new_cap) {  // per-call admission budget spent: reject
        out_rows[i] = -1;
        ++n_new;
        continue;
      }
      int64_t row = AllocRow();
      if (row < 0) {  // pool exhausted
        out_rows[i] = -1;
        continue;
      }
      Insert(fid, pos, (uint32_t)row, ts);
      out_rows[i] = (int32_t)row;
      out_new_rows[n_new] = (int32_t)row;
      out_new_fids[n_new] = fid;
      // compact wire format also wants the position of each new id within
      // the input fid array (strictly increasing by construction)
      if (out_new_pos) out_new_pos[n_new] = (int32_t)i;
      ++n_new;
      if (record_touch) touched_.push_back(fid);
    }
    *out_new_count = n_new;
  }

  // Read-only lookup (serving). Missing ids -> -1.
  void Lookup(const int64_t* fids, int64_t n, int32_t* out_rows) const {
    std::lock_guard<std::mutex> g(mu_);
    constexpr int64_t kPrefetch = 12;
    for (int64_t i = 0; i < n; ++i) {
      if (i + kPrefetch < n) {
        int64_t pf = fids[i + kPrefetch];
        if (pf > kTombstone)
          __builtin_prefetch(&slots_[mix64((uint64_t)pf) & mask_], 0, 1);
      }
      uint64_t pos;
      if (fids[i] > kTombstone && Find(fids[i], &pos))
        out_rows[i] = (int32_t)slots_[pos].row;
      else
        out_rows[i] = -1;
    }
  }

  // Assign: map fids to rows, unconditionally admitting (no filter), used by
  // checkpoint-restore and serving-side parameter sync.
  void MapAssign(const int64_t* fids, int64_t n, uint32_t ts,
                 int32_t* out_rows, int32_t* out_new_rows,
                 int64_t* out_new_fids, int64_t new_cap,
                 int64_t* out_new_count) {
    std::lock_guard<std::mutex> g(mu_);
    int64_t n_new = 0;
    for (int64_t i = 0; i < n; ++i) {
      int64_t fid = fids[i];
      if (fid <= kTombstone) { out_rows[i] = -1; continue; }  // reserved sentinels
      uint64_t pos;
      if (Find(fid, &pos)) {
        slots_[pos].ts = ts;
        out_rows[i] = (int32_t)slots_[pos].row;
        continue;
      }
      int64_t row = AllocRow();
      if (row < 0) { out_rows[i] = -1; continue; }
      Insert(fid, pos, (uint32_t)row, ts);
      out_rows[i] = (int32_t)row;
      if (n_new < new_cap) {
        out_new_rows[n_new] = (int32_t)row;
        out_new_fids[n_new] = fid;
      }
      ++n_new;
    }
    *out_new_count = n_new;
  }

  // Evict entries with ts < expire_before. Returns count; evicted rows are
  // written to out_rows (caller zeroes them on device) up to cap; if
  // out_fids is non-null the evicted fids are reported too (for two-tier
  // spill-to-host-archive).
  int64_t EvictExpired(uint32_t expire_before, int32_t* out_rows, int64_t cap,
                       int64_t* out_fids = nullptr) {
    std::lock_guard<std::mutex> g(mu_);
    int64_t n = 0;
    for (uint64_t i = 0; i < table_size_; ++i) {
      Slot& s = slots_[i];
      if (s.fid >= kTombstone + 1 && s.ts < expire_before) {
        if (n < cap) {
          out_rows[n] = (int32_t)s.row;
          if (out_fids) out_fids[n] = s.fid;
        }
        ++n;
        free_rows_.push_back(s.row);
        s.fid = kTombstone;
        --size_;
      }
    }
    return n;
  }

  int64_t Size() const {
    std::lock_guard<std::mutex> g(mu_);
    return size_;
  }

  // Dump all entries. Buffers must hold >= Size() elements. Returns count.
  int64_t Save(int64_t* fids, int32_t* rows, uint32_t* tss, uint32_t* counts) const {
    std::lock_guard<std::mutex> g(mu_);
    int64_t n = 0;
    for (uint64_t i = 0; i < table_size_; ++i) {
      const Slot& s = slots_[i];
      if (s.fid >= kTombstone + 1) {
        fids[n] = s.fid;
        rows[n] = (int32_t)s.row;
        tss[n] = s.ts;
        counts[n] = s.count;
        ++n;
      }
    }
    return n;
  }

  // Restore entries with their exact row indices (rows must be unique and
  // < row_capacity). Rebuilds the free list.
  bool Restore(const int64_t* fids, const int32_t* rows, const uint32_t* tss,
               const uint32_t* counts, int64_t n) {
    std::lock_guard<std::mutex> g(mu_);
    std::fill(slots_.begin(), slots_.end(), Slot{kEmpty, 0, 0, 0, 0});
    size_ = 0;
    std::vector<uint8_t> used(row_capacity_, 0);
    for (int64_t i = 0; i < n; ++i) {
      if (fids[i] <= kTombstone) return false;  // reserved sentinels
      if (rows[i] < 0 || rows[i] >= row_capacity_) return false;
      if (used[rows[i]]) return false;
      used[rows[i]] = 1;
      uint64_t pos;
      if (Find(fids[i], &pos)) return false;  // duplicate fid
      Insert(fids[i], pos, (uint32_t)rows[i], tss ? tss[i] : 0);
      slots_[pos].count = counts ? counts[i] : 0;
    }
    free_rows_.clear();
    next_fresh_row_ = row_capacity_;  // all handed out via free list now
    for (int64_t r = row_capacity_ - 1; r >= 0; --r)
      if (!used[r]) free_rows_.push_back((uint32_t)r);
    return true;
  }

  // Touched-key draining ("steal", ref hopscotch_hash_set.h). Deduplicated.
  int64_t DrainTouched(int64_t* out_fids, int64_t cap) {
    std::lock_guard<std::mutex> g(mu_);
    std::sort(touched_.begin(), touched_.end());
    touched_.erase(std::unique(touched_.begin(), touched_.end()), touched_.end());
    int64_t n = std::min<int64_t>(cap, (int64_t)touched_.size());
    memcpy(out_fids, touched_.data(), n * sizeof(int64_t));
    if (n == (int64_t)touched_.size()) touched_.clear();
    else touched_.erase(touched_.begin(), touched_.begin() + n);
    return n;
  }
  int64_t TouchedSize() const {
    std::lock_guard<std::mutex> g(mu_);
    return (int64_t)touched_.size();
  }

  size_t FilterByteSize() const {
    std::lock_guard<std::mutex> g(mu_);
    return filter_ ? filter_->ByteSize() : 0;
  }
  int64_t FilterSave(uint8_t* out) const {
    std::lock_guard<std::mutex> g(mu_);
    return filter_ ? (int64_t)filter_->Save(out) : 0;
  }
  bool FilterRestore(const uint8_t* in, int64_t len) {
    std::lock_guard<std::mutex> g(mu_);
    return filter_ ? filter_->Restore(in, (size_t)len) : true;
  }
  int64_t FilterEstimate(int64_t fid) const {
    std::lock_guard<std::mutex> g(mu_);
    return filter_ ? (int64_t)filter_->Estimate(fid) : -1;
  }

 private:
  // Linear probing. Returns true if fid found (pos = its slot); otherwise
  // pos = first insertable slot (empty or tombstone).
  bool Find(int64_t fid, uint64_t* out_pos) const {
    uint64_t pos = mix64((uint64_t)fid) & mask_;
    uint64_t first_insertable = UINT64_MAX;
    for (;;) {
      const Slot& s = slots_[pos];
      if (s.fid == fid) { *out_pos = pos; return true; }
      if (s.fid == kEmpty) {
        *out_pos = first_insertable != UINT64_MAX ? first_insertable : pos;
        return false;
      }
      if (s.fid == kTombstone && first_insertable == UINT64_MAX)
        first_insertable = pos;
      pos = (pos + 1) & mask_;
    }
  }

  void Insert(int64_t fid, uint64_t pos, uint32_t row, uint32_t ts) {
    slots_[pos] = Slot{fid, row, ts, 1, 0};
    ++size_;
    // grow when > 75% of slots are live (amortized)
    if ((uint64_t)size_ * 4 > table_size_ * 3) Grow();
  }

  void Grow() {
    std::vector<Slot> old;
    old.swap(slots_);
    table_size_ <<= 1;
    mask_ = table_size_ - 1;
    slots_.assign(table_size_, Slot{kEmpty, 0, 0, 0, 0});
    for (const Slot& s : old) {
      if (s.fid >= kTombstone + 1) {
        uint64_t pos = mix64((uint64_t)s.fid) & mask_;
        while (slots_[pos].fid != kEmpty) pos = (pos + 1) & mask_;
        slots_[pos] = s;
      }
    }
  }

  // `count` = occurrences of the fid in this batch (1 when the caller has
  // no per-id counts).
  bool Admit(int64_t fid, int64_t count) {
    switch (filter_kind_) {
      case kNoFilter:
        return true;
      case kSlidingFilter:
        return filter_->AddAndEstimate(fid, (uint32_t)count) >=
               (uint32_t)admit_threshold_;
      case kProbabilisticFilter:
        // equal-probability mode (ref probabilistic_filter.cc:29-36): each
        // occurrence admits with the same chance p1, chosen so a fid seen
        // `threshold` times has admitted with prob 1-eps; a batch of
        // `count` occurrences admits with 1-(1-p1)^count. Zero memory.
        return admit_threshold_ <= 1 ||
               rng_.uniform() < 1.0 - std::pow(1.0 - equal_p1_, (double)count);
      case kProbabilisticUnequalFilter:
        // unequal-probability mode (ref probabilistic_filter.cc:23-27):
        // admit with p = count/threshold — ids frequent within a batch
        // admit proportionally sooner; E[occurrences-to-admit] = threshold.
        return admit_threshold_ <= 1 ||
               rng_.uniform() * (double)admit_threshold_ < (double)count;
      default:
        return true;
    }
  }

  int64_t AllocRow() {
    if (!free_rows_.empty()) {
      uint32_t r = free_rows_.back();
      free_rows_.pop_back();
      return (int64_t)r;
    }
    if (next_fresh_row_ < row_capacity_) return next_fresh_row_++;
    return -1;
  }

  mutable std::mutex mu_;
  int64_t row_capacity_;
  int32_t filter_kind_;
  int32_t admit_threshold_;
  uint64_t table_size_ = 0, mask_ = 0;
  int64_t size_ = 0;
  double equal_p1_ = 1.0;
  int64_t next_fresh_row_ = 0;
  std::vector<Slot> slots_;
  std::vector<uint32_t> free_rows_;
  std::vector<int64_t> touched_;
  std::unique_ptr<SlidingHashFilter> filter_;
  XorShift rng_;
};

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* mt_store_new(int64_t row_capacity, int32_t filter_kind,
                   int64_t filter_capacity, int32_t filter_splits,
                   int32_t admit_threshold, uint64_t seed) {
  return new Store(row_capacity, filter_kind, filter_capacity, filter_splits,
                   admit_threshold, seed);
}

void mt_store_free(void* s) { delete static_cast<Store*>(s); }

void mt_store_map_train(void* s, const int64_t* fids, int64_t n, uint32_t ts,
                        int32_t* out_rows, int32_t* out_new_rows,
                        int64_t* out_new_fids, int64_t new_cap,
                        int64_t* out_new_count, int32_t record_touch) {
  static_cast<Store*>(s)->MapForTraining(fids, n, ts, out_rows, out_new_rows,
                                         out_new_fids, new_cap, out_new_count,
                                         record_touch);
}

void mt_store_map_train_pos(void* s, const int64_t* fids, int64_t n,
                            uint32_t ts, int32_t* out_rows,
                            int32_t* out_new_rows, int64_t* out_new_fids,
                            int32_t* out_new_pos, int64_t new_cap,
                            int64_t* out_new_count, int32_t record_touch) {
  static_cast<Store*>(s)->MapForTraining(fids, n, ts, out_rows, out_new_rows,
                                         out_new_fids, new_cap, out_new_count,
                                         record_touch, out_new_pos);
}

// map_train_pos with per-fid batch occurrence counts (probabilistic
// admission uses them; see Store::Admit). counts may be null.
void mt_store_map_train_pos2(void* s, const int64_t* fids, int64_t n,
                             uint32_t ts, const int32_t* counts,
                             int32_t* out_rows, int32_t* out_new_rows,
                             int64_t* out_new_fids, int32_t* out_new_pos,
                             int64_t new_cap, int64_t* out_new_count,
                             int32_t record_touch) {
  static_cast<Store*>(s)->MapForTraining(fids, n, ts, out_rows, out_new_rows,
                                         out_new_fids, new_cap, out_new_count,
                                         record_touch, out_new_pos, counts);
}

void mt_store_lookup(void* s, const int64_t* fids, int64_t n,
                     int32_t* out_rows) {
  static_cast<Store*>(s)->Lookup(fids, n, out_rows);
}

void mt_store_assign(void* s, const int64_t* fids, int64_t n, uint32_t ts,
                     int32_t* out_rows, int32_t* out_new_rows,
                     int64_t* out_new_fids, int64_t new_cap,
                     int64_t* out_new_count) {
  static_cast<Store*>(s)->MapAssign(fids, n, ts, out_rows, out_new_rows,
                                    out_new_fids, new_cap, out_new_count);
}

int64_t mt_store_evict_expired(void* s, uint32_t expire_before,
                               int32_t* out_rows, int64_t cap) {
  return static_cast<Store*>(s)->EvictExpired(expire_before, out_rows, cap);
}

int64_t mt_store_evict_expired2(void* s, uint32_t expire_before,
                                int32_t* out_rows, int64_t* out_fids,
                                int64_t cap) {
  return static_cast<Store*>(s)->EvictExpired(expire_before, out_rows, cap,
                                              out_fids);
}

int64_t mt_store_size(void* s) { return static_cast<Store*>(s)->Size(); }

int64_t mt_store_save(void* s, int64_t* fids, int32_t* rows, uint32_t* tss,
                      uint32_t* counts) {
  return static_cast<Store*>(s)->Save(fids, rows, tss, counts);
}

int32_t mt_store_restore(void* s, const int64_t* fids, const int32_t* rows,
                         const uint32_t* tss, const uint32_t* counts,
                         int64_t n) {
  return static_cast<Store*>(s)->Restore(fids, rows, tss, counts, n) ? 1 : 0;
}

int64_t mt_store_drain_touched(void* s, int64_t* out_fids, int64_t cap) {
  return static_cast<Store*>(s)->DrainTouched(out_fids, cap);
}

int64_t mt_store_touched_size(void* s) {
  return static_cast<Store*>(s)->TouchedSize();
}

int64_t mt_store_filter_byte_size(void* s) {
  return (int64_t)static_cast<Store*>(s)->FilterByteSize();
}

int64_t mt_store_filter_save(void* s, uint8_t* out) {
  return static_cast<Store*>(s)->FilterSave(out);
}

int32_t mt_store_filter_restore(void* s, const uint8_t* in, int64_t len) {
  return static_cast<Store*>(s)->FilterRestore(in, len) ? 1 : 0;
}

int64_t mt_store_filter_estimate(void* s, int64_t fid) {
  return static_cast<Store*>(s)->FilterEstimate(fid);
}

}  // extern "C"
