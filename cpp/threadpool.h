// Fixed-size host thread pool for per-table/per-shard prepare parallelism.
//
// TPU-native rebuild of the reference's runtime/concurrency/thread_pool
// (used by ShardingSparseFidsOp's parallel parse,
// data/kernels/parse_sparse_feature.h:42): the host pack — dedup + store
// map + wire pack per table — is the step bottleneck once the device is
// fast, and tables are independent, so they fan out here.
//
// Sizing: MT_HOST_THREADS env var if set, else hardware_concurrency() - 1
// (0 extra threads on a 1-core host: ParallelFor then runs inline with no
// locking overhead beyond one atomic load).

#pragma once

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <functional>
#include <memory>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

class ThreadPool {
 public:
  explicit ThreadPool(int num_threads) {
    for (int i = 0; i < num_threads; ++i) {
      workers_.emplace_back([this] { WorkerLoop(); });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> g(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  int size() const { return (int)workers_.size(); }

  // Run fn(0..n-1), blocking until all complete. Tasks may run on pool
  // workers and on the calling thread; with an empty pool everything runs
  // inline on the caller.
  void ParallelFor(int64_t n, const std::function<void(int64_t)>& fn) {
    if (n <= 0) return;
    if (workers_.empty() || n == 1) {
      for (int64_t i = 0; i < n; ++i) fn(i);
      return;
    }
    // Shared state lives on the heap: queued helper tasks can outlive this
    // frame (the caller may drain every item itself and return while a
    // worker still holds a queued copy — it must find live state, see that
    // next >= n, and exit as a no-op).
    struct State {
      std::atomic<int64_t> next{0}, done{0};
      std::mutex done_mu;
      std::condition_variable done_cv;
      std::function<void(int64_t)> fn;
      int64_t n;
    };
    auto st = std::make_shared<State>();
    st->fn = fn;
    st->n = n;
    auto run = [st] {
      for (;;) {
        int64_t i = st->next.fetch_add(1);
        if (i >= st->n) break;
        st->fn(i);
        if (st->done.fetch_add(1) + 1 == st->n) {
          std::lock_guard<std::mutex> g(st->done_mu);
          st->done_cv.notify_one();
        }
      }
    };
    {
      std::lock_guard<std::mutex> g(mu_);
      int64_t helpers = std::min<int64_t>((int64_t)workers_.size(), n - 1);
      for (int64_t i = 0; i < helpers; ++i) tasks_.push(run);
    }
    cv_.notify_all();
    run();  // caller participates
    std::unique_lock<std::mutex> g(st->done_mu);
    st->done_cv.wait(g, [st] { return st->done.load() >= st->n; });
  }

  static ThreadPool& Global() {
    static ThreadPool* pool = [] {
      int n = -1;
      if (const char* env = std::getenv("MT_HOST_THREADS")) n = atoi(env);
      if (n < 0) n = (int)std::thread::hardware_concurrency() - 1;
      if (n < 0) n = 0;
      return new ThreadPool(n);
    }();
    return *pool;
  }

 private:
  void WorkerLoop() {
    for (;;) {
      std::function<void()> task;
      {
        std::unique_lock<std::mutex> g(mu_);
        cv_.wait(g, [this] { return stop_ || !tasks_.empty(); });
        if (stop_ && tasks_.empty()) return;
        task = std::move(tasks_.front());
        tasks_.pop();
      }
      task();
    }
  }

  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> tasks_;
  std::vector<std::thread> workers_;
  bool stop_ = false;
};
