// Native batch assembly: multithreaded shuffled row gather.
//
// The reference fed devices from torch DataLoader worker processes
// (experiments/base/cifar.py:38 num_workers=2). This framework's host
// pipeline instead gathers minibatch rows from a resident numpy arena
// into a staging buffer with a small C++ thread pool — GIL-free,
// memory-bandwidth-bound, no worker processes to fork. Exposed through
// ctypes (see beyond_deep_ensembles_tpu/data/native_loader.py), with a
// pure-numpy fallback when the shared library is unavailable.
//
// Build: make -C native   (produces libbatcher.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lock(mu_);
            cv_.wait(lock, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
          if (--outstanding_ == 0) {
            std::lock_guard<std::mutex> lock(done_mu_);
            done_cv_.notify_all();
          }
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void Submit(std::function<void()> task) {
    ++outstanding_;
    {
      std::lock_guard<std::mutex> lock(mu_);
      tasks_.push(std::move(task));
    }
    cv_.notify_one();
  }

  void Wait() {
    std::unique_lock<std::mutex> lock(done_mu_);
    done_cv_.wait(lock, [this] { return outstanding_.load() == 0; });
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_, done_mu_;
  std::condition_variable cv_, done_cv_;
  std::atomic<int> outstanding_{0};
  bool stop_;
};

ThreadPool* pool() {
  static ThreadPool* p =
      new ThreadPool(std::max(2u, std::thread::hardware_concurrency() / 2));
  return p;
}

}  // namespace

extern "C" {

// Gather `n_rows` rows of `row_bytes` each from `src` (a dense [N, row]
// arena) at `indices` into `dst`. Parallelized over row chunks.
void gather_rows(const uint8_t* src, const int64_t* indices, int64_t n_rows,
                 int64_t row_bytes, uint8_t* dst) {
  const int64_t kChunk = 64;
  if (n_rows <= kChunk) {
    for (int64_t i = 0; i < n_rows; ++i) {
      std::memcpy(dst + i * row_bytes, src + indices[i] * row_bytes, row_bytes);
    }
    return;
  }
  for (int64_t start = 0; start < n_rows; start += kChunk) {
    const int64_t end = std::min(start + kChunk, n_rows);
    pool()->Submit([=] {
      for (int64_t i = start; i < end; ++i) {
        std::memcpy(dst + i * row_bytes, src + indices[i] * row_bytes,
                    row_bytes);
      }
    });
  }
  pool()->Wait();
}

// Fisher-Yates shuffle with SplitMix64 — deterministic given seed.
void shuffle_indices(int64_t* indices, int64_t n, uint64_t seed) {
  auto next = [&seed]() {
    seed += 0x9E3779B97f4A7C15ull;
    uint64_t z = seed;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  };
  for (int64_t i = n - 1; i > 0; --i) {
    const int64_t j = static_cast<int64_t>(next() % static_cast<uint64_t>(i + 1));
    std::swap(indices[i], indices[j]);
  }
}

}  // extern "C"
