// Native chunked data loader for npe_tpu.
//
// The reference streams CelebA through Fuel's C-backed HDF5 reader
// (reference train_IAN.py:357-374); this is the npe_tpu equivalent: an
// mmap'ed raw uint8 record file with per-epoch seeded shuffling and a
// background prefetch thread that gathers the next chunk(s) while the TPU
// trains on the current one. Exposed through a plain C ABI consumed via
// ctypes (npe_tpu/data/native_loader.py).
//
// Record layout: num_records fixed-size records of record_bytes uint8.
// Chunk semantics mirror the Python data_loader: per epoch, a permutation
// (or identity) of (num - offset) indices, floor(num/chunk_records) chunks.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <numeric>
#include <random>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Chunk {
  std::vector<uint8_t> data;
  int64_t n_records = 0;
};

struct Loader {
  // dataset
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t file_bytes = 0;
  int64_t num_records = 0;
  int64_t record_bytes = 0;
  // chunking
  int64_t chunk_records = 0;
  // epoch state
  std::vector<int64_t> order;
  int64_t next_chunk_idx = 0;
  int64_t chunks_in_epoch = 0;
  int64_t offset = 0;
  // prefetch machinery
  int n_prefetch = 2;
  std::deque<Chunk> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::thread worker;
  std::atomic<bool> stop{false};
  std::atomic<bool> epoch_active{false};
  std::atomic<int> in_flight{0};

  void gather(Chunk& out, int64_t chunk_idx) {
    out.n_records = chunk_records;
    out.data.resize(static_cast<size_t>(chunk_records * record_bytes));
    const int64_t start = chunk_idx * chunk_records;
    for (int64_t i = 0; i < chunk_records; ++i) {
      const int64_t rec = order[start + i] + offset;
      std::memcpy(out.data.data() + i * record_bytes,
                  base + rec * record_bytes,
                  static_cast<size_t>(record_bytes));
    }
  }

  void worker_loop() {
    while (!stop.load()) {
      int64_t my_chunk = -1;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop.load() ||
                 (epoch_active.load() && next_chunk_idx < chunks_in_epoch &&
                  static_cast<int>(ready.size()) < n_prefetch);
        });
        if (stop.load()) return;
        my_chunk = next_chunk_idx++;
        in_flight.fetch_add(1);
        if (next_chunk_idx >= chunks_in_epoch) epoch_active.store(false);
      }
      Chunk c;
      gather(c, my_chunk);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.push_back(std::move(c));
        in_flight.fetch_sub(1);
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

Loader* npe_loader_open(const char* path, int64_t num_records,
                        int64_t record_bytes, int64_t chunk_records,
                        int n_prefetch) {
  Loader* L = new Loader();
  L->fd = ::open(path, O_RDONLY);
  if (L->fd < 0) {
    delete L;
    return nullptr;
  }
  struct stat st;
  if (fstat(L->fd, &st) != 0 ||
      st.st_size < static_cast<off_t>(num_records * record_bytes)) {
    ::close(L->fd);
    delete L;
    return nullptr;
  }
  L->file_bytes = static_cast<size_t>(st.st_size);
  void* m = mmap(nullptr, L->file_bytes, PROT_READ, MAP_PRIVATE, L->fd, 0);
  if (m == MAP_FAILED) {
    ::close(L->fd);
    delete L;
    return nullptr;
  }
  madvise(m, L->file_bytes, MADV_WILLNEED);
  L->base = static_cast<const uint8_t*>(m);
  L->num_records = num_records;
  L->record_bytes = record_bytes;
  L->chunk_records = chunk_records;
  L->n_prefetch = n_prefetch > 0 ? n_prefetch : 2;
  L->worker = std::thread([L] { L->worker_loop(); });
  return L;
}

// Start an epoch: seeded permutation (shuffle!=0) or identity, with the
// reference's alternating half-batch offset.
void npe_loader_begin_epoch(Loader* L, int shuffle, uint64_t seed,
                            int64_t offset) {
  std::unique_lock<std::mutex> lk(L->mu);
  // drain any gather still in flight from a previous (abandoned) epoch
  L->epoch_active.store(false);
  L->cv_ready.wait(lk, [&] { return L->in_flight.load() == 0; });
  L->ready.clear();
  L->offset = offset;
  const int64_t n = L->num_records - offset;
  L->order.resize(static_cast<size_t>(n));
  std::iota(L->order.begin(), L->order.end(), 0);
  if (shuffle) {
    std::mt19937_64 rng(seed);
    std::shuffle(L->order.begin(), L->order.end(), rng);
  }
  L->chunks_in_epoch = L->num_records / L->chunk_records;
  // match the Python loader: chunk count over the full record count, but
  // indices drawn from the (num - offset) window
  if (L->chunks_in_epoch * L->chunk_records > n)
    L->chunks_in_epoch = n / L->chunk_records;
  L->next_chunk_idx = 0;
  L->epoch_active.store(L->chunks_in_epoch > 0);
  lk.unlock();
  L->cv_space.notify_all();
}

int64_t npe_loader_chunks_per_epoch(Loader* L) { return L->chunks_in_epoch; }

// Blocks until a chunk is ready; copies it into out. Returns the number of
// records copied, or 0 when the epoch is exhausted.
int64_t npe_loader_next(Loader* L, uint8_t* out) {
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_ready.wait(lk, [&] {
    return !L->ready.empty() ||
           (!L->epoch_active.load() && L->in_flight.load() == 0 &&
            L->next_chunk_idx >= L->chunks_in_epoch);
  });
  if (L->ready.empty()) return 0;
  Chunk c = std::move(L->ready.front());
  L->ready.pop_front();
  lk.unlock();
  L->cv_space.notify_all();
  std::memcpy(out, c.data.data(), c.data.size());
  return c.n_records;
}

void npe_loader_close(Loader* L) {
  if (!L) return;
  L->stop.store(true);
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  if (L->worker.joinable()) L->worker.join();
  if (L->base) munmap(const_cast<uint8_t*>(L->base), L->file_bytes);
  if (L->fd >= 0) ::close(L->fd);
  delete L;
}

}  // extern "C"
