// Native shard-cache reader: mmap'd record reads + background page
// prefetch for the training data path.
//
// The reference's data runtime leans on native code in its dependencies
// (torch DataLoader workers, shared-memory tensor IPC in
// utils/reduction.py); this is the TPU build's native analogue for the
// read side: shard files (data/cache.py `shard_N.bin`) are mmap'd once,
// records are copied straight out of the page cache without per-read
// open/seek/read syscalls, and a small thread pool warms upcoming
// records with madvise(MADV_WILLNEED) so video-latent batches don't
// stall the single-threaded Python loader on cold pages.
//
// ABI (ctypes, see diffusion_pipe_tpu/data/native_cache.py):
//   cr_open(shard_paths, n_shards, items_flat, n_items, n_threads) -> handle
//     items_flat: n_items * 3 u64 (shard, offset, size); missing items
//     are encoded with size == UINT64_MAX.
//   cr_item_size(handle, idx) -> size or -1
//   cr_read(handle, idx, out)  -> bytes copied or -1
//   cr_prefetch(handle, idxs, n) -> enqueue page warming
//   cr_close(handle)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fcntl.h>
#include <mutex>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr uint64_t kMissing = ~0ull;

struct Shard {
  int fd = -1;
  size_t size = 0;
  const uint8_t* base = nullptr;
};

struct Item {
  uint64_t shard, offset, size;
};

struct Reader {
  std::vector<Shard> shards;
  std::vector<Item> items;

  std::deque<uint64_t> queue;
  std::mutex mu;
  std::condition_variable cv;
  bool stop = false;
  std::vector<std::thread> workers;

  ~Reader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& w : workers) w.join();
    for (auto& s : shards) {
      if (s.base) munmap(const_cast<uint8_t*>(s.base), s.size);
      if (s.fd >= 0) close(s.fd);
    }
  }

  void prefetch_one(uint64_t idx) {
    if (idx >= items.size()) return;
    const Item& it = items[idx];
    if (it.size == kMissing || it.shard >= shards.size()) return;
    const Shard& s = shards[it.shard];
    if (!s.base || it.offset + it.size > s.size) return;
    long page = sysconf(_SC_PAGESIZE);
    uintptr_t begin = reinterpret_cast<uintptr_t>(s.base) + it.offset;
    uintptr_t aligned = begin & ~static_cast<uintptr_t>(page - 1);
    size_t len = it.size + (begin - aligned);
    madvise(reinterpret_cast<void*>(aligned), len, MADV_WILLNEED);
    // touch one byte per page so the readahead completes before use
    volatile uint8_t sink = 0;
    for (size_t off = 0; off < it.size; off += static_cast<size_t>(page)) {
      sink ^= s.base[it.offset + off];
    }
    (void)sink;
  }

  void worker() {
    for (;;) {
      uint64_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        idx = queue.front();
        queue.pop_front();
      }
      prefetch_one(idx);
    }
  }
};

}  // namespace

extern "C" {

void* cr_open(const char** shard_paths, int n_shards,
              const uint64_t* items_flat, uint64_t n_items, int n_threads) {
  auto* r = new Reader();
  r->shards.resize(n_shards);
  for (int i = 0; i < n_shards; ++i) {
    Shard& s = r->shards[i];
    s.fd = open(shard_paths[i], O_RDONLY);
    if (s.fd < 0) continue;
    struct stat st;
    if (fstat(s.fd, &st) != 0 || st.st_size == 0) continue;
    s.size = static_cast<size_t>(st.st_size);
    void* m = mmap(nullptr, s.size, PROT_READ, MAP_SHARED, s.fd, 0);
    if (m == MAP_FAILED) {
      s.size = 0;
      continue;
    }
    madvise(m, s.size, MADV_RANDOM);
    s.base = static_cast<const uint8_t*>(m);
  }
  r->items.resize(n_items);
  for (uint64_t i = 0; i < n_items; ++i) {
    r->items[i] = {items_flat[3 * i], items_flat[3 * i + 1],
                   items_flat[3 * i + 2]};
  }
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i) {
    r->workers.emplace_back([r] { r->worker(); });
  }
  return r;
}

int64_t cr_item_size(void* h, uint64_t idx) {
  auto* r = static_cast<Reader*>(h);
  if (idx >= r->items.size() || r->items[idx].size == kMissing) return -1;
  return static_cast<int64_t>(r->items[idx].size);
}

int64_t cr_read(void* h, uint64_t idx, uint8_t* out) {
  auto* r = static_cast<Reader*>(h);
  if (idx >= r->items.size()) return -1;
  const Item& it = r->items[idx];
  if (it.size == kMissing || it.shard >= r->shards.size()) return -1;
  const Shard& s = r->shards[it.shard];
  if (!s.base || it.offset + it.size > s.size) return -1;
  std::memcpy(out, s.base + it.offset, it.size);
  return static_cast<int64_t>(it.size);
}

void cr_prefetch(void* h, const uint64_t* idxs, uint64_t n) {
  auto* r = static_cast<Reader*>(h);
  {
    std::lock_guard<std::mutex> lk(r->mu);
    for (uint64_t i = 0; i < n; ++i) r->queue.push_back(idxs[i]);
  }
  r->cv.notify_all();
}

void cr_close(void* h) { delete static_cast<Reader*>(h); }

}  // extern "C"
