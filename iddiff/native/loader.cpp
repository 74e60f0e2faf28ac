// iddiff native batch loader: threaded shuffle + gather + prefetch.
//
// TPU-native equivalent of the host-side half of torch's DataLoader worker
// pool (the reference feeds Lightning with num_workers processes,
// /root/reference/lightning_data_modules/*.py DataLoader(..., num_workers)).
// Datasets here are materialized float32 arrays, so the loader's job is:
//   - seeded Fisher-Yates permutation per epoch (deterministic resume)
//   - gather of permuted rows into a ring of reusable batch buffers
//   - a background producer thread so batch assembly overlaps device compute
//     without holding the Python GIL.
//
// C ABI only (consumed via ctypes; no pybind11 in this image).
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Slot {
  std::vector<float> buf;
  long rows = 0;          // valid rows in this batch
  bool ready = false;     // producer filled it
  bool consumed = true;   // consumer done with it
};

struct Loader {
  const float* data = nullptr;   // (n, item_floats), row-major, borrowed
  long n = 0;
  long n_eff = 0;                // rows this shard iterates per epoch
  long item_floats = 0;
  long batch = 0;
  bool drop_last = true;
  long shard_index = 0;          // per-host sharding (DistributedSampler
  long num_shards = 1;           // equivalent): disjoint stride of the perm

  std::vector<long> perm;
  std::vector<Slot> slots;
  long next_batch_to_fill = 0;   // producer cursor (batch index)
  long next_batch_to_read = 0;   // consumer cursor
  long num_batches = 0;

  std::thread producer;
  std::mutex mu;
  std::condition_variable cv_producer, cv_consumer;
  std::atomic<bool> stop{false};
  bool epoch_active = false;

  void fill_loop() {
    while (true) {
      std::unique_lock<std::mutex> lk(mu);
      cv_producer.wait(lk, [&] {
        return stop.load() ||
               (epoch_active && next_batch_to_fill < num_batches &&
                !slots[next_batch_to_fill % slots.size()].ready &&
                slots[next_batch_to_fill % slots.size()].consumed);
      });
      if (stop.load()) return;
      long b = next_batch_to_fill++;
      Slot& slot = slots[b % slots.size()];
      slot.ready = false;
      slot.consumed = false;
      lk.unlock();

      long start = b * batch;
      long rows = std::min(batch, n_eff - start);
      float* dst = slot.buf.data();
      for (long r = 0; r < rows; ++r) {
        std::memcpy(dst + r * item_floats,
                    data + perm[start + r] * item_floats,
                    sizeof(float) * (size_t)item_floats);
      }
      lk.lock();
      slot.rows = rows;
      slot.ready = true;
      cv_consumer.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* loader_create(const float* data, long n, long item_floats, long batch,
                    int drop_last, int num_slots) {
  auto* L = new Loader();
  L->data = data;
  L->n = n;
  L->item_floats = item_floats;
  L->batch = batch;
  L->drop_last = drop_last != 0;
  L->perm.resize(n);
  L->n_eff = n;
  int slots = num_slots < 2 ? 2 : num_slots;
  L->slots.resize(slots);
  for (auto& s : L->slots) s.buf.resize((size_t)batch * item_floats);
  L->producer = std::thread([L] { L->fill_loop(); });
  return L;
}

// Per-host sharding: every host runs the same seeded permutation, then
// iterates the disjoint stride perm[shard_index::num_shards], truncated to a
// multiple of num_shards so all hosts see identical batch counts (lockstep).
void loader_set_shard(void* h, long shard_index, long num_shards) {
  auto* L = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(L->mu);
  L->shard_index = shard_index;
  L->num_shards = num_shards < 1 ? 1 : num_shards;
}

// Start a new epoch: seeded permutation (seed==0 -> identity order).
void loader_start_epoch(void* h, unsigned long long seed) {
  auto* L = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(L->mu);
  for (long i = 0; i < L->n; ++i) L->perm[i] = i;
  if (seed != 0) {
    std::mt19937_64 rng(seed);
    for (long i = L->n - 1; i > 0; --i) {
      long j = (long)(rng() % (unsigned long long)(i + 1));
      std::swap(L->perm[i], L->perm[j]);
    }
  }
  L->n_eff = L->n;
  if (L->num_shards > 1) {
    L->n_eff = L->n / L->num_shards;  // truncate to a shardable multiple
    for (long i = 0; i < L->n_eff; ++i)
      L->perm[i] = L->perm[L->shard_index + i * L->num_shards];
  }
  long full = L->n_eff / L->batch;
  L->num_batches =
      L->drop_last ? full : (L->n_eff + L->batch - 1) / L->batch;
  L->next_batch_to_fill = 0;
  L->next_batch_to_read = 0;
  for (auto& s : L->slots) {
    s.ready = false;
    s.consumed = true;
  }
  L->epoch_active = true;
  L->cv_producer.notify_all();
}

// Blocks until the next batch is assembled; returns rows (0 = epoch end).
// *out points at an internal buffer owned by the loader; it stays valid
// until loader_release is called for this batch.
long loader_next(void* h, float** out) {
  auto* L = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_batch_to_read >= L->num_batches) {
    L->epoch_active = false;
    *out = nullptr;
    return 0;
  }
  long b = L->next_batch_to_read;
  Slot& slot = L->slots[b % L->slots.size()];
  L->cv_consumer.wait(lk, [&] { return slot.ready || L->stop.load(); });
  if (L->stop.load()) {
    *out = nullptr;
    return 0;
  }
  *out = slot.buf.data();
  return slot.rows;
}

// Mark the current batch consumed so its slot can be refilled.
void loader_release(void* h) {
  auto* L = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(L->mu);
  Slot& slot = L->slots[L->next_batch_to_read % L->slots.size()];
  slot.ready = false;
  slot.consumed = true;
  L->next_batch_to_read++;
  L->cv_producer.notify_all();
}

void loader_destroy(void* h) {
  auto* L = static_cast<Loader*>(h);
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->stop.store(true);
  }
  L->cv_producer.notify_all();
  L->cv_consumer.notify_all();
  if (L->producer.joinable()) L->producer.join();
  delete L;
}

}  // extern "C"
