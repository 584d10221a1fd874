// Native prefetching reader for the indexed record store.
//
// The training input pipeline must keep the accelerator fed: record reads
// (seek + read + optional gunzip) run on a C++ thread pool, off the Python
// GIL, delivering records in request order through a bounded ring buffer.
// This is the TPU-framework counterpart of the reference's reliance on
// torch DataLoader worker processes (utils/commons/dataset_utils.py) — a
// native IO core instead of Python workers.
//
// C ABI (consumed via ctypes from real3dportrait_tpu/data/native_reader.py):
//   rr_create(paths, n_chunks, offsets[3*n], n_records)      -> handle
//   rr_start(handle, order[n], n, n_threads, ring_capacity)  -> 0/err
//   rr_next(handle, &ptr, &len)  // blocks; returns record seq or -1 at end
//   rr_release(handle, ptr)
//   rr_destroy(handle)
//
// Build: g++ -O2 -shared -fPIC -std=c++17 -pthread record_reader.cpp -o librecord_reader.so

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Record {
  int64_t seq = -1;
  std::unique_ptr<char[]> data;
  int64_t len = 0;
};

struct Reader {
  std::vector<std::string> chunk_paths;
  std::vector<int64_t> offsets;  // triplets (chunk, start, end)
  int64_t n_records = 0;

  // prefetch state
  std::vector<int32_t> order;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  std::deque<Record> ready;      // completed, unordered
  int64_t next_fetch = 0;        // next order index to claim
  int64_t next_deliver = 0;      // next sequence to hand to Python
  size_t ring_capacity = 8;
  bool stop = false;

  // per-consumer holding area for out-of-order completions
  std::deque<Record> held;
};

bool read_record(Reader* r, int64_t idx, Record* out) {
  int64_t chunk = r->offsets[3 * idx];
  int64_t start = r->offsets[3 * idx + 1];
  int64_t end = r->offsets[3 * idx + 2];
  int64_t len = end - start;
  FILE* f = std::fopen(r->chunk_paths[(size_t)chunk].c_str(), "rb");
  if (!f) return false;
  out->data.reset(new char[(size_t)len]);
  out->len = len;
  bool ok = std::fseek(f, (long)start, SEEK_SET) == 0 &&
            std::fread(out->data.get(), 1, (size_t)len, f) == (size_t)len;
  std::fclose(f);
  return ok;
}

void worker_loop(Reader* r) {
  for (;;) {
    int64_t my_pos;
    {
      std::unique_lock<std::mutex> lock(r->mu);
      r->cv_produce.wait(lock, [r] {
        return r->stop || (r->next_fetch < (int64_t)r->order.size() &&
                           r->ready.size() < r->ring_capacity);
      });
      if (r->stop || r->next_fetch >= (int64_t)r->order.size()) return;
      my_pos = r->next_fetch++;
    }
    Record rec;
    rec.seq = my_pos;
    if (!read_record(r, r->order[(size_t)my_pos], &rec)) {
      rec.len = -1;  // signal IO error
    }
    {
      std::lock_guard<std::mutex> lock(r->mu);
      r->ready.push_back(std::move(rec));
    }
    r->cv_consume.notify_all();
  }
}

}  // namespace

extern "C" {

void* rr_create(const char** chunk_paths, int32_t n_chunks,
                const int64_t* offsets, int64_t n_records) {
  auto* r = new Reader();
  for (int i = 0; i < n_chunks; ++i) r->chunk_paths.emplace_back(chunk_paths[i]);
  r->offsets.assign(offsets, offsets + 3 * n_records);
  r->n_records = n_records;
  return r;
}

int32_t rr_start(void* handle, const int32_t* order, int64_t n,
                 int32_t n_threads, int32_t ring_capacity) {
  auto* r = static_cast<Reader*>(handle);
  if (!r->workers.empty()) return -1;
  r->order.assign(order, order + n);
  r->ring_capacity = (size_t)ring_capacity;
  r->next_fetch = 0;
  r->next_deliver = 0;
  r->stop = false;
  for (int i = 0; i < n_threads; ++i) r->workers.emplace_back(worker_loop, r);
  return 0;
}

// Returns the record's sequence number (position in `order`), or -1 when the
// epoch is exhausted, or -2 on IO error. Blocks for in-order delivery.
int64_t rr_next(void* handle, char** out_ptr, int64_t* out_len) {
  auto* r = static_cast<Reader*>(handle);
  if (r->next_deliver >= (int64_t)r->order.size()) return -1;
  for (;;) {
    // check the holding area first
    for (auto it = r->held.begin(); it != r->held.end(); ++it) {
      if (it->seq == r->next_deliver) {
        if (it->len < 0) return -2;
        *out_ptr = it->data.release();
        *out_len = it->len;
        r->held.erase(it);
        return r->next_deliver++;
      }
    }
    std::unique_lock<std::mutex> lock(r->mu);
    r->cv_consume.wait(lock, [r] { return !r->ready.empty() || r->stop; });
    if (r->stop) return -1;
    while (!r->ready.empty()) {
      r->held.push_back(std::move(r->ready.front()));
      r->ready.pop_front();
    }
    lock.unlock();
    r->cv_produce.notify_all();
  }
}

void rr_release(void* handle, char* ptr) {
  (void)handle;
  delete[] ptr;
}

void rr_destroy(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  {
    std::lock_guard<std::mutex> lock(r->mu);
    r->stop = true;
  }
  r->cv_produce.notify_all();
  r->cv_consume.notify_all();
  for (auto& t : r->workers) t.join();
  delete r;
}

}  // extern "C"
