// C ABI over TsmPool for ctypes consumers (Python tests, the ddcd-tpu
// server's output stage).  Mirrors the class API 1:1.
#include "tsmpool.hpp"

#include <cstring>
#include <unordered_map>

extern "C" {

struct tsmpool_handle {
  TsmPool pool;
  std::unordered_map<int, TsmPool::Reader> readers;
  std::mutex reg_mu;
  int next_id = 0;
  tsmpool_handle(std::size_t bs, std::size_t d) : pool(bs, d) {}
};

tsmpool_handle* tsmpool_new(std::size_t buf_size, std::size_t depth) {
  return new tsmpool_handle(buf_size, depth);
}

void tsmpool_delete(tsmpool_handle* h) { delete h; }

// Copy `buf_size` bytes in and publish.
void tsmpool_write(tsmpool_handle* h, const char* data) {
  std::memcpy(h->pool.write_buffer(), data, h->pool.buf_size());
  h->pool.commit();
}

void tsmpool_close(tsmpool_handle* h) { h->pool.close(); }

int tsmpool_register_reader(tsmpool_handle* h) {
  std::lock_guard<std::mutex> lk(h->reg_mu);
  int id = h->next_id++;
  h->readers.emplace(id, h->pool.register_reader());
  return id;
}

// Returns 1 and copies a buffer out, 0 if none (non-blocking if wait=0) or
// closed-and-drained.
int tsmpool_read(tsmpool_handle* h, int reader_id, char* out, int wait) {
  TsmPool::Reader* r;
  {
    std::lock_guard<std::mutex> lk(h->reg_mu);
    auto it = h->readers.find(reader_id);
    if (it == h->readers.end()) return 0;
    r = &it->second;
  }
  const char* p = h->pool.read_next(*r, wait != 0);
  if (!p) return 0;
  std::memcpy(out, p, h->pool.buf_size());
  return 1;
}

// Partial-buffer variants (finite-stream tails): write/read with an explicit
// byte length <= buf_size.  tsmpool_read_len returns the buffer's published
// length, or -1 if none available.
void tsmpool_write_len(tsmpool_handle* h, const char* data, int len) {
  std::memcpy(h->pool.write_buffer(), data, static_cast<std::size_t>(len));
  h->pool.commit(static_cast<std::size_t>(len));
}

int tsmpool_read_len(tsmpool_handle* h, int reader_id, char* out, int wait) {
  TsmPool::Reader* r;
  {
    std::lock_guard<std::mutex> lk(h->reg_mu);
    auto it = h->readers.find(reader_id);
    if (it == h->readers.end()) return -1;
    r = &it->second;
  }
  std::size_t len = 0;
  const char* p = h->pool.read_next(*r, wait != 0, &len);
  if (!p) return -1;
  std::memcpy(out, p, len);
  return static_cast<int>(len);
}

}  // extern "C"
