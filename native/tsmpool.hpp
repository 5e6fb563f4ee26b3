// tsmpool: thread-safe single-writer / multi-reader circular buffer pool.
//
// TPU-era equivalent of the reference's tsmpool (tsmpool.cpp:3-74,
// tsmpool.h:19-43): one producer publishes fixed-size buffers, any number of
// consumers follow along, and a consumer that falls more than the pool depth
// behind is "lapped" — it silently skips to the oldest buffer still alive
// (drop-oldest policy, matching the reference's nmux/ddcd usage).
//
// Clean-room design: publication is a monotonically increasing sequence
// number; buffer seq s lives in slot s % depth.  A reader holding next_seq
// can read while next_seq < write_seq; it is lapped when
// next_seq <= write_seq - depth (the slot has been re-used).  One mutex +
// condvar; readers block in read_next(wait=true) until the writer commits or
// closes.
#pragma once

#include <condition_variable>
#include <cstddef>
#include <cstdint>
#include <mutex>
#include <vector>

class TsmPool {
 public:
  TsmPool(std::size_t buf_size, std::size_t depth)
      : buf_size_(buf_size), depth_(depth), data_(buf_size * depth),
        lens_(depth, buf_size) {}

  std::size_t buf_size() const { return buf_size_; }
  std::size_t depth() const { return depth_; }

  // Writer side: fill write_buffer(), then commit() to publish it and move
  // to the next slot.  Single writer only.
  char* write_buffer() { return &data_[(write_seq_ % depth_) * buf_size_]; }

  // `len` <= buf_size publishes a short (partial) buffer — used for the
  // final tail of a finite stream, which the reference's nmux also
  // publishes rather than dropping.
  void commit(std::size_t len) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      lens_[write_seq_ % depth_] = len;
      ++write_seq_;
    }
    cv_.notify_all();
  }
  void commit() { commit(buf_size_); }

  // EOF: wake all blocked readers; read_next() returns nullptr once drained.
  void close() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      closed_ = true;
    }
    cv_.notify_all();
  }

  bool closed() const {
    std::lock_guard<std::mutex> lk(mu_);
    return closed_;
  }

  // Reader side.  A new reader starts at the current head (it sees only
  // buffers committed after registration, like the reference's
  // register_thread).
  struct Reader {
    std::uint64_t next_seq;
  };

  Reader register_reader() const {
    std::lock_guard<std::mutex> lk(mu_);
    return Reader{write_seq_};
  }

  // Next published buffer for this reader, or nullptr (if !wait and none is
  // pending, or the pool is closed and drained).  Lapped readers skip ahead
  // to the oldest live buffer.  The returned pointer stays valid until the
  // reader falls a full depth behind again — consumers are expected to copy
  // or send() it promptly, exactly like the reference's client threads.
  const char* read_next(Reader& r, bool wait, std::size_t* len = nullptr,
                        std::uint64_t* dropped = nullptr) {
    std::unique_lock<std::mutex> lk(mu_);
    for (;;) {
      if (r.next_seq < write_seq_) {
        if (write_seq_ - r.next_seq >= depth_) {     // lapped: drop oldest
          std::uint64_t skip = write_seq_ - depth_ + 1 - r.next_seq;
          if (dropped) *dropped += skip;
          r.next_seq = write_seq_ - depth_ + 1;
        }
        const char* p = &data_[(r.next_seq % depth_) * buf_size_];
        if (len) *len = lens_[r.next_seq % depth_];
        ++r.next_seq;
        return p;
      }
      if (closed_ || !wait) return nullptr;
      cv_.wait(lk);
    }
  }

 private:
  const std::size_t buf_size_, depth_;
  std::vector<char> data_;
  std::vector<std::size_t> lens_;
  mutable std::mutex mu_;
  std::condition_variable cv_;
  std::uint64_t write_seq_ = 0;
  bool closed_ = false;
};
