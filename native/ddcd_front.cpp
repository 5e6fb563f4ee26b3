// ddcd_front: native client-facing front-end for the Python ddcd server
// (csdr_tpu/server/ddcd.py) — the counterpart of the reference ddcd's C++
// socket layer (ddcd_old.cpp:97-560), kept OUT of the Python device-loop
// process so client churn, slow readers, and command parsing never touch
// the GIL or the TPU step cadence.
//
//   ddcd_front --port 4953 [--address 127.0.0.1] --slots 8 [--qdepth 64]
//
// Parent protocol (the Python server spawns this as a child):
//   stdout (events, newline text):
//     connect <slot>            client accepted and bound to channel slot
//     line <slot> <text>        one newline-terminated command from client
//     close <slot>              client gone; slot free again
//   stdin (data frames, binary): 8-byte little-endian header
//     uint32 slot, uint32 len   followed by len payload bytes routed to
//                               that slot's client (drop-oldest per-client
//                               queue of --qdepth buffers; a stalled
//                               client never blocks the parent's write)
// stdin EOF shuts the front down.
//
// Design: one poll(2) thread owns the listen socket, stdin, and all client
// read-halves; each connected client gets a detached writer thread draining
// its queue (same pattern as nmux.cpp, but routed per-slot instead of
// broadcast).
#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <poll.h>
#include <signal.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

std::mutex out_mu;  // stdout event lines are written atomically

void emit(const char* fmt, int slot, const std::string& text = "") {
  std::lock_guard<std::mutex> lk(out_mu);
  if (text.empty())
    std::fprintf(stdout, fmt, slot);
  else
    std::fprintf(stdout, fmt, slot, text.c_str());
  std::fflush(stdout);
}

struct Slot {
  int fd = -1;                       // -1: free
  int gen = 0;                       // bumps on every (dis)connect
  bool closing = false;
  std::deque<std::vector<char>> q;   // drop-oldest
  std::uint64_t dropped = 0;
  std::string rxbuf;                 // partial command line
  std::mutex mu;
  std::condition_variable cv;
};

std::vector<Slot> slots;
std::size_t qdepth = 64;
std::atomic<int> n_writers{0};

// Writer thread: drains slot s's queue for connection generation `gen`.
// The writer OWNS closing `fd`: close_slot only shutdown(2)s it, so the fd
// number cannot be reused by accept(2) while a send on it may still be in
// flight here (fd-reuse would let a stale writer feed a fresh client).
void writer_loop(int s, int gen, int fd) {
  Slot& sl = slots[static_cast<std::size_t>(s)];
  for (;;) {
    std::vector<char> buf;
    {
      std::unique_lock<std::mutex> lk(sl.mu);
      sl.cv.wait(lk, [&] {
        return sl.gen != gen || sl.closing || !sl.q.empty();
      });
      if (sl.gen != gen || sl.closing) break;
      buf = std::move(sl.q.front());
      sl.q.pop_front();
    }
    std::size_t off = 0;
    while (off < buf.size()) {
      ssize_t sent = send(fd, buf.data() + off, buf.size() - off,
                          MSG_NOSIGNAL);
      if (sent <= 0) {
        // let the poll thread observe the dead socket and run the
        // close path exactly once
        std::lock_guard<std::mutex> lk(sl.mu);
        sl.closing = true;
        off = buf.size();
      } else {
        off += static_cast<std::size_t>(sent);
      }
    }
  }
  // Don't close until close_slot has invalidated the slot (gen bump):
  // if this writer exited on self-detected `closing`, close_slot still
  // holds the fd NUMBER and will shutdown(2) it — closing first would
  // let accept(2) reuse the number and that shutdown hit a stranger.
  {
    std::unique_lock<std::mutex> lk(sl.mu);
    sl.cv.wait(lk, [&] { return sl.gen != gen; });
  }
  close(fd);
  --n_writers;
}

// Must hold no slot lock.  Frees the slot and emits `close` once.  The fd
// itself is only shutdown(2) here — its writer thread closes it on exit.
void close_slot(int s) {
  Slot& sl = slots[static_cast<std::size_t>(s)];
  int fd;
  {
    std::lock_guard<std::mutex> lk(sl.mu);
    if (sl.fd < 0) return;
    fd = sl.fd;
    sl.fd = -1;
    sl.gen++;
    sl.closing = false;
    sl.q.clear();
    sl.rxbuf.clear();
  }
  sl.cv.notify_all();
  shutdown(fd, SHUT_RDWR);
  emit("close %d\n", s);
}

bool read_exact(int fd, char* dst, std::size_t n) {
  std::size_t off = 0;
  while (off < n) {
    ssize_t got = read(fd, dst + off, n - off);
    if (got <= 0) return false;
    off += static_cast<std::size_t>(got);
  }
  return true;
}

int usage(const char* argv0) {
  std::fprintf(stderr,
               "usage: %s --port <p> --slots <n> [--address <a>] "
               "[--qdepth <d>]\n",
               argv0);
  return 1;
}

}  // namespace

int main(int argc, char** argv) {
  int port = 0, nslots = 0;
  std::string address = "127.0.0.1";
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> const char* {
      if (i + 1 >= argc) {
        std::fprintf(stderr, "ddcd_front: %s needs a value\n", a.c_str());
        std::exit(1);
      }
      return argv[++i];
    };
    if (a == "--port" || a == "-p") port = atoi(next());
    else if (a == "--address" || a == "-a") address = next();
    else if (a == "--slots" || a == "-s") nslots = atoi(next());
    else if (a == "--qdepth" || a == "-q") qdepth = static_cast<std::size_t>(atoi(next()));
    else if (a == "--help" || a == "-h") return usage(argv[0]);
    else { std::fprintf(stderr, "ddcd_front: unknown arg %s\n", a.c_str()); return 1; }
  }
  if (port <= 0 || nslots <= 0 || qdepth < 2) return usage(argv[0]);
  signal(SIGPIPE, SIG_IGN);
  slots = std::vector<Slot>(static_cast<std::size_t>(nslots));

  int lfd = socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(lfd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (inet_pton(AF_INET, address.c_str(), &addr.sin_addr) != 1) {
    std::fprintf(stderr, "ddcd_front: bad address %s\n", address.c_str());
    return 1;
  }
  int bind_rc = -1;
  for (int attempt = 0; attempt < 10; ++attempt) {   // TIME_WAIT races
    bind_rc = bind(lfd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr));
    if (bind_rc == 0) break;
    std::fprintf(stderr, "ddcd_front: bind failed (%s), retrying...\n",
                 strerror(errno));
    usleep(500000);
  }
  if (bind_rc < 0 || listen(lfd, 16) < 0) {
    perror("ddcd_front: bind/listen");
    return 1;
  }
  std::fprintf(stderr, "ddcd_front: listening on %s:%d, %d slots\n",
               address.c_str(), port, nslots);

  for (;;) {
    std::vector<pollfd> fds;
    fds.push_back({STDIN_FILENO, POLLIN, 0});
    fds.push_back({lfd, POLLIN, 0});
    std::vector<int> fd_slot;  // parallel to fds[2..]
    for (int s = 0; s < nslots; ++s) {
      std::lock_guard<std::mutex> lk(slots[static_cast<std::size_t>(s)].mu);
      if (slots[static_cast<std::size_t>(s)].fd >= 0) {
        fds.push_back({slots[static_cast<std::size_t>(s)].fd, POLLIN, 0});
        fd_slot.push_back(s);
      }
    }
    if (poll(fds.data(), fds.size(), 200) < 0) {
      if (errno == EINTR) continue;
      perror("ddcd_front: poll");
      break;
    }
    // reap writer-detected dead clients
    for (int s = 0; s < nslots; ++s) {
      bool dead;
      {
        Slot& sl = slots[static_cast<std::size_t>(s)];
        std::lock_guard<std::mutex> lk(sl.mu);
        dead = sl.fd >= 0 && sl.closing;
      }
      if (dead) close_slot(s);
    }
    // client command bytes
    for (std::size_t i = 2; i < fds.size(); ++i) {
      if (!(fds[i].revents & (POLLIN | POLLHUP | POLLERR))) continue;
      int s = fd_slot[i - 2];
      Slot& sl = slots[static_cast<std::size_t>(s)];
      char tmp[1024];
      ssize_t got = recv(fds[i].fd, tmp, sizeof(tmp), 0);
      if (got <= 0) {
        close_slot(s);
        continue;
      }
      std::string lines_out;
      {
        std::lock_guard<std::mutex> lk(sl.mu);
        sl.rxbuf.append(tmp, static_cast<std::size_t>(got));
        std::size_t nl;
        while ((nl = sl.rxbuf.find('\n')) != std::string::npos) {
          std::string line = sl.rxbuf.substr(0, nl);
          sl.rxbuf.erase(0, nl + 1);
          if (!line.empty() && line.back() == '\r') line.pop_back();
          lines_out += "line " + std::to_string(s) + " " + line + "\n";
        }
      }
      if (!lines_out.empty()) {
        std::lock_guard<std::mutex> lk(out_mu);
        std::fwrite(lines_out.data(), 1, lines_out.size(), stdout);
        std::fflush(stdout);
      }
    }
    // accept AFTER client reads: a just-closed fd number may be
    // reused by accept(2); processing stale poll entries first keeps
    // a fresh client's fd from matching an old slot's entry
    if (fds[1].revents & POLLIN) {
      int cfd = accept(lfd, nullptr, nullptr);
      if (cfd >= 0) {
        int s = -1;
        for (int k = 0; k < nslots && s < 0; ++k) {
          Slot& sl = slots[static_cast<std::size_t>(k)];
          std::lock_guard<std::mutex> lk(sl.mu);
          if (sl.fd < 0) {
            sl.fd = cfd;
            sl.closing = false;
            s = k;
            setsockopt(cfd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
            ++n_writers;
            std::thread(writer_loop, k, sl.gen, cfd).detach();
          }
        }
        if (s < 0) {
          std::fprintf(stderr, "ddcd_front: no free slots\n");
          close(cfd);
        } else {
          emit("connect %d\n", s);
        }
      }
    }
    // parent data frames
    if (fds[0].revents & (POLLIN | POLLHUP)) {
      char hdr[8];
      if (!read_exact(STDIN_FILENO, hdr, 8)) break;   // parent EOF
      std::uint32_t slot, len;
      std::memcpy(&slot, hdr, 4);
      std::memcpy(&len, hdr + 4, 4);
      std::vector<char> payload(len);
      if (len && !read_exact(STDIN_FILENO, payload.data(), len)) break;
      if (slot < static_cast<std::uint32_t>(nslots)) {
        Slot& sl = slots[slot];
        bool notify = false;
        {
          std::lock_guard<std::mutex> lk(sl.mu);
          if (sl.fd >= 0 && !sl.closing) {
            if (sl.q.size() >= qdepth) {
              sl.q.pop_front();            // drop-oldest
              if ((++sl.dropped % 64) == 1)
                std::fprintf(stderr,
                             "ddcd_front: slot %u lapped (%llu dropped)\n",
                             slot,
                             static_cast<unsigned long long>(sl.dropped));
            }
            sl.q.push_back(std::move(payload));
            notify = true;
          }
        }
        if (notify) sl.cv.notify_one();
      }
    }
  }
  // close the listen socket FIRST: a lame-duck backlog must not keep
  // accepting handshakes while writers drain
  close(lfd);
  for (int s = 0; s < nslots; ++s) close_slot(s);
  for (int i = 0; i < 100 && n_writers.load() > 0; ++i) usleep(20000);
  return 0;
}
