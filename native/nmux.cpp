// nmux: single-producer multi-consumer TCP stream fan-out.
//
// TPU-era equivalent of the reference's nmux (nmux.cpp:60-353): reads a raw
// sample stream on stdin, publishes it through a TsmPool, and serves any
// number of TCP clients, each on its own thread.  Slow clients are lapped
// (drop-oldest) instead of stalling the producer — the property that lets a
// waterfall client and a demod client share one SDR stream.
//
//   nmux --port 4952 [--address 0.0.0.0] [--bufsize 65536] [--bufcnt 64]
//
// Design differences from the reference (not a translation): buffer
// hand-off is the seq-numbered TsmPool (tsmpool.hpp); client threads are
// std::thread detached against an atomic live-count; the accept loop uses
// poll(2); partial stdin reads are accumulated into full bufsize buffers,
// and the final partial buffer at EOF is published with its exact length
// (like the reference) so no tail bytes of a finite stream are lost.
#include "tsmpool.hpp"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <poll.h>
#include <signal.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>

namespace {

std::atomic<int> n_clients{0};
std::atomic<int> client_seq{0};

void client_loop(int fd, int client_id, TsmPool* pool) {
  TsmPool::Reader r = pool->register_reader();
  std::uint64_t sent_bytes = 0, dropped_bufs = 0, last_dropped = 0;
  for (;;) {
    std::size_t bs = 0;
    const char* buf = pool->read_next(r, /*wait=*/true, &bs, &dropped_bufs);
    if (!buf) break;                       // producer EOF
    if (dropped_bufs != last_dropped) {
      // backpressure stat: slow client fell a pool-depth behind and was
      // lapped (drop-oldest) — report like the reference's client-loss log
      std::fprintf(stderr,
                   "nmux: client %d lapped, %llu buffers dropped total\n",
                   client_id,
                   static_cast<unsigned long long>(dropped_bufs));
      last_dropped = dropped_bufs;
    }
    std::size_t off = 0;
    while (off < bs) {
      ssize_t sent = send(fd, buf + off, bs - off, MSG_NOSIGNAL);
      if (sent <= 0) goto done;            // client went away
      off += static_cast<std::size_t>(sent);
    }
    sent_bytes += bs;
  }
done:
  std::fprintf(stderr,
               "nmux: client %d disconnected (%llu bytes sent, %llu "
               "buffers dropped)\n",
               client_id, static_cast<unsigned long long>(sent_bytes),
               static_cast<unsigned long long>(dropped_bufs));
  close(fd);
  --n_clients;
}

int usage(const char* argv0) {
  std::fprintf(stderr,
               "usage: %s --port <p> [--address <a>] [--bufsize <b>] "
               "[--bufcnt <n>]\n",
               argv0);
  return 1;
}

}  // namespace

int main(int argc, char** argv) {
  int port = 0, bufsize = 65536, bufcnt = 64;
  std::string address = "0.0.0.0";
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> const char* {
      if (i + 1 >= argc) {
        std::fprintf(stderr, "nmux: %s needs a value\n", a.c_str());
        std::exit(1);
      }
      return argv[++i];
    };
    if (a == "--port" || a == "-p") port = atoi(next());
    else if (a == "--address" || a == "-a") address = next();
    else if (a == "--bufsize" || a == "-b") bufsize = atoi(next());
    else if (a == "--bufcnt" || a == "-n") bufcnt = atoi(next());
    else if (a == "--help" || a == "-h") return usage(argv[0]);
    else { std::fprintf(stderr, "nmux: unknown arg %s\n", a.c_str()); return 1; }
  }
  if (port <= 0 || bufsize <= 0 || bufcnt <= 1) return usage(argv[0]);
  signal(SIGPIPE, SIG_IGN);

  int lfd = socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(lfd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (inet_pton(AF_INET, address.c_str(), &addr.sin_addr) != 1) {
    std::fprintf(stderr, "nmux: bad address %s\n", address.c_str());
    return 1;
  }
  // bind with retries: a restarting fan-out server commonly races the old
  // instance's TIME_WAIT socket
  int bind_rc = -1;
  for (int attempt = 0; attempt < 10; ++attempt) {
    bind_rc = bind(lfd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr));
    if (bind_rc == 0) break;
    std::fprintf(stderr, "nmux: bind failed (%s), retrying...\n",
                 strerror(errno));
    usleep(500000);
  }
  if (bind_rc < 0 || listen(lfd, 16) < 0) {
    perror("nmux: bind/listen");
    return 1;
  }
  std::fprintf(stderr, "nmux: listening on %s:%d, bufsize=%d bufcnt=%d\n",
               address.c_str(), port, bufsize, bufcnt);

  TsmPool pool(static_cast<std::size_t>(bufsize),
               static_cast<std::size_t>(bufcnt));
  char* wbuf = pool.write_buffer();
  std::size_t fill = 0;

  pollfd fds[2] = {{STDIN_FILENO, POLLIN, 0}, {lfd, POLLIN, 0}};
  bool stdin_open = true;
  for (;;) {
    fds[0].fd = stdin_open ? STDIN_FILENO : -1;
    if (poll(fds, 2, -1) < 0) {
      if (errno == EINTR) continue;
      perror("nmux: poll");
      break;
    }
    if (fds[1].revents & POLLIN) {
      int cfd = accept(lfd, nullptr, nullptr);
      if (cfd >= 0) {
        setsockopt(cfd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
        ++n_clients;
        int cid = ++client_seq;
        std::fprintf(stderr, "nmux: client %d connected (%d total)\n",
                     cid, n_clients.load());
        std::thread(client_loop, cfd, cid, &pool).detach();
      }
    }
    if (stdin_open && (fds[0].revents & (POLLIN | POLLHUP))) {
      ssize_t got = read(STDIN_FILENO, wbuf + fill,
                         static_cast<std::size_t>(bufsize) - fill);
      if (got <= 0) {
        stdin_open = false;
        if (fill > 0) pool.commit(fill);   // publish partial tail on EOF
        pool.close();
        break;
      }
      fill += static_cast<std::size_t>(got);
      if (fill == static_cast<std::size_t>(bufsize)) {
        pool.commit();
        wbuf = pool.write_buffer();
        fill = 0;
      }
    }
  }
  // stop accepting BEFORE the drain (no lame-duck backlog), then give
  // connected clients a moment to finish sending the stream tail
  close(lfd);
  for (int i = 0; i < 100 && n_clients.load() > 0; ++i)
    usleep(20000);
  return 0;
}
