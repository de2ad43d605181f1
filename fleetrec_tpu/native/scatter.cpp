// FleetRec-TPU native scatter egress: one producer fanning blocks out to N
// independent downstream consumers over TCP.
//
// TPU-native analog of the reference's scatter tier
// (FPGA/kernel/user_krnl/scatter_krnl/src/hls/scatter.cpp:116-235 — an FSM
// client that opens useConn connections round-robined over up to 11
// destination IPs and streams fixed packets to each, :298-330 WRITE_PKG).
// Like the reference, the producer CONNECTS OUT to known destinations
// (openConnections analog). Unlike the reference — which blocks the whole
// stream on any one session's backpressure — each consumer here owns a
// bounded block queue drained by its own sender thread, and the round-robin
// skips consumers whose queue is full (or whose connection died), so one
// slow consumer only sheds its own share of the load; the producer blocks
// only when EVERY live consumer is saturated.
//
// Exposed as a C ABI for ctypes (same .so as ingest.cpp).

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Consumer {
  int fd = -1;
  std::string ip;                    // destination, kept for reconnect
  int port = 0;
  std::thread th;
  std::mutex mu;
  std::condition_variable cv;        // sender waits for work
  std::deque<std::vector<char>> q;   // bounded by Scatter::queue_blocks
  std::atomic<bool> dead{false};
  std::atomic<int64_t> sent_blocks{0};
  std::atomic<int64_t> sent_bytes{0};
  std::atomic<int64_t> reconnects{0};
};

struct Scatter {
  int queue_blocks = 4;
  std::vector<std::unique_ptr<Consumer>> consumers;
  std::atomic<bool> stop{false};
  std::atomic<int64_t> skipped{0};   // enqueue attempts deflected by a full
                                     // or dead consumer (isolation events)
  std::mutex rr_mu;                  // protects rr + "all full" wait
  std::condition_variable rr_cv;     // producer waits when all are full
  size_t rr = 0;
};

bool send_all(int fd, const char* p, size_t n) {
  size_t sent = 0;
  while (sent < n) {
    ssize_t r = ::send(fd, p + sent, n - sent, MSG_NOSIGNAL);
    if (r < 0) {
      if (errno == EINTR) continue;
      return false;
    }
    sent += (size_t)r;
  }
  return true;
}

// Dial ip:port, retrying up to `tries` times 100 ms apart (or until *stop).
// Returns the connected fd >= 0 or -errno.
int dial(const char* ip, int port, int tries, const std::atomic<bool>* stop) {
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  if (inet_pton(AF_INET, ip, &addr.sin_addr) != 1) return -EINVAL;
  int e = ECONNREFUSED;
  while (tries-- > 0 && !(stop && stop->load(std::memory_order_relaxed))) {
    int fd = ::socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0) return -errno;
    if (::connect(fd, (sockaddr*)&addr, sizeof(addr)) == 0) {
      int one = 1;
      setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
      return fd;
    }
    e = errno;
    ::close(fd);
    if (tries > 0) ::usleep(100 * 1000);
  }
  return -e;
}

void mark_dead(Scatter* sc, Consumer* c) {
  c->dead.store(true, std::memory_order_release);
  std::lock_guard<std::mutex> lk(sc->rr_mu);
  sc->rr_cv.notify_all();  // producer must not wait on a dead consumer
}

void consumer_thread(Scatter* sc, Consumer* c) {
  while (true) {
    std::vector<char> block;
    {
      std::unique_lock<std::mutex> lk(c->mu);
      c->cv.wait(lk, [&] {
        return !c->q.empty() || sc->stop.load(std::memory_order_relaxed);
      });
      if (c->q.empty()) return;  // stop and drained
      block = std::move(c->q.front());
      c->q.pop_front();
    }
    // A slot freed: the producer may have been waiting on "all full".
    {
      std::lock_guard<std::mutex> lk(sc->rr_mu);
      sc->rr_cv.notify_all();
    }
    // Send, reconnecting on failure — the reference scatter re-arms torn-
    // down sessions rather than abandoning the destination
    // (scatter_krnl/src/hls/scatter.cpp:270-276).  The interrupted block is
    // retransmitted IN FULL on the new connection (consumers treat every
    // new connection as a fresh block-aligned stream, like the ingest
    // tier's reconnect-resume).  While this consumer redials, its bounded
    // queue fills and the round-robin sheds to the others — isolation is
    // preserved.  ~5 s of refused dials (50 x 100 ms) marks it dead;
    // scat_reattach can revive it later.
    while (!send_all(c->fd, block.data(), block.size())) {
      ::close(c->fd);
      c->fd = -1;
      if (sc->stop.load(std::memory_order_relaxed)) return;
      int fd = dial(c->ip.c_str(), c->port, 50, &sc->stop);
      if (fd < 0) {
        mark_dead(sc, c);
        return;
      }
      c->fd = fd;
      c->reconnects.fetch_add(1, std::memory_order_relaxed);
    }
    c->sent_blocks.fetch_add(1, std::memory_order_relaxed);
    c->sent_bytes.fetch_add((int64_t)block.size(), std::memory_order_relaxed);
  }
}

}  // namespace

extern "C" {

void* scat_create(int queue_blocks) {
  auto* sc = new Scatter();
  sc->queue_blocks = queue_blocks < 1 ? 1 : queue_blocks;
  return sc;
}

// Connect one consumer (destination ip:port — the reference's per-IP
// session, scatter.cpp:116-141). Returns the consumer id >= 0 or -errno.
int scat_connect(void* h, const char* ip, int port) {
  auto* sc = (Scatter*)h;
  int fd = dial(ip, port, 50, nullptr);
  if (fd < 0) return fd;
  auto c = std::make_unique<Consumer>();
  c->fd = fd;
  c->ip = ip;
  c->port = port;
  Consumer* cp = c.get();
  cp->th = std::thread(consumer_thread, sc, cp);
  sc->consumers.push_back(std::move(c));
  return (int)sc->consumers.size() - 1;
}

// Revive a dead consumer: redial its stored destination and restart its
// sender thread (the explicit re-attach path for outages longer than the
// in-band ~5 s redial window). Returns 0, or -errno if the dial fails
// (the consumer stays dead and can be reattached again later).
int scat_reattach(void* h, int consumer) {
  auto* sc = (Scatter*)h;
  if (consumer < 0 || consumer >= (int)sc->consumers.size()) return -EINVAL;
  Consumer* c = sc->consumers[consumer].get();
  if (!c->dead.load(std::memory_order_acquire)) return 0;
  if (c->th.joinable()) c->th.join();  // sender thread exited at mark_dead
  int fd = dial(c->ip.c_str(), c->port, 50, &sc->stop);
  if (fd < 0) return fd;
  c->fd = fd;
  c->reconnects.fetch_add(1, std::memory_order_relaxed);
  c->dead.store(false, std::memory_order_release);
  c->th = std::thread(consumer_thread, sc, c);
  return 0;
}

// Fan one block out to the next available consumer, round-robin with
// skip-on-full/skip-on-dead (per-consumer backpressure isolation). Blocks
// only while every live consumer's queue is full. Returns the consumer id
// the block went to, or -ENOTCONN if no live consumers remain.
int scat_send(void* h, const void* buf, int64_t n) {
  auto* sc = (Scatter*)h;
  const size_t N = sc->consumers.size();
  if (N == 0) return -ENOTCONN;
  std::unique_lock<std::mutex> lk(sc->rr_mu);
  while (!sc->stop.load(std::memory_order_relaxed)) {
    int live = 0;
    for (size_t i = 0; i < N; ++i) {
      Consumer* c = sc->consumers[(sc->rr + i) % N].get();
      if (c->dead.load(std::memory_order_acquire)) continue;
      ++live;
      std::unique_lock<std::mutex> clk(c->mu);
      if ((int)c->q.size() >= sc->queue_blocks) {
        sc->skipped.fetch_add(1, std::memory_order_relaxed);
        continue;
      }
      c->q.emplace_back((const char*)buf, (const char*)buf + n);
      clk.unlock();
      c->cv.notify_one();
      int id = (int)((sc->rr + i) % N);
      sc->rr = (size_t)(id + 1) % N;
      return id;
    }
    if (live == 0) return -ENOTCONN;
    // every live consumer full: genuine global backpressure
    sc->rr_cv.wait_for(lk, std::chrono::milliseconds(50));
  }
  return -ECANCELED;
}

// Targeted variant: enqueue for ONE consumer; -EAGAIN if its queue is full,
// -ENOTCONN if it died (callers that shard by key rather than round-robin).
int scat_send_to(void* h, int consumer, const void* buf, int64_t n) {
  auto* sc = (Scatter*)h;
  if (consumer < 0 || consumer >= (int)sc->consumers.size()) return -EINVAL;
  Consumer* c = sc->consumers[consumer].get();
  if (c->dead.load(std::memory_order_acquire)) return -ENOTCONN;
  {
    std::lock_guard<std::mutex> lk(c->mu);
    if ((int)c->q.size() >= sc->queue_blocks) return -EAGAIN;
    c->q.emplace_back((const char*)buf, (const char*)buf + n);
  }
  c->cv.notify_one();
  return 0;
}

int64_t scat_sent_blocks(void* h, int consumer) {
  auto* sc = (Scatter*)h;
  if (consumer < 0 || consumer >= (int)sc->consumers.size()) return -EINVAL;
  return sc->consumers[consumer]->sent_blocks.load();
}

int64_t scat_sent_bytes(void* h, int consumer) {
  auto* sc = (Scatter*)h;
  if (consumer < 0 || consumer >= (int)sc->consumers.size()) return -EINVAL;
  return sc->consumers[consumer]->sent_bytes.load();
}

int scat_is_dead(void* h, int consumer) {
  auto* sc = (Scatter*)h;
  if (consumer < 0 || consumer >= (int)sc->consumers.size()) return -EINVAL;
  return sc->consumers[consumer]->dead.load() ? 1 : 0;
}

int64_t scat_skipped(void* h) { return ((Scatter*)h)->skipped.load(); }

int64_t scat_reconnects(void* h, int consumer) {
  auto* sc = (Scatter*)h;
  if (consumer < 0 || consumer >= (int)sc->consumers.size()) return -EINVAL;
  return sc->consumers[consumer]->reconnects.load();
}

// Stop after draining queued blocks (each sender exits once its queue is
// empty and stop is set); then close all connections.
void scat_destroy(void* h) {
  auto* sc = (Scatter*)h;
  sc->stop.store(true);
  {
    std::lock_guard<std::mutex> lk(sc->rr_mu);
    sc->rr_cv.notify_all();
  }
  for (auto& c : sc->consumers) {
    {
      std::lock_guard<std::mutex> lk(c->mu);
      c->cv.notify_all();
    }
  }
  for (auto& c : sc->consumers) {
    if (c->th.joinable()) c->th.join();
    if (c->fd >= 0) ::close(c->fd);
  }
  delete sc;
}

}  // extern "C"
