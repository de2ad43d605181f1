// FleetRec-TPU native feature-ingest server.
//
// TPU-native analog of the reference GPU tier's socket layer
// (GPU/final_network_cublasLt_3_nodes_no_FIFO_scatter/cuda_server.c:362-488
// socket setup, :514-587 fixed-offset receive concatenation) and of its
// FIFO/ring-buffer measurement variant
// (GPU/measure_network_cuda_cp_latency_3_nodes/cuda_server.c:119-247
// receiver threads, :690-728 ring + control words) — with the hand-rolled
// spin-wait control words replaced by C++11 atomics and condition variables
// (the reference left that protocol untested; see SURVEY.md §5).
//
// Model: N senders (the reference's CPU0/FPGA0/FPGA1 feature sources), each
// opening `n_conns` parallel TCP connections — the reference's `useConn`
// bandwidth knob (FPGA/kernel/user_krnl/embedding_krnl/src/hls/
// embedding_krnl.cpp:45-143 `sendData` round-robins fixed pkgWordCount
// packets over useConn sessions; default 4 conns,
// FPGA/host/embedding_krnl/host.cpp:976-977). A batch slot is a contiguous
// float buffer of sum(bytes_per_sender); sender s's payload lands at its
// fixed offset (constant.h:25-27's 64+1952+1952 layout generalized), and
// within it packet j (pkg_bytes each) is carried by connection j % n_conns
// at offset j*pkg_bytes — deterministic reassembly with no wire header.
// Each connection ("stripe") has its own port: port_base + s*n_conns + c,
// mirroring the reference where useConn connections land on distinct
// server-thread ports (cuda_server.c:362-488, ports 7080+i/8080+i/9080+i).
// A ring of S slots decouples receive from compute; the consumer (Python
// serving loop) acquires complete slots, hands the buffer to JAX, releases.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

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
#include <memory>
#include <mutex>
#include <thread>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

inline int64_t now_ns() {
  return std::chrono::duration_cast<std::chrono::nanoseconds>(
             Clock::now().time_since_epoch())
      .count();
}

struct SlotState {
  std::atomic<int> parts_done{0};   // stripes completed for this fill
  std::atomic<int64_t> first_byte_ns{0};
  std::atomic<int64_t> complete_ns{0};
  std::atomic<bool> ready{false};   // complete, not yet consumed
  // The batch id this slot currently accepts (slot s serves batches
  // s, s+n_slots, ...). Writers for batch b must wait until batch_id == b:
  // a plain free flag is not enough — a fast sender could start writing
  // batch b+n_slots while slow senders still fill batch b (the cross-lap
  // race the reference's hand-rolled ring protocol guarded with iteration
  // distance checks, measure_.../cuda_server.c:201-220).
  std::atomic<int64_t> batch_id{0};
};

// One receive stream: connection c of sender s, owning packets
// j ∈ {c, c+C, c+2C, ...} of that sender's per-batch payload.
struct Stripe {
  int sender = 0;
  int conn = 0;                       // 0..active_conns(sender)-1
  int port = 0;
  // Byte segments (offset into the SLOT buffer, length) this stripe
  // receives per batch, in wire order.
  std::vector<std::pair<size_t, size_t>> segs;
};

struct Ingest {
  int n_senders = 0;
  int n_slots = 0;
  int n_conns = 1;                    // requested conns per sender
  size_t pkg_bytes = 0;               // 0 => whole payload in one packet
  std::vector<size_t> bytes_per_sender;
  std::vector<size_t> offset_per_sender;  // byte offset into slot buffer
  size_t slot_bytes = 0;
  int port_base = 0;
  int total_parts = 0;                // active stripes across all senders

  std::vector<char> ring;  // n_slots * slot_bytes
  std::vector<SlotState> slots;
  std::vector<Stripe> stripes;

  // Per-stripe receive thread writes batch b into slot b % n_slots.
  std::vector<std::thread> threads;
  std::vector<int> listen_fds;        // one per stripe
  // Live connection fd per sender (-1 when disconnected), carried by the
  // sender's conn-0 stripe: the scores egress channel — TCP is full-duplex,
  // so replies ride the same connection the sender streams on (the
  // reference only sends a single end-of-run ack, cuda_server.c; per-batch
  // replies close the loop). reply_mus[s] serializes ing_reply with the
  // stripe thread's close(): without it a reply could send on an fd the
  // kernel has already closed and RE-ISSUED to the replacement connection,
  // injecting score bytes into the wrong stream.
  std::unique_ptr<std::atomic<int>[]> live_fds;
  std::unique_ptr<std::mutex[]> reply_mus;
  // Every stripe's CURRENT accepted connection fd (-1 = none), guarded by
  // fd_mu: ing_stop must shutdown() live connections too, or a stripe
  // thread blocked in recv() on an idle-but-open client never observes
  // stop and ing_destroy joins forever (a client that sends its batches
  // and then just keeps the socket open is normal — it may be waiting for
  // replies). fd_mu pairs the stop-side shutdown with the stripe-side
  // close so shutdown can never hit a recycled fd number.
  std::vector<int> conn_fds;
  std::mutex fd_mu;
  std::atomic<bool> stop{false};
  std::atomic<int64_t> total_batches{0};
  std::atomic<int64_t> bytes_received{0};
  std::atomic<int> error_code{0};
  // Per-sender observability — the analog of the hardware stack's
  // per-protocol rx/tx packet counters (network_stack.sv:1049-1100),
  // which the reference exposes over AXI-Lite for diagnosing a slow or
  // flapping sender. fills = per-stripe batch-payload completions (divide
  // by sender_stripes for whole batches); last_fill_ns lets a monitor spot
  // the stalled sender among healthy ones.
  std::unique_ptr<std::atomic<int64_t>[]> sender_bytes;
  std::unique_ptr<std::atomic<int64_t>[]> sender_fills;
  std::unique_ptr<std::atomic<int64_t>[]> sender_reconnects;
  std::unique_ptr<std::atomic<int64_t>[]> sender_last_fill_ns;
  std::vector<int> sender_stripes;    // active stripes per sender

  std::mutex mu;
  std::condition_variable cv_ready;   // consumer waits for a ready slot
  std::condition_variable cv_free;    // writers wait for slot free
  int64_t next_consume = 0;           // batch id the consumer takes next

  char* slot_ptr(int s) { return ring.data() + (size_t)s * slot_bytes; }
};

// Receive exactly n bytes; returns false on EOF/error/stop.
bool recv_all(Ingest* ing, int fd, char* dst, size_t n, int64_t* first_ns) {
  size_t got = 0;
  while (got < n && !ing->stop.load(std::memory_order_relaxed)) {
    ssize_t r = ::recv(fd, dst + got, n - got, 0);
    if (r <= 0) {
      if (r < 0 && (errno == EINTR)) continue;
      if (r < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) continue;
      return false;
    }
    if (got == 0 && first_ns && *first_ns == 0) *first_ns = now_ns();
    got += (size_t)r;
  }
  return got == n;
}

bool run_connection(Ingest* ing, const Stripe& st, int fd, int64_t* batch_io);

void stripe_thread(Ingest* ing, int stripe_idx) {
  // Accept-and-resume loop: unlike the reference (which printf+exits on any
  // socket error, cuda_server.c:370-401), a dropped connection re-enters
  // accept() and the replacement sender resumes at the batch boundary that
  // was in flight — this stripe's packet set is simply rewritten from its
  // first segment.
  const Stripe& st = ing->stripes[stripe_idx];
  int listen_fd = ing->listen_fds[stripe_idx];
  int64_t batch = 0;
  int accepts = 0;

  while (!ing->stop.load(std::memory_order_relaxed)) {
    sockaddr_in cli{};
    socklen_t len = sizeof(cli);
    int fd = ::accept(listen_fd, (sockaddr*)&cli, &len);
    if (fd < 0) {
      if (!ing->stop.load(std::memory_order_relaxed))
        ing->error_code.store(-errno);
      return;
    }
    if (accepts++ > 0)
      ing->sender_reconnects[st.sender].fetch_add(1, std::memory_order_relaxed);
    int one = 1;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    {
      std::lock_guard<std::mutex> lk(ing->fd_mu);
      if (ing->stop.load(std::memory_order_relaxed)) {
        // lost the race with ing_stop's shutdown sweep: don't run a
        // connection stop can no longer interrupt
        ::close(fd);
        return;
      }
      ing->conn_fds[stripe_idx] = fd;
    }
    if (st.conn == 0)
      ing->live_fds[st.sender].store(fd, std::memory_order_release);
    bool conn_ok = run_connection(ing, st, fd, &batch);
    if (st.conn == 0) {
      // Serialize with in-flight ing_reply before the fd number can be
      // reused by the next accept().
      std::lock_guard<std::mutex> lk(ing->reply_mus[st.sender]);
      ing->live_fds[st.sender].store(-1, std::memory_order_release);
      std::lock_guard<std::mutex> lk2(ing->fd_mu);
      ing->conn_fds[stripe_idx] = -1;
      ::close(fd);
    } else {
      std::lock_guard<std::mutex> lk(ing->fd_mu);
      ing->conn_fds[stripe_idx] = -1;
      ::close(fd);
    }
    if (!conn_ok) return;  // stop requested
  }
}

// Receive batches on one connection; returns false only on stop.
bool run_connection(Ingest* ing, const Stripe& st, int fd, int64_t* batch_io) {
  for (int64_t& batch = *batch_io; !ing->stop.load(std::memory_order_relaxed);
       ++batch) {
    int slot = (int)(batch % ing->n_slots);
    SlotState& ss = ing->slots[slot];
    // Wait until this slot has advanced to OUR batch (consumer released all
    // previous laps).
    {
      std::unique_lock<std::mutex> lk(ing->mu);
      ing->cv_free.wait(lk, [&] {
        return ss.batch_id.load(std::memory_order_acquire) == batch ||
               ing->stop.load(std::memory_order_relaxed);
      });
      if (ing->stop.load(std::memory_order_relaxed)) return false;
    }
    int64_t first_ns = 0;
    char* base = ing->slot_ptr(slot);
    size_t nbytes = 0;
    bool ok = true;
    for (const auto& seg : st.segs) {
      if (!recv_all(ing, fd, base + seg.first, seg.second, &first_ns)) {
        ok = false;
        break;
      }
      nbytes += seg.second;
    }
    if (!ok) {
      // Connection dropped (or stop). Do not advance `batch`: the next
      // connection refills this same batch from this stripe's first segment.
      return !ing->stop.load(std::memory_order_relaxed);
    }
    ing->bytes_received.fetch_add((int64_t)nbytes, std::memory_order_relaxed);
    ing->sender_bytes[st.sender].fetch_add((int64_t)nbytes,
                                           std::memory_order_relaxed);
    ing->sender_fills[st.sender].fetch_add(1, std::memory_order_relaxed);
    ing->sender_last_fill_ns[st.sender].store(now_ns(),
                                              std::memory_order_relaxed);
    // Record earliest first-byte across stripes (the reference stamps at
    // first recv byte per sender, cuda_server.c:519).
    int64_t prev = ss.first_byte_ns.load(std::memory_order_relaxed);
    while ((prev == 0 || first_ns < prev) &&
           !ss.first_byte_ns.compare_exchange_weak(prev, first_ns)) {
    }
    if (ss.parts_done.fetch_add(1, std::memory_order_acq_rel) + 1 ==
        ing->total_parts) {
      ss.complete_ns.store(now_ns(), std::memory_order_relaxed);
      ss.parts_done.store(0, std::memory_order_relaxed);
      ss.ready.store(true, std::memory_order_release);
      ing->total_batches.fetch_add(1, std::memory_order_relaxed);
      std::lock_guard<std::mutex> lk(ing->mu);
      ing->cv_ready.notify_all();
    }
  }
  return false;
}

}  // namespace

extern "C" {

// Multi-connection creator: n_conns parallel connections per sender, payload
// striped by pkg_bytes packets (the reference's useConn/pkgWordCount pair).
// pkg_bytes == 0 or n_conns == 1 degrades to one whole-payload packet per
// sender. Senders whose payload has fewer packets than n_conns get only
// ceil(bytes/pkg_bytes) connections; ports are port_base + s*n_conns + c.
void* ing_create_mc(int n_senders, const int64_t* bytes_per_sender,
                    int n_slots, int port_base, int n_conns,
                    int64_t pkg_bytes) {
  auto* ing = new Ingest();
  ing->n_senders = n_senders;
  ing->n_slots = n_slots;
  ing->port_base = port_base;
  ing->n_conns = n_conns < 1 ? 1 : n_conns;
  ing->pkg_bytes = pkg_bytes <= 0 ? 0 : (size_t)pkg_bytes;
  size_t off = 0;
  for (int s = 0; s < n_senders; ++s) {
    ing->bytes_per_sender.push_back((size_t)bytes_per_sender[s]);
    ing->offset_per_sender.push_back(off);
    off += (size_t)bytes_per_sender[s];
  }
  ing->slot_bytes = off;
  ing->ring.resize((size_t)n_slots * off);
  ing->slots = std::vector<SlotState>(n_slots);
  for (int s = 0; s < n_slots; ++s) ing->slots[s].batch_id.store(s);
  ing->live_fds = std::make_unique<std::atomic<int>[]>(n_senders);
  for (int s = 0; s < n_senders; ++s) ing->live_fds[s].store(-1);
  ing->reply_mus = std::make_unique<std::mutex[]>(n_senders);
  ing->sender_bytes = std::make_unique<std::atomic<int64_t>[]>(n_senders);
  ing->sender_fills = std::make_unique<std::atomic<int64_t>[]>(n_senders);
  ing->sender_reconnects = std::make_unique<std::atomic<int64_t>[]>(n_senders);
  ing->sender_last_fill_ns = std::make_unique<std::atomic<int64_t>[]>(n_senders);
  for (int s = 0; s < n_senders; ++s) {
    ing->sender_bytes[s].store(0);
    ing->sender_fills[s].store(0);
    ing->sender_reconnects[s].store(0);
    ing->sender_last_fill_ns[s].store(0);
  }

  for (int s = 0; s < n_senders; ++s) {
    const size_t nbytes = ing->bytes_per_sender[s];
    const size_t base = ing->offset_per_sender[s];
    const size_t pkg =
        (ing->pkg_bytes == 0 || ing->n_conns == 1) ? nbytes : ing->pkg_bytes;
    const size_t npkg = pkg ? (nbytes + pkg - 1) / pkg : 0;
    const int active =
        (int)((npkg < (size_t)ing->n_conns) ? npkg : (size_t)ing->n_conns);
    for (int c = 0; c < active; ++c) {
      Stripe st;
      st.sender = s;
      st.conn = c;
      st.port = port_base + s * ing->n_conns + c;
      for (size_t j = c; j < npkg; j += (size_t)active) {
        size_t seg_off = base + j * pkg;
        size_t seg_len = (j + 1 == npkg) ? nbytes - j * pkg : pkg;
        st.segs.emplace_back(seg_off, seg_len);
      }
      ing->stripes.push_back(std::move(st));
    }
    ing->sender_stripes.push_back(active);
  }
  ing->total_parts = (int)ing->stripes.size();
  return ing;
}

void* ing_create(int n_senders, const int64_t* bytes_per_sender, int n_slots,
                 int port_base) {
  return ing_create_mc(n_senders, bytes_per_sender, n_slots, port_base, 1, 0);
}

// Send n bytes back to sender's live conn-0 connection (scores egress).
// Returns 0, -ENOTCONN if the sender is disconnected, or -errno on send
// failure. Caller must ensure the client actually reads replies, or its
// socket buffer eventually fills and this blocks. Holds the sender's reply
// mutex for the whole send so the fd cannot be closed/reused underneath it.
int ing_reply(void* h, int sender, const void* buf, int64_t n) {
  auto* ing = (Ingest*)h;
  if (sender < 0 || sender >= ing->n_senders) return -EINVAL;
  std::lock_guard<std::mutex> lk(ing->reply_mus[sender]);
  int fd = ing->live_fds[sender].load(std::memory_order_acquire);
  if (fd < 0) return -ENOTCONN;
  const char* p = (const char*)buf;
  size_t sent = 0;
  while (sent < (size_t)n) {
    ssize_t r = ::send(fd, p + sent, (size_t)n - sent, MSG_NOSIGNAL);
    if (r < 0) {
      if (errno == EINTR) continue;
      return -errno;
    }
    sent += (size_t)r;
  }
  return 0;
}

// Bind+listen all stripe ports. Returns 0 or -errno.
int ing_listen(void* h) {
  auto* ing = (Ingest*)h;
  for (const Stripe& st : ing->stripes) {
    int fd = ::socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0) return -errno;
    int one = 1;
    setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = INADDR_ANY;
    addr.sin_port = htons((uint16_t)st.port);
    if (::bind(fd, (sockaddr*)&addr, sizeof(addr)) < 0 ||
        ::listen(fd, 16) < 0) {
      int e = errno;
      ::close(fd);
      return -e;
    }
    ing->listen_fds.push_back(fd);
  }
  return 0;
}

// Spawn per-stripe receive threads (each blocks in accept()).
void ing_start(void* h) {
  auto* ing = (Ingest*)h;
  ing->conn_fds.assign(ing->stripes.size(), -1);
  for (int i = 0; i < (int)ing->stripes.size(); ++i) {
    ing->threads.emplace_back(stripe_thread, ing, i);
  }
}

// Block until the next batch (in order) is complete. Returns slot id >= 0,
// -1 on timeout, -2 on stop/error.
int ing_acquire(void* h, int timeout_ms) {
  auto* ing = (Ingest*)h;
  int slot = (int)(ing->next_consume % ing->n_slots);
  SlotState& st = ing->slots[slot];
  std::unique_lock<std::mutex> lk(ing->mu);
  bool ok = ing->cv_ready.wait_for(
      lk, std::chrono::milliseconds(timeout_ms), [&] {
        return st.ready.load(std::memory_order_acquire) ||
               ing->stop.load(std::memory_order_relaxed) ||
               ing->error_code.load() != 0;
      });
  if (!ok) return -1;
  if (!st.ready.load(std::memory_order_acquire)) return -2;
  ing->next_consume++;
  return slot;
}

float* ing_slot_data(void* h, int slot) {
  auto* ing = (Ingest*)h;
  return (float*)ing->slot_ptr(slot);
}

int64_t ing_slot_first_byte_ns(void* h, int slot) {
  return ((Ingest*)h)->slots[slot].first_byte_ns.load();
}

int64_t ing_slot_complete_ns(void* h, int slot) {
  return ((Ingest*)h)->slots[slot].complete_ns.load();
}

void ing_release(void* h, int slot) {
  auto* ing = (Ingest*)h;
  SlotState& st = ing->slots[slot];
  st.ready.store(false, std::memory_order_relaxed);
  st.first_byte_ns.store(0, std::memory_order_relaxed);
  st.complete_ns.store(0, std::memory_order_relaxed);
  // Advance the slot to its next lap; writers waiting on batch_id wake up.
  st.batch_id.fetch_add(ing->n_slots, std::memory_order_release);
  std::lock_guard<std::mutex> lk(ing->mu);
  ing->cv_free.notify_all();
}

int64_t ing_total_batches(void* h) { return ((Ingest*)h)->total_batches.load(); }
int64_t ing_bytes_received(void* h) { return ((Ingest*)h)->bytes_received.load(); }
int ing_error(void* h) { return ((Ingest*)h)->error_code.load(); }

// Number of listen ports (active stripes) — for clients that need to know
// how many connections to open per sender after short-payload clamping.
int ing_n_stripes(void* h) { return (int)((Ingest*)h)->stripes.size(); }

// --- per-sender observability (network_stack.sv:1049-1100 analog) ---------
static inline bool bad_sender(Ingest* ing, int s) {
  return s < 0 || s >= ing->n_senders;
}

int64_t ing_sender_bytes(void* h, int s) {
  auto* ing = (Ingest*)h;
  return bad_sender(ing, s) ? -EINVAL : ing->sender_bytes[s].load();
}

// Per-stripe batch-payload completions for sender s (divide by
// ing_sender_stripes for whole batches).
int64_t ing_sender_fills(void* h, int s) {
  auto* ing = (Ingest*)h;
  return bad_sender(ing, s) ? -EINVAL : ing->sender_fills[s].load();
}

int64_t ing_sender_reconnects(void* h, int s) {
  auto* ing = (Ingest*)h;
  return bad_sender(ing, s) ? -EINVAL : ing->sender_reconnects[s].load();
}

// steady-clock ns of sender s's most recent completed stripe fill (0 =
// never) — a monitor compares against now to spot the stalled sender.
int64_t ing_sender_last_fill_ns(void* h, int s) {
  auto* ing = (Ingest*)h;
  return bad_sender(ing, s) ? -EINVAL : ing->sender_last_fill_ns[s].load();
}

int ing_sender_stripes(void* h, int s) {
  auto* ing = (Ingest*)h;
  return bad_sender(ing, s) ? -EINVAL : ing->sender_stripes[s];
}

void ing_stop(void* h) {
  auto* ing = (Ingest*)h;
  ing->stop.store(true);
  {
    std::lock_guard<std::mutex> lk(ing->mu);
    ing->cv_ready.notify_all();
    ing->cv_free.notify_all();
  }
  for (int fd : ing->listen_fds) ::shutdown(fd, SHUT_RDWR);
  for (int fd : ing->listen_fds) ::close(fd);
  {
    // unblock stripe threads sitting in recv() on live connections (see
    // Ingest::conn_fds) — shutdown only; the owning thread closes
    std::lock_guard<std::mutex> lk(ing->fd_mu);
    for (int fd : ing->conn_fds)
      if (fd >= 0) ::shutdown(fd, SHUT_RDWR);
  }
  for (auto& t : ing->threads)
    if (t.joinable()) t.join();
  ing->threads.clear();
  ing->listen_fds.clear();
}

void ing_destroy(void* h) {
  ing_stop(h);
  delete (Ingest*)h;
}

// ---------------------------------------------------------------------------
// Load generators: analogs of the reference sender emulators
// (GPU/*/FPGA0_multiple_connections_network_client_sender.c — connect, fill
// a block with a constant, stream n_batches blocks).

namespace {

int connect_retry(const char* ip, int port) {
  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -errno;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  if (inet_pton(AF_INET, ip, &addr.sin_addr) != 1) {
    ::close(fd);
    return -EINVAL;
  }
  // retry connect briefly (server may still be binding)
  int tries = 50;
  while (::connect(fd, (sockaddr*)&addr, sizeof(addr)) < 0) {
    if (--tries == 0) {
      int e = errno;
      ::close(fd);
      return -e;
    }
    ::usleep(100 * 1000);
  }
  int one = 1;
  setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  return fd;
}

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

}  // namespace

int64_t loadgen_run(const char* ip, int port, int64_t bytes_per_batch,
                    int64_t n_batches, float fill_value) {
  int fd = connect_retry(ip, port);
  if (fd < 0) return fd;
  std::vector<float> buf(bytes_per_batch / sizeof(float), fill_value);
  for (int64_t b = 0; b < n_batches; ++b) {
    if (!send_all(fd, (const char*)buf.data(), (size_t)bytes_per_batch)) {
      int e = errno;
      ::close(fd);
      return -e;
    }
  }
  ::close(fd);
  return n_batches;
}

// Striped multi-connection sender: the `sendData` analog
// (embedding_krnl.cpp:45-143) — opens up to n_conns connections to
// port0..port0+n_conns-1 and streams packet j of every batch on connection
// j % n_conns. If ramp != 0 the payload is position-coded (float i of the
// batch = (float)i) so the server-side reassembly offsets are verifiable;
// otherwise constant fill_value. Returns n_batches or -errno.
int64_t loadgen_run_striped(const char* ip, int port0, int n_conns,
                            int64_t pkg_bytes, int64_t bytes_per_batch,
                            int64_t n_batches, float fill_value, int ramp) {
  if (n_conns < 1) n_conns = 1;
  const size_t nbytes = (size_t)bytes_per_batch;
  const size_t pkg =
      (pkg_bytes <= 0 || n_conns == 1) ? nbytes : (size_t)pkg_bytes;
  const size_t npkg = pkg ? (nbytes + pkg - 1) / pkg : 0;
  const int active =
      (int)((npkg < (size_t)n_conns) ? npkg : (size_t)n_conns);

  std::vector<float> payload(nbytes / sizeof(float));
  for (size_t i = 0; i < payload.size(); ++i)
    payload[i] = ramp ? (float)i : fill_value;

  std::atomic<int> err{0};
  std::vector<std::thread> threads;
  for (int c = 0; c < active; ++c) {
    threads.emplace_back([&, c] {
      int fd = connect_retry(ip, port0 + c);
      if (fd < 0) {
        err.store(-fd);
        return;
      }
      const char* base = (const char*)payload.data();
      for (int64_t b = 0; b < n_batches; ++b) {
        for (size_t j = (size_t)c; j < npkg; j += (size_t)active) {
          size_t seg_off = j * pkg;
          size_t seg_len = (j + 1 == npkg) ? nbytes - j * pkg : pkg;
          if (!send_all(fd, base + seg_off, seg_len)) {
            err.store(errno);
            ::close(fd);
            return;
          }
        }
      }
      ::close(fd);
    });
  }
  for (auto& t : threads) t.join();
  int e = err.load();
  return e ? -(int64_t)e : n_batches;
}

}  // extern "C"
