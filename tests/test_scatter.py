"""Scatter egress fan-out tests — the scatter_krnl analog
(FPGA/kernel/user_krnl/scatter_krnl/src/hls/scatter.cpp:116-235: one stream
round-robined over up to 11 destination IPs). The key property beyond the
reference: per-consumer backpressure isolation (one slow consumer sheds its
own share, the rest keep streaming at full rate)."""

import socket
import threading
import time

import numpy as np

from fleetrec_tpu.serving import ScatterEgress

PORT = 18080


class _Consumer(threading.Thread):
    """Listening consumer: accepts one producer connection and drains fixed
    blocks, optionally sleeping per block (the 'slow consumer'). paused=True
    reads NOTHING until .resume is set — with a small rcvbuf this defeats
    kernel socket buffering, so producer-side backpressure is deterministic."""

    def __init__(self, port, block_bytes, delay_s=0.0, paused=False):
        super().__init__(daemon=True)
        self.block_bytes = block_bytes
        self.delay_s = delay_s
        self.blocks = []
        self.resume = threading.Event()
        if not paused:
            self.resume.set()
        self.srv = socket.socket()
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        if paused:
            # inherited by the accepted socket: cap kernel-side absorption
            self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 1 << 16)
        self.srv.bind(("127.0.0.1", port))
        self.srv.listen(1)
        self.stop = False

    def run(self):
        conn, _ = self.srv.accept()
        conn.settimeout(0.2)
        self.resume.wait()
        buf = b""
        while not self.stop:
            try:
                chunk = conn.recv(1 << 16)
            except socket.timeout:
                continue
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            while len(buf) >= self.block_bytes:
                self.blocks.append(np.frombuffer(buf[: self.block_bytes], np.float32))
                buf = buf[self.block_bytes:]
                if self.delay_s:
                    time.sleep(self.delay_s)
        conn.close()
        self.srv.close()


def test_round_robin_fanout_content():
    """Blocks are distributed round-robin across 3 consumers and arrive
    intact (block i carries value i)."""
    B = 64
    nbytes = B * 4
    consumers = [_Consumer(PORT + c, nbytes) for c in range(3)]
    for c in consumers:
        c.start()
    with ScatterEgress(queue_blocks=4) as eg:
        for c in range(3):
            eg.connect("127.0.0.1", PORT + c)
        dest = []
        for i in range(12):
            dest.append(eg.send(np.full(B, float(i), np.float32)))
    # queues drain on close; give sockets a beat
    deadline = time.time() + 5
    while time.time() < deadline and sum(len(c.blocks) for c in consumers) < 12:
        time.sleep(0.05)
    for c in consumers:
        c.stop = True
    assert sorted(dest) == sorted(list(range(3)) * 4)  # balanced round-robin
    got = {}
    for cid, c in enumerate(consumers):
        for blk in c.blocks:
            assert np.all(blk == blk[0])
            got[int(blk[0])] = cid
    assert sorted(got) == list(range(12))
    for i, cid in got.items():
        assert cid == dest[i]  # each block landed where send() said


def test_slow_consumer_isolated():
    """A consumer that reads NOTHING (the pathological slow case) must not
    stall the others: its bounded queue fills (plus whatever the kernel
    socket buffers absorb mid-block), the round-robin skips it, and the
    fast pair carries the rest while the producer never blocks."""
    B = 1 << 18  # 1 MiB blocks defeat socket buffering
    nbytes = B * 4
    fast = [_Consumer(PORT + 10, nbytes), _Consumer(PORT + 11, nbytes)]
    slow = _Consumer(PORT + 12, nbytes, paused=True)
    for c in fast + [slow]:
        c.start()
    NBLK = 30
    with ScatterEgress(queue_blocks=2) as eg:
        for p in (PORT + 10, PORT + 11, PORT + 12):
            eg.connect("127.0.0.1", p)
        t0 = time.time()
        for i in range(NBLK):
            eg.send(np.full(B, float(i), np.float32))
        send_time = time.time() - t0
        stats = eg.stats()
        # unblock the slow consumer so close() can drain its queue
        slow.resume.set()
    # close() drained every queue; wait for the consumer apps to read it all
    deadline = time.time() + 10
    while (time.time() < deadline
           and sum(len(c.blocks) for c in fast + [slow]) < NBLK):
        time.sleep(0.05)
    for c in fast + [slow]:
        c.stop = True
    # Producer must have finished without waiting on the stalled consumer:
    # 30 MiB through the fast pair is sub-second; any real stall means the
    # skip-on-full isolation failed.
    assert send_time < 10.0, f"producer stalled behind slow consumer: {send_time:.1f}s"
    assert stats["skipped"] > 0  # isolation actually engaged
    got = [len(c.blocks) for c in fast + [slow]]
    assert sum(got) == NBLK  # nothing lost
    # the stalled consumer can absorb at most queue(2) + ~1 in-flight block
    # + kernel buffers (~a couple of MiB) before every further block skips
    assert got[2] <= 10, f"stalled consumer absorbed too much: {got}"
    assert got[0] + got[1] >= NBLK - 10  # fast pair carried the load


def test_dead_consumer_skipped():
    """A consumer whose connection dies is marked dead and skipped; the
    stream continues to the survivors."""
    B = 32
    nbytes = B * 4
    c0 = _Consumer(PORT + 20, nbytes)
    c1 = _Consumer(PORT + 21, nbytes)
    c0.start()
    c1.start()
    with ScatterEgress(queue_blocks=1) as eg:
        eg.connect("127.0.0.1", PORT + 20)
        eg.connect("127.0.0.1", PORT + 21)
        eg.send(np.zeros(B, np.float32))
        eg.send(np.zeros(B, np.float32))
        # kill consumer 0's socket (join so the RST is actually out); sends
        # must keep landing on consumer 1. TCP can still absorb a block or
        # two before the RST surfaces producer-side, so the survivor
        # carries >= 8 of the 10.
        c0.stop = True
        c0.join(5)
        time.sleep(0.3)
        for _ in range(10):
            eg.send(np.ones(B, np.float32))  # must never raise
            time.sleep(0.02)  # let the sender thread hit the RST
        stats = eg.stats()
    assert stats["per_consumer_blocks"][1] >= 8, stats
    c1.stop = True


def test_engine_scatter_egress_end_to_end():
    """Full pipeline: loadgen -> ingest -> fused model -> scatter fan-out to
    3 consumers; the union of delivered blocks is exactly the per-batch
    oracle scores."""
    import fleetrec_tpu as fr
    from fleetrec_tpu import reference as ref
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.serving import IngestServer, ServingEngine

    cfg = fr.get_config("micro_test", batch_size=8)
    B, NB = 8, 6
    tables = ref.init_tables(cfg, scheme="rowid")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    eng = ServingEngine.from_model(model, params, batch_size=B)

    rng = np.random.default_rng(11)
    batches = []
    for _ in range(NB):
        idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
        dense = rng.uniform(-1, 1, (B, cfg.dense_dim)).astype(np.float32)
        batches.append((idx, dense))

    consumers = [_Consumer(PORT + 40 + c, B * 4) for c in range(3)]
    for c in consumers:
        c.start()
    nbytes = B * (cfg.num_tables * 4 + cfg.dense_dim * 4)
    with IngestServer([nbytes], n_slots=4, port_base=PORT + 50) as ing:
        with ScatterEgress(queue_blocks=4) as eg:
            for c in range(3):
                eg.connect("127.0.0.1", PORT + 40 + c)

            def client():
                s = socket.create_connection(("127.0.0.1", PORT + 50), timeout=10)
                for idx, dense in batches:
                    s.sendall(idx.tobytes() + dense.tobytes())
                s.close()

            threading.Thread(target=client, daemon=True).start()
            eng.run_from_ingest(ing, NB, mode="index", scatter=eg)
        # ScatterEgress.close (via __exit__) drains queues before closing
    deadline = time.time() + 5
    while time.time() < deadline and sum(len(c.blocks) for c in consumers) < NB:
        time.sleep(0.05)
    for c in consumers:
        c.stop = True
    got = [blk for c in consumers for blk in c.blocks]
    assert len(got) == NB
    goldens = [ref.forward(cfg, tables, ws, idx, dense).astype(np.float32)
               for idx, dense in batches]
    # round-robin order across consumers isn't globally ordered; match sets
    for g in goldens:
        assert any(np.allclose(blk, g, rtol=1e-5, atol=1e-5) for blk in got), \
            "a batch's scores never reached any consumer"


def test_consumer_reconnect_mid_stream():
    """Kill a consumer mid-stream and restart it on the same port: the
    sender thread redials in-band (the reference's session re-arm,
    scatter.cpp:270-276) and delivery resumes — the consumer is NOT shed
    forever on one EPIPE (VERDICT r2 #8). The block interrupted by the
    drop is retransmitted in full on the new connection."""
    B = 64
    nbytes = B * 4
    first = _Consumer(PORT + 60, nbytes)
    first.start()
    with ScatterEgress(queue_blocks=4) as eg:
        eg.connect("127.0.0.1", PORT + 60)
        for i in range(5):
            eg.send(np.full(B, float(i), np.float32))
        deadline = time.time() + 5
        while time.time() < deadline and len(first.blocks) < 5:
            time.sleep(0.02)
        assert len(first.blocks) == 5
        # kill the consumer (conn + listener closed), then restart on the
        # same port before the ~5 s redial window expires
        first.stop = True
        first.join(5)
        second = _Consumer(PORT + 60, nbytes)
        second.start()
        for i in range(5, 15):
            eg.send(np.full(B, float(i), np.float32))
            time.sleep(0.05)  # let the sender thread hit the RST + redial
        # blocks flushed into the dead socket's kernel buffer before the
        # RST surfaced are lost (same as any TCP peer crash); everything
        # after the redial must arrive, including the final block
        deadline = time.time() + 10
        while time.time() < deadline and len(second.blocks) < 8:
            time.sleep(0.05)
        stats = eg.stats()
    second.stop = True
    assert stats["reconnects"][0] >= 1, stats
    assert not stats["dead"][0], stats
    assert len(second.blocks) >= 8, len(second.blocks)
    vals = sorted(int(b[0]) for b in second.blocks)
    assert vals[-1] == 14  # the stream genuinely resumed to the end
    for b in second.blocks:
        assert np.all(b == b[0])  # block-aligned: no torn/partial blocks


def test_dead_consumer_reattach():
    """An outage longer than the redial window marks the consumer dead;
    scat_reattach revives it once the destination is back."""
    import pytest

    B = 32
    nbytes = B * 4
    c0 = _Consumer(PORT + 70, nbytes)
    c0.start()
    with ScatterEgress(queue_blocks=2) as eg:
        eg.connect("127.0.0.1", PORT + 70)
        eg.send(np.zeros(B, np.float32))
        c0.stop = True
        c0.join(5)
        # reattach against a down destination fails cleanly (stays dead)
        # NOTE: the consumer may not be marked dead yet (the sender thread
        # only notices on its next send) — force detection first
        deadline = time.time() + 8
        while time.time() < deadline and not eg.stats()["dead"][0]:
            try:
                eg.send(np.zeros(B, np.float32))
            except OSError:  # no live consumers remain
                pass
            time.sleep(0.1)
        # in-band redial (50x100ms) must exhaust against the closed port
        assert eg.stats()["dead"][0]
        with pytest.raises(OSError):
            eg.reattach(0)
        c1 = _Consumer(PORT + 70, nbytes)
        c1.start()
        eg.reattach(0)
        assert not eg.stats()["dead"][0]
        for i in range(3):
            eg.send(np.full(B, float(i), np.float32))
        deadline = time.time() + 5
        while time.time() < deadline and len(c1.blocks) < 3:
            time.sleep(0.05)
    c1.stop = True
    assert len(c1.blocks) >= 3


def test_send_to_targeted_backpressure():
    """send_to reports -EAGAIN on a full queue instead of blocking."""
    import errno

    B = 16
    nbytes = B * 4
    c = _Consumer(PORT + 30, nbytes, delay_s=1.0)
    c.start()
    with ScatterEgress(queue_blocks=1) as eg:
        eg.connect("127.0.0.1", PORT + 30)
        got_eagain = False
        for _ in range(10):
            rc = eg.send_to(0, np.zeros(B, np.float32))
            if rc == -errno.EAGAIN:
                got_eagain = True
                break
        assert got_eagain
    c.stop = True


def test_eleven_consumer_fanout_with_slow_and_killed():
    """Reference-scale fan-out (VERDICT r4 #7): the scatter_krnl tier is
    sized for 11 destination IPs (scatter.cpp:116-141).  11 consumers, one
    pathologically slow (reads nothing until the end) and one killed
    mid-stream: the 9 healthy ones must carry the load, the slow one sheds
    only its own share, the dead one is marked dead and skipped, and the
    producer never stalls.  Per-consumer counters expose the isolation."""
    B = 1 << 18  # 1 MiB blocks defeat kernel socket buffering
    nbytes = B * 4
    N = 11
    SLOW, DEAD = 9, 10
    consumers = [
        _Consumer(PORT + 200 + c, nbytes, paused=(c == SLOW))
        for c in range(N)
    ]
    for c in consumers:
        c.start()
    NBLK = 110
    with ScatterEgress(queue_blocks=2) as eg:
        for c in range(N):
            eg.connect("127.0.0.1", PORT + 200 + c)
        # kill one consumer after its first block lands
        t0 = time.time()
        for i in range(NBLK):
            eg.send(np.full(B, float(i), np.float32))
            if i == 22:
                consumers[DEAD].stop = True
                consumers[DEAD].join(5)
                time.sleep(0.2)  # let the RST surface producer-side
        send_time = time.time() - t0
        # the killed consumer's sender thread redials its (closed) port
        # for ~5 s before marking dead (scatter.cpp consumer_thread
        # docstring) — poll the counters until the marking lands
        deadline = time.time() + 10
        while time.time() < deadline and not eg.stats()["dead"][DEAD]:
            time.sleep(0.2)
        stats = eg.stats()
        consumers[SLOW].resume.set()  # so close() can drain its queue
    deadline = time.time() + 15
    while (time.time() < deadline
           and sum(len(c.blocks) for c in consumers) < NBLK - 5):
        time.sleep(0.05)
    for c in consumers:
        c.stop = True
    got = [len(c.blocks) for c in consumers]
    # producer free-running: ~27 MiB through 9 healthy loopback consumers
    assert send_time < 20.0, f"producer stalled: {send_time:.1f}s"
    # dead consumer dropped its share AFTER the kill; the counters know
    assert stats["dead"][DEAD] and sum(stats["dead"]) == 1, stats
    assert stats["skipped"] > 0, stats
    # the slow consumer absorbed at most queue(2) + in-flight + kernel buf
    assert got[SLOW] <= 8, f"slow consumer absorbed too much: {got}"
    # dead consumer got roughly its share up to the kill, little after
    assert got[DEAD] <= 22 // N + 3, got
    healthy = sum(got[c] for c in range(N) if c not in (SLOW, DEAD))
    # nothing the healthy 9 were offered was lost; they carried the bulk
    assert healthy >= NBLK - got[SLOW] - got[DEAD] - stats["skipped"], (
        got, stats)
    assert healthy >= NBLK * 0.7, (got, stats)
    # every delivered block is intact
    for c in consumers:
        for blk in c.blocks:
            assert np.all(blk == blk[0])
