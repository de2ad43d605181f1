"""Native ingest server + loadgen + serving engine tests — the analog of
the reference's localhost sender/receiver bring-up ladder
(GPU/*/single_connection_*, run_single_sender_*.sh)."""

import time

import numpy as np
import pytest

from fleetrec_tpu.serving import IngestServer, Loadgen

PORT = 17080  # avoid clashing with anything local


def test_single_sender_roundtrip():
    B, F = 32, 64
    nbytes = B * F * 4
    with IngestServer([nbytes], n_slots=4, port_base=PORT) as ing:
        lg = Loadgen("127.0.0.1", PORT, [nbytes], n_batches=10, fill=2.5).start()
        got = 0
        while got < 10:
            r = ing.acquire(5000)
            assert r is not None, "timeout"
            slot, view, t_first, t_complete = r
            assert view.shape == (B * F,)
            np.testing.assert_array_equal(view, np.full(B * F, 2.5, np.float32))
            assert t_complete >= t_first > 0
            ing.release(slot)
            got += 1
        assert lg.join(5) == [10]
        assert ing.total_batches == 10
        assert ing.bytes_received == 10 * nbytes


def test_three_sender_fixed_offsets():
    """Model-3 wire layout: 64 + 1952 + 1952 floats per query at fixed
    offsets (constant.h:25-27), distinguishable fill values per sender."""
    B = 8
    widths = [64, 1952, 1952]
    nbytes = [B * w * 4 for w in widths]
    with IngestServer(nbytes, n_slots=4, port_base=PORT + 10) as ing:
        lgs = [
            Loadgen("127.0.0.1", PORT + 10 + s, [nbytes[s]], n_batches=5, fill=float(s + 1))
            for s in range(3)
        ]
        # start each sender's single thread on its own port
        for lg in lgs:
            lg.threads[0].start()
        for _ in range(5):
            r = ing.acquire(5000)
            assert r is not None
            slot, view, *_ = r
            off = 0
            for s, w in enumerate(widths):
                seg = view[off : off + B * w]
                np.testing.assert_array_equal(seg, np.full(B * w, s + 1, np.float32))
                off += B * w
            ing.release(slot)


def test_per_sender_counters():
    """Per-sender rx observability (VERDICT r2 #8 — the hardware stack's
    per-protocol counter analog, network_stack.sv:1049-1100): bytes and
    batches accounted per sender, reconnects counted when a sender drops
    and a replacement connects, last-fill timestamps distinguish the
    stalled sender."""
    import socket
    import threading

    B, widths = 4, [16, 64]
    nbytes = [B * w * 4 for w in widths]
    with IngestServer(nbytes, n_slots=4, port_base=PORT + 90) as ing:
        def sender0_flapping():
            # batch 0 on one connection, then drop and reconnect for batch 1
            s = socket.create_connection(("127.0.0.1", PORT + 90), timeout=5)
            s.sendall(np.full(B * 16, 1.0, np.float32).tobytes())
            s.close()
            time.sleep(0.3)
            s = socket.create_connection(("127.0.0.1", PORT + 90), timeout=5)
            s.sendall(np.full(B * 16, 1.0, np.float32).tobytes())
            s.close()

        def sender1():
            s = socket.create_connection(("127.0.0.1", PORT + 91), timeout=5)
            for _ in range(2):
                s.sendall(np.full(B * 64, 2.0, np.float32).tobytes())
            s.close()

        threading.Thread(target=sender0_flapping, daemon=True).start()
        threading.Thread(target=sender1, daemon=True).start()
        for _ in range(2):
            r = ing.acquire(5000)
            assert r is not None
            ing.release(r[0])
        stats = ing.sender_stats()
    assert stats[0]["bytes"] == 2 * nbytes[0]
    assert stats[1]["bytes"] == 2 * nbytes[1]
    assert stats[0]["batches"] == 2 and stats[1]["batches"] == 2
    assert stats[0]["reconnects"] >= 1  # the flap was observed
    assert stats[1]["reconnects"] == 0
    assert stats[0]["ns_since_last_fill"] is not None
    assert stats[1]["ns_since_last_fill"] is not None


def test_ring_backpressure():
    """More batches than slots: writers must block until release, nothing
    overwritten (the bug class the reference's spin-wait code risked)."""
    B, F = 4, 16
    nbytes = B * F * 4
    with IngestServer([nbytes], n_slots=2, port_base=PORT + 20) as ing:
        Loadgen("127.0.0.1", PORT + 20, [nbytes], n_batches=20, fill=1.0).start()
        time.sleep(0.3)  # let sender race ahead; ring must hold it to 2 slots
        seen = 0
        while seen < 20:
            r = ing.acquire(5000)
            assert r is not None
            slot, view, *_ = r
            np.testing.assert_array_equal(view, np.full(B * F, 1.0, np.float32))
            ing.release(slot)
            seen += 1


def test_engine_feature_mode_end_to_end():
    """Loadgen -> ingest -> ServingEngine (MLP only) must reproduce the
    closed-form all-ones score — the reference's own correctness check
    (README 'Correct Results')."""
    import fleetrec_tpu as fr
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.serving import ServingEngine

    B, width = 16, 512
    cfg = fr.config.parity_synthetic(width, batch_size=B)
    model, params = init_model(cfg)
    eng = ServingEngine.mlp_only(model, params, batch_size=B)

    outs = {}
    nbytes = B * width * 4
    with IngestServer([nbytes], n_slots=4, port_base=PORT + 30) as ing:
        Loadgen("127.0.0.1", PORT + 30, [nbytes], n_batches=6, fill=1.0).start()
        summary = eng.run_from_ingest(
            ing, 6, mode="feature", feature_dim=width,
            on_done=lambda bid, scores: outs.__setitem__(bid, scores),
        )
    assert summary["batches"] == 6
    assert summary["latency_ms_p99"] > 0
    for bid, scores in outs.items():
        np.testing.assert_array_equal(scores, np.full(B, 68719476736.0, np.float32))


def test_engine_feature_mode_three_sender_model3_wire():
    """The reference's exact 3-node wire (constant.h:25-27): CPU node ships
    64 floats/query, two FPGA nodes 1952 each, assembled at fixed offsets
    and scored by the MLP tower; all-ones input must hit the closed-form
    constant for width 3968 (3968*1024... computed by the oracle)."""
    import fleetrec_tpu as fr
    from fleetrec_tpu import reference as ref
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.serving import ServingEngine

    B = 4
    widths = [64, 1952, 1952]
    F = sum(widths)
    cfg = fr.config.parity_synthetic(F, batch_size=B)
    model, params = init_model(cfg)
    eng = ServingEngine.mlp_only(model, params, batch_size=B)

    # NOTE: slot layout is per-sender contiguous [B*64 | B*1952 | B*1952],
    # i.e. each node's block is a [B, w] matrix — the feature vector is the
    # horizontal concat, which for all-ones equals all-ones [B, F].
    nbytes = [B * w * 4 for w in widths]
    outs = {}
    with IngestServer(nbytes, n_slots=2, port_base=PORT + 40) as ing:
        lgs = [
            Loadgen("127.0.0.1", PORT + 40 + s, [nbytes[s]], n_batches=3, fill=1.0)
            for s in range(3)
        ]
        for lg in lgs:
            lg.threads[0].start()
        summary = eng.run_from_ingest(
            ing, 3, mode="feature", feature_dim=F,
            on_done=lambda bid, s: outs.__setitem__(bid, s),
        )
    assert summary["batches"] == 3
    want = ref.closed_form_all_ones_score(F)
    for scores in outs.values():
        np.testing.assert_array_equal(scores, np.full(B, want, np.float32))


def test_engine_background_drain():
    """Background-drain mode: readbacks happen on the drain thread, order
    and per-batch results identical to synchronous mode; close() is clean."""
    import fleetrec_tpu as fr
    from fleetrec_tpu import reference as ref
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.serving import ServingEngine

    cfg = fr.get_config("micro_test", batch_size=8)
    B = 8
    tables = ref.init_tables(cfg, scheme="rowid")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    eng = ServingEngine.from_model(model, params, batch_size=B,
                                   max_in_flight=2, background_drain=True)

    rng = np.random.default_rng(3)
    outs = {}
    goldens = {}
    for b in range(12):
        idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
        dense = rng.uniform(-1, 1, (B, cfg.dense_dim)).astype(np.float32)
        goldens[b] = ref.forward(cfg, tables, ws, idx, dense)
        eng.submit(idx, dense, on_done=lambda bid, s: outs.__setitem__(bid, s))
    summary = eng.drain()
    eng.close()
    eng.close()  # idempotent
    assert summary["batches"] == 12
    assert sorted(outs) == list(range(12))
    for b in range(12):
        np.testing.assert_allclose(outs[b], goldens[b], rtol=1e-5, atol=1e-5)


def test_engine_background_drain_survives_on_done_error():
    """A failing on_done (e.g. reply to a dead client) must not kill the
    drain thread — later batches still drain, and the error surfaces on
    drain() instead of deadlocking submit()."""
    import fleetrec_tpu as fr
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.serving import ServingEngine

    cfg = fr.get_config("micro_test", batch_size=4)
    model, params = init_model(cfg, table_scheme="rowid", mlp_scheme="uniform")
    eng = ServingEngine.from_model(model, params, batch_size=4,
                                   max_in_flight=1, background_drain=True)
    rng = np.random.default_rng(0)

    def boom(bid, scores):
        raise OSError("client gone")

    done = []
    for b in range(6):  # > max_in_flight: would deadlock pre-fix
        idx = np.stack([rng.integers(0, t.rows, 4) for t in cfg.tables], 1).astype(np.int32)
        dense = rng.uniform(-1, 1, (4, cfg.dense_dim)).astype(np.float32)
        try:
            eng.submit(idx, dense,
                       on_done=boom if b == 0 else lambda i, s: done.append(i))
        except OSError:
            pass  # first error may surface on a later submit
    with pytest.raises(OSError):
        eng.drain()
        eng.close()
        raise OSError("already surfaced")  # error must appear at one of these
    eng.close()
    assert len(done) >= 4  # later batches drained despite the poison one


def test_engine_index_mode_end_to_end():
    """Index-mode wire: senders ship int32 row-ids (+ dense floats); the
    engine runs the FULL fused pipeline and matches the oracle."""
    import socket

    import fleetrec_tpu as fr
    from fleetrec_tpu import reference as ref
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.serving import ServingEngine

    cfg = fr.get_config("micro_test", batch_size=8)
    B = 8
    tables = ref.init_tables(cfg, scheme="rowid")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    eng = ServingEngine.from_model(model, params, batch_size=B)

    rng = np.random.default_rng(0)
    idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
    dense = rng.uniform(-1, 1, (B, cfg.dense_dim)).astype(np.float32)
    payload = np.concatenate([idx.reshape(-1).view(np.float32), dense.reshape(-1)])
    nbytes = payload.nbytes

    outs = {}
    with IngestServer([nbytes], n_slots=4, port_base=PORT + 40) as ing:
        # custom sender: raw payload bytes, 3 batches
        def send():
            s = socket.create_connection(("127.0.0.1", PORT + 40), timeout=5)
            for _ in range(3):
                s.sendall(payload.tobytes())
            s.close()

        import threading

        th = threading.Thread(target=send, daemon=True)
        th.start()
        eng.run_from_ingest(
            ing, 3, mode="index",
            on_done=lambda bid, scores: outs.__setitem__(bid, scores),
        )
        th.join(5)

    golden = ref.forward(cfg, tables, ws, idx, dense)
    for scores in outs.values():
        np.testing.assert_allclose(scores, golden, rtol=1e-4, atol=1e-4)


def test_engine_index_validation():
    import fleetrec_tpu as fr
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.serving import ServingEngine

    cfg = fr.get_config("micro_test", batch_size=4)
    model, params = init_model(cfg)
    eng = ServingEngine.from_model(model, params, batch_size=4)
    idx = np.zeros((4, cfg.num_tables), np.int32)
    idx[1, 2] = 10**6
    with pytest.raises(ValueError, match="out of range"):
        eng.validate_indices(idx, [t.rows for t in cfg.tables])


def test_reply_channel_scores_roundtrip():
    """Full duplex serving: client streams index batches, server streams
    fp32 scores back on the same connection (reply_to=0); values match the
    oracle per batch, in order."""
    import socket

    import fleetrec_tpu as fr
    from fleetrec_tpu import reference as ref
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.serving import ServingEngine

    cfg = fr.get_config("micro_test", batch_size=8)
    B, NB = 8, 5
    tables = ref.init_tables(cfg, scheme="rowid")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    eng = ServingEngine.from_model(model, params, batch_size=B)

    rng = np.random.default_rng(7)
    batches = []
    for _ in range(NB):
        idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
        dense = rng.uniform(-1, 1, (B, cfg.dense_dim)).astype(np.float32)
        batches.append((idx, dense))

    nbytes = B * (cfg.num_tables * 4 + cfg.dense_dim * 4)
    got_scores = []
    with IngestServer([nbytes], n_slots=4, port_base=PORT + 50) as ing:
        def client():
            s = socket.create_connection(("127.0.0.1", PORT + 50), timeout=10)
            for idx, dense in batches:
                s.sendall(idx.tobytes() + dense.tobytes())
            want = NB * B * 4
            buf = b""
            while len(buf) < want:
                chunk = s.recv(want - len(buf))
                if not chunk:
                    break
                buf += chunk
            s.close()
            got_scores.append(np.frombuffer(buf, np.float32))

        import threading
        t = threading.Thread(target=client, daemon=True)
        t.start()
        eng.run_from_ingest(ing, NB, mode="index", reply_to=0)
        t.join(10)

    assert got_scores and got_scores[0].shape == (NB * B,)
    for b, (idx, dense) in enumerate(batches):
        golden = ref.forward(cfg, tables, ws, idx, dense).astype(np.float32)
        np.testing.assert_allclose(got_scores[0][b * B:(b + 1) * B], golden,
                                   rtol=1e-5, atol=1e-5)


def test_sender_reconnect_resumes_batch():
    """A sender that dies mid-batch is replaced: the new connection refills
    the in-flight batch and the stream continues (the reference printf+exits
    on any socket error; we re-accept)."""
    import socket
    import threading

    B, F = 4, 32
    nbytes = B * F * 4
    with IngestServer([nbytes], n_slots=4, port_base=PORT + 50) as ing:
        def sender_a():
            s = socket.create_connection(("127.0.0.1", PORT + 50), timeout=5)
            s.sendall(np.full(B * F, 1.0, np.float32).tobytes())   # batch 0
            s.sendall(np.full(B * F // 2, 9.0, np.float32).tobytes())  # half of batch 1
            s.close()  # dies mid-batch

        def sender_b():
            s = socket.create_connection(("127.0.0.1", PORT + 50), timeout=5)
            for _ in range(2):  # batches 1 and 2, fresh from region start
                s.sendall(np.full(B * F, 2.0, np.float32).tobytes())
            s.close()

        threading.Thread(target=sender_a, daemon=True).start()
        r = ing.acquire(5000)
        assert r is not None
        slot, view, *_ = r
        np.testing.assert_array_equal(view, np.full(B * F, 1.0, np.float32))
        ing.release(slot)
        time.sleep(0.2)  # let sender_a die
        threading.Thread(target=sender_b, daemon=True).start()
        for _ in range(2):
            r = ing.acquire(5000)
            assert r is not None, "reconnected sender's batches never arrived"
            slot, view, *_ = r
            np.testing.assert_array_equal(view, np.full(B * F, 2.0, np.float32))
            ing.release(slot)


def test_multi_conn_striped_reassembly():
    """useConn analog (embedding_krnl.cpp:45-143 sendData, host.cpp:976-977
    default 4 conns): each sender stripes its payload over 4 parallel
    connections in fixed packets; ramp-coded payloads prove every packet
    lands at its deterministic offset."""
    widths = [64, 1952, 1952]  # the model-3 wire, B=2
    B, CONNS, PKG = 2, 4, 512
    nbytes = [B * w * 4 for w in widths]
    with IngestServer(nbytes, n_slots=4, port_base=PORT + 60,
                      n_conns=CONNS, pkg_bytes=PKG) as ing:
        # sender 0: 512 B payload = 1 packet -> clamps to 1 active conn
        assert ing.n_stripes == 1 + 4 + 4
        lg = Loadgen("127.0.0.1", PORT + 60, nbytes, n_batches=5,
                     n_conns=CONNS, pkg_bytes=PKG, ramp=True).start()
        for _ in range(5):
            r = ing.acquire(5000)
            assert r is not None, "timeout"
            slot, view, *_ = r
            off = 0
            for w in widths:
                n = B * w
                np.testing.assert_array_equal(
                    view[off:off + n], np.arange(n, dtype=np.float32))
                off += n
            ing.release(slot)
        assert lg.join(5) == [5, 5, 5]


def test_multi_conn_stripe_reconnect_resumes():
    """One stripe's connection dying mid-batch must stall only that stripe;
    a replacement connection on the same stripe port resumes the in-flight
    batch and the assembled slot is still correct."""
    import socket
    import threading

    B, F, CONNS, PKG = 2, 256, 2, 512  # 2048 B payload = 4 pkgs, 2/stripe
    nbytes = B * F * 4
    pkt = np.arange(B * F, dtype=np.float32)

    def stripe_payload(c):
        # packets j = c, c+2 of the ramp payload, concatenated in wire order
        segs = []
        for j in range(c, 4, CONNS):
            segs.append(pkt[j * 128:(j + 1) * 128])
        return np.concatenate(segs).tobytes()

    with IngestServer([nbytes], n_slots=4, port_base=PORT + 70,
                      n_conns=CONNS, pkg_bytes=PKG) as ing:
        # stripe 1 streams both batches up front
        def s1():
            s = socket.create_connection(("127.0.0.1", PORT + 71), timeout=5)
            s.sendall(stripe_payload(1) * 2)
            s.close()

        # stripe 0 sends batch 0, then half a packet of batch 1, then dies
        def s0_a():
            s = socket.create_connection(("127.0.0.1", PORT + 70), timeout=5)
            s.sendall(stripe_payload(0))
            s.sendall(stripe_payload(0)[:256])
            s.close()

        def s0_b():
            s = socket.create_connection(("127.0.0.1", PORT + 70), timeout=5)
            s.sendall(stripe_payload(0))  # batch 1, fresh from segment start
            s.close()

        threading.Thread(target=s1, daemon=True).start()
        threading.Thread(target=s0_a, daemon=True).start()
        r = ing.acquire(5000)
        assert r is not None
        slot, view, *_ = r
        np.testing.assert_array_equal(view, pkt)
        ing.release(slot)
        time.sleep(0.2)  # let s0_a die
        threading.Thread(target=s0_b, daemon=True).start()
        r = ing.acquire(5000)
        assert r is not None, "stripe reconnect never completed batch 1"
        slot, view, *_ = r
        np.testing.assert_array_equal(view, pkt)
        ing.release(slot)


def test_servebench_device_pool_and_fuse():
    """device_pool slices batches device-side; fuse=K scans K batches per
    dispatch — both must achieve the offered load and report sane latency."""
    import fleetrec_tpu as fr
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.serving.servebench import run_servebench

    cfg = fr.get_config("micro_test", batch_size=16)
    model, params = init_model(cfg, table_scheme="uniform", mlp_scheme="uniform")
    for kw in ({"device_pool": True}, {"fuse": 4}):
        r = run_servebench(model, params, batch_size=16, offered_qps=4000,
                           duration_s=0.5, max_wait_ms=2.0, **kw)
        assert r.n_queries > 500
        assert r.achieved_qps > 1000
        assert r.latency_ms_p99 < 5000


def test_servebench_cpu_smoke():
    """servebench closed loop on CPU: low offered load must be achieved and
    produce sane latency percentiles."""
    import fleetrec_tpu as fr
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.serving.servebench import run_servebench

    cfg = fr.get_config("micro_test", batch_size=32)
    model, params = init_model(cfg)
    r = run_servebench(model, params, batch_size=32, offered_qps=1000,
                       duration_s=1.0, max_wait_ms=2.0)
    assert r.n_queries > 500
    assert 0.5 * r.offered_qps < r.achieved_qps < 2 * r.offered_qps
    assert 0 < r.latency_ms_p50 <= r.latency_ms_p99 <= r.latency_ms_max


def test_sixteen_sender_striped_assembly():
    """Reference-scale fan-in (VERDICT r4 #7): the reference server runs
    16 receive threads (constant.h:55, cuda_server.c:362-488).  16 senders
    each own a fixed slice of every batch; the ring must assemble batches
    in order with all 16 slices correctly placed, and the per-sender
    counters must account every byte."""
    NS, NB = 16, 12
    per = 4096  # bytes per sender per batch
    nbytes = [per] * NS
    with IngestServer(nbytes, n_slots=4, port_base=PORT + 700) as ing:
        lgs = [
            Loadgen("127.0.0.1", PORT + 700 + s, [per], n_batches=NB,
                    fill=float(s + 1)).start()
            for s in range(NS)
        ]
        for b in range(NB):
            got = ing.acquire(20_000)
            assert got is not None, f"timeout at batch {b}"
            slot, view, t_first, t_done = got
            assert t_done >= t_first > 0
            arr = view.reshape(NS, per // 4)
            for s in range(NS):
                assert np.all(arr[s] == float(s + 1)), (b, s)
            ing.release(slot)
        stats = ing.sender_stats()
        for s, st in enumerate(stats):
            assert st["bytes"] == per * NB, st
            assert st["batches"] == NB, st
        assert ing.bytes_received == NS * per * NB
        for lg in lgs:
            lg.join()
