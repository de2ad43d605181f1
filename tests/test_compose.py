"""Serve-tier assembly (serving/compose.py) + PeerWatchdog unit tests —
the library entry point behind `cli serve` (VERDICT r4 #9: the wiring must
be testable without spawning the CLI)."""

import socket
import threading
import time

import numpy as np
import pytest

import fleetrec_tpu as fr
from fleetrec_tpu import reference as ref
from fleetrec_tpu.models import init_model
from fleetrec_tpu.serving import PeerWatchdog, ServeSpec, serve
from fleetrec_tpu.serving.compose import build_engine

PORT = 18580


# ---- PeerWatchdog -------------------------------------------------------

def test_watchdog_fires_on_overrun():
    fired = []
    wd = PeerWatchdog(0.15, process_id=3, on_timeout=fired.append)
    with wd.guard("dispatch batch 7"):
        time.sleep(0.5)
    assert len(fired) == 1
    assert "process 3" in fired[0] and "dispatch batch 7" in fired[0]


def test_watchdog_quiet_when_guards_complete():
    fired = []
    wd = PeerWatchdog(0.3, on_timeout=fired.append)
    for i in range(3):
        with wd.guard(f"batch {i}"):
            time.sleep(0.02)
    time.sleep(0.5)  # past the timeout horizon with nothing armed
    assert not fired


def test_watchdog_overlapping_guards_earliest_deadline_wins():
    """The submit thread dispatches while the drain thread reads back —
    two live guards; expiry of EITHER must fire."""
    fired = []
    wd = PeerWatchdog(0.2, on_timeout=fired.append)

    def long_readback():
        with wd.guard("readback batch 0"):
            time.sleep(0.6)

    th = threading.Thread(target=long_readback, daemon=True)
    th.start()
    time.sleep(0.05)
    with wd.guard("dispatch batch 1"):
        time.sleep(0.01)   # completes fine
    th.join(2)
    assert len(fired) == 1 and "readback batch 0" in fired[0]


# ---- build_engine / serve -----------------------------------------------

def test_build_engine_multiprocess_requires_mesh():
    cfg = fr.get_config("micro_test", batch_size=8)
    model, params = init_model(cfg)
    with pytest.raises(ValueError):
        build_engine(model, params,
                     ServeSpec(batch=8, batches=1, multiprocess=True))


def test_serve_library_end_to_end_loopback():
    """serve() as a library call: bind ingest, score over loopback TCP,
    reply scores, return the summary — no CLI process involved."""
    B, NB = 8, 4
    cfg = fr.get_config("micro_test", batch_size=B)
    tables = ref.init_tables(cfg, scheme="rowid")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)

    rng = np.random.default_rng(5)
    batches = []
    for _ in range(NB):
        idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables],
                       1).astype(np.int32)
        dense = rng.uniform(-1, 1, (B, cfg.dense_dim)).astype(np.float32)
        batches.append((idx, dense))

    spec = ServeSpec(batch=B, batches=NB, port=PORT, slots=4, reply=True,
                     fuse=2, bg_drain=True)
    out = {}

    def run():
        out["summary"] = serve(cfg, model, params, spec)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    sock = None
    for _ in range(100):
        try:
            sock = socket.create_connection(("127.0.0.1", PORT), timeout=5)
            break
        except OSError:
            time.sleep(0.05)
    assert sock is not None, "serve() never bound its port"
    for idx, dense in batches:
        sock.sendall(idx.tobytes() + dense.tobytes())
    want = NB * B * 4
    buf = b""
    while len(buf) < want:
        chunk = sock.recv(want - len(buf))
        if not chunk:
            break
        buf += chunk
    sock.close()
    th.join(60)
    assert "summary" in out, "serve() did not finish"
    assert out["summary"]["wire_batches"] == NB
    assert out["summary"]["fuse"] == 2
    scores = np.frombuffer(buf, np.float32).reshape(NB, B)
    for k, (idx, dense) in enumerate(batches):
        golden = ref.forward(cfg, tables, ws, idx, dense)
        np.testing.assert_allclose(scores[k], golden, rtol=1e-4, atol=1e-4)


def test_serve_library_pooled_bags_loopback():
    """serve() with bag_L: int32 [B, T, L] bags (-1 padding) on the wire,
    pooled scoring, score replies — vs the pooled float64 oracle."""
    import sys
    sys.path.insert(0, "tests")
    from test_pooled import L, make_bags, oracle

    B, NB = 8, 3
    cfg = fr.get_config("micro_test", batch_size=B)
    tables = ref.init_tables(cfg, scheme="pm1")
    ws = ref.init_mlp_weights(cfg, scheme="ones")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    batches = [make_bags(cfg, B, seed=40 + k) for k in range(NB)]

    spec = ServeSpec(batch=B, batches=NB, port=PORT + 40, slots=4,
                     reply=True, bag_L=L)
    out = {}

    def run():
        out["summary"] = serve(cfg, model, params, spec)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    sock = None
    for _ in range(100):
        try:
            sock = socket.create_connection(("127.0.0.1", PORT + 40),
                                            timeout=5)
            break
        except OSError:
            time.sleep(0.05)
    assert sock is not None
    for idx, dense in batches:
        sock.sendall(idx.tobytes() + dense.tobytes())
    want = NB * B * 4
    buf = b""
    while len(buf) < want:
        chunk = sock.recv(want - len(buf))
        if not chunk:
            break
        buf += chunk
    sock.close()
    th.join(60)
    scores = np.frombuffer(buf, np.float32).reshape(NB, B)
    for k, (idx, dense) in enumerate(batches):
        golden = oracle(cfg, tables, ws, idx, dense)
        np.testing.assert_array_equal(scores[k], golden.astype(np.float32))
