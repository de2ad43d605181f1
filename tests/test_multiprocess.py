"""True multi-process serving test: 2 JAX processes (gloo/CPU), a global
(data=2, model=2) mesh spanning them, the shard_map forward, per-process
local batch assembly — the multi-node analog the reference runs with its
sender/server binaries on separate machines (SURVEY §4.3)."""

import os
import subprocess
import sys
import textwrap
import threading

import numpy as np

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fleetrec_tpu import config as C, reference as ref
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.parallel import ShardedFleetRec
    from fleetrec_tpu.parallel.multihost import global_mesh, host_local_batch_to_global

    B = 16  # global batch; each process contributes 8 rows
    cfg = C.micro_test(batch_size=B)
    tables = ref.init_tables(cfg, scheme="uniform")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)

    mesh = global_mesh(data=2, model=2)
    sh = ShardedFleetRec(model, mesh)
    sparams = sh.shard_params(params)

    rng = np.random.default_rng(7)
    idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
    dense = rng.uniform(-1, 1, (B, cfg.dense_dim)).astype(np.float32)
    golden = ref.forward(cfg, tables, ws, idx, dense)

    lo, hi = pid * 8, pid * 8 + 8
    gi = host_local_batch_to_global(mesh, idx[lo:hi])
    gd = host_local_batch_to_global(mesh, dense[lo:hi])
    out = sh.forward(sparams, gi, gd)
    # this process's data-shard (its devices hold model-replicated copies;
    # take one)
    local = np.asarray(out.addressable_shards[0].data).ravel()
    ok = np.allclose(local, golden[lo:hi], rtol=1e-4, atol=1e-3)
    print(f"proc {pid} local-vs-oracle match: {ok}", flush=True)
    assert ok
    """
)


def _mp_env():
    env = {k: v for k, v in os.environ.items()}
    env["PYTHONPATH"] = os.pathsep.join(
        filter(None, [env.get("PYTHONPATH", ""), os.path.dirname(os.path.dirname(__file__))])
    )
    return env


def test_two_process_sharded_forward(tmp_path):
    port = "29911"
    env = _mp_env()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "match: True" in out, out[-2000:]


def test_two_process_sharded_serving_e2e():
    """The reference's full multi-node deployment, reproducible from the
    CLI (VERDICT r2 #2): two `cli serve --mesh 2,2 --procs 2` OS processes
    over a jax.distributed (gloo/CPU) global mesh, EACH running its own
    IngestServer and feeding its host-local rows of the global batch
    through the sharded forward (host_local_batch_to_global); each
    process streams back the scores for ITS rows, verified against the
    float64 oracle on the assembled global batch.

    Reference topology: run_cuda_server.sh starts server + CPU0 + FPGA0 +
    FPGA1 in order (GPU/final_network_cublasLt_3_nodes_no_FIFO_scatter);
    here the two serve processes are the scoring+ingest nodes and this
    test plays every sender."""
    import json
    import socket
    import struct

    import jax  # noqa: F401  (env knobs only; this process stays client-side)

    from fleetrec_tpu import config as C
    from fleetrec_tpu import reference as ref

    B_LOC, NB, PORT0, COORD = 8, 3, 19400, "localhost:29917"
    cfg = C.micro_test(batch_size=2 * B_LOC)
    tables = ref.init_tables(cfg, scheme="rowid")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")

    env = _mp_env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    servers = [
        subprocess.Popen(
            [sys.executable, "-m", "fleetrec_tpu.cli", "serve",
             "--platform", "cpu", "--config", "micro_test",
             "--batch", str(B_LOC), "--batches", str(NB),
             "--mesh", "2,2", "--procs", "2", "--proc-id", str(i),
             "--coordinator", COORD,
             "--port", str(PORT0 + 10 * i), "--slots", "4",
             "--table-scheme", "rowid", "--mlp-scheme", "uniform",
             "--reply"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    try:
        # serve prints its banner after model build + port bind (gloo
        # chatters "[Gloo] Rank ..." on stdout first — skip it)
        for i, p in enumerate(servers):
            for _ in range(20):
                banner = p.stdout.readline()
                if banner.startswith("serving"):
                    break
            assert banner.startswith("serving"), (banner, p.stderr.read()[-2000:])

        rng = np.random.default_rng(11)
        g_idx = [
            np.stack([rng.integers(0, t.rows, 2 * B_LOC) for t in cfg.tables], 1)
            .astype(np.int32) for _ in range(NB)
        ]
        g_dense = [
            rng.uniform(-1, 1, (2 * B_LOC, cfg.dense_dim)).astype(np.float32)
            for _ in range(NB)
        ]

        def run_client(pid, out):
            sock = socket.create_connection(("127.0.0.1", PORT0 + 10 * pid),
                                            timeout=30)
            lo, hi = pid * B_LOC, (pid + 1) * B_LOC
            for k in range(NB):
                sock.sendall(g_idx[k][lo:hi].tobytes() +
                             g_dense[k][lo:hi].tobytes())
            want = NB * B_LOC * 4
            buf = b""
            while len(buf) < want:
                chunk = sock.recv(want - len(buf))
                if not chunk:
                    break
                buf += chunk
            sock.close()
            out[pid] = np.frombuffer(buf, np.float32).reshape(NB, B_LOC)

        scores = {}
        ths = [threading.Thread(target=run_client, args=(i, scores), daemon=True)
               for i in range(2)]
        for t in ths:
            t.start()
        outs = [p.communicate(timeout=180) for p in servers]
        for t in ths:
            t.join(30)
        for i, (p, (out, err)) in enumerate(zip(servers, outs)):
            assert p.returncode == 0, f"serve {i} failed:\n{err[-3000:]}"
            summary = json.loads(out.strip().splitlines()[-1])
            assert summary["batches"] == NB
        assert set(scores) == {0, 1}
        for k in range(NB):
            golden = ref.forward(cfg, tables, ws, g_idx[k], g_dense[k])
            got = np.concatenate([scores[0][k], scores[1][k]])
            np.testing.assert_allclose(got, golden, rtol=1e-4, atol=1e-3)
    finally:
        for p in servers:
            if p.poll() is None:
                p.kill()
                p.wait()


def test_four_process_fused_sharded_serving_e2e():
    """Production-complete multi-host serving (VERDICT r4 #1): FOUR
    `cli serve --mesh 4,2 --procs 4 --fuse 4` processes over one
    jax.distributed (gloo/CPU) global mesh of 8 virtual devices, fused
    lockstep dispatch through the PIPELINED collective step
    (ShardedFleetRec._local_pipelined: batch k's psum overlaps batch
    k+1's gather) — the deployment every >=10M SCALING.md verdict
    assumes.  Each process ingests its own 8 rows of the 32-row global
    batch and replies its own rows' scores; pm1 tables + ones MLP + ±1
    dense keep every sum integer-valued, so scores are checked BIT-EXACT
    against the float64 oracle."""
    import json
    import socket

    from fleetrec_tpu import config as C
    from fleetrec_tpu import reference as ref

    NP_, B_LOC, NB, FUSE = 4, 8, 8, 4
    PORT0, COORD = 19600, "localhost:29931"
    cfg = C.micro_test(batch_size=NP_ * B_LOC)
    tables = ref.init_tables(cfg, scheme="pm1")
    ws = ref.init_mlp_weights(cfg, scheme="ones")

    env = _mp_env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    servers = [
        subprocess.Popen(
            [sys.executable, "-m", "fleetrec_tpu.cli", "serve",
             "--platform", "cpu", "--config", "micro_test",
             "--batch", str(B_LOC), "--batches", str(NB),
             "--mesh", "4,2", "--procs", str(NP_), "--proc-id", str(i),
             "--coordinator", COORD, "--fuse", str(FUSE),
             "--peer-timeout", "120",
             "--port", str(PORT0 + 10 * i), "--slots", "8",
             "--table-scheme", "pm1", "--mlp-scheme", "ones",
             "--reply"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(NP_)
    ]
    try:
        for i, p in enumerate(servers):
            for _ in range(40):
                banner = p.stdout.readline()
                if banner.startswith("serving"):
                    break
            assert banner.startswith("serving"), (banner, p.stderr.read()[-2000:])

        rng = np.random.default_rng(13)
        B_G = NP_ * B_LOC
        g_idx = [
            np.stack([rng.integers(0, t.rows, B_G) for t in cfg.tables], 1)
            .astype(np.int32) for _ in range(NB)
        ]
        g_dense = [
            np.sign(rng.uniform(-1, 1, (B_G, cfg.dense_dim))).astype(np.float32)
            for _ in range(NB)
        ]

        def run_client(pid, out):
            sock = socket.create_connection(("127.0.0.1", PORT0 + 10 * pid),
                                            timeout=60)
            lo, hi = pid * B_LOC, (pid + 1) * B_LOC
            for k in range(NB):
                sock.sendall(g_idx[k][lo:hi].tobytes() +
                             g_dense[k][lo:hi].tobytes())
            want = NB * B_LOC * 4
            buf = b""
            while len(buf) < want:
                chunk = sock.recv(want - len(buf))
                if not chunk:
                    break
                buf += chunk
            sock.close()
            out[pid] = np.frombuffer(buf, np.float32).reshape(NB, B_LOC)

        scores = {}
        ths = [threading.Thread(target=run_client, args=(i, scores), daemon=True)
               for i in range(NP_)]
        for t in ths:
            t.start()
        outs = [p.communicate(timeout=300) for p in servers]
        for t in ths:
            t.join(30)
        for i, (p, (out, err)) in enumerate(zip(servers, outs)):
            assert p.returncode == 0, f"serve {i} failed:\n{err[-3000:]}"
            summary = json.loads(out.strip().splitlines()[-1])
            assert summary["wire_batches"] == NB
            assert summary["fuse"] == FUSE
        assert set(scores) == set(range(NP_))
        for k in range(NB):
            golden = ref.forward(cfg, tables, ws, g_idx[k], g_dense[k])
            got = np.concatenate([scores[i][k] for i in range(NP_)])
            np.testing.assert_array_equal(got, golden.astype(np.float32))
    finally:
        for p in servers:
            if p.poll() is None:
                p.kill()
                p.wait()


def test_peer_stall_watchdog_aborts_instead_of_hanging():
    """Kill-a-peer behavior (VERDICT r4 weak #5): two lockstep serve
    processes; traffic goes ONLY to process 0, so process 1 never enters
    the collective — exactly the stalled-peer deadlock.  With
    --peer-timeout armed, process 0 must ABORT with the per-process
    diagnostic (exit 124) within the bound instead of hanging forever
    (the reference's fail-loud convention, cuda_server.c:370-401).

    Mesh is (1, 4): the MODEL axis spans both processes, so the psum is a
    genuine cross-process gloo collective.  (On a (2, 2) mesh each
    process's model pair is local and process 0 can finish its own data
    rows alone — measured while building this test.)"""
    import socket

    from fleetrec_tpu import config as C
    from fleetrec_tpu.serving.engine import EXIT_PEER_TIMEOUT

    B_LOC, PORT0, COORD = 8, 19700, "localhost:29941"
    cfg = C.micro_test(batch_size=2 * B_LOC)

    env = _mp_env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    servers = [
        subprocess.Popen(
            [sys.executable, "-m", "fleetrec_tpu.cli", "serve",
             "--platform", "cpu", "--config", "micro_test",
             "--batch", str(B_LOC), "--batches", "1",
             "--mesh", "1,4", "--procs", "2", "--proc-id", str(i),
             "--coordinator", COORD, "--peer-timeout", "5",
             "--port", str(PORT0 + 10 * i), "--slots", "4"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    try:
        for i, p in enumerate(servers):
            for _ in range(40):
                banner = p.stdout.readline()
                if banner.startswith("serving"):
                    break
            assert banner.startswith("serving"), (banner, p.stderr.read()[-2000:])

        rng = np.random.default_rng(3)
        idx = np.stack([rng.integers(0, t.rows, B_LOC) for t in cfg.tables],
                       1).astype(np.int32)
        dense = rng.uniform(-1, 1, (B_LOC, cfg.dense_dim)).astype(np.float32)
        sock = socket.create_connection(("127.0.0.1", PORT0), timeout=30)
        sock.sendall(idx.tobytes() + dense.tobytes())

        out0, err0 = servers[0].communicate(timeout=90)
        sock.close()
        assert servers[0].returncode == EXIT_PEER_TIMEOUT, (
            servers[0].returncode, err0[-3000:])
        assert "peer-watchdog" in err0, err0[-3000:]
    finally:
        for p in servers:
            if p.poll() is None:
                p.kill()
                p.wait()
