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
