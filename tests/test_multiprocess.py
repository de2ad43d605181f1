"""True multi-process serving test: 2 JAX processes (gloo/CPU), a global
(data=2, model=2) mesh spanning them, the shard_map forward, per-process
local batch assembly — the multi-node analog the reference runs with its
sender/server binaries on separate machines (SURVEY §4.3)."""

import os
import subprocess
import sys
import textwrap

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


def test_two_process_sharded_forward(tmp_path):
    port = "29911"
    env = {k: v for k, v in os.environ.items()}
    env["PYTHONPATH"] = os.pathsep.join(
        filter(None, [env.get("PYTHONPATH", ""), os.path.dirname(os.path.dirname(__file__))])
    )
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
