"""CLI command smokes on the CPU backend — the analog of exercising the
reference's host CLIs (host.cpp:112-178) and run scripts end to end."""

import json
import os

import numpy as np
import pytest

from fleetrec_tpu.cli import main


def run_cli(capsys, *argv):
    main(list(argv))
    out = capsys.readouterr().out.strip()
    try:
        return json.loads(out)          # single (possibly pretty) JSON doc
    except json.JSONDecodeError:
        return json.loads(out.splitlines()[-1])  # last line after banners


COMMON = ["--config", "micro_test", "--batch", "16", "--platform", "cpu"]


def test_cli_bench_stages(capsys):
    for stage in ("e2e", "lookup", "mlp"):
        r = run_cli(capsys, "bench", *COMMON, "--iters", "2", "--stage", stage)
        assert r["stage"] == stage and r["ms_per_batch"] > 0


def test_cli_plan(capsys):
    r = run_cli(capsys, "plan", "--config", "criteo_terabyte", "--platform",
                "cpu", "--model-axis", "8", "--batch", "64")
    assert r["fits"] is True and r["n_model"] == 8
    assert r["take_bytes_per_chip"] * 8 == r["take_bytes_total"]


def test_cli_plan_recommend(capsys):
    r = run_cli(capsys, "plan", "--config", "criteo_terabyte", "--platform",
                "cpu", "--recommend", "16", "--dtype", "bfloat16", "--batch", "64")
    assert r["chips"] == 16
    assert r["data_axis"] * r["model_axis"] == 16
    assert r["per_chip_bytes"] <= r["hbm_budget_bytes"]


def test_cli_export_and_ckpt_roundtrip(tmp_path, capsys):
    path = os.path.join(tmp_path, "m.npz")
    r = run_cli(capsys, "export", *COMMON, "--out", path)
    assert r["config"] == "micro_test" and os.path.exists(path)
    r = run_cli(capsys, "bench", *COMMON, "--iters", "2", "--ckpt", path)
    assert r["ms_per_batch"] > 0
    # wrong geometry fails fast
    from fleetrec_tpu.io import ConfigMismatchError
    with pytest.raises(ConfigMismatchError):
        run_cli(capsys, "bench", "--config", "tiny_dlrm", "--batch", "16",
                "--platform", "cpu", "--iters", "2", "--ckpt", path)


def test_cli_autotune(capsys):
    r = run_cli(capsys, "autotune", *COMMON, "--iters", "2",
                "--thresholds", "64", "128")
    assert r["best"]["onehot_max"] in (64, 128)
    assert len(r["sweep"]) == 2


def test_cli_servebench(capsys):
    r = run_cli(capsys, "servebench", *COMMON, "--qps", "3000",
                "--duration", "0.5", "--fuse", "2")
    assert r["n_queries"] > 100 and r["fuse"] == 2


def test_cli_icibench(capsys):
    r = run_cli(capsys, "icibench", "--platform", "cpu", "--data", "2",
                "--mbytes", "1", "--iters", "2")
    assert r["model_axis"] == 4
    for name in ("all_gather", "psum", "ppermute"):
        assert r[name]["GB_s"] > 0


def test_cli_qr_threshold_without_rem_rejected():
    """--qr-threshold alone would silently build the exact model (the gate
    is --qr-rem); it must fail loudly instead (ADVICE r4)."""
    with pytest.raises(SystemExit):
        main(["bench", *COMMON, "--iters", "1", "--qr-threshold", "100"])
