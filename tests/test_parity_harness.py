"""Parity harness smoke: tools/parity_check.py dumps layer stats +
detections for a converted (synthesized) checkpoint and `--diff` judges
two dumps. Exercises the full ready-to-fire path of VERDICT's parity
protocol (`/root/reference/README.md:70-84`) minus only the real data."""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from parity_check import collect_stats, run_diff, tensor_stats  # noqa: E402


def test_tensor_stats_masked():
    x = np.array([[1.0, 2.0], [100.0, 200.0]])
    mask = np.array([True, False])
    s = tensor_stats(x, mask)
    assert s["n"] == 2 and s["mean"] == 1.5 and s["absmax"] == 2.0


def test_collect_stats_walks_sparse_tensors():
    import jax.numpy as jnp

    from fcaf3d_tpu.ops.sparse.tensor import SENTINEL, SparseTensor

    keys = jnp.array([[0, 5, SENTINEL]], jnp.uint32)
    st = SparseTensor(
        coords=jnp.zeros((1, 3, 3), jnp.int32),
        feats=jnp.array([[[1.0], [3.0], [999.0]]]),
        keys=keys, shift=jnp.zeros((1, 3), jnp.int32), stride=1,
    )
    out = {}
    collect_stats({"backbone": {"__call__": (st,)}}, "", out)
    rec = out["backbone/__call__[0]"]
    assert rec["n"] == 2 and rec["mean"] == 2.0  # padding row excluded


def test_diff_detects_deviation(tmp_path):
    a = {"layer_stats": {"l1": {"mean": 1.0, "std": 2.0, "absmax": 3.0}},
         "detections": {"scores": [0.9], "boxes": [[0] * 7], "labels": [0]}}
    b = json.loads(json.dumps(a))
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    assert run_diff(str(pa), str(pb), rtol=1e-3) == 0
    b["layer_stats"]["l1"]["mean"] = 1.5
    pb.write_text(json.dumps(b))
    assert run_diff(str(pa), str(pb), rtol=1e-3) == 1


@pytest.mark.slow
def test_cli_dump_runs_on_tiny_model(tmp_path):
    """End-to-end CLI: synthetic scene bin -> reference-mode inference ->
    dump JSON with layer stats + detections; self-diff passes."""
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform(0, 3, (2048, 3)), rng.uniform(0, 255, (2048, 3))],
        axis=1).astype(np.float32)
    bin_path = tmp_path / "scene.bin"
    pts.tofile(bin_path)
    dump_path = tmp_path / "dump.json"
    r = subprocess.run(
        [sys.executable, "tools/parity_check.py", "--config", "fcaf3d_tiny",
         "--points", str(bin_path), "--dump", str(dump_path)],
        capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    with open(dump_path) as f:
        dump = json.load(f)
    assert dump["layer_stats"], "no layer records captured"
    assert any("backbone" in k for k in dump["layer_stats"])
    assert "detections" in dump
    # self-diff must pass
    r2 = subprocess.run(
        [sys.executable, "tools/parity_check.py", "--diff", str(dump_path),
         str(dump_path)],
        capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert r2.returncode == 0, r2.stdout + r2.stderr[-500:]
    assert "PARITY OK" in r2.stdout
