"""lake_admin CLI (python -m tenzir_ray.lake_admin) via subprocess."""

import json
import shutil
import subprocess
import sys

import pyarrow as pa
import pytest


@pytest.fixture()
def admin_lake(ray_session, tmp_path):
    from tenzir_ray.cdc import LakeTable

    root = str(tmp_path / "lake")
    shutil.rmtree(root, ignore_errors=True)
    lake = LakeTable(root, num_partitions=4, token_bloom_cols=("text",))
    n = 200
    tbl = pa.table({
        "lsn": pa.array(range(n), pa.int64()),
        "op": pa.array(["insert"] * n),
        "conv_id": pa.array([f"c{i % 10}" for i in range(n)]),
        "turn_idx": pa.array([i // 10 for i in range(n)], pa.int32()),
        "text": pa.array(
            [("magic" if i % 40 == 0 else "plain") + f" r{i}"
             for i in range(n)]),
    })
    lake.apply_changes(tbl, epoch_id="e1")
    return root


def _run(root, *a, timeout=300):
    r = subprocess.run(
        [sys.executable, "-m", "tenzir_ray.lake_admin", root, *a,
         "--num-cpus", "2"],
        capture_output=True, text=True, timeout=timeout, cwd="/tmp")
    assert r.returncode == 0, r.stderr[-800:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_show_and_metrics(admin_lake):
    out = _run(admin_lake, "show")
    assert out["live_rows"] == 200 and out["epochs"] == 1
    assert out["resume_lsn"] == 200
    m = _run(admin_lake, "metrics")
    assert len(m["epochs"]) == 1


def test_search_and_lookup(admin_lake):
    s = _run(admin_lake, "search", "magic")
    assert len(s["rows"]) == 5
    assert all("magic" in r["text"].split() for r in s["rows"])
    lk = _run(admin_lake, "lookup", "c3")
    assert lk["rows_total"] == 20


def test_expire_and_gc(admin_lake):
    e = _run(admin_lake, "expire", "turn_idx >= 10")
    assert e.get("skipped") is False
    out = _run(admin_lake, "show")
    assert out["live_rows"] == 100
    g = _run(admin_lake, "gc")
    assert "removed" in g or isinstance(g, dict)


def test_reshard_and_clone(admin_lake, tmp_path):
    rs = _run(admin_lake, "reshard", str(tmp_path / "rs"), "2")
    assert rs["dest"]["num_partitions"] == 2
    assert rs["dest"]["live_rows"] == 200
    cl = _run(admin_lake, "clone", str(tmp_path / "cl"))
    assert cl["dest"]["live_rows"] == 200


def test_bad_command_operands(admin_lake):
    r = subprocess.run(
        [sys.executable, "-m", "tenzir_ray.lake_admin", admin_lake,
         "lookup", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=120, cwd="/tmp")
    assert r.returncode != 0
