"""CLI entry points: ``python -m tenzir_ray`` (the reference's `tenzir
"<pipeline>"` executable analog) and ``python -m tenzir_ray.replay``
(the ray-job CDC replay driver). Each subprocess owns its own Ray
session — these run outside the shared fixture on purpose (fresh-process
worker-import coverage)."""

import json
import os
import subprocess
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(args, cwd="/tmp"):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run([sys.executable, *args], capture_output=True,
                          text=True, env=env, cwd=cwd, timeout=240)


def test_cli_tql_ndjson():
    r = _run(["-m", "tenzir_ray", "--num-cpus", "4",
              f'read_parquet "{SF}/nation.parquet" | where n_regionkey == 1 '
              "| select n_name, n_nationkey | sort n_name | head 3"])
    assert r.returncode == 0, r.stderr[-800:]
    rows = [json.loads(x) for x in r.stdout.strip().splitlines()]
    assert len(rows) == 3
    assert all(set(x) == {"n_name", "n_nationkey"} for x in rows)


def test_cli_explain_does_not_execute():
    r = _run(["-m", "tenzir_ray", "--explain", "--num-cpus", "4",
              'read_parquet "/nonexistent.parquet" | where x == 1'])
    assert r.returncode == 0, r.stderr[-800:]
    stages = [json.loads(x)["stage"] for x in r.stdout.strip().splitlines()]
    assert "parsed" in stages and "optimized" in stages


def test_replay_job_checkpoint_and_exactly_once(tmp_path):
    sys.path.insert(0, REPO)
    from tenzir_ray.cdc import gen_changes

    ch = gen_changes(4000, seed=3)
    lsn = ch.column("lsn")
    log1 = tmp_path / "log1"
    logf = tmp_path / "logf"
    log1.mkdir(), logf.mkdir()
    pq.write_table(ch.filter(pc.less(lsn, 2000)), str(log1 / "a.parquet"))
    pq.write_table(ch, str(logf / "b.parquet"))
    lake = str(tmp_path / "lake")
    base = ["-m", "tenzir_ray.replay", "--lake", lake, "--num-cpus", "4"]
    r1 = _run(base + ["--changes", str(log1), "--epoch-id", "e1"])
    assert r1.returncode == 0, r1.stderr[-800:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert m1["lsn_max"] == 1999 and m1["resume_lsn"] == 2000
    # full log + checkpoint: only the unseen suffix applies
    r2 = _run(base + ["--changes", str(logf), "--epoch-id", "e2",
                      "--from-checkpoint"])
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert m2["lsn_min"] == 2000 and m2["lsn_max"] == 3999
    # replayed epoch id: exactly-once no-op
    r3 = _run(base + ["--changes", str(logf), "--epoch-id", "e2"])
    m3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert m3["skipped"] is True and m3["resume_lsn"] == 4000


def test_cli_show_aspects():
    r = _run(["-m", "tenzir_ray", "--show", "operators"])
    assert r.returncode == 0, r.stderr[-500:]
    ops = json.loads(r.stdout)
    assert "conversation_stats" in ops and "summarize" in ops
    r2 = _run(["-m", "tenzir_ray", "--show", "version"])
    assert json.loads(r2.stdout) == "0.4.0"
    # no pipeline and no --show: usage error
    r3 = _run(["-m", "tenzir_ray"])
    assert r3.returncode == 2
