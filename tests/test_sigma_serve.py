"""Sigma rule compiler + serve paging."""

import pyarrow as pa

from tenzir_ray.pipelines.serve import serve
from tenzir_ray.stages.sigma import compile_rule, sigma

SF = "/root/testdata/sf0.001"


def test_sigma_modifiers_and_condition(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "proc": ["powershell.exe", "cmd.exe", "bash", "powershell.exe"],
            "cmdline": ["-enc abc", "dir", "ls", "Get-Item"],
            "sev": [5, 1, 1, 9],
        }
    )
    rule = {
        "detection": {
            "sel_proc": {"proc|endswith": ".exe"},
            "sel_enc": {"cmdline|contains": "-enc"},
            "high": {"sev|gte": 5},
            "condition": "sel_proc and (sel_enc or high)",
        }
    }
    out = sigma(ray.data.from_arrow(tbl), rule).to_pandas()
    assert sorted(out["proc"]) == ["powershell.exe", "powershell.exe"]
    # "1 of them" form
    rule2 = {"detection": {"a": {"proc": "bash"}, "b": {"sev": 9}, "condition": "1 of them"}}
    out2 = sigma(ray.data.from_arrow(tbl), rule2).to_pandas()
    assert len(out2) == 2
    # list-of-maps OR selection
    rule3 = {"detection": {"sel": [{"proc": "bash"}, {"proc": "cmd.exe"}], "condition": "sel"}}
    assert sigma(ray.data.from_arrow(tbl), rule3).count() == 2


def test_serve_paging(ray_session):
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/events.parquet").sort("event_id")
    srv = serve(ds, page_size=300)
    seen, token, pages = 0, None, 0
    while True:
        page, token = srv.get(token)
        if page is None:
            break
        seen += page.num_rows
        pages += 1
        if token is None:
            break
    assert seen == 1000 and pages == 4
    # re-fetch an already-served token (at-least-once client retry)
    page1, _ = srv.get(1)
    assert page1 is not None and page1.num_rows == 300


def test_sigma_rule_watcher(tmp_path, ray_session):
    """Hot-reload: the watcher re-reads rules only when the file set or
    mtimes change, and new rules take effect on the next tick."""
    import os
    import time

    import pyarrow as pa
    import ray.data as rd

    from tenzir_ray.stages.sigma import RuleWatcher, sigma

    rdir = tmp_path / "rules"
    rdir.mkdir()
    (rdir / "a.yml").write_text(
        "title: sshd\ndetection:\n  sel:\n    proc: sshd\n  condition: sel\n")
    w = RuleWatcher(str(rdir))
    assert [r["title"] for r in w.rules()] == ["sshd"]
    assert not w.changed
    r1 = w.rules()
    assert w.rules() is r1  # clean tick: no reload, same object

    time.sleep(0.01)
    (rdir / "b.yml").write_text(
        "title: cron\ndetection:\n  sel:\n    proc: cron\n  condition: sel\n")
    assert w.changed
    assert sorted(r["title"] for r in w.rules()) == ["cron", "sshd"]

    ds = rd.from_arrow(pa.table({"proc": ["sshd", "cron", "bash"]}))
    out = sigma(ds, w.rules()).to_pandas()
    assert sorted(out["proc"]) == ["cron", "sshd"]


def test_hint_ops_are_noops(ray_session):
    """unordered/local/remote parse and pass events through unchanged
    (Ray's scheduler owns placement/ordering here)."""
    import pyarrow as pa
    import ray.data as rd

    from tenzir_ray.pipelines import run_pipeline

    ds = rd.from_arrow(pa.table({"x": [3, 1, 2]}))
    out = run_pipeline("unordered | local | remote | sort x", ds=ds).to_pandas()
    assert out["x"].tolist() == [1, 2, 3]
