"""Sources/formats + declarative Pipeline (SURVEY §2.1/§2.2, §3)."""

import json
import os

import pandas as pd

import pyarrow as pa
import pyarrow.feather as feather
import pytest

from tenzir_ray.pipelines import Pipeline
from tenzir_ray.sources import (
    parse_cef,
    parse_grok,
    parse_kv,
    parse_leef,
    parse_ndjson,
    parse_syslog,
    read_csv,
    read_feather,
    read_lines,
    read_parquet,
)

SF = "/root/testdata/sf0.001"


def _lines_ds(ray, lines):
    import ray.data

    return ray.data.from_arrow(pa.table({"text": lines}))


def test_read_parquet_pushdown(ray_session):
    ds = read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity"],
        filter_expr="l_quantity > 45",
    )
    df = ds.to_pandas()
    assert set(df.columns) == {"l_orderkey", "l_quantity"}
    assert (df["l_quantity"] > 45).all()


def test_read_csv_tsv(ray_session, tmp_path):
    p = tmp_path / "x.tsv"
    p.write_text("a\tb\n1\tx\n2\ty\n")
    df = read_csv(str(p), delimiter="\t").to_pandas()
    assert df["a"].tolist() == [1, 2] and df["b"].tolist() == ["x", "y"]
    p2 = tmp_path / "nohdr.csv"
    p2.write_text("1,x\n2,y\n")
    df = read_csv(str(p2), header=False, column_names=["n", "s"]).to_pandas()
    assert df["n"].tolist() == [1, 2]


def test_read_feather(ray_session, tmp_path):
    tbl = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    p = str(tmp_path / "t.feather")
    feather.write_feather(tbl, p)
    df = read_feather(p).to_pandas()
    assert df["a"].tolist() == [1, 2, 3]


def test_parse_ndjson_inference_and_selector(ray_session):
    lines = [
        json.dumps({"kind": "alert", "sev": 3, "msg": "hi"}),
        json.dumps({"kind": "flow", "bytes": 123}),
        "not json at all {",
    ]
    ds = parse_ndjson(_lines_ds(ray_session, lines), selector="kind")
    df = ds.to_pandas()
    assert "_schema" in df.columns
    ok = df[df.get("_parse_error").isna()] if "_parse_error" in df.columns else df
    assert set(ok["_schema"]) == {"alert", "flow"}
    # additive fields: both sev and bytes present, nulls where missing
    assert {"sev", "bytes"} <= set(df.columns)


def test_parse_kv(ray_session):
    ds = parse_kv(_lines_ds(ray_session, ["a=1 b=two c=3", "a=9 d=x"]))
    df = ds.to_pandas()
    assert df["a"].tolist() == ["1", "9"]
    assert df["b"].tolist()[0] == "two"
    assert df["d"].tolist()[1] == "x"


def test_parse_syslog_both_rfcs(ray_session):
    lines = [
        "<165>1 2023-10-11T22:14:15.003Z host1 app 1234 ID47 - Something happened",
        "<34>Oct 11 22:14:15 myhost su[230]: 'su root' failed",
        "plain noise",
    ]
    df = parse_syslog(_lines_ds(ray_session, lines)).to_pandas()
    by_rfc = df.set_index("rfc", drop=False)
    assert by_rfc.loc[5424]["hostname"] == "host1"
    assert by_rfc.loc[5424]["severity"] == 165 % 8
    assert by_rfc.loc[3164]["tag"] == "su"
    assert df["rfc"].isna().sum() == 1


def test_parse_cef_leef(ray_session):
    cef = "CEF:0|Vendor|Product|1.0|100|Port scan|5|src=10.0.0.1 dst=10.0.0.2 spt=1232"
    df = parse_cef(_lines_ds(ray_session, [cef])).to_pandas()
    assert df["device_vendor"][0] == "Vendor"
    assert df["src"][0] == "10.0.0.1" and df["spt"][0] == "1232"
    leef = "LEEF:1.0|IBM|QRadar|2.0|12345|src=10.0.0.1\tdst=10.0.0.5\tsev=5"
    df = parse_leef(_lines_ds(ray_session, [leef])).to_pandas()
    assert df["device_vendor"][0] == "IBM" and df["dst"][0] == "10.0.0.5"


def test_parse_grok(ray_session):
    line = '10.1.2.3 - GET /index.html 200'
    ds = parse_grok(
        _lines_ds(ray_session, [line]),
        "%{IP:client} - %{WORD:method} %{PATH:path} %{INT:status}",
    )
    df = ds.to_pandas()
    assert df["client"][0] == "10.1.2.3"
    assert df["method"][0] == "GET"
    assert df["path"][0] == "/index.html"
    assert df["status"][0] == "200"


def test_pipeline_spec(ray_session):
    result = Pipeline(
        [
            {"op": "read_parquet", "paths": f"{SF}/lineitem.parquet"},
            {"op": "where", "expr": "l_quantity > 45"},
            {"op": "set", "rev": "l_extendedprice * (1 - l_discount)"},
            {
                "op": "summarize",
                "by": "l_returnflag",
                "aggs": {"total": "sum(rev)", "n": "count(*)"},
            },
            {"op": "sort", "keys": "total", "descending": True},
        ]
    ).run()
    df = result.to_pandas()
    assert len(df) <= 3 and df["total"].is_monotonic_decreasing


def test_pipeline_from_json_and_apply(ray_session):
    spec = json.dumps(
        [
            {"op": "read_parquet", "paths": f"{SF}/events.parquet"},
            {
                "op": "apply",
                "pipeline": [
                    {"op": "where", "expr": "event_type == 'click'"},
                    {"op": "select", "columns": ["event_id", "event_type"]},
                ],
            },
        ]
    )
    df = Pipeline.from_json(spec).run().to_pandas()
    assert (df["event_type"] == "click").all()


def test_zeek_tsv(ray_session, tmp_path):
    from tenzir_ray.sources.parsers import read_zeek_tsv

    log = (
        "#separator \\x09\n"
        "#set_separator\t,\n"
        "#empty_field\t(empty)\n"
        "#unset_field\t-\n"
        "#path\tconn\n"
        "#fields\tts\tuid\tid.orig_h\tid.orig_p\tproto\tduration\ttags\n"
        "#types\ttime\tstring\taddr\tport\tenum\tinterval\tset[string]\n"
        "1633737600.1\tCab1\t10.0.0.1\t51532\ttcp\t0.25\ta,b\n"
        "1633737601.5\tCab2\t10.0.0.2\t80\tudp\t-\t(empty)\n"
        "#close\t2021-10-09-00-00-05\n"
    )
    p = tmp_path / "conn.log"
    p.write_text(log)
    df = read_zeek_tsv(str(p)).to_pandas()
    assert len(df) == 2
    assert df["uid"].tolist() == ["Cab1", "Cab2"]
    assert df["id.orig_p"].tolist() == [51532, 80]
    assert df["duration"][0] == 0.25 and pd.isna(df["duration"][1])
    assert list(df["tags"][0]) == ["a", "b"] and list(df["tags"][1]) == []


def test_parse_yaml(ray_session):
    import pyarrow as pa
    import ray.data

    from tenzir_ray.sources.parsers import parse_yaml_docs

    docs = ["a: 1\nb: text", "a: 2\nc: [1, 2]", "justa string"]
    ds = parse_yaml_docs(ray.data.from_arrow(pa.table({"text": docs})))
    df = ds.to_pandas()
    assert df["a"].tolist()[:2] == [1, 2]
    assert "value" in df.columns or "_raw" in df.columns


def test_presets_and_schema_split(ray_session):
    import ray.data

    from tenzir_ray.sources.parsers import parse_suricata, split_by_schema

    lines = [
        json.dumps({"event_type": "alert", "severity": 2}),
        json.dumps({"event_type": "flow", "bytes": 10}),
        json.dumps({"event_type": "alert", "severity": 5}),
    ]
    ds = parse_suricata(
        ray.data.from_arrow(pa.table({"text": lines}))
    )
    per_schema = split_by_schema(ds)
    assert sorted(per_schema) == ["alert", "flow"]
    assert per_schema["alert"].count() == 2
    assert per_schema["flow"].to_pandas()["bytes"].tolist() == [10]


def test_yield_and_parse_time(ray_session):
    import ray.data

    from tenzir_ray.stages.transforms import parse_time, yield_

    tbl = pa.table(
        {
            "id": [1, 2],
            "nested": pa.array(
                [{"inner": {"x": 10, "y": "a"}}, {"inner": {"x": 20, "y": "b"}}],
                pa.struct([("inner", pa.struct([("x", pa.int64()), ("y", pa.string())]))]),
            ),
            "when": ["2024-01-02 03:04:05", "2024-06-07 08:09:10"],
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = yield_(ds, "nested.inner").to_pandas()
    assert sorted(out.columns) == ["x", "y"]
    assert sorted(out["x"]) == [10, 20]
    ts = parse_time(ds, "when", "%Y-%m-%d %H:%M:%S", out="ts").to_pandas()
    assert str(ts["ts"][0]).startswith("2024-01-02 03:04:05")


def test_pipeline_join_subpipeline(ray_session):
    out = Pipeline(
        [
            {"op": "read_parquet", "paths": f"{SF}/lineitem.parquet"},
            {"op": "select", "columns": ["l_orderkey", "l_quantity"]},
            {
                "op": "hash_join",
                "on": "l_orderkey",
                "right_on": "o_orderkey",
                "right": [
                    {"op": "read_parquet", "paths": f"{SF}/orders.parquet"},
                    {"op": "select", "columns": ["o_orderkey", "o_orderpriority"]},
                ],
            },
            {
                "op": "summarize",
                "by": "o_orderpriority",
                "aggs": {"qty": "sum(l_quantity)", "n": "count(*)"},
            },
        ]
    ).run()
    df = out.to_pandas()
    assert df["n"].sum() == 6000 and len(df) == 5


# ---------------------------------------------------------------------------
# velociraptor source (injected-transport adapter)


def test_velociraptor_query_and_logs(ray_session):
    import json

    from tenzir_ray.sources.velociraptor import (
        FakeVelociraptorClient,
        read_velociraptor,
    )

    client = FakeVelociraptorClient(n_parts=2, rows_per_part=3)
    out = read_velociraptor("SELECT * FROM pslist()", client=client).to_pandas()
    assert len(out) == 6
    assert set(out["part"]) == {0, 1}
    assert out["query_vql"].iloc[0] == "SELECT * FROM pslist()"
    first = json.loads(out["response"].iloc[0])
    assert first == {"ClientId": "C.0-0", "Pid": 0}
    assert str(out["timestamp"].dtype).startswith("datetime64")
    # the adapter recorded exactly one request with our name
    assert client.requests == [("tenzir_ray", "SELECT * FROM pslist()", "")]

    logs = read_velociraptor(
        "SELECT 1", client=FakeVelociraptorClient(), logs=True
    ).to_pandas()
    assert logs["log"].tolist() == ["query completed"]


def test_velociraptor_subscribe_and_guards(ray_session):
    import pytest as _pytest

    from tenzir_ray.sources.velociraptor import (
        FakeVelociraptorClient,
        make_subscribe_query,
        read_velociraptor,
    )

    client = FakeVelociraptorClient()
    out = read_velociraptor(
        artifact="Windows.Sys.Processes", client=client, max_rows=4
    ).to_pandas()
    assert len(out) == 4  # max_rows bound
    assert "Windows.Sys.Processes" in client.requests[0][1]
    assert "watch_monitoring" in make_subscribe_query("X.Y")
    with _pytest.raises(ValueError, match="exactly one"):
        read_velociraptor("SELECT 1", artifact="A", client=client)
    with _pytest.raises(ValueError, match="client="):
        read_velociraptor("SELECT 1")


def test_velociraptor_registry(ray_session):
    from tenzir_ray.pipelines.pipeline import Pipeline
    from tenzir_ray.sources.velociraptor import FakeVelociraptorClient

    out = Pipeline([
        {"op": "read_velociraptor", "vql": "SELECT 1",
         "client": FakeVelociraptorClient(n_parts=1, rows_per_part=2)},
        {"op": "select", "columns": ["part", "response"]},
    ]).run()
    assert out.count() == 2
