"""CDC wire-envelope parsers (Debezium / Maxwell / wal2json →
change rows) and their composition with the exactly-once lake."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
COLS = {"conv_id": pa.string(), "turn_idx": pa.int64(),
        "role": pa.string(), "text": pa.string(), "tool": pa.string(),
        "ts": pa.string()}


def _payload(r):
    d = {}
    for c in PAYLOAD:
        v = r[c]
        if isinstance(v, pd.Timestamp):
            v = v.isoformat()
        if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
            v = None
        if isinstance(v, np.integer):
            v = int(v)
        d[c] = v
    return d


@pytest.fixture(scope="module")
def change_log():
    from tenzir_ray.cdc import gen_changes

    return gen_changes(1200, seed=5).to_pandas()


def _envelopes(df, kind):
    opmap = {"insert": "c", "update": "u", "delete": "d"}
    out = []
    for _, r in df.iterrows():
        p = _payload(r)
        op, lsn = r["op"], int(r["lsn"])
        if kind == "debezium":
            if op == "delete":
                env = {"payload": {"before": p, "after": None, "op": "d",
                                   "ts_ms": lsn, "source": {"lsn": lsn}}}
            else:
                env = {"payload": {"before": None, "after": p,
                                   "op": opmap[op], "ts_ms": 0,
                                   "source": {"lsn": lsn}}}
        elif kind == "maxwell":
            env = {"database": "d", "table": "t", "type": op, "ts": 0,
                   "xid": lsn, "data": p}
        else:  # wal2json v2
            cols = [{"name": k, "type": "text", "value": v}
                    for k, v in p.items()]
            env = {"action": {"insert": "I", "update": "U",
                              "delete": "D"}[op],
                   "schema": "public", "table": "t",
                   "lsn": f"{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}"}
            env["identity" if op == "delete" else "columns"] = cols
        out.append(json.dumps(env))
    if kind == "wal2json":  # framing records must be dropped
        out = ['{"action":"B"}'] + out + ['{"action":"C"}']
    return out


@pytest.mark.parametrize("kind", ["debezium", "maxwell", "wal2json"])
def test_envelope_parsers_roundtrip(ray_session, kind, change_log):
    import ray.data

    from tenzir_ray.cdc import envelopes as env

    fn = getattr(env, f"parse_{kind}")
    ds = ray.data.from_items(
        [{"value": v} for v in _envelopes(change_log, kind)]).repartition(5)
    out = (fn(ds, columns=COLS).to_pandas()
           .sort_values("lsn", ignore_index=True))
    exp = change_log.sort_values("lsn", ignore_index=True)
    assert len(out) == len(exp)
    assert out["op"].tolist() == exp["op"].tolist()
    for c in ("conv_id", "turn_idx", "role", "text", "tool"):
        for x, y in zip(out[c].to_numpy(object), exp[c].to_numpy(object)):
            if pd.isna(x):
                assert y is None or pd.isna(y), (c, x, y)
            elif c == "turn_idx":
                assert int(x) == int(y)
            else:
                assert x == y, (c, x, y)


def test_debezium_flat_form_and_op_codes(ray_session):
    import ray.data

    from tenzir_ray.cdc.envelopes import parse_debezium

    rows = [
        # flat (schemas disabled), snapshot read 'r' maps to insert
        {"value": json.dumps({"before": None, "after": {"k": 1, "v": "a"},
                              "op": "r", "ts_ms": 7,
                              "source": {"lsn": 42}})},
        {"value": json.dumps({"before": {"k": 1, "v": "a"}, "after": None,
                              "op": "d", "ts_ms": 9})},  # no source.lsn
        {"value": None},  # null inputs are skipped
    ]
    out = (parse_debezium(ray.data.from_items(rows),
                          columns={"k": pa.int64(), "v": pa.string()})
           .to_pandas().sort_values("lsn", ignore_index=True))
    assert out["op"].tolist() == ["delete", "insert"]
    assert out["lsn"].tolist() == [9, 42]  # ts_ms fallback for the delete
    assert out["k"].tolist() == [1, 1]


def test_debezium_to_lake_equals_naive_apply(ray_session, change_log,
                                             tmp_path):
    import ray.data

    from tenzir_ray.cdc import LakeTable
    from tenzir_ray.cdc.envelopes import parse_debezium
    from tenzir_ray.cdc.oracle import naive_apply

    ds = ray.data.from_items(
        [{"value": v} for v in _envelopes(change_log, "debezium")]
    ).repartition(4)
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=4)
    lake.apply_changes(parse_debezium(ds, columns=COLS), epoch_id="e1")
    got = (lake.final_table().to_pandas()
           .sort_values(["conv_id", "turn_idx"], ignore_index=True))
    want = (naive_apply(pa.Table.from_pandas(change_log,
                                             preserve_index=False))
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"], ignore_index=True))
    assert len(got) == len(want)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()


def test_fold_patches_matches_reference(ray_session):
    import ray.data

    from tenzir_ray.cdc.envelopes import fold_patches

    rng = np.random.default_rng(7)
    n, K = 4000, 150
    df = pd.DataFrame({
        "k": rng.integers(0, K, n),
        "lsn": rng.permutation(n).astype(np.int64),
        "op": rng.choice(["insert", "update", "update", "delete"], n,
                         p=[0.3, 0.3, 0.3, 0.1]),
        "a": np.where(rng.random(n) < 0.4, None,
                      rng.integers(0, 100, n).astype(object)),
        "b": np.where(rng.random(n) < 0.4, None,
                      np.array([f"s{i % 17}" for i in range(n)],
                               dtype=object)),
    })
    # sequential reference fold (the semantics contract)
    ref = {}
    for _, r in df.sort_values(["k", "lsn"]).iterrows():
        st = ref.get(r["k"])
        if r["op"] == "insert":
            ref[r["k"]] = {"a": r["a"], "b": r["b"],
                           "lsn": r["lsn"], "dead": False}
        elif r["op"] == "delete":
            ref[r["k"]] = {"a": None, "b": None,
                           "lsn": r["lsn"], "dead": True}
        else:
            if st is None:
                ref[r["k"]] = st = {"a": None, "b": None,
                                    "lsn": r["lsn"], "dead": False}
            st["lsn"] = r["lsn"]
            if not st["dead"]:
                for c in ("a", "b"):
                    if r[c] is not None and not pd.isna(r[c]):
                        st[c] = r[c]
    out = (fold_patches(ray_session.data.from_pandas(df).repartition(7),
                        keys="k")
           .to_pandas().sort_values("k", ignore_index=True))
    assert len(out) == len(ref)
    for key in sorted(ref):
        st, r = ref[key], out[out["k"] == key].iloc[0]
        assert r["lsn"] == st["lsn"] and \
            r["op"] == ("delete" if st["dead"] else "insert")
        for c in ("a", "b"):
            want = None if st["dead"] else st[c]
            assert (pd.isna(r[c]) and want is None) or r[c] == want, \
                (key, c, r[c], want)


def test_unmappable_ops_dropped_not_forwarded(ray_session):
    """Truncate / framing / unknown op codes must never reach the lake,
    where LWW would keep them as phantom live rows."""
    import ray.data

    from tenzir_ray.cdc.envelopes import (parse_debezium, parse_maxwell,
                                          parse_wal2json)

    dbz = [
        {"value": json.dumps({"op": "t", "before": None, "after": None,
                              "ts_ms": 1})},       # truncate: keyless
        {"value": json.dumps({"op": "zz", "after": {"k": 1}, "ts_ms": 2})},
        {"value": json.dumps({"op": "c", "after": {"k": 2, "v": "x"},
                              "ts_ms": 3})},
    ]
    out = parse_debezium(ray.data.from_items(dbz),
                         columns={"k": pa.int64(), "v": pa.string()}
                         ).to_pandas()
    assert out["op"].tolist() == ["insert"] and out["k"].tolist() == [2]

    mxw = [
        {"value": json.dumps({"type": "bootstrap-insert", "ts": 1,
                              "data": {"k": 5}})},   # snapshot insert
        {"value": json.dumps({"type": "bootstrap-start", "ts": 2})},
        {"value": json.dumps({"type": "table-create", "ts": 3})},
        {"value": json.dumps({"type": "delete", "ts": 4,
                              "data": {"k": 5}})},
    ]
    out = parse_maxwell(ray.data.from_items(mxw),
                        columns={"k": pa.int64()}
                        ).to_pandas().sort_values("lsn", ignore_index=True)
    assert out["op"].tolist() == ["insert", "delete"]
    assert out["k"].tolist() == [5, 5]

    w2j = [
        {"value": " "},    # whitespace-only keepalive line
        {"value": "\n"},
        {"value": json.dumps({"action": "T", "lsn": "0/1"})},  # truncate
        {"value": json.dumps({"action": "I", "lsn": "0/2",
                              "columns": [{"name": "k", "value": 9}]})},
    ]
    out = parse_wal2json(ray.data.from_items(w2j),
                         columns={"k": pa.int64()}).to_pandas()
    assert out["op"].tolist() == ["insert"] and out["k"].tolist() == [9]


def test_fold_patches_empty_input_schema_stable(ray_session):
    """grouped_apply pins the empty-input schema from the fold callback:
    it must match the non-empty output's column order."""
    import ray.data

    from tenzir_ray.cdc.envelopes import fold_patches

    base = pd.DataFrame({"lsn": pd.Series([], dtype="int64"),
                         "op": pd.Series([], dtype=object),
                         "k": pd.Series([], dtype=object),
                         "x": pd.Series([], dtype="float64")})
    empty = fold_patches(ray.data.from_pandas(base), keys="k")
    full = fold_patches(ray.data.from_pandas(pd.DataFrame({
        "lsn": [1, 2], "op": ["insert", "update"],
        "k": ["a", "a"], "x": [1.0, None]})), keys="k")
    es, fs = empty.schema(), full.schema()
    assert es.names == fs.names == ["k", "lsn", "op", "x"]
