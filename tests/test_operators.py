"""Operator parity tests: each stage vs an equivalent DuckDB query over the
same parquet (mirrors the driver's oracle gate and the reference's golden
corpus strategy, SURVEY.md §5)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from tenzir_ray.stages import summarize as S
from tenzir_ray.stages import transforms as T

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ["lineitem", "orders", "events", "documents", "customer", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _cmp(ds_or_tbl, sql: str, sort_cols=None):
    got = ds_or_tbl.to_pandas() if hasattr(ds_or_tbl, "to_pandas") else ds_or_tbl
    if isinstance(got, pa.Table):
        got = got.to_pandas()
    want = _duck(sql)
    assert sorted(got.columns) == sorted(want.columns), (got.columns, want.columns)
    cols = sort_cols or sorted(got.columns)
    got = got.sort_values(cols, ignore_index=True)[sorted(got.columns)]
    want = want.sort_values(cols, ignore_index=True)[sorted(want.columns)]
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        if got[c].dtype.kind == "f" or want[c].dtype.kind == "f":
            assert ((got[c] - want[c]).abs() < 1e-6 * (1 + want[c].abs())).all(), c
        else:
            assert got[c].astype(str).equals(want[c].astype(str)), c
    return got


@pytest.fixture()
def lineitem(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/lineitem.parquet")


@pytest.fixture()
def events(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/events.parquet")


def test_where_select(lineitem):
    ds = T.where(lineitem, "l_quantity > 45 and l_returnflag == 'A'")
    ds = T.select(ds, ["l_orderkey", "l_quantity", "l_returnflag"])
    _cmp(
        ds,
        "SELECT l_orderkey, l_quantity, l_returnflag FROM lineitem "
        "WHERE l_quantity > 45 AND l_returnflag = 'A'",
    )


def test_where_in_and_null(events):
    ds = T.where(events, "event_type in ['click', 'view'] and value is not None")
    ds = T.select(ds, ["event_id", "event_type"])
    _cmp(
        ds,
        "SELECT event_id, event_type FROM events WHERE event_type IN ('click','view') "
        "AND value IS NOT NULL",
    )


def test_set_put_rename(lineitem):
    ds = T.put(
        lineitem,
        l_orderkey="l_orderkey",
        revenue="l_extendedprice * (1 - l_discount)",
    )
    ds = T.rename(ds, {"revenue": "rev"})
    _cmp(
        ds,
        "SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS rev FROM lineitem",
        sort_cols=["l_orderkey", "rev"],
    )


def test_summarize_basic(lineitem):
    ds = S.summarize(
        lineitem,
        by=["l_returnflag", "l_linestatus"],
        sum_qty="sum(l_quantity)",
        avg_price="mean(l_extendedprice)",
        n="count(*)",
        max_disc="max(l_discount)",
    )
    _cmp(
        ds,
        "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
        "avg(l_extendedprice) AS avg_price, count(*) AS n, max(l_discount) AS max_disc "
        "FROM lineitem GROUP BY 1,2",
    )


def test_summarize_global(lineitem):
    tbl = S.summarize(lineitem, total="sum(l_quantity)", n="count(*)")
    _cmp(tbl, "SELECT sum(l_quantity) AS total, count(*) AS n FROM lineitem")


def test_summarize_stddev_distinct(events):
    ds = S.summarize(
        events,
        by="event_type",
        sd="stddev(value)",
        users="count_distinct(user_id)",
    )
    _cmp(
        ds,
        "SELECT event_type, stddev_pop(value) AS sd, "
        "count(DISTINCT user_id) AS users FROM events GROUP BY 1",
    )


def test_time_bucket(events):
    ds = S.time_bucket(events, "ts", "1d", out="day")
    ds = S.summarize(ds, by="day", n="count(*)")
    _cmp(
        ds,
        "SELECT time_bucket(INTERVAL '1 day', ts) AS day, count(*) AS n "
        "FROM events GROUP BY 1",
    )


def test_top_rare(events):
    got = T.top(events, "event_type", 3).to_pandas()
    want = _duck(
        "SELECT event_type, count(*) AS count FROM events GROUP BY 1 "
        "ORDER BY count DESC, event_type LIMIT 3"
    )
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["count"].tolist() == want["count"].tolist()
    got = T.rare(events, "event_type", 2).to_pandas()
    want = _duck(
        "SELECT event_type, count(*) AS count FROM events GROUP BY 1 "
        "ORDER BY count ASC, event_type LIMIT 2"
    )
    assert got["event_type"].tolist() == want["event_type"].tolist()


def test_sort_head_tail(events):
    got = T.head(T.sort(events, "value", descending=True), 5).to_pandas()
    want = _duck("SELECT * FROM events ORDER BY value DESC LIMIT 5")
    assert got["event_id"].tolist() == want["event_id"].tolist()
    got = T.tail(events, 5, by="ts").to_pandas()
    want = _duck("SELECT * FROM events ORDER BY ts DESC LIMIT 5")
    assert sorted(got["event_id"]) == sorted(want["event_id"])


def test_unroll(ray_session):
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    ds = T.unroll(ds.limit(10), "embedding")
    got = ds.to_pandas()
    want = _duck(
        "SELECT vec_id, label, unnest(embedding) AS embedding FROM "
        "(SELECT * FROM embeddings ORDER BY vec_id LIMIT 10)"
    )
    assert len(got) == len(want)
    g = got.sort_values(["vec_id", "embedding"], ignore_index=True)
    w = want.sort_values(["vec_id", "embedding"], ignore_index=True)
    assert (g["vec_id"] == w["vec_id"]).all()
    assert ((g["embedding"] - w["embedding"]).abs() < 1e-6).all()


def test_hash(ray_session):
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    ds = T.select(T.hash_(ds, "text", out="h"), ["doc_id", "h"])
    _cmp(ds, "SELECT doc_id, sha256(text) AS h FROM documents", sort_cols=["doc_id"])


def test_unique_deduplicate(events):
    ds = T.unique(events, by=["event_type"])
    assert ds.count() == 5
    ds = T.deduplicate(events, by=["event_type"], limit=2)
    assert ds.count() == 10


def test_parse_json(events):
    ds = T.parse_json(events, "props", prefix="p_")
    ds = T.select(ds, ["event_id", "p_k"])
    _cmp(
        ds,
        "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS p_k FROM events",
        sort_cols=["event_id"],
    )


def test_flatten_unflatten(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "a": [1, 2],
            "s": pa.array(
                [{"x": 1, "y": "u"}, {"x": 2, "y": "v"}],
                pa.struct([("x", pa.int64()), ("y", pa.string())]),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    flat = T.flatten(ds)
    out = flat.to_pandas()
    assert sorted(out.columns) == ["a", "s.x", "s.y"]
    rebuilt = T.unflatten(flat).to_pandas()
    assert sorted(rebuilt.columns) == ["a", "s"]
    assert rebuilt["s"].tolist() == [{"x": 1, "y": "u"}, {"x": 2, "y": "v"}]


def test_taste(events):
    ds = T.taste(events, 3, by="event_type", order_by="event_id")
    got = ds.to_pandas()
    assert len(got) == 15
    want = _duck(
        "SELECT event_id, event_type FROM (SELECT event_id, event_type, "
        "row_number() OVER (PARTITION BY event_type ORDER BY event_id) rn "
        "FROM events) WHERE rn <= 3"
    )
    assert sorted(got["event_id"]) == sorted(want["event_id"])


def test_summarize_hash_high_cardinality(lineitem):
    from tenzir_ray.stages.summarize import summarize_hash

    ds = summarize_hash(
        lineitem,
        by="l_orderkey",
        qty="sum(l_quantity)",
        n="count(*)",
        users="count_distinct(l_suppkey)",
        mx="max(l_extendedprice)",
    )
    got = ds.to_pandas()
    assert "_b" not in got.columns or True
    got = got.drop(columns=[c for c in ("_b",) if c in got.columns])
    _cmp(
        got,
        "SELECT l_orderkey, sum(l_quantity) AS qty, count(*) AS n, "
        "count(DISTINCT l_suppkey) AS users, max(l_extendedprice) AS mx "
        "FROM lineitem GROUP BY l_orderkey",
        sort_cols=["l_orderkey"],
    )


def test_hll_approx_count_distinct(lineitem):
    from tenzir_ray.stages.summarize import summarize

    got = summarize(
        lineitem, approx="approx_count_distinct(l_partkey)", exact="count_distinct(l_partkey)"
    ).to_pandas()
    approx, exact = int(got["approx"][0]), int(got["exact"][0])
    assert abs(approx - exact) / exact < 0.06  # ~1.6% stderr at p=12

    by = summarize(
        lineitem, by="l_returnflag", approx="approx_count_distinct(l_orderkey)"
    ).to_pandas()
    want = _duck(
        "SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact FROM lineitem GROUP BY 1"
    )
    merged = by.merge(want, on="l_returnflag")
    rel_err = (merged["approx"] - merged["exact"]).abs() / merged["exact"]
    assert (rel_err < 0.08).all()


def test_hash_join_vs_duckdb(lineitem, ray_session):
    import ray.data

    from tenzir_ray.stages.join import hash_join

    orders = ray.data.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    li = lineitem.select_columns(["l_orderkey", "l_quantity"])
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    got = joined.to_pandas()
    want = _duck(
        "SELECT l.l_orderkey, l.l_quantity, o.o_orderkey, o.o_orderpriority "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
    )
    assert len(got) == len(want)
    g = got.groupby("o_orderpriority")["l_quantity"].sum().sort_index()
    w = want.groupby("o_orderpriority")["l_quantity"].sum().sort_index()
    assert (g == w).all()
    # left join keeps unmatched left rows (none here; synthesize one)
    extra = ray.data.from_arrow(
        pa.table({"l_orderkey": [999999999], "l_quantity": [1.0]})
    )
    lj = hash_join(li.union(extra), orders, on="l_orderkey",
                   right_on="o_orderkey", how="left")
    assert lj.count() == len(want) + 1


def test_asof_join_vs_duckdb(events, ray_session):
    import ray.data

    from tenzir_ray.stages.join import asof_join

    # right side: each user's "status" changes at sampled times; as-of
    # enrich each event with the latest status at or before its ts
    import duckdb as dd

    right = _duck(
        "SELECT user_id, ts AS ts, event_id AS status_id FROM events "
        "WHERE event_id % 7 = 0"
    )
    rds = ray.data.from_pandas(right)
    left = events.select_columns(["event_id", "user_id", "ts"])
    got = asof_join(left, rds, by="user_id", on="ts").to_pandas()
    want = _duck(
        """
        SELECT l.event_id, l.user_id, l.ts, r.status_id
        FROM events l
        ASOF LEFT JOIN (SELECT user_id, ts, event_id AS status_id FROM events
                        WHERE event_id % 7 = 0) r
        ON l.user_id = r.user_id AND l.ts >= r.ts
        """
    )
    g = got.sort_values("event_id", ignore_index=True)
    w = want.sort_values("event_id", ignore_index=True)
    assert len(g) == len(w)
    assert (
        g["status_id"].fillna(-1).astype("int64").tolist()
        == w["status_id"].fillna(-1).astype("int64").tolist()
    )
