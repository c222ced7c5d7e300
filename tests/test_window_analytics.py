"""Analytic window functions (ntile / percent_rank / cume_dist /
first_value / last_value / nth_value / moving ROWS frames) vs DuckDB's
window executor on randomized inputs."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def _tbl(seed=7, n=6_000, groups=40, with_nulls=False):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=n)
    cols = {
        "id": np.arange(n, dtype=np.int64),
        "g": rng.integers(0, groups, n),
        "v": v,
    }
    t = pa.table(cols)
    if with_nulls:
        mask = rng.random(n) < 0.15
        t = t.set_column(2, "v", pa.array(np.where(mask, np.nan, v),
                                          mask=mask))
    return t


def test_window_ntile_matches_duckdb(ray_session):
    import duckdb

    from tenzir_ray.stages.window import window_ntile

    T = _tbl(seed=3)
    for n in (1, 4, 7):
        got = (window_ntile(_ds(T), by="g", order_by="id", n=n)
               .to_pandas().sort_values("id", ignore_index=True))
        want = duckdb.sql(
            f"SELECT id, ntile({n}) OVER (PARTITION BY g ORDER BY id) w "
            "FROM T ORDER BY id").df()
        assert got["ntile"].tolist() == want["w"].tolist(), n


def test_window_ntile_more_tiles_than_rows(ray_session):
    import duckdb

    from tenzir_ray.stages.window import window_ntile

    # groups of 1-3 rows with n=10: every row its own tile
    T = _tbl(seed=5, n=50, groups=30)
    got = (window_ntile(_ds(T), by="g", order_by="id", n=10)
           .to_pandas().sort_values("id", ignore_index=True))
    want = duckdb.sql(
        "SELECT id, ntile(10) OVER (PARTITION BY g ORDER BY id) w "
        "FROM T ORDER BY id").df()
    assert got["ntile"].tolist() == want["w"].tolist()


def test_window_percent_rank_and_cume_dist(ray_session):
    import duckdb

    from tenzir_ray.stages.window import window_percent

    rng = np.random.default_rng(11)
    n = 5_000
    # integer order key with heavy ties exercises the peer-group rules
    T = pa.table({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.integers(0, 25, n),
        "k": rng.integers(0, 12, n),
    })
    got = (window_percent(_ds(T), by="g", order_by="k",
                          method="percent_rank", out="pr")
           .to_pandas().sort_values("id", ignore_index=True))
    want = duckdb.sql(
        "SELECT id, percent_rank() OVER (PARTITION BY g ORDER BY k) w "
        "FROM T ORDER BY id").df()
    assert np.allclose(got["pr"], want["w"])

    got = (window_percent(_ds(T), by="g", order_by="k",
                          method="cume_dist", out="cd")
           .to_pandas().sort_values("id", ignore_index=True))
    want = duckdb.sql(
        "SELECT id, cume_dist() OVER (PARTITION BY g ORDER BY k) w "
        "FROM T ORDER BY id").df()
    assert np.allclose(got["cd"], want["w"])


def test_window_value_first_last_nth(ray_session):
    import duckdb

    from tenzir_ray.stages.window import window_value

    T = _tbl(seed=19, n=4_000, groups=37)
    frame = ("ROWS BETWEEN UNBOUNDED PRECEDING AND "
             "UNBOUNDED FOLLOWING")
    for which, nth, sql in (
        ("first", 1, "first_value(v)"),
        ("last", 1, "last_value(v)"),
        ("nth", 3, "nth_value(v, 3)"),
        ("nth", 200, "nth_value(v, 200)"),  # beyond most group sizes
    ):
        got = (window_value(_ds(T), by="g", order_by="id", column="v",
                            which=which, nth=nth, out="w")
               .to_pandas().sort_values("id", ignore_index=True))
        want = duckdb.sql(
            f"SELECT id, {sql} OVER (PARTITION BY g ORDER BY id {frame}) w "
            "FROM T ORDER BY id").df()
        gw = got["w"].astype("float64")
        ww = want["w"].astype("float64")
        assert np.array_equal(gw.isna(), ww.isna()), (which, nth)
        assert np.allclose(gw.fillna(0), ww.fillna(0)), (which, nth)


def test_window_frame_aggregates(ray_session):
    import duckdb

    from tenzir_ray.stages.window import window_frame

    T = _tbl(seed=23, n=5_000, groups=31, with_nulls=True)
    for fn, sqlfn in (("sum", "sum"), ("mean", "avg"), ("min", "min"),
                      ("max", "max"), ("count", "count")):
        for p, f in ((2, 1), (3, 0), (0, 2)):
            got = (window_frame(_ds(T), by="g", order_by="id", column="v",
                                fn=fn, preceding=p, following=f, out="w")
                   .to_pandas().sort_values("id", ignore_index=True))
            want = duckdb.sql(
                f"SELECT id, {sqlfn}(v) OVER (PARTITION BY g ORDER BY id "
                f"ROWS BETWEEN {p} PRECEDING AND {f} FOLLOWING) w "
                "FROM T ORDER BY id").df()
            gw = got["w"].astype("float64")
            ww = want["w"].astype("float64")
            assert np.array_equal(gw.isna(), ww.isna()), (fn, p, f)
            assert np.allclose(gw.fillna(0), ww.fillna(0)), (fn, p, f)


def test_window_frame_all_null_frame_is_null(ray_session):
    from tenzir_ray.stages.window import window_frame

    T = pa.table({
        "id": pa.array([0, 1, 2, 3], pa.int64()),
        "g": pa.array([0, 0, 0, 0], pa.int64()),
        "v": pa.array([None, None, 1.5, None], pa.float64()),
    })
    got = (window_frame(_ds(T), by="g", order_by="id", column="v",
                        fn="sum", preceding=1, out="w")
           .to_pandas().sort_values("id", ignore_index=True))
    # frames: {0}, {0,1} all-null -> NULL; {1,2}, {2,3} contain 1.5
    assert got["w"].isna().tolist() == [True, True, False, False]
    assert got["w"].fillna(0).tolist() == [0.0, 0.0, 1.5, 1.5]


def test_window_analytics_registry(ray_session):
    from tenzir_ray.pipelines.pipeline import Pipeline

    T = _tbl(seed=29, n=500, groups=5)
    out = Pipeline([
        {"op": "window_ntile", "by": "g", "order_by": "id", "n": 3},
        {"op": "window_frame", "by": "g", "order_by": "id",
         "column": "v", "fn": "mean", "preceding": 2, "out": "mv"},
        {"op": "window_value", "by": "g", "order_by": "id",
         "column": "v", "which": "first", "out": "fv"},
        {"op": "window_percent", "by": "g", "order_by": "id",
         "method": "cume_dist"},
    ]).run(_ds(T)).to_pandas()
    assert {"ntile", "mv", "fv", "cume_dist"} <= set(out.columns)
    assert len(out) == 500


def test_resample_fills_match_reference(ray_session):
    import duckdb
    import pandas as pd

    from tenzir_ray.stages.window import resample

    rng = np.random.default_rng(31)
    n = 4_000
    base = np.datetime64("2026-01-01", "us")
    ts = base + (rng.integers(0, 40, n) * 3600 * 6 * 10**6).astype(
        "timedelta64[us]")
    T = pa.table({
        "k": rng.integers(0, 12, n),
        "ts": ts,
        "v": rng.normal(size=n),
    })

    def run(fill):
        return (resample(_ds(T), "ts", "6h", by="k", value_col="v",
                         agg="mean", fill=fill, out="v")
                .to_pandas().sort_values(["k", "ts"], ignore_index=True))

    got = run("ffill")
    want = duckdb.sql("""
        WITH b AS (SELECT k, time_bucket(INTERVAL '6 hours', ts) bk,
                          avg(v) v FROM T GROUP BY 1, 2),
        r AS (SELECT k, min(bk) mn, max(bk) mx FROM b GROUP BY k),
        g AS (SELECT k, unnest(generate_series(mn, mx,
                                               INTERVAL '6 hours')) bk
              FROM r)
        SELECT g.k, g.bk ts,
               last_value(b.v IGNORE NULLS)
                   OVER (PARTITION BY g.k ORDER BY g.bk) v
        FROM g LEFT JOIN b ON b.k = g.k AND b.bk = g.bk
        ORDER BY g.k, g.bk""").df()
    assert got.shape == want.shape
    assert np.allclose(got["v"].fillna(-9), want["v"].fillna(-9))
    assert (got["ts"].astype("datetime64[us]").to_numpy()
            == want["ts"].astype("datetime64[us]").to_numpy()).all()

    # interpolate: pandas per-group linear reference, inside-only
    nullv = run("null")
    interp = run("interpolate")
    ref = nullv.groupby("k")["v"].transform(
        lambda s: s.interpolate(limit_area="inside"))
    a, b = interp["v"].to_numpy(), ref.to_numpy()
    assert np.all((np.isnan(a) & np.isnan(b)) | np.isclose(a, b))
    # zero fill has no NaN
    assert not run("zero")["v"].isna().any()
    with pytest.raises(ValueError, match="fill must be"):
        resample(_ds(T), "ts", "6h", by="k", value_col="v", fill="pad")


# ---------------------------------------------------------------------------
# RANGE frames (window_range)


def test_window_range_matches_duckdb_timestamps(ray_session):
    import duckdb

    from tenzir_ray.stages.window import window_range

    rng = np.random.default_rng(11)
    n = 4_000
    ts = (np.datetime64("2024-03-01", "us")
          + rng.integers(0, 86_400_000_000 * 3, n).astype("timedelta64[us]"))
    T = pa.table({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 25, n),
        "ts": ts,
        "v": rng.integers(-50, 50, n),
    })
    for fn, sqlfn, p, f in [
        ("sum", "SUM", "1h", "0s"),
        ("mean", "AVG", "2h", "30m"),
        ("min", "MIN", "45m", "45m"),
        ("max", "MAX", "0s", "3h"),
        ("count", "COUNT", "30m", "30m"),
    ]:
        got = (window_range(_ds(T), by="k", order_by="ts", column="v",
                            fn=fn, preceding=p, following=f, out="w")
               .to_pandas().sort_values("id", ignore_index=True))
        sp = p.replace("h", " HOUR").replace("m", " MINUTE").replace(
            "s", " SECOND")
        sfo = f.replace("h", " HOUR").replace("m", " MINUTE").replace(
            "s", " SECOND")
        want = duckdb.sql(
            f"SELECT id, {sqlfn}(v) OVER (PARTITION BY k ORDER BY ts "
            f"RANGE BETWEEN INTERVAL {sp} PRECEDING "
            f"AND INTERVAL {sfo} FOLLOWING) w FROM T ORDER BY id").df()
        assert np.allclose(got["w"].to_numpy(dtype=float),
                           want["w"].to_numpy(dtype=float),
                           equal_nan=True), fn


def test_window_range_numeric_nulls_and_peers(ray_session):
    import duckdb
    import pandas as pd

    from tenzir_ray.stages.window import window_range

    # null order keys (SQL: peers of each other), null values, exact
    # boundary peers (tied order keys all enter the frame together)
    pdf = pd.DataFrame({
        "k": ["a"] * 6 + ["b"] * 5,
        "o": [1.0, 2.0, 2.0, 5.0, None, None, 0.0, 10.0, 10.5, None, 3.0],
        "x": [1.0, None, 3.0, 4.0, 5.0, None, 7.0, None, 9.0, 10.0, 11.0],
    })
    import ray.data

    duckdb.register("pdf", pdf)
    for fn, sqlfn in [("count", "COUNT"), ("sum", "SUM"), ("min", "MIN")]:
        got = (window_range(ray.data.from_pandas(pdf), by="k", order_by="o",
                            column="x", fn=fn, preceding=1.0, following=0.5,
                            out="w")
               .to_pandas()
               .sort_values(["k", "o", "x"], na_position="last",
                            ignore_index=True))
        want = duckdb.sql(
            f"SELECT k, o, x, {sqlfn}(x) OVER (PARTITION BY k ORDER BY o "
            "RANGE BETWEEN 1.0 PRECEDING AND 0.5 FOLLOWING) w "
            "FROM pdf ORDER BY k, o NULLS LAST, x NULLS LAST").df()
        assert np.allclose(got["w"].to_numpy(dtype=float),
                           want["w"].to_numpy(dtype=float),
                           equal_nan=True), fn


def test_window_range_validation(ray_session):
    import ray.data

    from tenzir_ray.stages.window import window_range

    ds = ray.data.from_items([{"k": 1, "o": 1.0, "x": 1.0}])
    with pytest.raises(ValueError, match="offsets must be >= 0"):
        window_range(ds, by="k", order_by="o", column="x", preceding=-1,
                     following=0)
    with pytest.raises(ValueError, match="unsupported fn"):
        window_range(ds, by="k", order_by="o", column="x", fn="median")
    # duration offsets demand a timestamp order key
    with pytest.raises(Exception, match="timestamp|duration"):
        window_range(ds, by="k", order_by="o", column="x",
                     preceding="1h").materialize()
