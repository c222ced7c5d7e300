"""skew_join: hot-key broadcast stream + cold exchange stream union
(stages/join.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from tenzir_ray.stages.join import _heavy_keys, hash_join, skew_join


def _skewed(n=20000, hot_share=0.4, seed=0):
    rng = np.random.default_rng(seed)
    keys = [int(k) for k in rng.integers(0, 500, n)]
    for i in range(int(n * hot_share)):
        keys[i] = 7
    for i in range(0, n, 97):
        keys[i] = None
    left = pa.table({
        "k": pa.array(keys, pa.int64()),
        "lv": pa.array(np.arange(n), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(np.arange(450), pa.int64()),
        "rv": pa.array(np.arange(450) * 10, pa.int64()),
    })
    return left, right


def _canon(df):
    df = df[sorted(df.columns)].astype("float64")
    return (df.sort_values(list(df.columns))
              .reset_index(drop=True).fillna(-9.0))


@pytest.mark.parametrize("how,sql", [
    ("inner", "SELECT l.k, lv, rv FROM l JOIN r USING (k)"),
    ("left", "SELECT l.k, lv, rv FROM l LEFT JOIN r USING (k)"),
    ("semi", "SELECT k, lv FROM l SEMI JOIN r USING (k)"),
    ("anti", "SELECT k, lv FROM l ANTI JOIN r USING (k)"),
])
def test_skew_join_matches_duckdb(ray_session, how, sql):
    import ray.data

    ltbl, rtbl = _skewed()
    con = duckdb.connect()
    con.register("l", ltbl.to_pandas())
    con.register("r", rtbl.to_pandas())
    got = _canon(
        skew_join(ray.data.from_arrow(ltbl), ray.data.from_arrow(rtbl),
                  "k", how=how, hot_frac=0.01).to_pandas()
    )
    want = _canon(con.sql(sql).df())
    assert len(got) == len(want)
    assert np.allclose(got.to_numpy(), want.to_numpy())


def test_skew_join_explicit_and_fallback_match_hash_join(ray_session):
    import ray.data

    ltbl, rtbl = _skewed(n=5000)
    left, right = ray.data.from_arrow(ltbl), ray.data.from_arrow(rtbl)
    base = _canon(hash_join(left, right, "k", how="inner").to_pandas())
    expl = _canon(
        skew_join(left, right, "k", how="inner", hot_keys=[7]).to_pandas()
    )
    # hot_frac=0.99: nothing qualifies -> pure hash_join fallback
    fall = _canon(
        skew_join(left, right, "k", how="inner", hot_frac=0.99).to_pandas()
    )
    assert base.equals(expl)
    assert base.equals(fall)


def test_skew_join_rejects_outer_and_composite(ray_session):
    import ray.data

    ltbl, rtbl = _skewed(n=100)
    left, right = ray.data.from_arrow(ltbl), ray.data.from_arrow(rtbl)
    with pytest.raises(ValueError, match="unsupported"):
        skew_join(left, right, "k", how="full")
    with pytest.raises(ValueError, match="single-column"):
        skew_join(left, right, ["k", "lv"], how="inner")


def test_skew_join_broadcast_size_gate(ray_session):
    import ray.data

    ltbl, rtbl = _skewed(n=2000)
    left, right = ray.data.from_arrow(ltbl), ray.data.from_arrow(rtbl)
    with pytest.raises(ValueError, match="max_broadcast_bytes"):
        skew_join(left, right, "k", hot_keys=[7], max_broadcast_bytes=1)


def test_heavy_keys_finds_hot_and_total(ray_session):
    import ray.data

    ltbl, _ = _skewed(n=10000, hot_share=0.3)
    counts, total = _heavy_keys(
        ray.data.from_arrow(ltbl).repartition(8), "k", capacity=64
    )
    assert total == 10000
    top = max(counts, key=counts.get)
    assert top == 7
    # the hot key's estimate is close to its true 30% share
    assert counts[7] >= 2500


def test_skew_join_tql_string(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines.tql import run_pipeline

    ltbl, rtbl = _skewed(n=2000)
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(ltbl, lp)
    pq.write_table(rtbl, rp)
    out = run_pipeline(
        f"read_parquet {lp} "
        f"| skew_join on=k how=inner hot_keys=[7] "
        f"right=( read_parquet {rp} )"
    ).to_pandas()
    want = hash_join(
        __import__("ray").data.from_arrow(ltbl),
        __import__("ray").data.from_arrow(rtbl), "k", how="inner",
    ).to_pandas()
    assert _canon(out).equals(_canon(want))


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_rows = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 6)), st.integers(0, 99)),
    min_size=0, max_size=40,
)
_hows = st.sampled_from(["inner", "left", "semi", "anti"])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(lrows=_rows, rrows=_rows, how=_hows,
       hot=st.lists(st.integers(0, 6), max_size=3, unique=True))
def test_skew_join_random_vs_duckdb(ray_session, lrows, rrows, how, hot):
    """Randomized parity: tiny key domain forces dense collisions, null
    keys, empty sides, and hot sets that cover none/some/all keys."""
    import ray.data

    ltbl = pa.table({
        "k": pa.array([a for a, _ in lrows], pa.int64()),
        "lv": pa.array([b for _, b in lrows], pa.int64()),
    })
    rtbl = pa.table({
        "k": pa.array([a for a, _ in rrows], pa.int64()),
        "rv": pa.array([b for _, b in rrows], pa.int64()),
    })
    if ltbl.num_rows == 0 or rtbl.num_rows == 0:
        return  # joins require a schema-bearing side; covered elsewhere
    con = duckdb.connect()
    con.register("l", ltbl.to_pandas())
    con.register("r", rtbl.to_pandas())
    sql = {
        "inner": "SELECT l.k, lv, rv FROM l JOIN r USING (k)",
        "left": "SELECT l.k, lv, rv FROM l LEFT JOIN r USING (k)",
        "semi": "SELECT k, lv FROM l SEMI JOIN r USING (k)",
        "anti": "SELECT k, lv FROM l ANTI JOIN r USING (k)",
    }[how]
    got = _canon(
        skew_join(ray.data.from_arrow(ltbl), ray.data.from_arrow(rtbl),
                  "k", how=how, hot_keys=list(hot) or None,
                  hot_frac=0.2).to_pandas()
    )
    want = _canon(con.sql(sql).df())
    assert len(got) == len(want)
    if len(got):
        assert np.allclose(got.to_numpy(), want.to_numpy())
