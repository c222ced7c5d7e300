"""Event-analytics operators (histogram / funnel / retention) vs
hand-computed expectations and DuckDB."""

import numpy as np
import pandas as pd
import pytest


def test_histogram_edges_and_nulls(ray_session):
    from tenzir_ray.stages.analytics import histogram

    df = pd.DataFrame({"v": [0.0, 9.99, 10.0, 55.0, 100.0, 150.0, -5.0,
                             None]})
    out = (histogram(ray_session.data.from_pandas(df), "v", bins=10,
                     lo=0.0, hi=100.0)
           .to_pandas().sort_values("bin", ignore_index=True))
    got = dict(zip(out["bin"], out["n"]))
    # -5 clamps to bin 0; 100 and 150 clamp to bin 9; null dropped
    assert got == {0: 3, 1: 1, 5: 1, 9: 2}
    assert np.allclose(
        out["bin_start"], out["bin"].to_numpy(dtype=float) * 10.0)
    # auto lo/hi path
    auto = histogram(ray_session.data.from_pandas(df.dropna()), "v",
                     bins=4).to_pandas()
    assert auto["n"].sum() == 7
    with pytest.raises(ValueError, match="bins"):
        histogram(ray_session.data.from_pandas(df), "v", bins=0)


def test_funnel_strict_ordering_and_window(ray_session):
    from tenzir_ray.stages.analytics import funnel

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # u1 completes A->B; u2 has B before A only (stops at A);
    # u3 never does A; u4 completes but B outside the 1h window
    for u, seq in {
        1: [("a", 0), ("b", 10)],
        2: [("b", 0), ("a", 10)],
        3: [("b", 5)],
        4: [("a", 0), ("b", 90)],
    }.items():
        for ty, m in seq:
            rows.append({"u": u, "ty": ty,
                         "ts": t0 + pd.Timedelta(minutes=m)})
    ds = ray_session.data.from_items(rows)
    out = (funnel(ds, by="u", order_by="ts",
                  steps=["ty == 'a'", "ty == 'b'"])
           .to_pandas().sort_values("u", ignore_index=True))
    assert out["steps_completed"].tolist() == [2, 1, 0, 2]
    assert pd.isna(out.loc[1, "step_2"]) and pd.isna(out.loc[2, "step_1"])
    win = (funnel(ds, by="u", order_by="ts",
                  steps=["ty == 'a'", "ty == 'b'"], within="1h")
           .to_pandas().sort_values("u", ignore_index=True))
    assert win["steps_completed"].tolist() == [2, 1, 0, 1]


def test_retention_matrix(ray_session):
    from tenzir_ray.stages.analytics import retention

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # cohort day0: users 1,2 — user 1 returns day1 and day2, user 2 only
    # day2; cohort day1: user 3 returns day1(+0) twice (distinct count!)
    for u, days in {1: [0, 1, 2], 2: [0, 2], 3: [1, 1]}.items():
        for d in days:
            rows.append({"u": u, "ts": t0 + pd.Timedelta(days=d, hours=3)})
    out = (retention(ray_session.data.from_items(rows), by="u",
                     ts_col="ts", period="1d")
           .to_pandas().sort_values(["cohort", "period_n"],
                                    ignore_index=True))
    base = out["cohort"].min()
    m = {(int(r["cohort"] - base), int(r["period_n"])): int(r["n"])
         for _, r in out.iterrows()}
    assert m == {(0, 0): 2, (0, 1): 1, (0, 2): 2, (1, 0): 1}
    capped = retention(ray_session.data.from_items(rows), by="u",
                       ts_col="ts", period="1d",
                       max_periods=1).to_pandas()
    assert capped["period_n"].max() == 1


def test_histogram_nan_allnull_constant(ray_session):
    import ray.data

    from tenzir_ray.stages.analytics import histogram

    # NaN values are dropped, not counted into bin 0
    ds = ray.data.from_pandas(pd.DataFrame(
        {"v": [0.0, float("nan"), 9.0, float("nan")]}))
    out = histogram(ds, "v", bins=3).to_pandas().sort_values(
        "bin", ignore_index=True)
    assert out["n"].tolist() == [1, 1]
    assert out["bin"].tolist() == [0, 2]

    # all-null column: empty result with the canonical schema
    ds = ray.data.from_pandas(pd.DataFrame({"v": pd.Series(
        [None, None], dtype="float64")}))
    out = histogram(ds, "v", bins=4)
    assert out.count() == 0
    assert out.schema().names == ["bin", "bin_start", "n"]

    # constant column: everything in bin 0, no hi > lo error
    ds = ray.data.from_pandas(pd.DataFrame({"v": [7.0, 7.0, 7.0]}))
    out = histogram(ds, "v", bins=5).to_pandas()
    assert out["bin"].tolist() == [0] and out["n"].tolist() == [3]
    assert out["bin_start"].tolist() == [7.0]


def test_funnel_empty_input_timestamp_schema(ray_session):
    import ray.data

    from tenzir_ray.stages.analytics import funnel

    base = pd.DataFrame({
        "u": pd.Series([], dtype=object),
        "ts": pd.Series([], dtype="datetime64[ns]"),
        "ev": pd.Series([], dtype=object)})
    out = funnel(ray.data.from_pandas(base), by="u", order_by="ts",
                 steps=["ev == 'a'", "ev == 'b'"])
    sch = out.schema()
    i1 = sch.names.index("step_1")
    assert "datetime64" in str(sch.base_schema.types[i1]) \
        or "timestamp" in str(sch.base_schema.types[i1])
