"""New aggregation functions (arg_min/arg_max, product, bit ops, mode,
entropy, skewness/kurtosis, corr/covar, string_agg) vs DuckDB."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(9)
    n = 20_000
    vals = rng.normal(10, 3, n)
    vals[rng.random(n) < 0.1] = np.nan
    y = 2.5 * np.nan_to_num(vals) + rng.normal(0, 1, n)
    return pa.table({
        "g": rng.integers(0, 8, n),
        "k": np.arange(n, dtype=np.int64),
        "v": pa.array(vals, from_pandas=True),
        "y": y,
        "b": rng.integers(0, 1 << 20, n),
        "s": rng.choice(np.array(["aa", "bb", "cc", "dd", "ee"]), n),
    })


def test_new_aggs_match_duckdb(ray_session, corpus):
    import duckdb

    from tenzir_ray.stages.summarize import summarize

    got = summarize(
        _ds(corpus), by="g",
        am="arg_max(v, k)", an="arg_min(v, k)",
        ba="bit_and(b)", bo="bit_or(b)", bx="bit_xor(b)",
        en="entropy(s)", sk="skewness(v)", ku="kurtosis(v)",
        co="corr(y, v)", cvp="covar_pop(y, v)", cvs="covar_samp(y, v)",
        sa="string_agg(s)", pr="product(b)",
    ).to_pandas().sort_values("g", ignore_index=True)
    T = corpus.to_pandas()  # noqa: F841 — duckdb reads the local
    want = duckdb.sql("""
        SELECT g, arg_max(v, k) am, arg_min(v, k) an,
               bit_and(b) ba, bit_or(b) bo, bit_xor(b) bx,
               entropy(s) en, skewness(v) sk, kurtosis(v) ku,
               corr(y, v) co, covar_pop(y, v) cvp, covar_samp(y, v) cvs,
               string_agg(s, ',' ORDER BY s) sa, product(b) pr
        FROM T GROUP BY g ORDER BY g""").df()
    for c in ["ba", "bo", "bx", "sa"]:
        assert got[c].tolist() == want[c].tolist(), c
    for c in ["am", "an"]:  # the picked value itself may be NaN
        a = got[c].to_numpy(dtype=np.float64)
        b = want[c].to_numpy(dtype=np.float64)
        assert np.array_equal(np.isnan(a), np.isnan(b)), c
        assert np.array_equal(a[~np.isnan(a)], b[~np.isnan(b)]), c
    for c in ["en", "sk", "ku", "co", "cvp", "cvs"]:
        assert np.allclose(got[c], want[c], rtol=1e-7), c
    assert np.allclose(got["pr"], want["pr"], rtol=1e-6)


def test_mode_deterministic_tiebreak(ray_session):
    from tenzir_ray.stages.summarize import summarize

    T = pa.table({"g": [0, 0, 0, 0], "s": ["b", "b", "a", "a"]})
    got = summarize(_ds(T), by="g", m="mode(s)").to_pandas()
    assert got["m"].tolist() == ["a"]  # tie -> smallest value


def test_new_aggs_null_and_empty_groups(ray_session):
    from tenzir_ray.stages.summarize import summarize

    T = pa.table({
        "g": pa.array([0, 0, 1], pa.int64()),
        "v": pa.array([None, None, 2.0], pa.float64()),
        "k": pa.array([1, None, 3], pa.int64()),
    })
    got = summarize(
        _ds(T), by="g", am="arg_max(v, k)", pr="product(v)",
        md="mode(v)", sk="skewness(v)",
        ba="bit_and(k)",
    ).to_pandas().sort_values("g", ignore_index=True)
    # group 0: v all-null -> product/mode NULL; arg_max picks the only
    # non-null key row (k=1, v=null -> the VALUE is null)
    import pandas as pd

    assert pd.isna(got.loc[0, "am"])
    assert pd.isna(got.loc[0, "pr"]) and pd.isna(got.loc[0, "md"])
    assert pd.isna(got.loc[0, "sk"])  # n < 3
    assert got.loc[0, "ba"] == 1  # null k ignored
    assert got.loc[1, "pr"] == 2.0 and got.loc[1, "md"] == 2.0


def test_new_aggs_global(ray_session, corpus):
    import duckdb

    from tenzir_ray.stages.summarize import summarize

    got = summarize(_ds(corpus), co="corr(y, v)", md="mode(s)",
                    am="arg_min(v, k)")
    T = corpus.to_pandas()  # noqa: F841
    want = duckdb.sql(
        "SELECT corr(y, v) co, arg_min(v, k) am FROM T").df()
    row = got.to_pandas().iloc[0]
    assert abs(row["co"] - want["co"][0]) < 1e-9
    assert row["am"] == want["am"][0]
    assert row["md"] in ("aa", "bb", "cc", "dd", "ee")


def test_two_col_spec_validation(ray_session):
    from tenzir_ray.stages.summarize import summarize

    T = pa.table({"g": [0], "v": [1.0]})
    with pytest.raises(ValueError, match="exactly two columns"):
        summarize(_ds(T), by="g", x="arg_min(v)").to_pandas()
    with pytest.raises(ValueError, match="bad aggregate spec"):
        summarize(_ds(T), by="g", x="corr(a, b, c)").to_pandas()


def test_regr_family_matches_duckdb(ray_session, corpus):
    import duckdb

    from tenzir_ray.stages.summarize import summarize

    got = summarize(
        _ds(corpus), by="g",
        sl="regr_slope(y, v)", ic="regr_intercept(y, v)",
        r2="regr_r2(y, v)", rc="regr_count(y, v)",
        ax="regr_avgx(y, v)", ay="regr_avgy(y, v)",
        xx="regr_sxx(y, v)", yy="regr_syy(y, v)", xy="regr_sxy(y, v)",
    ).to_pandas().sort_values("g", ignore_index=True)
    T = corpus.to_pandas()  # noqa: F841
    want = duckdb.sql("""
        SELECT g, regr_slope(y, v) sl, regr_intercept(y, v) ic,
               regr_r2(y, v) r2, regr_count(y, v) rc,
               regr_avgx(y, v) ax, regr_avgy(y, v) ay,
               regr_sxx(y, v) xx, regr_syy(y, v) yy, regr_sxy(y, v) xy
        FROM T GROUP BY g ORDER BY g""").df()
    assert got["rc"].tolist() == want["rc"].tolist()
    for c in ("sl", "ic", "r2", "ax", "ay", "xx", "yy", "xy"):
        assert np.allclose(got[c].to_numpy(dtype=float),
                           want[c].to_numpy(dtype=float),
                           rtol=1e-9, equal_nan=True), c


def test_regr_degenerate_groups(ray_session):
    import duckdb
    import pandas as pd

    from tenzir_ray.stages.summarize import summarize

    # constant x (Sxx=0 -> slope/intercept/r2 NULL), constant y with
    # varying x (Syy=0 -> r2 = 1.0), all-null pairs (count 0)
    pdf = pd.DataFrame({
        "g": ["cx"] * 3 + ["cy"] * 3 + ["nn"] * 2,
        "x": [5.0, 5.0, 5.0, 1.0, 2.0, 3.0, None, None],
        "y": [1.0, 2.0, 3.0, 7.0, 7.0, 7.0, 1.0, 2.0],
    })
    import ray.data

    got = summarize(
        ray.data.from_pandas(pdf), by="g",
        sl="regr_slope(y, x)", r2="regr_r2(y, x)", rc="regr_count(y, x)",
    ).to_pandas().sort_values("g", ignore_index=True)
    duckdb.register("pdf8", pdf)
    want = duckdb.sql("""
        SELECT g, regr_slope(y, x) sl, regr_r2(y, x) r2,
               regr_count(y, x) rc
        FROM pdf8 GROUP BY g ORDER BY g""").df()
    assert got["rc"].tolist() == want["rc"].tolist()
    for c in ("sl", "r2"):
        a = got[c].to_numpy(dtype=float)
        b = want[c].to_numpy(dtype=float)
        assert ((np.isnan(a) & np.isnan(b)) | np.isclose(a, b)).all(), c


def test_mad_and_quantile_cont_match_duckdb(ray_session, corpus):
    import duckdb

    from tenzir_ray.stages.summarize import group_quantiles, summarize

    got = summarize(_ds(corpus), by="g", m="mad(v)", mi="mad(b)"
                    ).to_pandas().sort_values("g", ignore_index=True)
    T = corpus.to_pandas()  # noqa: F841
    want = duckdb.sql(
        "SELECT g, mad(v) m, mad(b) mi FROM T GROUP BY g ORDER BY g").df()
    assert np.allclose(got["m"], want["m"], rtol=1e-12)
    assert np.allclose(got["mi"].astype(float), want["mi"].astype(float))

    gq = (group_quantiles(_ds(corpus), by="g", column="v",
                          quantiles={"q25": 0.25, "q50": 0.5, "q99": 0.99},
                          interpolation="linear")
          .to_pandas().sort_values("g", ignore_index=True))
    w2 = duckdb.sql("""
        SELECT g, quantile_cont(v, 0.25) q25, quantile_cont(v, 0.5) q50,
               quantile_cont(v, 0.99) q99 FROM T GROUP BY g ORDER BY g""").df()
    for c in ("q25", "q50", "q99"):
        assert np.allclose(gq[c], w2[c], rtol=1e-12, equal_nan=True), c
    with pytest.raises(ValueError, match="interpolation"):
        group_quantiles(_ds(corpus), by="g", column="v",
                        quantiles={"q": 0.5}, interpolation="nearest")


def test_mad_all_null_group(ray_session):
    import duckdb
    import pandas as pd
    import ray.data

    from tenzir_ray.stages.summarize import summarize

    pdf = pd.DataFrame({"g": ["a", "a", "b"], "v": [None, None, 3.0]})
    got = (summarize(ray.data.from_pandas(pdf), by="g", m="mad(v)")
           .to_pandas().sort_values("g", ignore_index=True))
    duckdb.register("pdf_mad", pdf)
    want = duckdb.sql(
        "SELECT g, mad(v) m FROM pdf_mad GROUP BY g ORDER BY g").df()
    a = got["m"].to_numpy(float)
    b = want["m"].to_numpy(float)
    assert ((np.isnan(a) & np.isnan(b)) | np.isclose(a, b)).all()
