"""Expression compiler edge cases (expr.py — where/set/pushdown surface)."""

import pyarrow as pa
import pytest

from tenzir_ray.stages import transforms as T


@pytest.fixture()
def tbl_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "a": [1, 5, 10, 15, 20],
                "b": [2.0, 4.0, 6.0, 8.0, 10.0],
                "s": ["foo", "bar", "foobar", None, "baz"],
                "t": pa.array(
                    [1000, 2000, 3000, 4000, 5000], pa.timestamp("s")
                ),
            }
        )
    )


def test_chained_comparison(tbl_ds):
    out = T.where(tbl_ds, "1 < a < 15").to_pandas()
    assert sorted(out["a"]) == [5, 10]


def test_arithmetic_precedence(tbl_ds):
    out = T.set_(tbl_ds, c="a + b * 2").to_pandas().sort_values("a")
    assert out["c"].tolist() == [5.0, 13.0, 22.0, 31.0, 40.0]
    out = T.set_(tbl_ds, d="(a + b) * 2").to_pandas().sort_values("a")
    assert out["d"].tolist() == [6.0, 18.0, 32.0, 46.0, 60.0]


def test_mod_floordiv_python_floor_semantics(ray_session):
    """% and // follow Python floor semantics on signed ints — -7 % 3
    is 2, -7 // 3 is -3 (ADVICE r3: Arrow trunc-division diverged)."""
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"x": [-7, -6, -1, 0, 1, 7],
                                 "y": [-7.5, -6.0, -1.0, 0.0, 1.5, 7.5]}))
    out = T.where(ds, "x % 3 == 2").to_pandas()
    assert sorted(out["x"]) == [-7, -1]
    got = T.set_(ds, m="x % 3", d="x // 3", n="x % -3",
                 fm="y % 2.0").to_pandas().sort_values("x")
    xs = got["x"].tolist()
    assert got["m"].tolist() == [x % 3 for x in xs]
    assert got["d"].tolist() == [x // 3 for x in xs]
    assert got["n"].tolist() == [x % -3 for x in xs]
    ys = got["y"].tolist()
    assert got["fm"].tolist() == [y % 2.0 for y in ys]


def test_scalar_on_left(tbl_ds):
    out = T.set_(tbl_ds, e="100 - a").to_pandas().sort_values("a")
    assert out["e"].tolist() == [99, 95, 90, 85, 80]
    out = T.where(tbl_ds, "10 <= a").to_pandas()
    assert sorted(out["a"]) == [10, 15, 20]


def test_string_methods_and_null(tbl_ds):
    out = T.where(tbl_ds, "s.startswith('foo')").to_pandas()
    assert sorted(out["s"]) == ["foo", "foobar"]
    out = T.where(tbl_ds, "s.contains('ba') and a > 1").to_pandas()
    assert sorted(out["s"]) == ["bar", "baz", "foobar"]
    out = T.where(tbl_ds, "s is None").to_pandas()
    assert len(out) == 1 and out["a"].iloc[0] == 15
    out = T.where(tbl_ds, "not (a in [1, 5])").to_pandas()
    assert sorted(out["a"]) == [10, 15, 20]


def test_bool_connectives(tbl_ds):
    out = T.where(tbl_ds, "a < 5 or a > 15 or (b == 6.0 and s == 'foobar')").to_pandas()
    assert sorted(out["a"]) == [1, 10, 20]


def test_unsupported_raises():
    from tenzir_ray.expr import compile_expr

    with pytest.raises(ValueError):
        compile_expr("__import__('os').system('x')")
    with pytest.raises(ValueError):
        compile_expr("a ** 2")


def test_pattern_literals(ray_session):
    import ray.data as rd

    from tenzir_ray.stages import transforms as T

    t = pa.table({
        "name": pa.array(["alpha-1", "beta-22", "alpha-9", "gamma"]),
        "n": pa.array([1, 2, 3, 4], pa.int64()),
    })
    out = T.where(rd.from_arrow(t), r"name == /alpha-\d+/").to_pandas()
    assert sorted(out["n"]) == [1, 3]
    out = T.where(rd.from_arrow(t), r"name != /alpha/ and n < 4").to_pandas()
    assert sorted(out["n"]) == [2]
    out = T.where(rd.from_arrow(t), "name in /a-[29]/").to_pandas()
    assert sorted(out["n"]) == [2, 3]  # 'bet(a-2)2' and 'alph(a-9)'
    # pattern bodies are not re-lexed as ip literals
    t2 = pa.table({"s": pa.array(["10.0.0.1", "x10.0.0.1y", "other"]),
                   "n": pa.array([1, 2, 3], pa.int64())})
    out = T.where(rd.from_arrow(t2), r"s == /10\.0\.0\.1/").to_pandas()
    assert sorted(out["n"]) == [1, 2]
    # division is untouched
    out = T.where(rd.from_arrow(t), "n / 2 >= 1").to_pandas()
    assert sorted(out["n"]) == [2, 3, 4]
    import pytest as _p

    from tenzir_ray.expr import compile_expr

    # /re/ only lexes after ==/!=/in; elsewhere the explicit marker form
    # exists and rejects unsupported operators
    with _p.raises(ValueError, match="pattern literals"):
        compile_expr('name > pattern("abc")')
    with _p.raises(SyntaxError):
        compile_expr("name > /abc/")


# ---------------------------------------------- reference operator sugar


def test_ni_and_bang_in_operators(ray_session):
    import ray.data as rd

    from tenzir_ray.stages.transforms import where

    ds = rd.from_arrow(pa.table({
        "msg": ["GET /index", "POST /login", "GET /api", None],
        "code": [200, 403, 200, 500],
    }))
    # A ni B == A contains B
    got = where(ds, 'msg ni "GET"').to_pandas()
    assert sorted(got["msg"]) == ["GET /api", "GET /index"]
    # !ni — nulls drop (predicate null semantics)
    got2 = where(ds, 'msg !ni "GET"').to_pandas()
    assert sorted(got2["msg"]) == ["POST /login"]
    # "lit" in field is the same containment, un-sugared
    got3 = where(ds, '"login" in msg').to_pandas()
    assert list(got3["msg"]) == ["POST /login"]
    # !in on list membership
    got4 = where(ds, "code !in [200, 500]").to_pandas()
    assert list(got4["code"]) == [403]


def test_bare_field_short_form(ray_session):
    import ray.data as rd

    from tenzir_ray.stages.transforms import where

    ds = rd.from_arrow(pa.table({
        "a": [1, None, 3, None],
        "b": ["x", "y", None, None],
    }))
    # bare field ≡ field != null (expressions.md:173-199)
    assert where(ds, "a").count() == 2
    assert where(ds, "a and b").count() == 1
    assert where(ds, "not a").count() == 2
    assert where(ds, "a or b").count() == 3
    # value positions unchanged: arithmetic on the bare name still works
    got = where(ds, "a + 1 > 2").to_pandas()
    assert list(got["a"]) == [3.0] or list(got["a"]) == [3]


def test_relative_time_literals(ray_session, monkeypatch):
    from datetime import datetime

    import ray.data as rd

    from tenzir_ray import expr as expr_mod
    from tenzir_ray.stages.transforms import where

    frozen = datetime(2024, 1, 10, 12, 0, 0)
    monkeypatch.setattr(expr_mod, "NOW_FN", lambda: frozen)

    ts = pa.array([
        datetime(2024, 1, 10, 11, 30),   # 30 min ago
        datetime(2024, 1, 10, 9, 0),     # 3 h ago
        datetime(2024, 1, 8, 12, 0),     # 2 d ago
        datetime(2024, 1, 10, 12, 30),   # future
    ], pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({"i": [0, 1, 2, 3], "ts": ts}))

    assert sorted(where(ds, "ts > 1 hour ago").to_pandas()["i"]) == [0, 3]
    assert sorted(where(ds, "ts > 2 hours ago and ts < now")
                  .to_pandas()["i"]) == [0]
    assert sorted(where(ds, "ts <= 1 day ago").to_pandas()["i"]) == [2]
    # compact unit form works too
    assert sorted(where(ds, "ts > 90min ago").to_pandas()["i"]) == [0, 3]


def test_bare_value_short_form(ray_session):
    import ray.data as rd

    from tenzir_ray.stages.transforms import where

    ds = rd.from_arrow(pa.table({
        "a": pa.array([42, 7, 42, 1], pa.int64()),
        "b": pa.array([7, 42, 3, 4], pa.int32()),
        "s": ["x", "42", "y", "z"],
    }))
    # bare int ≡ :integer == 42 — matches in ANY integer column
    got = where(ds, "42").to_pandas()
    assert sorted(got["a"].tolist()) == [7, 42, 42]
    # bare string binds string columns only
    got2 = where(ds, '"42"').to_pandas()
    assert got2["s"].tolist() == ["42"]
    # conjunct composes with normal predicates
    got3 = where(ds, "42 and b < 10").to_pandas()
    assert sorted(got3["b"].tolist()) == [3, 7]


def test_bare_value_in_disjunction(ray_session):
    import ray.data as rd

    from tenzir_ray.stages.transforms import where

    ds = rd.from_arrow(pa.table({
        "a": pa.array([42, 7, 3], pa.int64()),
        "v": pa.array([1.0, 95.0, 2.0]),
    }))
    got = where(ds, "42 or v > 90").to_pandas()
    assert sorted(got["a"].tolist()) == [7, 42]
    got2 = where(ds, "not 42").to_pandas()
    assert sorted(got2["a"].tolist()) == [3, 7]


def test_pattern_bodies_survive_operator_sugar(ray_session):
    import ray.data as rd

    from tenzir_ray.stages.transforms import where

    ds = rd.from_arrow(pa.table({
        "msg": ["right now", "later", "a !in b", "foo ni bar"],
    }))
    # pattern bodies containing operator/relative-time keywords must
    # match literally, not be rewritten (round-3 review finding)
    assert where(ds, "msg == /right now/").count() == 1
    assert where(ds, "msg == /a !in b/").to_pandas()["msg"].tolist() == ["a !in b"]
    assert where(ds, "msg == /foo ni bar/").count() == 1
    assert where(ds, "msg == /2 hours ago/").count() == 0


def test_math_functions(ray_session):
    import numpy as np
    import ray.data

    from tenzir_ray.stages import transforms as T

    ds = ray.data.from_arrow(pa.table({
        "x": [1.234, 5.678, -2.5], "y": [4.0, 9.0, 16.0]}))
    out = T.put(ds, a="round(x, 1)", b="sqrt(y)", c="floor(x)",
                d="ceil(x)", e="exp(0.0) + ln(y)").to_pandas()
    assert out["a"].tolist() == [1.2, 5.7, -2.5]
    assert out["b"].tolist() == [2.0, 3.0, 4.0]
    assert out["c"].tolist() == [1.0, 5.0, -3.0]
    assert out["d"].tolist() == [2.0, 6.0, -2.0]
    assert np.allclose(out["e"], 1.0 + np.log([4.0, 9.0, 16.0]))
    # functions work inside filters, on columns AND literals
    f = T.where(ds, "sqrt(y) > 2.5 and x < round(10.4)").to_pandas()
    assert f["y"].tolist() == [9.0, 16.0]
    # function names are not treated as column references
    from tenzir_ray.expr import referenced_columns

    assert referenced_columns("sqrt(y) > floor(x)") == {"x", "y"}


def test_null_keyword_equality(ray_session):
    # the reference's `x == null` / `x != null` are null TESTS
    # (expression.md), not SQL's always-null comparison
    import pyarrow as pa

    from tenzir_ray.expr import compile_filter

    t = pa.table({"x": pa.array([1, None, 3], pa.int64()),
                  "tool": pa.array(["a", None, "b"])})
    assert compile_filter("x == null").apply(t).num_rows == 1
    assert compile_filter("x != null").apply(t).num_rows == 2
    # composes under negation and conjunction, both apply and mask paths
    f = compile_filter("not (tool == null) and x != null")
    assert f.apply(t).to_pydict()["x"] == [1, 3]
    assert list(f.mask(t)) == [True, False, True]
    # a string literal containing the word null is untouched
    t2 = pa.table({"s": ["null", "x"]})
    assert compile_filter("s == 'null'").apply(t2).num_rows == 1


def test_string_transform_methods():
    # value-position string kernels via the batch path (no Ray needed)
    import pyarrow as pa

    from tenzir_ray.expr import compile_expr, eval_expr

    t = pa.table({"s": ["Hello World", "abc", None, "xyzxyz"]})
    cases = [
        ("s.substr(1, 3)", ["ell", "bc", None, "yzx"]),
        ("s.substr(2)", ["llo World", "c", None, "zxyz"]),
        ('s.replace("l", "L")', ["HeLLo WorLd", "abc", None, "xyzxyz"]),
        ('s.regex_replace("[aeiou]", "_")',
         ["H_ll_ W_rld", "_bc", None, "xyzxyz"]),
        ('s.find("l")', [2, -1, None, -1]),
        ('s.count("xyz")', [0, 0, None, 2]),
        ('s.lpad(5, ".")', ["Hello World", "..abc", None, "xyzxyz"]),
        ('s.rpad(5, ".")', ["Hello World", "abc..", None, "xyzxyz"]),
        ("s.title()", ["Hello World", "Abc", None, "Xyzxyz"]),
        ("s.capitalize()", ["Hello world", "Abc", None, "Xyzxyz"]),
        ("s.reverse()", ["dlroW olleH", "cba", None, "zyxzyx"]),
        ("s.lstrip()", ["Hello World", "abc", None, "xyzxyz"]),
        ('s.split("l")',
         [["He", "", "o Wor", "d"], ["abc"], None, ["xyzxyz"]]),
        # methods chain: receiver compiles recursively
        ('s.substr(0, 5).upper().replace("L", "!")',
         ["HE!!O", "ABC", None, "XYZXY"]),
    ]
    for ex, want in cases:
        got = eval_expr(compile_expr(ex), t)
        got = got.to_pylist() if hasattr(got, "to_pylist") else got
        assert got == want, ex


def test_string_methods_in_put(ray_session, tbl_ds):
    out = T.put(tbl_ds, s="s", head="s.substr(0, 2)",
                fixed='s.replace("o", "0")').to_pandas()
    by_s = out.dropna(subset=["s"]).set_index("s")
    assert by_s.loc["foo", "head"] == "fo"
    assert by_s.loc["foo", "fixed"] == "f00"
