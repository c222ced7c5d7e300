"""TQL2 record literals and lambda list functions (reference
tql2/parser.cpp record/lambda expressions; list functions map/where in
the TQL2 function library)."""

import numpy as np
import pyarrow as pa
import pytest

from tenzir_ray.expr import compile_expr, eval_expr


def _batch():
    return pa.table({
        "x": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["a", "bb", None]),
        "xs": pa.array([[1, -2, 3], [], None], type=pa.list_(pa.int64())),
    })


# ---------------------------------------------------------------------------
# record literals


def test_record_literal_basic():
    out = eval_expr(compile_expr("{a: x * 2, b: name, c: 'lit'}"), _batch())
    assert pa.types.is_struct(out.type)
    assert out.to_pylist() == [
        {"a": 2, "b": "a", "c": "lit"},
        {"a": 4, "b": "bb", "c": "lit"},
        {"a": 6, "b": None, "c": "lit"},
    ]


def test_record_literal_nested_and_quoted_keys():
    out = eval_expr(compile_expr("{o: {i: x + 1}, 'q k': x}"), _batch())
    assert out.type.field("o").type.field("i").type == pa.int64()
    assert out.to_pylist()[0] == {"o": {"i": 2}, "q k": 1}


def test_record_literal_empty_batch_keeps_types():
    out = eval_expr(compile_expr("{a: x, c: 'lit'}"), _batch().slice(0, 0))
    assert out.type == pa.struct([("a", pa.int64()), ("c", pa.string())])
    assert len(out) == 0


def test_record_literal_duplicate_field_rejected():
    with pytest.raises(ValueError, match="repeats"):
        compile_expr("{a: 1, a: 2}")


def test_record_literal_null_field():
    out = eval_expr(compile_expr("{a: null, b: x}"), _batch())
    assert out.to_pylist()[0] == {"a": None, "b": 1}


# ---------------------------------------------------------------------------
# lambda list functions


def test_map_lambda_elementwise():
    out = eval_expr(compile_expr("map(xs, v => v * 10)"), _batch())
    assert out.to_pylist() == [[10, -20, 30], [], None]


def test_map_lambda_outer_field_reference():
    # the lambda body may read row fields — gathered by parent index
    out = eval_expr(compile_expr("map(xs, v => v + x * 100)"), _batch())
    assert out.to_pylist() == [[101, 98, 103], [], None]


def test_where_lambda_filters_elements():
    out = eval_expr(compile_expr("where(xs, v => v > 0)"), _batch())
    assert out.to_pylist() == [[1, 3], [], None]


def test_where_lambda_null_predicate_drops():
    b = pa.table({"xs": pa.array([[1, None, 3]], type=pa.list_(pa.int64()))})
    out = eval_expr(compile_expr("where(xs, v => v > 0)"), b)
    assert out.to_pylist() == [[1, 3]]


def test_lambda_composes_with_methods_and_strings():
    b = pa.table({"ws": pa.array([["aa", "b"], ["ccc"]],
                                 type=pa.list_(pa.string()))})
    out = eval_expr(compile_expr('where(ws, w => w.startswith("a"))'), b)
    assert out.to_pylist() == [["aa"], []]
    out2 = eval_expr(compile_expr("map(ws, w => w.upper())"), b)
    assert out2.to_pylist() == [["AA", "B"], ["CCC"]]


def test_map_over_fixed_size_list():
    b = pa.table({"fs": pa.array([[1.0, 2.0], [3.0, 4.0]],
                                 type=pa.list_(pa.float64(), 2))})
    out = eval_expr(compile_expr("map(fs, v => v * 2.0)"), b)
    assert out.to_pylist() == [[2.0, 4.0], [6.0, 8.0]]


def test_map_empty_batch_keeps_list_type():
    out = eval_expr(compile_expr("map(xs, v => v * 10)"),
                    _batch().slice(0, 0))
    assert pa.types.is_list(out.type)
    assert pa.types.is_integer(out.type.value_type)


def test_lambda_errors_are_loud():
    with pytest.raises(TypeError, match="list column"):
        eval_expr(compile_expr("map(x, v => v)"), _batch())
    with pytest.raises(TypeError, match="boolean"):
        eval_expr(compile_expr("where(xs, v => v + 1)"), _batch())
    with pytest.raises(ValueError, match="one parameter"):
        compile_expr("map(xs, lambda a, b: a)")
    # map/where without a lambda second arg are NOT list calls
    with pytest.raises(ValueError):
        compile_expr("map(xs, 3)")


def test_nested_map_in_record():
    out = eval_expr(compile_expr("{doubled: map(xs, v => v * 2), k: x}"),
                    _batch())
    assert out.to_pylist()[0] == {"doubled": [2, -4, 6], "k": 1}


# ---------------------------------------------------------------------------
# integration through set / TQL2 statements


def _ds(ray_session):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "x": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["a", "b", "c"]),
        "xs": pa.array([[1, -2], [3], [4, 5, 6]], type=pa.list_(pa.int64())),
    }))


def test_tql2_record_assignment(ray_session):
    from tenzir_ray.pipelines.tql2 import run_pipeline2

    out = run_pipeline2("meta = {double: x * 2, who: name}\nselect meta",
                        _ds(ray_session)).take_all()
    assert out[0]["meta"] == {"double": 2, "who": "a"}


def test_tql2_this_record_replaces_event(ray_session):
    from tenzir_ray.pipelines.tql2 import run_pipeline2

    out = run_pipeline2("this = {k: x + 100, n: name}",
                        _ds(ray_session)).take_all()
    assert sorted(r["k"] for r in out) == [101, 102, 103]
    assert set(out[0]) == {"k", "n"}


def test_tql2_this_requires_record(ray_session):
    from tenzir_ray.pipelines.tql2 import run_pipeline2

    with pytest.raises(Exception, match="record"):
        run_pipeline2("this = x + 1", _ds(ray_session)).materialize()


def test_tql2_lambda_statements(ray_session):
    from tenzir_ray.pipelines.tql2 import run_pipeline2

    out = run_pipeline2(
        "pos = where(xs, v => v > 0) | scaled = map(xs, v => v * 0 + x)\n"
        "select x, pos, scaled", _ds(ray_session))
    rows = sorted(out.take_all(), key=lambda r: r["x"])
    assert [list(r["pos"]) for r in rows] == [[1], [3], [4, 5, 6]]
    assert [list(r["scaled"]) for r in rows] == [[1, 1], [2], [3, 3, 3]]


def test_tql2_if_branches_with_record_take_fallback(ray_session):
    # record values bail out of the vectorized CASE kernel; the
    # sequential union fallback must still produce correct structs
    from tenzir_ray.pipelines.tql2 import run_pipeline2

    out = run_pipeline2(
        "if x > 1 { m = {big: x} } else { m = {big: x * -1} }\nselect x, m",
        _ds(ray_session))
    rows = sorted(out.take_all(), key=lambda r: r["x"])
    assert [r["m"]["big"] for r in rows] == [-1, 2, 3]


# ---------------------------------------------------------------------------
# list literals (value position)


def test_list_literal_value_position():
    out = eval_expr(compile_expr("[x, x * 2, 100]"), _batch())
    assert pa.types.is_list(out.type)
    assert out.to_pylist() == [[1, 2, 100], [2, 4, 100], [3, 6, 100]]


def test_list_literal_type_unification():
    out = eval_expr(compile_expr("[x, 2.5]"), _batch())
    assert pa.types.is_floating(out.type.value_type)
    assert out.to_pylist() == [[1.0, 2.5], [2.0, 2.5], [3.0, 2.5]]


def test_list_literal_null_elements_stay_null():
    out = eval_expr(compile_expr("[name, 'z']"), _batch())
    assert out.to_pylist() == [["a", "z"], ["bb", "z"], [None, "z"]]


def test_list_literal_inside_record_and_lambda():
    out = eval_expr(compile_expr("map([x, x * 10], e => e + 1)"), _batch())
    assert out.to_pylist() == [[2, 11], [3, 21], [4, 31]]
    rec = eval_expr(compile_expr("{v: [x, 0]}"), _batch())
    assert rec.to_pylist()[0] == {"v": [1, 0]}


def test_membership_value_sets_still_plain():
    # `x in [...]` keeps compiling to a constant value set, and a
    # per-row expression inside one is rejected loudly
    out = eval_expr(compile_expr("x in [1, 3]"), _batch())
    assert out.to_pylist() == [True, False, True]
    with pytest.raises(ValueError, match="constant"):
        compile_expr("x in [x, 2]")


def test_empty_list_literal():
    out = eval_expr(compile_expr("[]"), _batch())
    assert pa.types.is_list(out.type)
    assert out.to_pylist() == [[], [], []]


# ---------------------------------------------------------------------------
# nested-path assignment


def test_tql2_nested_path_assignment(ray_session):
    import pandas as pd
    import ray.data

    from tenzir_ray.pipelines.tql2 import run_pipeline2

    ds = ray.data.from_pandas(pd.DataFrame({"a": [1, 2]}))
    out = run_pipeline2(
        'rec = {inner: {x: a}, y: a * 10}\n'
        'rec.inner.x = rec.inner.x + 5\n'
        'rec.z = a\n'
        'select rec', ds).to_pandas()
    recs = out.to_dict("records")
    assert [r["rec"]["inner"]["x"] for r in recs] == [6, 7]
    assert [r["rec"]["y"] for r in recs] == [10, 20]   # siblings keep
    assert [r["rec"]["z"] for r in recs] == [1, 2]     # leaf append


def test_nested_set_keeps_flat_dotted_columns_and_nulls(ray_session):
    import pandas as pd
    import ray.data

    from tenzir_ray.stages import transforms as T

    # flatten-style flat column names with dots are NOT struct paths
    flat = ray.data.from_arrow(pa.table({"a.b": pa.array([1, 2])}))
    out = T.set_(flat, **{"a.c": "7"}).to_pandas()
    assert out["a.c"].tolist() == [7, 7]

    # null struct rows stay null; non-record intermediates error loudly
    nds = ray.data.from_arrow(pa.table({
        "rec": pa.array([{"x": 1}, None],
                        type=pa.struct([("x", pa.int64())])),
        "a": pa.array([5, 6])}))
    got = T.set_(nds, **{"rec.x": "a"}).to_pandas()
    assert got["rec"][0] == {"x": 5} and pd.isna(got["rec"][1])
    with pytest.raises(Exception, match="not a record"):
        T.set_(nds, **{"rec.x.deep": "1"}).to_pandas()
