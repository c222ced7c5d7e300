"""Corpus-wide exact line dedup (dedup.line_dedup / split_lines)."""

import duckdb
import pyarrow as pa


def _docs():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "alpha\nshared header\nbody one",
            "shared header\nbody two\nalpha",
            "unique only",
            "shared header",  # every line duplicated -> doc disappears
        ]),
    })


def test_split_lines_vectorized(ray_session):
    import ray.data

    from tenzir_ray.stages.dedup import split_lines

    got = split_lines(ray.data.from_arrow(_docs())).to_pandas()
    assert len(got) == 8
    d1 = got[got["doc_id"] == 1].sort_values("line_idx")
    assert d1["line"].tolist() == ["alpha", "shared header", "body one"]
    assert d1["line_idx"].tolist() == [0, 1, 2]


def test_line_dedup_matches_sql(ray_session):
    import ray.data

    from tenzir_ray.stages.dedup import line_dedup

    docs = _docs()
    got = (line_dedup(ray.data.from_arrow(docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", docs.to_pandas())
    want = con.sql("""
        WITH w AS (SELECT doc_id, string_split(text, chr(10)) ls
                   FROM documents),
        e AS (SELECT doc_id, unnest(generate_series(1, len(ls))) i, ls
              FROM w),
        l AS (SELECT doc_id, i-1 AS line_idx, ls[i] AS line FROM e),
        k AS (SELECT doc_id, line_idx, line FROM (
                  SELECT *, row_number() OVER (
                      PARTITION BY line ORDER BY doc_id, line_idx) rn
                  FROM l) WHERE rn = 1)
        SELECT doc_id, string_agg(line, chr(10) ORDER BY line_idx) AS text
        FROM k GROUP BY doc_id ORDER BY doc_id
    """).df()
    assert got.equals(want.astype(got.dtypes.to_dict()))
    # the fully-duplicate doc is gone; the first-occurrence doc is intact
    assert 4 not in set(got["doc_id"])
    assert got.loc[got["doc_id"] == 1, "text"].iloc[0] == (
        "alpha\nshared header\nbody one"
    )


def test_line_dedup_partitioning_independent(ray_session):
    import ray.data

    from tenzir_ray.stages.dedup import line_dedup

    docs = _docs()
    a = (line_dedup(ray.data.from_arrow(docs)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (line_dedup(ray.data.from_arrow(docs).repartition(5)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_line_dedup_custom_separator(ray_session):
    import ray.data

    from tenzir_ray.stages.dedup import line_dedup

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a. b. c", "b. d"]),
    })
    got = (line_dedup(ray.data.from_arrow(docs), sep=". ").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["text"].tolist() == ["a. b. c", "d"]


def test_line_dedup_registry_op(ray_session):
    import ray.data

    from tenzir_ray.pipelines.pipeline import Pipeline

    ds = ray.data.from_arrow(_docs())
    got = (Pipeline([{"op": "line_dedup"}]).run(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    direct = __import__(
        "tenzir_ray.stages.dedup", fromlist=["line_dedup"]
    ).line_dedup(ray.data.from_arrow(_docs())).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got.equals(direct)


def test_fuzzy_decontaminate_exact_near_and_invert(ray_session):
    import ray.data

    from tenzir_ray.stages.dedup import fuzzy_decontaminate

    block = pa.table({"text": pa.array([
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs every single day",
    ])})
    corpus = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog again and again",
            "the quick brown fox jumps over the lazy dog again and again x",
            "completely different content about data processing engines",
            "pack my box with five dozen liquor jugs every single day",
            "unrelated text mentioning neither foxes nor boxes anywhere",
        ]),
    })
    kept = fuzzy_decontaminate(
        ray.data.from_arrow(corpus), ray.data.from_arrow(block)
    ).to_pandas()
    assert sorted(kept["doc_id"]) == [3, 5]
    assert "minhash" not in kept.columns
    hits = fuzzy_decontaminate(
        ray.data.from_arrow(corpus), ray.data.from_arrow(block),
        invert=True,
    ).to_pandas()
    assert sorted(hits["doc_id"]) == [1, 2, 4]


def test_fuzzy_decontaminate_key_gate_and_empty_block(ray_session):
    import pytest as _pytest
    import ray.data

    from tenzir_ray.stages.dedup import fuzzy_decontaminate

    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma delta", "epsilon zeta eta"]),
    }))
    block = ray.data.from_arrow(pa.table({
        "text": pa.array(["alpha beta gamma delta"])}))
    with _pytest.raises(ValueError, match="max_blocklist_keys"):
        fuzzy_decontaminate(corpus, block, max_blocklist_keys=1)
    # empty blocklist keeps everything
    none = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    out = fuzzy_decontaminate(corpus, none).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]
