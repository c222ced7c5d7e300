"""DSIR hashed-ngram importance weighting (stages/dsir.py)."""

import duckdb
import numpy as np
import pytest

from tenzir_ray.stages import dsir as DS

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def documents(ray_session):
    import ray.data

    return ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])


def test_affinity_parity_vs_duckdb(documents):
    got = DS.dsir_weights(documents, "lang == 'en'", buckets=512) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute("""
        WITH tok AS (
          SELECT doc_id, lang, md5_number_lower(t) % 512 AS b
          FROM (SELECT doc_id, lang,
                       unnest(regexp_split_to_array(text, '\\s+')) AS t
                FROM documents)
          WHERE t <> ''),
        raw AS (SELECT b, count(*) AS cr FROM tok GROUP BY b),
        tgt AS (SELECT b, count(*) AS ct FROM tok WHERE lang = 'en'
                GROUP BY b),
        w AS (SELECT raw.b, (coalesce(ct, 0) * 1000000) // cr AS wt
              FROM raw LEFT JOIN tgt ON raw.b = tgt.b),
        sc AS (SELECT tok.doc_id, SUM(w.wt) AS affinity
               FROM tok JOIN w ON tok.b = w.b GROUP BY tok.doc_id)
        SELECT d.doc_id, CAST(coalesce(sc.affinity, 0) AS BIGINT) AS affinity
        FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        ORDER BY d.doc_id
    """).df()
    assert (got["affinity"].to_numpy() == exp["affinity"].to_numpy()).all()


def test_logratio_prefers_target_language(documents):
    got = DS.dsir_weights(documents, "lang == 'en'").to_pandas()
    means = got.groupby("lang")["dsir_logratio"].mean()
    assert means.idxmax() == "en"


def test_partitioning_independent(documents):
    a = DS.dsir_weights(documents, "lang == 'en'").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    b = DS.dsir_weights(documents.repartition(7), "lang == 'en'") \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert (a["affinity"].to_numpy() == b["affinity"].to_numpy()).all()
    # float log-ratios: per-doc sums use the SAME broadcast weight
    # vector and per-doc add order (token order within a doc), so even
    # the float column is bit-stable across block layouts
    assert (a["dsir_logratio"].to_numpy() == b["dsir_logratio"].to_numpy()).all()


def test_bigram_counts_vs_reference(ray_session):
    import ray.data

    rows = [
        {"doc_id": 0, "text": "a b c a b"},
        {"doc_id": 1, "text": "  x  y "},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "solo"},
    ]
    ds = ray.data.from_items(rows)
    counts = DS.dsir_counts(ds, "doc_id == 0", buckets=64, ngram=2)
    # reference: bigrams within each doc, joined by single space
    import hashlib

    def b(tok):
        return int.from_bytes(hashlib.md5(tok.encode()).digest()[8:],
                              "little") % 64

    raw = np.zeros(64, np.int64)
    tgt = np.zeros(64, np.int64)
    grams = {0: ["a b", "b c", "c a", "a b"], 1: ["x y"], 2: [], 3: []}
    for d, gs in grams.items():
        for g in gs:
            raw[b(g)] += 1
            if d == 0:
                tgt[b(g)] += 1
    assert (counts[0] == raw).all()
    assert (counts[1] == tgt).all()


def test_empty_and_whitespace_docs_score_zero(ray_session):
    import ray.data

    ds = ray.data.from_items([
        {"doc_id": 0, "text": "hello world", "lang": "en"},
        {"doc_id": 1, "text": "   ", "lang": "en"},
        {"doc_id": 2, "text": "", "lang": "fr"},
    ])
    out = DS.dsir_weights(ds, "lang == 'en'").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert len(out) == 3
    assert out.loc[1, "affinity"] == 0 and out.loc[2, "affinity"] == 0
    assert out.loc[0, "affinity"] > 0


def test_dsir_select_topn(documents):
    n = documents.count()
    top = DS.dsir_select(documents, "lang == 'en'", 25)
    df = top.to_pandas()
    assert len(df) == 25
    # the selection is by log-ratio: scores are the 25 highest
    full = DS.dsir_weights(documents, "lang == 'en'").to_pandas()
    thresh = np.sort(full["dsir_logratio"].to_numpy())[-25]
    assert (df["dsir_logratio"].to_numpy() >= thresh).all()
    assert n == len(full)


def test_tql_string_pipeline(ray_session):
    from tenzir_ray.pipelines.tql import run_pipeline

    out = run_pipeline(
        f'read_parquet {SF}/documents.parquet '
        '| dsir_weights target="lang == \'en\'" buckets=256 '
        '| select doc_id, affinity | sort affinity desc | head 5')
    df = out.to_pandas()
    assert len(df) == 5 and (df["affinity"] > 0).all()


def test_registry_op(documents):
    from tenzir_ray.pipelines.pipeline import Pipeline

    out = Pipeline([
        {"op": "dsir_weights", "target": "lang == 'en'", "buckets": 256},
        {"op": "select", "columns": ["doc_id", "affinity"]},
    ]).run(documents)
    assert out.count() == documents.count()
