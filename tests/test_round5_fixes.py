"""Round-5 regression tests: ADVICE r4 fixes (canonical_url unknown
scheme:port crash, JSONL non-finite floats, null group keys in feature
scaling) and VERDICT r4 items (canonical gate dtypes, Arrow-typed
NB/LR aggregate partials, Arrow output from the fuzzy filter)."""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ------------------------------------------------------------- url fixes


def test_canonical_url_unknown_scheme_with_port(ray_session):
    """ADVICE r4 (high): rtsp://h:554/p crashed the whole batch —
    scheme.map(defaults) yields NaN, the != compare yields pd.NA, and
    np.where raised. Unknown schemes keep their explicit port."""
    import ray.data

    from tenzir_ray.stages.url import canonical_url

    t = pa.table({"i": [0, 1, 2, 3],
                  "url": ["rtsp://H:554/p", "ssh://x:22",
                          "https://A.com:443/ok", "gopher://g.org:70/x"]})
    df = (canonical_url(ray.data.from_arrow(t), "url")
          .to_pandas().sort_values("i", ignore_index=True))
    assert df.loc[0, "canonical_url"] == "rtsp://h:554/p"
    # empty path with an authority canonicalizes to "/" (documented rule)
    assert df.loc[1, "canonical_url"] == "ssh://x:22/"
    # known scheme still strips its default port
    assert df.loc[2, "canonical_url"] == "https://a.com/ok"
    assert df.loc[3, "canonical_url"] == "gopher://g.org:70/x"


def test_parse_url_port_is_plain_int_not_extension(ray_session):
    """Gate-dtype canonicalization: the nullable port must come back as
    a plain numpy dtype (int64, or float64 when nulls force it) — a
    pandas Int64 extension column str-renders nulls as "<NA>" and hashes
    red at the driver."""
    import ray.data

    from tenzir_ray.stages.url import parse_url

    t = pa.table({"url": ["http://a.com:8080/x", "http://b.com/y"]})
    out = parse_url(ray.data.from_arrow(t), "url")
    assert str(out.schema().base_schema.field("url_port").type) == "int64"
    df = out.to_pandas()
    assert not pd.api.types.is_extension_array_dtype(df["url_port"].dtype)


# -------------------------------------------------- feature-scaling keys


def test_standardize_null_group_key_gets_its_group_stats(ray_session):
    """ADVICE r4: rows with a null group key form ONE group (SQL GROUP
    BY semantics) and must be scaled against that group's stats, not
    nulled out."""
    import ray.data

    from tenzir_ray.stages.analytics import minmax_scale, standardize

    df = pd.DataFrame({
        "g": ["a", "a", "a", None, None, None],
        "v": [1.0, 2.0, 3.0, 10.0, 20.0, 30.0],
    })
    out = (standardize(ray.data.from_pandas(df), "v", by="g", out="z")
           .to_pandas())
    nulls = out[out["g"].isna()].sort_values("v")
    assert len(nulls) == 3
    # z of the null group's own stats: mean 20, sample sd 10
    assert np.allclose(nulls["z"].to_numpy(), [-1.0, 0.0, 1.0])
    mm = (minmax_scale(ray.data.from_pandas(df), "v", by="g", out="s")
          .to_pandas())
    nulls = mm[mm["g"].isna()].sort_values("v")
    assert np.allclose(nulls["s"].to_numpy(), [0.0, 0.5, 1.0])


# ------------------------------------------------------------ sft export


def test_sft_jsonl_nonfinite_floats_become_null(ray_session, tmp_path):
    """ADVICE r4: json.dumps emits bare NaN/Infinity — invalid JSON.
    Non-finite float cells must serialize as null."""
    import ray.data

    from tenzir_ray.stages.transcripts import write_sft_jsonl

    df = pd.DataFrame({
        "conv_id": ["c1", "c1"],
        "turn_idx": [0, 1],
        "role": ["user", "assistant"],
        "text": ["hi", "hello"],
        "score": [float("nan"), float("inf")],
        "ts": pd.to_datetime(["2026-01-01", "2026-01-01"]),
    })
    dest = str(tmp_path / "sft")
    write_sft_jsonl(ray.data.from_pandas(df), dest)
    import glob

    lines = []
    for p in glob.glob(dest + "/*.jsonl"):
        lines += open(p).read().splitlines()
    assert lines
    for ln in lines:
        rec = json.loads(ln)  # strict parse: bare NaN would raise
        for m in rec.get("messages", []):
            pass
    assert "NaN" not in " ".join(lines)
    assert "Infinity" not in " ".join(lines)


# ------------------------------------------------- typed Arrow partials


def test_nb_accumulator_is_arrow_convertible():
    """VERDICT r4 #4: the NB partial must convert to a typed Arrow
    struct — the old dict-of-numpy fell back to pickled-object blocks
    with a warning per batch."""
    from tenzir_ray.stages.classify import _LrGradAgg, _NbAgg

    agg = _NbAgg("lang", "text", buckets=16, ngram=1)
    block = pa.table({"lang": ["en", "de", "en"],
                      "text": ["a b", "c", "a d"]})
    acc = agg.accumulate_block(agg.init(None), block)
    arr = pa.array([acc])
    assert pa.types.is_struct(arr.type)
    merged = _NbAgg.merge(acc, acc)
    assert pa.types.is_struct(pa.array([merged]).type)

    lr = _LrGradAgg("y", "text", 16, 1, np.zeros(16), 0.0)
    block2 = pa.table({"y": [1, 0], "text": ["a b", "c"]})
    acc2 = lr.accumulate_block(lr.init(None), block2)
    assert pa.types.is_struct(pa.array([acc2]).type)
    assert pa.types.is_struct(pa.array([_LrGradAgg.merge(acc2, acc2)]).type)


def test_nb_train_multi_block_matches_single(ray_session):
    import ray.data

    from tenzir_ray.stages.classify import nb_train

    rng = np.random.default_rng(5)
    langs = rng.choice(["en", "de", "fr"], size=300)
    texts = ["tok%d tok%d" % (i % 17, i % 5) for i in range(300)]
    df = pd.DataFrame({"lang": langs, "text": texts})
    one = nb_train(ray.data.from_pandas(df), "lang", "text", buckets=64)
    many = nb_train(ray.data.from_pandas(df).repartition(8), "lang",
                    "text", buckets=64)
    assert one.classes == many.classes
    assert np.array_equal(one.doc_counts, many.doc_counts)
    assert np.array_equal(one.counts, many.counts)


# ----------------------------------------------------- fuzzy empty block


def test_fuzzy_filter_empty_upstream_is_quiet_arrow(ray_session):
    """Empty filtered upstream blocks used to trip Ray's pandas block
    size estimator (np.vectorize on size-0). Arrow output is silent."""
    import ray.data

    from tenzir_ray.stages.dedup import fuzzy_decontaminate

    corpus = ray.data.from_pandas(pd.DataFrame({
        "doc_id": range(50),
        "text": ["quick brown fox %d" % i for i in range(50)],
    })).repartition(4).filter(lambda r: r["doc_id"] < 0)
    block = ray.data.from_pandas(
        pd.DataFrame({"text": ["quick brown fox 3"]}))
    out = fuzzy_decontaminate(corpus, block, "text")
    assert out.count() == 0


# ---------------------------------------------------- tql2 two-input ops


def test_tql2_two_input_join_named_args(ray_session, tmp_path):
    """TQL2 named comma-separated operator arguments + a pipeline
    expression (`right=( <tql2 statements> )`) as the second input; the
    nested pipeline uses TQL2 grammar (from / newlines)."""
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines.tql2 import run_pipeline2

    left = tmp_path / "l.parquet"
    right = tmp_path / "r.parquet"
    pq.write_table(pa.table({"k": [1, 2, 3, 2], "v": [10, 20, 30, 40]}),
                   left)
    pq.write_table(pa.table({"rk": [2, 3], "tag": ["b", "c"]}), right)
    out = run_pipeline2(f"""
        from "{left}"
        hash_join on="k", right_on="rk", how="inner", right=(
            from "{right}"
            where tag != "zzz"
        )
        summarize n=count(), sv=sum(v) by tag
        sort tag
    """)
    df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert df["tag"].tolist() == ["b", "c"]
    assert df["sv"].tolist() == [60, 30]


def test_tql2_two_input_requires_right(ray_session):
    from tenzir_ray.pipelines.tql2 import parse_pipeline2

    with pytest.raises(ValueError, match="right"):
        parse_pipeline2('hash_join on="k"')


# -------------------------------------------------------- keyed watermark


def test_watermark_by_matches_per_key_serial_model(ray_session):
    """Per-key watermark sharded over the exchange (>1 parallel task):
    equals the serial per-key model, independent of partitioning."""
    import ray.data

    from tenzir_ray.stages.streaming import watermark_by

    rng = np.random.default_rng(7)
    n = 4000
    keys = rng.integers(0, 13, size=n)
    lsn = np.arange(n, dtype=np.int64)
    base = pd.Timestamp("2026-01-01").value
    # mostly increasing per key with injected backward jumps
    ts_ns = base + lsn * 1_000_000_000 - rng.integers(
        0, 5_000_000_000, size=n) * (rng.random(n) < 0.2)
    df = pd.DataFrame({
        "k": keys, "lsn": lsn,
        "ts": pd.to_datetime(ts_ns),
    })
    lateness = 1.0

    # serial per-key reference model
    exp_late = np.zeros(n, bool)
    seen: dict = {}
    for i in range(n):
        kk = keys[i]
        t = ts_ns[i]
        wm = seen.get(kk)
        if wm is not None and t < wm - lateness * 1e9:
            exp_late[i] = True
        seen[kk] = t if wm is None else max(wm, t)
    expected = set(lsn[~exp_late].tolist())

    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = watermark_by(ds, "ts", lateness, by="k", order_by="lsn",
                           num_buckets=8).to_pandas()
        assert set(out["lsn"].tolist()) == expected, parts
    # tag mode marks the same rows
    tagged = watermark_by(ray.data.from_pandas(df), "ts", lateness,
                          by="k", order_by="lsn", mode="tag",
                          num_buckets=8).to_pandas()
    got_late = set(tagged.loc[tagged["late"], "lsn"].tolist())
    assert got_late == set(lsn[exp_late].tolist())


# --------------------------------------------------- kmeans fast path


def test_kmeans_fit_driver_path_matches_streaming(ray_session):
    """When the init sample captures the whole dataset, Lloyd runs
    driver-local — must match the streaming-aggregate loop (forced by
    a small `sample`) to float tolerance."""
    import ray.data

    from tenzir_ray.stages.cluster import kmeans_fit

    rng = np.random.default_rng(4)
    vecs = np.r_[rng.normal(0, 0.1, (120, 8)),
                 rng.normal(5, 0.1, (140, 8))].astype(np.float64)
    t = pa.table({"embedding": list(vecs)})
    ds = ray.data.from_arrow(t).repartition(5)
    local = kmeans_fit(ds, "embedding", 2, iters=6, seed=3, sample=4096)
    streamed = kmeans_fit(ds, "embedding", 2, iters=6, seed=3, sample=260)
    assert np.allclose(local, streamed, atol=1e-9), (local, streamed)


def test_tql2_move_statement(ray_session, tmp_path):
    """`move a=b` assigns and removes the source; a source that is
    also a target stays (swap-like chains keep the re-targeted name)."""
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines.tql2 import run_pipeline2

    p = tmp_path / "t.parquet"
    pq.write_table(pa.table({"a": [1, 2], "b": [10, 20], "c": [5, 6]}), p)
    out = run_pipeline2(f"""
        from "{p}"
        move x=a, y=b
    """)
    df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert sorted(df.columns) == ["c", "x", "y"]
    assert df.sort_values("x")["y"].tolist() == [10, 20]


def test_record_spread_literal(ray_session):
    """TQL2 `{...rec, a: 1}` spread: struct fields expand in place,
    later entries override by value."""
    import ray.data

    import tenzir_ray.stages.transforms as T

    rec = pa.array([{"a": 1, "b": 2}, {"a": 3, "b": 4}, None],
                   pa.struct([("a", pa.int64()), ("b", pa.int64())]))
    ds = ray.data.from_arrow(pa.table({"i": [0, 1, 2], "rec": rec}))
    out = T.set_(ds, merged="{...rec, b: i * 100, c: 7}").to_pandas()
    m = out.sort_values("i")["merged"].tolist()
    assert m[0] == {"a": 1, "b": 0, "c": 7}
    assert m[1] == {"a": 3, "b": 100, "c": 7}
    # null parent struct spreads to null children; overrides still apply
    assert m[2]["a"] is None and m[2]["b"] == 200 and m[2]["c"] == 7


# ------------------------------------------------- review-pass regressions


def test_tql2_move_chained_is_left_to_right(ray_session, tmp_path):
    """`move y=z, x=y` applies left-to-right: x ends with old z, both
    y and z are gone (each pair is set-then-drop in order)."""
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines.tql2 import parse_pipeline2, run_pipeline2

    p = tmp_path / "t.parquet"
    pq.write_table(pa.table({"z": [7, 8], "keep": [1, 2]}), p)
    out = run_pipeline2(f'from "{p}"\nmove y=z, x=y')
    df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert sorted(df.columns) == ["keep", "x"]
    assert sorted(df["x"].tolist()) == [7, 8]
    # dotted sources are rejected loudly (removal is a column drop)
    with pytest.raises(ValueError, match="top-level column"):
        parse_pipeline2("move x=rec.a")


def test_tql2_right_in_quoted_value_not_misparsed(ray_session, tmp_path):
    """A quoted argument value containing `right=(` must not divert the
    pipeline-expression parser."""
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines.tql2 import run_pipeline2

    left = tmp_path / "l.parquet"
    right = tmp_path / "r.parquet"
    pq.write_table(pa.table({"k": ["right=(x)", "b"], "v": [1, 2]}), left)
    pq.write_table(pa.table({"rk": ["right=(x)"], "t": [9]}), right)
    out = run_pipeline2(f"""
        from "{left}"
        where k == "right=(x)"
        hash_join on="k", right_on="rk", how="inner", right=(
            from "{right}"
        )
    """)
    df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert len(df) == 1 and df["t"].tolist() == [9]


def test_watermark_by_nat_and_boundary_semantics(ray_session):
    """NaT rows: late only once the key HAS a watermark (serial-op
    contract); prior NaT rows neither create nor advance one. The
    strict-< boundary holds exactly in int64 (ts == wm-lateness is
    NOT late)."""
    import ray.data

    from tenzir_ray.stages.streaming import watermark_by

    base = pd.Timestamp("2026-01-01").value
    df = pd.DataFrame({
        "k": ["a"] * 5,
        "lsn": range(5),
        "ts": pd.to_datetime([pd.NaT,            # 0: no wm yet -> kept
                              base + 10_000_000_000,  # 1: first wm
                              pd.NaT,            # 2: wm exists -> late
                              base + 9_000_000_000,   # 3: == wm-1s -> kept
                              base + 8_999_999_999,   # 4: 1ns below -> late
                              ]),
    })
    out = watermark_by(ray.data.from_pandas(df), "ts", 1.0,
                       by="k", order_by="lsn").to_pandas()
    assert sorted(out["lsn"].tolist()) == [0, 1, 3]


def test_watermark_by_property_random_streams(ray_session):
    """Randomized multi-key streams (NaTs, duplicates, backward jumps,
    boundary-exact values): watermark_by must equal the per-key serial
    model for every key, at several partitionings."""
    import ray.data

    from tenzir_ray.stages.streaming import watermark_by

    rng = np.random.default_rng(123)
    base = pd.Timestamp("2026-01-01").value
    for trial in range(5):
        n = int(rng.integers(30, 400))
        keys = rng.integers(0, int(rng.integers(1, 9)), size=n)
        # ns offsets including exact-boundary collisions and NaTs
        offs = rng.integers(-3_000_000_000, 3_000_000_000, size=n)
        offs = (offs // 1_000_000_000) * 1_000_000_000 + rng.choice(
            [0, 1, -1, 999_999_999], size=n)
        ts_ns = base + np.cumsum(np.abs(offs) // 4) + offs
        nat = rng.random(n) < 0.15
        lateness = float(rng.choice([0.0, 0.5, 2.0]))
        lat_ns = int(lateness * 1e9)

        exp_keep = []
        wm: dict = {}
        NO = None
        for i in range(n):
            k = int(keys[i])
            w = wm.get(k)
            if nat[i]:
                if w is None:
                    exp_keep.append(i)
                continue
            t = int(ts_ns[i])
            if not (w is not None and t < w - lat_ns):
                exp_keep.append(i)
            wm[k] = t if w is None else max(w, t)

        df = pd.DataFrame({
            "k": keys, "lsn": np.arange(n),
            "ts": pd.to_datetime(np.where(nat, np.datetime64("NaT"),
                                          ts_ns.astype("datetime64[ns]"))),
        })
        for parts in (1, 6):
            got = watermark_by(
                ray.data.from_pandas(df).repartition(parts), "ts",
                lateness, by="k", order_by="lsn").to_pandas()
            assert sorted(got["lsn"].tolist()) == exp_keep, (
                trial, parts, lateness)


# ---------------------------------------------- new training-data ops


def test_fim_transform_split_structure(ray_session):
    """Selected rows become <PRE>prefix<SUF>suffix<MID>middle with the
    three pieces reassembling the original; unselected pass through."""
    import ray.data

    from tenzir_ray.stages.text import fim_transform

    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": ["word%d " % i * 5 for i in range(200)]})
    out = fim_transform(ray.data.from_pandas(df), key="doc_id",
                        rate=0.5, out="t2").to_pandas()
    sel = out[out["t2_fim"]]
    assert 0 < len(sel) < 200  # rate actually selects a strict subset
    for _, r in sel.head(20).iterrows():
        t2 = r["t2"]
        assert t2.startswith("<PRE>")
        body = t2[len("<PRE>"):]
        pre, rest = body.split("<SUF>", 1)
        suf, midd = rest.split("<MID>", 1)
        orig = df.loc[df["doc_id"] == r["doc_id"], "text"].iloc[0]
        assert pre + midd + suf == orig
    unsel = out[~out["t2_fim"]]
    for _, r in unsel.head(5).iterrows():
        assert r["t2"] == df.loc[df["doc_id"] == r["doc_id"], "text"].iloc[0]


def test_deterministic_shuffle_is_stable_and_epoch_varying(ray_session):
    import ray.data

    from tenzir_ray.stages.splits import deterministic_shuffle

    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64)})
    runs = []
    for parts in (1, 7):
        out = deterministic_shuffle(
            ray.data.from_pandas(df).repartition(parts), key="doc_id",
            epoch=1, rank="r").to_pandas().sort_values("doc_id")
        runs.append(out["r"].tolist())
    assert runs[0] == runs[1]  # partitioning-independent
    assert sorted(runs[0]) == list(range(300))  # a permutation
    e2 = deterministic_shuffle(ray.data.from_pandas(df), key="doc_id",
                               epoch=2, rank="r").to_pandas()
    assert e2.sort_values("doc_id")["r"].tolist() != runs[0]  # new epoch


def test_collate_segment_ids_alignment(ray_session):
    """segment_ids parallels input_ids: doc j's kept tokens carry j
    (1-based), padding carries 0."""
    import ray.data

    from tenzir_ray.stages.chunk import collate_packed

    df = pd.DataFrame({
        "seq": [0, 0, 0], "ord": [1, 2, 3],
        "ids": [np.arange(3, dtype=np.int32),
                np.arange(10, 14, dtype=np.int32),
                np.arange(50, 60, dtype=np.int32)],
    })
    out = collate_packed(ray.data.from_pandas(df), "ord", "ids", 10,
                         seq_col="seq", segment_ids=True).to_pandas()
    seg = np.asarray(out["segment_ids"].iloc[0])
    # 3 tokens of doc1, 4 of doc2, then doc3 truncated at 10
    assert seg.tolist() == [1, 1, 1, 2, 2, 2, 2, 3, 3, 3]
    # padding case
    out2 = collate_packed(ray.data.from_pandas(df.head(1)), "ord",
                          "ids", 6, seq_col="seq",
                          segment_ids=True).to_pandas()
    assert np.asarray(out2["segment_ids"].iloc[0]).tolist() == [1, 1, 1, 0, 0, 0]


def test_render_chat_text_spans_cover_assistant_content(ray_session):
    """Loss spans index exactly the assistant turns' content inside the
    rendered string."""
    import ray.data

    from tenzir_ray.stages.transcripts import render_chat_text

    df = pd.DataFrame({
        "conv_id": ["c1"] * 3 + ["c2"] * 2,
        "turn_idx": [0, 1, 2, 0, 1],
        "role": ["user", "assistant", "assistant", "user", None],
        "text": ["hi", "hello there", "bye", "solo", "x"],
    })
    out = (render_chat_text(ray.data.from_pandas(df))
           .to_pandas().set_index("conv_id"))
    r1 = out.loc["c1"]
    for s, e in zip(r1["span_starts"], r1["span_ends"]):
        assert r1["text"][s:e] in ("hello there", "bye")
    assert len(r1["span_starts"]) == 2
    r2 = out.loc["c2"]
    assert list(r2["span_starts"]) == []  # null role never matches
    assert "<|im_start|>\nx<|im_end|>" in r2["text"]


def test_fim_transform_null_and_bad_keys(ray_session):
    """Null keys pass through unselected; non-numeric key columns raise
    instead of crashing the task opaquely; negative keys raise."""
    import ray.data

    from tenzir_ray.stages.text import fim_transform

    df = pd.DataFrame({"k": pd.array([1, None, 3], dtype="Int64"),
                       "text": ["aaa bbb"] * 3})
    out = fim_transform(ray.data.from_pandas(df), key="k",
                        rate=1.0, out="t2").to_pandas()
    assert not out.loc[out["k"].isna(), "t2_fim"].any()
    assert out.loc[out["k"].notna(), "t2_fim"].all()

    bad = pd.DataFrame({"k": ["x"], "text": ["t"]})
    with pytest.raises(Exception, match="numeric"):
        fim_transform(ray.data.from_pandas(bad), key="k",
                      rate=1.0).to_pandas()
    neg = pd.DataFrame({"k": [-5], "text": ["t"]})
    with pytest.raises(Exception, match="egative"):
        fim_transform(ray.data.from_pandas(neg), key="k",
                      rate=1.0).to_pandas()


def test_span_corrupt_roundtrip(ray_session):
    """Input with sentinels + target reassemble the original document;
    unselected rows keep text and a null target."""
    import ray.data

    from tenzir_ray.stages.text import span_corrupt

    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                       "text": ["alpha beta gamma delta %d" % i
                                for i in range(120)]})
    out = span_corrupt(ray.data.from_pandas(df), key="doc_id",
                       rate=0.6).to_pandas()
    sel = out[out["corrupt_target"].notna()]
    assert 0 < len(sel) < 120
    for _, r in sel.head(25).iterrows():
        pre, rest = r["corrupt_input"].split("<extra_id_0>", 1)
        midgap, post = rest.split("<extra_id_1>", 1)
        t = r["corrupt_target"]
        span1, span2 = t[len("<extra_id_0>"):].split("<extra_id_1>", 1)
        orig = df.loc[df["doc_id"] == r["doc_id"], "text"].iloc[0]
        assert pre + span1 + midgap + span2 + post == orig
    unsel = out[out["corrupt_target"].isna()]
    for _, r in unsel.head(5).iterrows():
        assert r["corrupt_input"] == \
            df.loc[df["doc_id"] == r["doc_id"], "text"].iloc[0]


def test_tql2_randomized_equivalence_with_dict_pipelines(ray_session,
                                                         tmp_path):
    """Randomized TQL2 programs (where/select/sort/summarize/move over
    random tables) must equal the equivalent dict-form Pipeline."""
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines.pipeline import Pipeline
    from tenzir_ray.pipelines.tql2 import run_pipeline2

    rng = np.random.default_rng(77)
    p = tmp_path / "t.parquet"
    n = 500
    pq.write_table(pa.table({
        "a": rng.integers(0, 50, n),
        "b": rng.normal(size=n).round(3),
        "c": rng.choice(["x", "y", "z"], n),
    }), p)

    for trial in range(8):
        thresh = int(rng.integers(5, 45))
        asc = bool(rng.integers(0, 2))
        prog = f"""
            from "{p}"
            where a > {thresh}
            move a2=a
            summarize n=count(), sa=sum(a2), sb=sum(b) by c
            sort {'' if asc else '-'}n, c
        """
        spec = Pipeline([
            {"op": "read_parquet", "paths": str(p)},
            {"op": "where", "expr": f"a > {thresh}"},
            {"op": "set", "a2": "a"},
            {"op": "drop", "columns": ["a"]},
            {"op": "summarize", "by": "c",
             "aggs": {"n": "count(*)", "sa": "sum(a2)",
                      "sb": "sum(b)"}},
            {"op": "sort", "keys": ["n", "c"],
             "descending": [not asc, False]},
        ]).run()
        got = run_pipeline2(prog)
        # compare IN ORDER: the randomized sort direction and the moved
        # column's VALUES (sum over a2) are both under test
        g = (got.to_pandas() if not isinstance(got, pd.DataFrame)
             else got).reset_index(drop=True)
        w = (spec.to_pandas() if not isinstance(spec, pd.DataFrame)
             else spec).reset_index(drop=True)
        assert g["c"].tolist() == w["c"].tolist(), trial
        assert g["n"].tolist() == w["n"].tolist(), trial
        assert g["sa"].tolist() == w["sa"].tolist(), trial
        assert np.allclose(g["sb"], w["sb"]), trial
        ns = g["n"].tolist()
        assert ns == sorted(ns, reverse=not asc), trial


def test_truncate_and_quantize_embeddings(ray_session):
    import ray.data

    from tenzir_ray.stages.similarity import (
        quantize_embeddings,
        truncate_embeddings,
    )

    vecs = [np.array([3.0, 4.0, 0.0, 12.0]),
            np.array([0.0, 0.0, 0.0, 0.0]),
            np.array([-1.0, 2.0, -3.0, 4.0])]
    t = pa.table({"vec_id": [0, 1, 2], "embedding": vecs})
    out = truncate_embeddings(ray.data.from_arrow(t), dims=2,
                              out="t2").to_pandas().sort_values("vec_id")
    t2 = np.stack(out["t2"].to_numpy())
    assert np.allclose(t2[0], [0.6, 0.8])  # 3-4-5 renormalized
    assert np.all(t2[1] == 0)  # zero vector stays zero (no NaN)
    q = quantize_embeddings(ray.data.from_arrow(t)).to_pandas().sort_values("vec_id")
    q0 = np.asarray(q["qvec"].iloc[0])
    assert q0.tolist() == [32, 42, 0, 127]  # round(127*x/12)
    assert q["qscale"].iloc[0] == 12.0
    assert np.asarray(q["qvec"].iloc[1]).tolist() == [0, 0, 0, 0]
    assert q["qscale"].iloc[1] == 0.0
    # reconstruction error bounded by scale/254 per component
    rec = q0 * 12.0 / 127.0
    assert np.abs(rec - vecs[0]).max() <= 12.0 / 254 + 1e-12


def test_quantized_topk_high_recall(ray_session):
    import ray.data

    from tenzir_ray.stages.similarity import (
        brute_force_topk,
        quantize_embeddings,
        quantized_topk,
    )

    rng = np.random.default_rng(21)
    vecs = rng.normal(size=(500, 24)).astype(np.float64)
    ds = ray.data.from_arrow(pa.table({"vec_id": np.arange(500),
                                       "embedding": list(vecs)}))
    q = vecs[:3]
    exact = brute_force_topk(ds, q, k=10).to_pandas()
    approx = quantized_topk(quantize_embeddings(ds).drop_columns(["embedding"]),
                            q, k=10).to_pandas()
    for qi in range(3):
        e = set(exact.loc[exact["query_idx"] == qi, "vec_id"])
        a = set(approx.loc[approx["query_idx"] == qi, "vec_id"])
        assert len(e & a) / 10 >= 0.9, (qi, e, a)


def test_embed_ops_empty_batches(ray_session):
    """Filtered-to-empty upstream blocks must not crash the embedding
    ops (the _to_matrix reshape rejects 0-row input)."""
    import ray.data

    from tenzir_ray.stages.similarity import (
        quantize_embeddings,
        truncate_embeddings,
    )

    t = pa.table({"vec_id": [1, 2], "embedding": [np.ones(4), np.ones(4)]})
    ds = (ray.data.from_arrow(t).repartition(2)
          .filter(lambda r: r["vec_id"] < 0))
    assert truncate_embeddings(ds, dims=2).count() == 0
    assert quantize_embeddings(ds).count() == 0


def test_selection_constant_synced_with_hash_split():
    from tenzir_ray.stages.splits import _KNUTH
    from tenzir_ray.stages.text import _SELECT_A1

    assert _SELECT_A1 == int(_KNUTH)


def test_iter_training_batches_shapes(ray_session):
    import ray.data

    from tenzir_ray.stages.chunk import collate_packed, iter_training_batches

    df = pd.DataFrame({
        "seq": np.repeat(np.arange(6), 2),
        "ord": np.arange(12),
        "ids": [np.arange(i + 1, dtype=np.int32) for i in range(12)],
    })
    coll = collate_packed(ray.data.from_pandas(df), "ord", "ids", 8,
                          seq_col="seq", segment_ids=True)
    seen = 0
    for batch in iter_training_batches(coll, batch_size=4):
        assert batch["input_ids"].ndim == 2
        assert batch["input_ids"].shape[1] == 8
        assert batch["segment_ids"].shape == batch["input_ids"].shape
        assert batch["n_docs"].ndim == 1
        seen += len(batch["n_docs"])
    assert seen == 6


def test_hash_select_rejects_float_keys(ray_session):
    """Non-integral numeric keys would silently truncate against the
    SQL oracle — must raise."""
    import ray.data

    from tenzir_ray.stages.text import fim_transform

    df = pd.DataFrame({"k": [1.0, 3.7], "text": ["a", "b"]})
    with pytest.raises(Exception, match="integral"):
        fim_transform(ray.data.from_pandas(df), key="k",
                      rate=1.0).to_pandas()


def test_quantize_rejects_nonfinite(ray_session):
    import ray.data

    from tenzir_ray.stages.similarity import quantize_embeddings

    t = pa.table({"vec_id": [1], "embedding": [np.array([1.0, np.nan])]})
    with pytest.raises(Exception, match="non-finite"):
        quantize_embeddings(ray.data.from_arrow(t)).to_pandas()


def test_tql2_reserved_names_rejected():
    from tenzir_ray.pipelines.tql2 import parse_pipeline2

    with pytest.raises(ValueError, match="reserved"):
        parse_pipeline2("move op=status")
    with pytest.raises(ValueError, match="reserved"):
        parse_pipeline2(
            'hash_join right=( from "x.parquet" ), op="drop"')
