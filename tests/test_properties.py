"""Property-based tests (hypothesis) for the pure CDC core functions —
beyond the reference's golden-corpus strategy (SURVEY §5 notes it has no
randomized testing)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from tenzir_ray.cdc.lake import _lww_mask
from tenzir_ray.cdc.registry import SchemaRegistry, widen


@st.composite
def _events(draw):
    n = draw(st.integers(1, 200))
    convs = draw(st.lists(st.integers(0, 10), min_size=n, max_size=n))
    turns = draw(st.lists(st.integers(0, 5), min_size=n, max_size=n))
    lsns = draw(
        st.lists(st.integers(0, 10**6), min_size=n, max_size=n, unique=True)
    )
    return np.array(lsns, np.int64), np.array(convs, np.int64), np.array(turns, np.int64)


@st.composite
def _pred_tables(draw):
    n = draw(st.integers(0, 60))
    vals = draw(st.lists(st.one_of(st.none(), st.integers(-5, 5)),
                         min_size=n, max_size=n))
    tools = draw(st.lists(st.one_of(st.none(), st.sampled_from(["a", "b"])),
                          min_size=n, max_size=n))
    return pa.table({
        "x": pa.array(vals, pa.int64()),
        "tool": pa.array(tools, pa.string()),
    })


@given(_pred_tables(),
       st.sampled_from(["x > 2", "tool == 'a'", "x > 0 and tool == 'b'",
                        "tool != 'a'", "x == null"]))
@settings(max_examples=150, deadline=None)
def test_filter_mask_complement_partitions_rows(tbl, pred):
    """Filter.mask must agree with Filter.apply row-for-row, and its
    complement must be exactly the rows apply drops — the contract
    filter_conversations' all-mode counter-example stream relies on
    (null predicates land in the complement)."""
    from tenzir_ray.expr import compile_filter

    f = compile_filter(pred)
    kept = f.apply(tbl)
    mask = f.mask(tbl)
    assert int(mask.sum()) == kept.num_rows
    assert tbl.filter(pa.array(mask)).equals(kept)
    comp = tbl.filter(pa.array(~mask))
    assert comp.num_rows + kept.num_rows == tbl.num_rows


@given(_events())
@settings(max_examples=200, deadline=None)
def test_lww_mask_matches_naive(ev):
    lsn, conv, turn = ev
    mask = _lww_mask(lsn, conv, turn)
    # naive: per key, winner = max lsn
    best = {}
    for i in range(len(lsn)):
        k = (conv[i], turn[i])
        if k not in best or lsn[i] > lsn[best[k]]:
            best[k] = i
    expect = np.zeros(len(lsn), dtype=bool)
    for i in best.values():
        expect[i] = True
    assert (mask == expect).all()
    # exactly one winner per key
    assert mask.sum() == len(best)


_types = st.sampled_from(
    [pa.int8(), pa.int16(), pa.int32(), pa.int64(), pa.uint8(), pa.uint32(),
     pa.float32(), pa.float64(), pa.string(), pa.timestamp("s"),
     pa.timestamp("us"), pa.timestamp("ns"), pa.null()]
)


@given(_types, _types)
@settings(max_examples=200, deadline=None)
def test_widen_commutative_and_idempotent(a, b):
    try:
        w1 = widen(a, b)
    except TypeError:
        # incompatible pair must be incompatible both ways
        try:
            widen(b, a)
            raised = False
        except TypeError:
            raised = True
        assert raised
        return
    w2 = widen(b, a)
    assert w1.equals(w2), (a, b, w1, w2)
    # widening is monotone: widening again with either input is a no-op
    assert widen(w1, a).equals(w1)
    assert widen(w1, b).equals(w1)


@given(_types, _types, _types)
@settings(max_examples=100, deadline=None)
def test_widen_associative(a, b, c):
    try:
        left = widen(widen(a, b), c)
        right = widen(a, widen(b, c))
    except TypeError:
        return  # any incompatibility short-circuits; order may differ
    assert left.equals(right), (a, b, c, left, right)


@given(st.lists(st.sampled_from(["a", "b", "c", "lang"]), min_size=1, max_size=4, unique=True))
@settings(max_examples=50, deadline=None)
def test_registry_conform_total(names):
    reg = SchemaRegistry()
    reg.evolve(pa.schema([(n, pa.int64()) for n in names]))
    reg.evolve(pa.schema([("extra", pa.string())]))
    tbl = pa.table({names[0]: pa.array([1, 2], pa.int32())})
    out = reg.conform(tbl)
    assert out.schema.equals(reg.schema)
    assert out.num_rows == 2


# ---------------------------------------------------------------- ddsketch


@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6,
                       allow_nan=False, allow_infinity=False),
             min_size=1, max_size=300),
    st.sampled_from([0.25, 0.5, 0.9, 0.99]),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=100, deadline=None)
def test_ddsketch_merge_invariant_and_error_bound(vals, q, nsplits):
    """Sketch(all values) == merge(sketches of any split) — and the
    finalized quantile is within the DDSketch relative-error guarantee
    of the exact empirical quantile (same rank convention: element at
    floor/ceil of q*(n-1))."""
    import numpy as np
    import pyarrow as pa

    from tenzir_ray.stages.summarize import _ddsketch

    agg = _ddsketch("v", "q", q=q, alpha=0.01)
    acc_all = agg.init(None)
    acc_all = agg.accumulate_block(acc_all, pa.table({"v": vals}))

    # arbitrary split points
    n = len(vals)
    cuts = sorted({(i * n) // nsplits for i in range(1, nsplits)})
    parts, prev = [], 0
    for c in cuts + [n]:
        parts.append(vals[prev:c])
        prev = c
    acc_m = agg.init(None)
    for p in parts:
        a = agg.accumulate_block(agg.init(None), pa.table({"v": p or []}))
        acc_m = agg.merge(acc_m, a)
    assert acc_all == acc_m  # byte-identical accumulators

    est = agg.finalize(acc_all)
    ordered = np.sort(np.asarray(vals, dtype=np.float64))
    rank = q * (n - 1)
    lo_v, hi_v = ordered[int(np.floor(rank))], ordered[int(np.ceil(rank))]
    # the sketch answers SOME element within one rank step; check the
    # relative-error bound against the closest of the two rank neighbors
    tol = lambda x: 0.0101 * abs(x) + 1e-12
    ok = (abs(est - lo_v) <= tol(lo_v)) or (abs(est - hi_v) <= tol(hi_v))
    assert ok, (est, lo_v, hi_v, q)


@given(
    st.lists(st.tuples(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        st.floats(min_value=0.01, max_value=50, allow_nan=False),
    ), min_size=0, max_size=20),
    st.lists(st.floats(min_value=-200, max_value=200, allow_nan=False),
             min_size=0, max_size=60),
)
@settings(max_examples=60, deadline=None)
def test_range_joiner_matches_bruteforce(ray_session, intervals, values):
    """_RangeJoiner (interval-stabbing kernel) == O(n*m) brute force,
    including overlapping intervals and boundary values."""
    import numpy as np
    import pyarrow as pa

    from tenzir_ray.stages.join import _RangeJoiner

    lo = np.array([a for a, w in intervals], dtype=np.float64)
    hi = lo + np.array([w for a, w in intervals], dtype=np.float64)
    right = pa.table({
        "rid": pa.array(np.arange(len(intervals), dtype=np.int64)),
        "lo": pa.array(lo), "hi": pa.array(hi),
    })

    class _Ref:
        pass

    import ray as ray_mod
    ref = ray_mod.put(right)
    j = _RangeJoiner(ref, on="v", lo="lo", hi="hi", how="inner", by=None,
                     rename_r={})
    batch = pa.table({
        "vid": pa.array(np.arange(len(values), dtype=np.int64)),
        "v": pa.array(np.asarray(values, dtype=np.float64)),
    })
    got = j(batch)
    got_pairs = sorted(zip(got.column("vid").to_pylist(),
                           got.column("rid").to_pylist()))
    want = sorted(
        (vi, ri)
        for vi, v in enumerate(values)
        for ri in range(len(intervals))
        if lo[ri] <= v < hi[ri]
    )
    assert got_pairs == want


@st.composite
def _grouped_frame(draw):
    n = draw(st.integers(1, 120))
    groups = draw(st.lists(
        st.one_of(st.integers(0, 5).map(lambda i: f"g{i}"), st.none()),
        min_size=n, max_size=n))
    vals = draw(st.lists(
        st.one_of(st.integers(-50, 50), st.none()),
        min_size=n, max_size=n))
    return groups, vals


@given(_grouped_frame())
@settings(max_examples=5, deadline=None)
def test_window_family_matches_duckdb_random(ray_session, gf):
    """Random frames with NULL group keys and NULL values: lag, running
    sum/count, and rank must agree with DuckDB row-for-row."""
    import duckdb
    import ray.data

    from tenzir_ray.stages.window import window_cum, window_rank, window_shift

    groups, vals = gf
    n = len(groups)
    T = pa.table({
        "id": pa.array(list(range(n)), pa.int64()),
        "g": pa.array(groups, pa.string()),
        "v": pa.array(vals, pa.int64()),
    })
    ds = ray.data.from_arrow(T)

    lag = (window_shift(ds, by="g", order_by="id", column="v", out="x")
           .to_pandas().sort_values("id", ignore_index=True))
    want = duckdb.sql(
        "SELECT id, lag(v) OVER (PARTITION BY g ORDER BY id) x "
        "FROM T ORDER BY id").df()
    assert lag["x"].fillna(-999).tolist() == want["x"].fillna(-999).tolist()

    cs = (window_cum(ds, by="g", order_by="id", column="v", fn="sum",
                     out="x")
          .to_pandas().sort_values("id", ignore_index=True))
    want = duckdb.sql(
        "SELECT id, sum(v) OVER (PARTITION BY g ORDER BY id "
        "ROWS UNBOUNDED PRECEDING) x FROM T ORDER BY id").df()
    assert cs["x"].fillna(-999).tolist() == want["x"].fillna(-999).tolist()

    rk = (window_rank(ds, by="g", order_by="v", method="rank", out="x")
          .to_pandas().sort_values("id", ignore_index=True))
    want = duckdb.sql(
        "SELECT id, rank() OVER (PARTITION BY g ORDER BY v) x "
        "FROM T ORDER BY id").df()
    assert rk["x"].tolist() == want["x"].astype("int64").tolist()


@st.composite
def _dup_corpus(draw):
    """Small corpora with planted shared substrings."""
    alphabet = "abcdefg "
    n_docs = draw(st.integers(2, 6))
    shared = draw(st.text(alphabet, min_size=12, max_size=30))
    docs = []
    for i in range(n_docs):
        pre = draw(st.text(alphabet, min_size=0, max_size=20))
        post = draw(st.text(alphabet, min_size=0, max_size=20))
        use = draw(st.booleans())
        docs.append(pre + (shared if use else "") + post)
    return docs


@given(_dup_corpus(), st.integers(6, 10))
@settings(max_examples=6, deadline=None)
def test_duplicate_spans_matches_naive_random(ray_session, docs, k):
    """duplicate_spans vs a direct substring-counting oracle on random
    corpora with planted shared runs."""
    import ray.data

    from tenzir_ray.stages.dedup import duplicate_spans

    T = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    got = duplicate_spans(ray.data.from_arrow(T), k=k).to_pandas()

    # naive oracle: char-level gram -> set of docs; duplicated positions
    # are those whose k-gram appears in >= 2 distinct docs; merge spans
    from collections import defaultdict

    gram_docs = defaultdict(set)
    for d, s in enumerate(docs):
        for i in range(len(s) - k + 1):
            gram_docs[s[i:i + k]].add(d)
    want = {}
    for d, s in enumerate(docs):
        hits = [i for i in range(len(s) - k + 1)
                if len(gram_docs[s[i:i + k]]) >= 2]
        if not hits:
            continue
        spans = []
        start = prev = hits[0]
        for p in hits[1:]:
            if p - prev > k:
                spans.append((start, prev + k))
                start = p
            prev = p
        spans.append((start, prev + k))
        want[d] = (len(spans), sum(e - s0 for s0, e in spans))
    if not len(got):
        # Ray's empty-Dataset to_pandas drops the schema (known trap) —
        # an empty result can only be compared by emptiness
        assert want == {}
        return
    got_map = {r["doc_id"]: (r["dup_spans"], r["dup_chars"])
               for r in got.to_dict("records")}
    assert got_map == want


@st.composite
def _transcript_frame(draw):
    n = draw(st.integers(1, 100))
    convs = draw(st.lists(st.integers(0, 6).map(lambda i: f"c{i}"),
                          min_size=n, max_size=n))
    roles = draw(st.lists(st.sampled_from(["user", "assistant", "tool"]),
                          min_size=n, max_size=n))
    tools = draw(st.lists(st.one_of(st.none(), st.sampled_from(["a", "b"])),
                          min_size=n, max_size=n))
    texts = draw(st.lists(st.text(alphabet="ab x", max_size=8),
                          min_size=n, max_size=n))
    return convs, roles, tools, texts


@given(_transcript_frame())
@settings(max_examples=5, deadline=None)
def test_transcript_family_matches_duckdb_random(ray_session, tf):
    """Random transcript tables (NULL tools, empty/whitespace texts):
    conversation_stats, tool_sequences and filter_conversations must
    agree with DuckDB row-for-row."""
    import duckdb
    import pandas as pd
    import ray.data

    from tenzir_ray.stages.transcripts import (conversation_stats,
                                               filter_conversations,
                                               tool_sequences)

    convs, roles, tools, texts = tf
    n = len(convs)
    T = pa.table({
        "conv_id": pa.array(convs, pa.string()),
        "turn_idx": pa.array(list(range(n)), pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array([1000 + i for i in range(n)], pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(T).repartition(3)

    got = (conversation_stats(ds).to_pandas()
           .sort_values("conv_id", ignore_index=True))
    want = duckdb.sql("""
        SELECT conv_id, count(*) AS n_turns, count(tool) AS n_tool_calls,
               sum(length(text)) AS total_chars,
               min(ts) AS first_ts, max(ts) AS last_ts,
               max(turn_idx) AS max_turn
        FROM T GROUP BY conv_id ORDER BY conv_id""").df()
    for c in ("n_turns", "n_tool_calls", "total_chars", "max_turn"):
        assert got[c].astype("int64").tolist() == \
            want[c].astype("int64").tolist(), c
    assert got["first_ts"].astype("datetime64[us]").tolist() == \
        want["first_ts"].astype("datetime64[us]").tolist()

    seq = tool_sequences(ds).to_pandas()
    wseq = duckdb.sql("""
        SELECT conv_id, count(*) AS n_calls,
               string_agg(tool, '->' ORDER BY turn_idx) AS tool_chain
        FROM T WHERE tool IS NOT NULL GROUP BY conv_id ORDER BY conv_id
    """).df()
    if len(wseq):
        seq = seq.sort_values("conv_id", ignore_index=True)
        assert seq["tool_chain"].tolist() == wseq["tool_chain"].tolist()
    else:
        assert len(seq) == 0

    kept = filter_conversations(ds, "tool == 'a'", mode="any",
                                keep=False).to_pandas()
    wkeep = duckdb.sql("""
        SELECT * FROM T WHERE conv_id NOT IN
            (SELECT conv_id FROM T WHERE tool = 'a')""").df()
    got_ids = sorted(kept["turn_idx"].tolist()) if len(kept) else []
    assert got_ids == sorted(wkeep["turn_idx"].tolist())

    # all-mode with a nullable predicate column (the null-semantics fix)
    alk = filter_conversations(ds, "tool != null", mode="all",
                               keep=True).to_pandas()
    walk = duckdb.sql("""
        SELECT * FROM T WHERE conv_id NOT IN
            (SELECT conv_id FROM T WHERE tool IS NULL)""").df()
    got_ids = sorted(alk["turn_idx"].tolist()) if len(alk) else []
    assert got_ids == sorted(walk["turn_idx"].tolist())
