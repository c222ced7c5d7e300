"""Deduplication family for training-data pipelines.

- exact_dedup: content-hash → hash-partitioned per-group first. The
  scalable exact path: a vectorized hash column inside ``map_batches``
  (combiner pre-dedup per batch), then one shuffle on the hash.
- minhash_lsh_dedup: shingle → minhash → band → bucket groupby →
  candidate groups; near-duplicates share any band bucket (the classic
  MinHash-LSH pipeline; Broder 1997 / Leskovec et al. MMDS, public).
- simhash: 64-bit Charikar simhash over token features.
- ngram_jaccard: verify candidate pairs by true n-gram Jaccard.
- embedding near-dup: see similarity.embedding_near_dup.

The reference only has streaming `deduplicate` (per-key copy limits,
builtins/operators/deduplicate.cpp:102) — content-based near-dup is part
of this engine's training-data extension surface.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa

from tenzir_ray._ship import ship_by_value

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(ds, column: str = "text", keep_order_by: str | None = None,
                buckets: int | None = None):
    """Drop exact duplicate contents, keeping one row per distinct value
    (deterministic winner = min(keep_order_by), default min of itself).

    The content hash is only the SHUFFLE key (fine exchange buckets —
    8x cluster CPUs — with reduce tasks coalesced by measured bytes, so
    one vectorized pandas dedup per task, never a Python call per
    group); equality within a bucket is decided on the text itself, so
    a hash collision (expected ~3 at 10^10 docs for 64 bits) can never
    silently merge two distinct contents."""
    order = keep_order_by or column

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order, kind="mergesort")
        return df.drop_duplicates(subset=[column], keep="first")

    pre = ds.map_batches(_pre, batch_format="pandas")

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        return g.drop_duplicates(subset=[column], keep="first")

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(pre, [column], _first, num_buckets=buckets)


# ---------------------------------------------------------------------------
# line-level exact dedup (RefinedWeb-style)


def split_lines(ds, id_column: str = "doc_id", column: str = "text",
                sep: str = "\n"):
    """Explode documents into (id, line_idx, line) rows — fully
    vectorized (Arrow split + list_flatten; line indices from one
    cumsum, no per-row Python)."""
    import pyarrow.compute as pc

    def _explode(batch: pa.Table) -> pa.Table:
        # single-chunk required for list_parent_indices below
        col = batch.column(column).combine_chunks()
        parts = pc.split_pattern(pc.fill_null(col, ""), pattern=sep)
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts)
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        offsets = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        idx = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            offsets, lens
        )
        return pa.table({
            id_column: batch.column(id_column).take(parent),
            "line_idx": pa.array(idx, pa.int64()),
            "line": flat,
        })

    return ds.map_batches(_explode, batch_format="pyarrow")


def line_dedup(ds, id_column: str = "doc_id", column: str = "text",
               sep: str = "\n", buckets: int | None = None):
    """Corpus-wide exact LINE dedup (the RefinedWeb/MassiveText recipe,
    arXiv:2306.01116 §3: repeated boilerplate lines — headers, nav bars,
    license blurbs — are removed across documents, keeping only the
    first occurrence by (id, line_idx)):

    1. explode documents into lines (vectorized, :func:`split_lines`),
    2. keep the globally-first copy of each distinct line — the line
       TEXT is only the shuffle key of one packed exchange
       (grouped_apply: fine buckets, byte-coalesced tasks); the winner
       is a vectorized idxmin per bucket,
    3. reassemble each surviving document from its kept lines in
       original order (second grouped exchange keyed by id).

    Documents whose every line was a duplicate disappear (their text
    would be empty). Two shuffles total, both over (id, idx, line)
    triples — never the full document payload twice."""

    lines = split_lines(ds, id_column, column, sep)

    def _first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_column, "line_idx"], kind="mergesort")
        return df.drop_duplicates(subset=["line"], keep="first")

    from tenzir_ray.stages.exchange import grouped_apply

    kept = grouped_apply(lines, ["line"], _first, num_buckets=buckets)

    def _reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_column, "line_idx"], kind="mergesort")
        out = df.groupby(id_column, sort=True)["line"].agg(sep.join)
        return out.rename(column).reset_index()

    return grouped_apply(kept, [id_column], _reassemble,
                         num_buckets=buckets)


# ---------------------------------------------------------------------------
# minhash + LSH


class MinHasher:
    """Per-actor minhash signatures: k character-shingle hash functions via
    the (a*x + b) mod p universal family; parameters fixed by seed."""

    def __init__(self, column: str, num_hashes: int = 64, shingle: int = 5,
                 seed: int = 1234):
        self.column = column
        self.shingle = shingle
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.uint64)

    def shingle_hashes(self, text: str) -> np.ndarray:
        n = self.shingle
        if len(text) < n:
            text = text.ljust(n, "\0")
        codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        win = np.lib.stride_tricks.sliding_window_view(codes, n)
        powers = np.power(np.uint64(1_000_003), np.arange(n, dtype=np.uint64), dtype=np.uint64)
        return np.unique((win * powers[::-1]).sum(axis=1) & np.uint64(_MERSENNE))

    def signature(self, text: str) -> np.ndarray:
        x = self.shingle_hashes(text)
        # (k, m): a[:,None]*x + b, min over shingles
        vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # one pass over the whole batch: concatenate every row's shingle
        # hashes, apply all k hash functions as one (k, total) broadcast,
        # then per-row segment minima via minimum.reduceat — no per-row
        # Python matmuls
        texts = batch[self.column].fillna("")
        shingles = [self.shingle_hashes(t) for t in texts]
        counts = np.array([len(s) for s in shingles], dtype=np.int64)
        if len(shingles) == 0 or counts.sum() == 0:
            batch["minhash"] = [np.zeros(len(self.a), dtype=np.uint64)] * len(batch)
            return batch
        flat = np.concatenate(shingles)
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        # loop over the k hash functions, not over rows: each pass is one
        # vectorized (total,) transform + segment-min — peak memory stays
        # at one shingle-length temp instead of a (k × total) matrix
        mins = np.empty((len(counts), len(self.a)), dtype=np.uint64)
        m = np.uint64(_MERSENNE)
        for j in range(len(self.a)):
            vals = (self.a[j] * flat + self.b[j]) % m
            mins[:, j] = np.minimum.reduceat(vals, starts)
        batch["minhash"] = list(mins)
        return batch


def minhash(ds, column: str = "text", num_hashes: int = 64, shingle: int = 5,
            concurrency=None, batch_size: int = 1024, seed: int = 1234):
    """Attach a `minhash` list<uint64> signature column. Hash parameters
    are small seeded arrays — built once on the driver and shipped to
    stateless tasks (no actor-pool spin-up)."""
    return ds.map_batches(
        MinHasher(column, num_hashes, shingle, seed),
        batch_format="pandas", batch_size=batch_size,
    )


def minhash_lsh_dedup(ds, id_column: str, column: str = "text",
                      num_hashes: int = 64, bands: int = 16, shingle: int = 5,
                      concurrency=(1, 4)):
    """Near-duplicate clusters via MinHash-LSH banding.

    Returns a Dataset of ``(id_column, dup_group)`` where rows sharing a
    ``dup_group`` are near-duplicate candidates (same signature in ≥1
    band). dup_group = min id in the candidate cluster (per-band local
    union; full transitive closure would iterate min-label propagation —
    one round is the standard first-pass filter).

    Scale shape: explode to (band, band_hash, id) rows → one groupby on
    the (band, band_hash) bucket — skew-safe because bucket sizes are
    bounded by collision rate, not corpus size.
    """
    rows_per_band = num_hashes // bands
    with_sig = minhash(ds, column, num_hashes, shingle, concurrency=concurrency)

    band_pows = np.power(
        np.uint64(1_000_003), np.arange(rows_per_band, dtype=np.uint64), dtype=np.uint64
    )

    def _bands(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_column: [], "band": [], "band_hash": []})
        sigs = np.stack([np.asarray(s, dtype=np.uint64) for s in df["minhash"]])
        usable = bands * rows_per_band
        # (rows, bands, rpb) → deterministic polynomial hash per band (never
        # builtin hash(): PYTHONHASHSEED varies across workers)
        chunks = sigs[:, :usable].reshape(len(df), bands, rows_per_band)
        hashes = (chunks * band_pows[None, None, :]).sum(axis=2) % np.uint64(_MERSENNE)
        ids = np.repeat(df[id_column].to_numpy(), bands)
        band_ids = np.tile(np.arange(bands), len(df))
        return pd.DataFrame(
            {id_column: ids, "band": band_ids, "band_hash": hashes.reshape(-1).astype(np.int64)}
        )

    exploded = with_sig.map_batches(_bands, batch_format="pandas")

    # Label = min id sharing any band bucket. Two vectorized reductions —
    # never a Python call per bucket/id (50k docs → 800k bucket rows would
    # mean 800k map_groups invocations otherwise):
    # 1. per band (only `bands` groups), a C groupby-transform assigns each
    #    row its bucket's min id;
    def _label_per_band(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.groupby("band_hash")[id_column].transform("min")
        return pd.DataFrame({id_column: g[id_column], "dup_group": lab})

    labels = exploded.groupby("band").map_groups(
        _label_per_band, batch_format="pandas"
    )
    # 2. per id, keep the smallest label across bands. NOT Ray's native
    #    aggregate — it pays per-group Python overhead (measured 19s for
    #    5k groups); instead bucket ids and run one C pandas groupby-min
    #    per bucket (32 vectorized calls total).
    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["_b"] = pd.util.hash_array(df[id_column].to_numpy()) % 32
        return df

    def _min_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(id_column, as_index=False)["dup_group"].min()

    return (
        labels.map_batches(_bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(_min_per_bucket, batch_format="pandas")
    )


def _band_keys(sigs: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(rows, bands) combined band keys: deterministic polynomial hash of
    each band's signature slice, folded with the band index (so band 0's
    bucket space never collides with band 1's)."""
    pows = np.power(np.uint64(1_000_003),
                    np.arange(rows_per_band, dtype=np.uint64),
                    dtype=np.uint64)
    usable = bands * rows_per_band
    chunks = sigs[:, :usable].reshape(len(sigs), bands, rows_per_band)
    h = (chunks * pows[None, None, :]).sum(axis=2) % np.uint64(_MERSENNE)
    band_ids = np.arange(bands, dtype=np.uint64)[None, :]
    return (h * np.uint64(1_000_003) + band_ids) % np.uint64(_MERSENNE)


class _FuzzyBlockFilter:
    """Actor stage for fuzzy_decontaminate: hash params + the broadcast
    blocklist key array load once per actor; each batch's band keys are
    matched with one vectorized np.isin."""

    def __init__(self, keys_ref, column: str, num_hashes: int, bands: int,
                 shingle: int, seed: int, invert: bool):
        import ray

        self.mh = MinHasher(column, num_hashes, shingle, seed)
        self.keys = (keys_ref if isinstance(keys_ref, np.ndarray)
                     else ray.get(keys_ref))
        self.bands = bands
        self.rpb = num_hashes // bands
        self.invert = invert

    def __call__(self, df: pd.DataFrame):
        import pyarrow as _pa

        def _arrow(out: pd.DataFrame) -> "_pa.Table":
            # emit Arrow blocks: an (often-empty) filtered pandas block
            # with object columns trips Ray's block-size estimator
            # ("cannot call `vectorize` on size 0 inputs") on every
            # batch a filtered upstream empties
            return _pa.Table.from_pandas(
                out, preserve_index=False).replace_schema_metadata(None)

        if not len(df):
            return _arrow(df)
        df = self.mh(df.copy())
        sigs = np.stack([np.asarray(s, np.uint64) for s in df["minhash"]])
        keys = _band_keys(sigs, self.bands, self.rpb)
        hit = np.isin(keys, self.keys).any(axis=1)
        keep = hit if self.invert else ~hit
        return _arrow(df[keep].drop(columns=["minhash"]))


def fuzzy_decontaminate(corpus, blocklist, column: str = "text",
                        block_column: str | None = None,
                        num_hashes: int = 64, bands: int = 16,
                        shingle: int = 5, seed: int = 1234,
                        max_blocklist_keys: int = 50_000_000,
                        invert: bool = False):
    """NEAR-duplicate test-set decontamination — the fuzzy complement of
    :func:`tenzir_ray.stages.splits.decontaminate`'s exact-substring
    filter (the corpus-hygiene step training pipelines run against eval
    sets): drop every corpus row whose ``column`` shares ANY MinHash-LSH
    band bucket with a blocklist row (same banding math as
    :func:`minhash_lsh_dedup`; both sides use the same seeded hash
    family, so an exact copy ALWAYS matches and near-copies match with
    the standard S-curve probability in the (bands, rows-per-band)
    knobs). ``invert=True`` keeps only the matches (audit mode).

    Scale shape: the blocklist (an eval/test set — small by definition)
    is reduced to its DISTINCT band keys (≤ rows x bands uint64s,
    size-gated by ``max_blocklist_keys``), broadcast once via
    ``ray.put``, and the corpus streams through a stateless filter with
    one vectorized ``np.isin`` per batch — the corpus is never shuffled,
    joined, or materialized."""
    import ray

    qcol = block_column or column
    rpb = num_hashes // bands
    sig_b = minhash(blocklist, qcol, num_hashes, shingle, seed=seed)

    def _keys_only(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"_k": np.array([], np.uint64)})
        sigs = np.stack([np.asarray(s, np.uint64) for s in df["minhash"]])
        return pd.DataFrame(
            {"_k": _band_keys(sigs, bands, rpb).reshape(-1)})

    parts = sig_b.map_batches(_keys_only, batch_format="pandas")
    # an all-empty blocklist yields blocks that kept the INPUT schema
    # (Ray skips the transform on empty blocks) — filter by column
    arrs = [
        t.column("_k").to_numpy(zero_copy_only=False).astype(np.uint64)
        for t in ray.get(parts.to_arrow_refs())
        if "_k" in t.column_names and t.num_rows
    ]
    keys = np.unique(np.concatenate(arrs or [np.array([], np.uint64)]))
    if len(keys) > max_blocklist_keys:
        raise ValueError(
            f"fuzzy_decontaminate: blocklist produced {len(keys)} band "
            f"keys (> {max_blocklist_keys}) — that side should be the "
            "small eval set; raise max_blocklist_keys deliberately if so"
        )
    kref = ray.put(keys)
    return corpus.map_batches(
        _FuzzyBlockFilter,
        fn_constructor_args=(kref, column, num_hashes, bands, shingle,
                             seed, invert),
        batch_format="pandas", concurrency=(1, 8),
    )


# ---------------------------------------------------------------------------
# simhash


class SimHasher:
    """64-bit Charikar simhash over word tokens."""

    def __init__(self, column: str, out: str = "simhash"):
        self.column = column
        self.out = out

    def _sim(self, text: str) -> int:
        words = text.lower().split()
        if not words:
            return 0
        hashes = pd.util.hash_array(np.asarray(words, dtype=object)).astype(np.uint64)
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized across the batch: hash all words once, then per bit a
        # segment-sum of ±1 votes (bit-loop, like MinHasher — no per-row
        # broadcasting matrices)
        toks = batch[self.column].fillna("").str.lower().str.split()
        counts = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        if counts.sum() == 0:
            batch[self.out] = np.zeros(len(batch), dtype=np.uint64)
            return batch
        flat_words = np.concatenate(
            [np.asarray(w, dtype=object) if len(w) else np.empty(0, object) for w in toks]
        )
        hashes = pd.util.hash_array(flat_words).astype(np.uint64)
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        empty = counts == 0
        sig = np.zeros(len(counts), dtype=np.uint64)
        for b in range(64):
            votes = (((hashes >> np.uint64(b)) & np.uint64(1)).astype(np.int64) * 2 - 1)
            seg = np.add.reduceat(votes, np.minimum(starts, len(hashes) - 1))
            sig |= np.where(~empty & (seg > 0), np.uint64(1) << np.uint64(b), np.uint64(0))
        sig[empty] = 0
        batch[self.out] = sig
        return batch


def simhash(ds, column: str = "text", batch_size: int = 2048):
    return ds.map_batches(
        SimHasher(column), batch_format="pandas", batch_size=batch_size
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verification


def ngram_jaccard_pairs(ds, pairs: list[tuple], id_column: str,
                        column: str = "text", ngram: int = 3):
    """Verify candidate duplicate pairs by true word-n-gram Jaccard.

    ``pairs`` is a small candidate list (from LSH); the texts are fetched
    via a broadcast filter and compared on the driver-side small result.
    Returns a pyarrow Table (id_a, id_b, jaccard).
    """
    import ray

    wanted = sorted({i for p in pairs for i in p})
    small = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_column], pa.array(wanted))),
        batch_format="pyarrow",
    ).to_pandas()
    texts = dict(zip(small[id_column], small[column]))

    def grams(s):
        toks = (s or "").lower().split()
        return {tuple(toks[i : i + ngram]) for i in range(max(0, len(toks) - ngram + 1))}

    rows = []
    for a, b in pairs:
        ga, gb = grams(texts.get(a, "")), grams(texts.get(b, ""))
        j = len(ga & gb) / max(1, len(ga | gb))
        rows.append({"id_a": a, "id_b": b, "jaccard": j})
    return pa.Table.from_pylist(rows)


def _driver_union_find(edges_tbl: "pa.Table", node_col: str) -> "pa.Table":
    """Exact components over an edge table that FITS on the driver (two
    int64 columns): VECTORIZED iterated min-label with pointer jumping —
    each pass is O(E) numpy (np.minimum.at both directions) followed by
    label[label] jumping to a fixpoint; passes needed ≈ log(diameter).
    2M edges ≈ tens of milliseconds, never a per-edge Python loop."""
    a = edges_tbl.column("node").to_numpy(zero_copy_only=False)
    b = edges_tbl.column("peer").to_numpy(zero_copy_only=False)
    nodes, codes = np.unique(np.r_[a, b], return_inverse=True)
    ca, cb = codes[: len(a)], codes[len(a) :]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = label.sum()
        np.minimum.at(label, ca, label[cb])
        np.minimum.at(label, cb, label[ca])
        while True:  # pointer jumping: label <- label[label]
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if label.sum() == before:
            break
    # nodes is sorted ascending, so the min label INDEX in a component
    # names its min node id
    return pa.table(
        {node_col: pa.array(nodes, pa.int64()),
         "component": pa.array(nodes[label], pa.int64())}
    )


def connected_components(pairs_ds, node_col: str = "id_a", peer_col: str = "id_b",
                         max_iters: int = 10, buckets: int = 32,
                         driver_threshold: int = 2_000_000):
    """Connected components with a size-gated hybrid:

    - edge lists that PROVABLY fit on the driver (≤ ``driver_threshold``
      rows, two int64 columns — 2M edges ≈ 32 MB) run exact union-find
      locally (milliseconds, no iteration);
    - larger graphs run the fully distributed iterative min-label
      propagation: the label table stays a ``ray.data.Dataset``
      end-to-end — propagation is a co-bucketed hash merge of edges with
      labels (typed int padding through the union, vectorized pandas
      merge per bucket), and the ONLY driver-side state is one scalar
      per round (labels are non-increasing ints, so ``sum(label)`` is
      monotone and unchanged ⟺ fixpoint). Rounds needed = graph
      diameter. Node ids must be integers.

    Input: a Dataset of undirected edges. Returns (node, component) with
    component = min node id in the component.
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum as _Sum

    def _sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat([df[node_col], df[peer_col]], ignore_index=True).astype(np.int64),
                "peer": pd.concat([df[peer_col], df[node_col]], ignore_index=True).astype(np.int64),
            }
        )

    # bound the block count up front: the input often arrives as hundreds
    # of tiny blocks (post-LSH), and iterated union+groupby would multiply
    # block counts each round — driver scheduling cost then dwarfs compute
    edges = (
        pairs_ds.map_batches(_sym, batch_format="pandas")
        .repartition(buckets)
        .materialize()
    )

    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table({node_col: pa.array([], pa.int64()),
                      "component": pa.array([], pa.int64())})
        )
    if n_edges <= driver_threshold:
        tbl = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow"))
        )
        return ray.data.from_arrow(_driver_union_find(tbl, node_col))

    def _bucket_by(col: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_b"] = (pd.util.hash_array(df[col].to_numpy()) % buckets).astype(np.int64)
            return df

        return f

    # initial labels: each node's min direct neighbor (or itself)
    def _min_peer(g: pd.DataFrame) -> pd.DataFrame:
        m = g.drop(columns=["_b"]).groupby("node", as_index=False)["peer"].min()
        return pd.DataFrame(
            {"node": m["node"], "label": np.minimum(m["node"], m["peer"])}
        )

    labels = (
        edges.map_batches(_bucket_by("node"), batch_format="pandas")
        .groupby("_b")
        .map_groups(_min_peer, batch_format="pandas")
        .repartition(buckets)
        .materialize()
    )
    prev_sum = labels.aggregate(_Sum("label"))["sum(label)"]

    # padded-union schemas (typed int sentinels — object-dtype padding
    # would force pickled blocks through the shuffle)
    def _pad_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": df["node"], "peer": df["peer"],
                "_plab": np.full(len(df), -1, np.int64),
                "_is_lab": np.zeros(len(df), np.int8),
            }
        )

    def _pad_labels(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.full(len(df), -1, np.int64),
                "peer": df["node"], "_plab": df["label"],
                "_is_lab": np.ones(len(df), np.int8),
            }
        )

    def _prop_join(g: pd.DataFrame) -> pd.DataFrame:
        is_lab = g["_is_lab"].to_numpy() == 1
        e = g.loc[~is_lab, ["node", "peer"]]
        l = g.loc[is_lab, ["peer", "_plab"]]
        m = e.merge(l, on="peer", how="inner")
        return pd.DataFrame({"node": m["node"], "label": m["_plab"]})

    def _min_label(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns=["_b"]).groupby("node", as_index=False)["label"].min()

    for _ in range(max_iters):
        # propagate each node's label to its neighbors: co-bucket edges
        # (by peer) with labels (by node) and hash-merge per bucket
        unioned = edges.map_batches(_pad_edges, batch_format="pandas").union(
            labels.map_batches(_pad_labels, batch_format="pandas")
        )
        proposed = (
            unioned.map_batches(_bucket_by("peer"), batch_format="pandas")
            .groupby("_b")
            .map_groups(
                lambda g: _prop_join(g.drop(columns=["_b"])),
                batch_format="pandas",
            )
        )
        labels = (
            proposed.union(labels)
            .map_batches(_bucket_by("node"), batch_format="pandas")
            .groupby("_b")
            .map_groups(_min_label, batch_format="pandas")
            .repartition(buckets)
            .materialize()
        )
        cur_sum = labels.aggregate(_Sum("label"))["sum(label)"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.map_batches(
        lambda df: df.rename(columns={"node": node_col, "label": "component"}),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# exact duplicate-span detection (cross-document substring dedup)

_SPAN_BASES = (np.uint64(0x100000001B3), np.uint64(0x9E3779B97F4A7C15))
_SPAN_INV = tuple(np.uint64(pow(int(b), -1, 1 << 64)) for b in _SPAN_BASES)


def _rolling_hashes(codes: np.ndarray, k: int, base: np.uint64,
                    invbase: np.uint64) -> np.ndarray:
    """All k-wide window hashes of ``codes`` in O(n), vectorized.

    Polynomial hash with ascending powers mod 2^64 (uint64 wraparound):
    ``H[i] = sum_j codes[i+j] * base**j``. Computed from one prefix sum
    ``P[i] = sum_{j<=i} codes[j]*base**j`` as ``(P[i+k-1]-P[i-1]) *
    invbase**i`` — odd bases are invertible mod 2^64, so the
    normalization is exact, not approximate."""
    n = codes.size
    m = n - k + 1
    pw = np.full(n, base, dtype=np.uint64)
    pw[0] = 1
    np.multiply.accumulate(pw, out=pw)
    P = codes.astype(np.uint64) * pw
    np.add.accumulate(P, out=P)
    low = np.empty(m, dtype=np.uint64)
    low[0] = 0
    low[1:] = P[: m - 1]
    ipw = np.full(m, invbase, dtype=np.uint64)
    ipw[0] = 1
    np.multiply.accumulate(ipw, out=ipw)
    return (P[k - 1:] - low) * ipw


class _SpanGrams:
    """Stage 1 of duplicate_spans: explode each document into one row per
    k-char window — ``(h1, h2, id, pos)``, 28 bytes fixed width. The
    window hash is double 64-bit (two independent odd bases), so a
    cross-pair collision needs both to collide (~2^-128): grouping on
    (h1, h2) is equality for any real corpus size."""

    def __init__(self, column: str, id_col: str, k: int):
        self.column, self.id_col, self.k = column, id_col, k

    def __call__(self, t: pa.Table) -> pa.Table:
        k = self.k
        id_type = t.schema.field(self.id_col).type
        ids = t.column(self.id_col).to_pylist()
        texts = t.column(self.column).to_pylist()
        h1s, h2s, out_pos = [], [], []
        id_vals: list = []  # any id type (int, string/uuid, ...)
        for did, s in zip(ids, texts):
            if did is None or s is None or len(s) < k:
                continue
            # code points (not UTF-8 bytes) so positions match the
            # oracle's character-based substr() on non-ASCII text too
            codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            codes = codes.astype(np.uint64)
            h1s.append(_rolling_hashes(codes, k, _SPAN_BASES[0], _SPAN_INV[0]))
            h2s.append(_rolling_hashes(codes, k, _SPAN_BASES[1], _SPAN_INV[1]))
            m = codes.size - k + 1
            id_vals.extend([did] * m)
            out_pos.append(np.arange(1, m + 1, dtype=np.int64))
        if not h1s:
            return pa.table({
                "h1": pa.array([], pa.uint64()),
                "h2": pa.array([], pa.uint64()),
                self.id_col: pa.array([], id_type),
                "pos": pa.array([], pa.int64()),
            })
        return pa.table({
            "h1": np.concatenate(h1s),
            "h2": np.concatenate(h2s),
            self.id_col: pa.array(id_vals, id_type),
            "pos": np.concatenate(out_pos),
        })



def _dup_hit_filter(id_col: str, min_docs: int):
    """Reduce-side filter shared by duplicate_spans/clip_duplicate_spans:
    keep (id, pos) rows whose (h1, h2) window hash occurs in >= min_docs
    DISTINCT documents."""

    def _dup_hits(df: pd.DataFrame) -> pa.Table:
        if len(df):
            nd = df.groupby(["h1", "h2"], sort=False)[id_col].transform(
                "nunique")
            df = df.loc[nd >= min_docs]
        # typed Arrow out: an empty pandas block would drop its schema
        # (the engine-wide Ray trap), breaking the all-unique corpus case
        return pa.Table.from_pandas(df[[id_col, "pos"]],
                                    preserve_index=False)

    return _dup_hits


def _merge_islands(df: pd.DataFrame, id_col: str, k: int) -> pd.DataFrame:
    """Merge duplicated window positions into maximal spans: one row per
    span with columns ``_doc`` / ``_s`` (1-based start) / ``_e``
    (exclusive end). Shared by the stats and clip operators so their
    span boundaries can never drift apart."""
    df = df.sort_values([id_col, "pos"], kind="mergesort")
    new_doc = df[id_col].ne(df[id_col].shift())
    gap = df["pos"].diff().gt(k)
    island = (new_doc | gap).cumsum()
    sp = df.groupby(island, sort=False).agg(
        _doc=(id_col, "first"), _s=("pos", "min"), _e=("pos", "max"))
    sp["_e"] += k
    return sp


def duplicate_spans(ds, column: str = "text", id_col: str = "doc_id",
                    k: int = 40, min_docs: int = 2,
                    buckets: int | None = None):
    """Exact cross-document duplicate-SPAN statistics: for every document,
    find the character positions whose k-char window also appears in at
    least ``min_docs - 1`` OTHER documents, merge overlapping windows
    into maximal spans, and emit ``(id_col, dup_spans, dup_chars)`` for
    documents containing at least one duplicated span.

    This is the exact-substring half of Lee et al., "Deduplicating
    Training Data Makes Language Models Better" (ACL 2022, public):
    their suffix-array dedup finds ≥k-char substrings shared across the
    corpus; the window/rolling-hash formulation here finds the same
    spans (a shared substring of length L ≥ k is exactly a run of
    L - k + 1 duplicated windows) with shuffle-friendly fixed-width
    rows instead of a monolithic suffix array.

    Scale shape: stage 1 explodes to one 28-byte row per character —
    the algorithm's published cost — streamed through the packed
    exchange (fine buckets on the 128-bit window hash, reduce tasks
    coalesced by measured bytes); stage 2 keeps only duplicated
    positions (corpus-dup-rate bound, tiny for clean corpora); stage 3
    is a per-document merge over that filtered set. No stage holds a
    document's neighbors, no driver materialization.
    """
    from tenzir_ray.stages.exchange import grouped_apply

    grams = ds.map_batches(
        _SpanGrams(column, id_col, k), batch_format="pyarrow",
        batch_size=1024,
    )

    hits = grouped_apply(grams, ["h1", "h2"],
                         _dup_hit_filter(id_col, min_docs),
                         num_buckets=buckets, tag="dupspan")

    def _merge_spans(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.Table.from_pandas(
                pd.DataFrame({id_col: df[id_col] if id_col in df
                              else pd.Series([], dtype="object"),
                              "dup_spans": pd.Series([], dtype="int64"),
                              "dup_chars": pd.Series([], dtype="int64")}),
                preserve_index=False)
        sp = _merge_islands(df, id_col, k)
        sp["_len"] = sp["_e"] - sp["_s"]
        out = sp.groupby("_doc", sort=False).agg(
            dup_spans=("_len", "size"), dup_chars=("_len", "sum"))
        out = out.reset_index().rename(columns={"_doc": id_col})
        out = out.astype({"dup_spans": "int64", "dup_chars": "int64"})
        return pa.Table.from_pandas(out, preserve_index=False)

    return grouped_apply(hits, [id_col], _merge_spans, num_buckets=buckets,
                         tag="dupspan2")


def clip_duplicate_spans(ds, column: str = "text", id_col: str = "doc_id",
                         k: int = 40, min_docs: int = 2,
                         buckets: int | None = None):
    """Remove every cross-document duplicated span from each document's
    text (ALL occurrences — the conservative variant; Lee et al. keep
    one copy, which needs a global winner election this operator trades
    for simplicity). Non-duplicated documents pass through unchanged.

    Returns the input columns with ``column`` rewritten. Invariant
    (pytest-enforced): ``len(clipped) == len(original) - dup_chars``
    per document, with ``dup_chars`` from :func:`duplicate_spans`.

    Shape: the merged span list per document (tiny — bounded by that
    document's dup-span count) travels as one JSON string column
    through a hash join back onto the documents; the cut itself is a
    per-row slice concat."""
    import json as _json

    from tenzir_ray.stages.exchange import grouped_apply
    from tenzir_ray.stages.join import hash_join

    grams = ds.map_batches(
        _SpanGrams(column, id_col, k), batch_format="pyarrow",
        batch_size=1024,
    )

    hits = grouped_apply(grams, ["h1", "h2"],
                         _dup_hit_filter(id_col, min_docs),
                         num_buckets=buckets, tag="dupclip")

    def _span_lists(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({
                id_col: pa.Array.from_pandas(
                    df[id_col] if id_col in df
                    else pd.Series([], dtype="object")),
                "_spans": pa.array([], pa.string())})
        sp = _merge_islands(df, id_col, k)
        out = sp.groupby("_doc", sort=False).apply(
            lambda g: _json.dumps(
                [[int(s), int(e)] for s, e in zip(g["_s"], g["_e"])]),
            include_groups=False,
        )
        return pa.table({
            id_col: pa.Array.from_pandas(out.index.to_series()
                                         .reset_index(drop=True)),
            "_spans": pa.array(out.to_numpy(dtype=object), pa.string()),
        })

    spans = grouped_apply(hits, [id_col], _span_lists, num_buckets=buckets,
                          tag="dupclip2")
    joined = hash_join(ds, spans, [id_col], how="left")

    def _clip(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.drop(columns=["_spans"], errors="ignore")
        texts = df[column].tolist()
        out = []
        for s, spec in zip(texts, df["_spans"]):
            if spec is None or (isinstance(spec, float) and pd.isna(spec)) \
                    or s is None:
                out.append(s)
                continue
            parts, prev = [], 0
            for a, b in _json.loads(spec):
                parts.append(s[prev:a - 1])  # spans are 1-based inclusive
                prev = b - 1
            parts.append(s[prev:])
            out.append("".join(parts))
        df = df.drop(columns=["_spans"])
        df[column] = out
        return df

    return joined.map_batches(_clip, batch_format="pandas")


ship_by_value(sys.modules[__name__])
