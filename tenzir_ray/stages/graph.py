"""Graph analytics over edge tables.

PageRank (Page et al. 1999) as a Ray-Data dataflow — the web-graph
quality signal corpus pipelines use for source weighting (the
Common-Crawl-derived corpora filter on link-graph centrality). The
reference has no graph operators; this extends the engine's
training-data surface next to :func:`tenzir_ray.stages.dedup.connected_components`.

Semantics (fixed so a SQL oracle can reproduce it bit-for-bit after
1e-6 rounding):

- nodes = distinct(src) ∪ distinct(dst); N = |nodes|
- out-degree counts PARALLEL edges (each edge row carries rank)
- per iteration: r'(v) = (1-d)/N + d * (Σ_{(u,v)∈E} r(u)/deg(u) + D/N)
  where D = Σ r(u) over dangling nodes (no out-edges) — the standard
  uniform dangling-mass redistribution
- initial rank 1/N; exactly ``iters`` synchronous iterations (no
  convergence test, so engine and oracle run the same computation)

Scale shape: ranks stay a ``ray.data.Dataset`` end-to-end; one
iteration is one co-partitioned hash join (ranks ⋈ edges on src) + one
grouped sum + one left join back onto the node table — all over the
packed exchange. Driver state per iteration is two scalars (dangling
mass, total nodes). Rounds are the only serial dimension, as in any
synchronous Pregel step.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa

from tenzir_ray._ship import ship_by_value


def _pagerank_local(pairs: pd.DataFrame, src: str, dst: str,
                    d: float, iters: int,
                    node_col: str, rank_col: str) -> pa.Table:
    """Driver fast path over the (src, dst, weight) aggregate: identical
    semantics, vectorized numpy iterations."""
    nodes = np.unique(np.concatenate([
        pairs[src].to_numpy(np.int64), pairs[dst].to_numpy(np.int64)
    ]))
    n = len(nodes)
    # nodes is sorted (np.unique) — index by binary search, no Python dict
    si = np.searchsorted(nodes, pairs[src].to_numpy(np.int64))
    di = np.searchsorted(nodes, pairs[dst].to_numpy(np.int64))
    w = pairs["_w"].to_numpy(np.float64)
    deg = np.zeros(n)
    np.add.at(deg, si, w)
    has_out = deg > 0
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = float(r[~has_out].sum())
        c = np.zeros(n)
        np.add.at(c, di, r[si] / deg[si] * w)
        r = (1.0 - d) / n + d * (c + dang / n)
    return pa.table({node_col: pa.array(nodes, pa.int64()),
                     rank_col: pa.array(r, pa.float64())})


def pagerank(edges, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 5,
             node_col: str = "node", rank_col: str = "rank",
             driver_threshold: int = 2_000_000):
    """PageRank over an edge Dataset; returns (node, rank) with exactly
    ``iters`` iterations of the semantics documented in the module
    docstring. Node ids must be integers.

    Size-gated hybrid (the connected_components discipline): edge
    multiplicities are first collapsed to (src, dst, weight) in ONE
    grouped aggregation — when that aggregate PROVABLY fits on the
    driver (≤ ``driver_threshold`` pairs ≈ 48 MB of int64 triples) the
    iterations run as vectorized numpy locally, skipping 6 Ray stages
    per round; larger graphs run the fully distributed loop below."""
    import ray.data

    from tenzir_ray.stages.join import hash_join
    from tenzir_ray.stages.summarize import summarize_hash

    if iters < 0:
        raise ValueError("pagerank: iters must be >= 0")
    d = float(damping)

    pairs_ds = summarize_hash(edges, by=[src, dst], _w="count(*)")
    pairs_ds = pairs_ds.materialize()  # count() then read: one execution
    if pairs_ds.count() <= driver_threshold:
        pairs = pairs_ds.to_pandas()
        if not len(pairs):
            return ray.data.from_arrow(pa.table({
                node_col: pa.array([], pa.int64()),
                rank_col: pa.array([], pa.float64()),
            }))
        return ray.data.from_arrow(
            _pagerank_local(pairs, src, dst, d, int(iters),
                            node_col, rank_col)
        )

    def _sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            node_col: pd.concat(
                [df[src], df[dst]], ignore_index=True
            ).astype(np.int64),
        })

    nodes = (
        edges.map_batches(_sym, batch_format="pandas")
        .groupby(node_col).count().select_columns([node_col])
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            node_col: pa.array([], pa.int64()),
            rank_col: pa.array([], pa.float64()),
        }))

    # out-degree (parallel edges count), joined onto the edge list ONCE
    deg = summarize_hash(
        edges.map_batches(
            lambda t: t.select([src]), batch_format="pyarrow"
        ),
        by=src, _deg="count(*)",
    )
    edges_deg = hash_join(
        edges.map_batches(lambda t: t.select([src, dst]),
                          batch_format="pyarrow"),
        deg, on=src,
    ).materialize()

    def _init(df: pd.DataFrame) -> pd.DataFrame:
        df[rank_col] = 1.0 / n_nodes
        return df

    ranks = nodes.map_batches(_init, batch_format="pandas").materialize()
    # nodes with out-edges, for the dangling-mass scalar
    out_nodes = deg.map_batches(
        lambda t: t.rename_columns([node_col, "_deg"]),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(int(iters)):
        # dangling mass: total rank minus rank held by nodes with
        # out-edges (two tiny driver scalars, no row materialization)
        total = ranks.sum(rank_col, ignore_nulls=True) or 0.0
        with_out = hash_join(ranks, out_nodes, on=node_col, how="semi")
        out_mass = with_out.sum(rank_col, ignore_nulls=True) or 0.0
        dangling = total - out_mass

        contrib_in = hash_join(ranks, edges_deg, on=node_col,
                               right_on=src)

        def _contrib(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                node_col: df[dst].astype(np.int64),
                "_c": df[rank_col].to_numpy() / df["_deg"].to_numpy(),
            })

        sums = summarize_hash(
            contrib_in.map_batches(_contrib, batch_format="pandas"),
            by=node_col, _c="sum(_c)",
        )
        joined = hash_join(nodes, sums, on=node_col, how="left")
        base = (1.0 - d) / n_nodes + d * dangling / n_nodes

        def _apply(df: pd.DataFrame) -> pd.DataFrame:
            c = df["_c"].fillna(0.0).to_numpy(dtype=np.float64)
            return pd.DataFrame({
                node_col: df[node_col].astype(np.int64),
                rank_col: base + d * c,
            })

        ranks = joined.map_batches(
            _apply, batch_format="pandas"
        ).materialize()

    return ranks


def _canon_edges(edges, src: str, dst: str):
    """Directed multi-edge table → distinct undirected simple edges
    ``(a, b)`` with ``a < b`` (self-loops dropped); dedup runs over the
    grouped exchange, so no driver materialization."""
    import pyarrow.compute as pc

    from tenzir_ray.stages.transforms import unique

    def _canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column(src), pa.int64())
        d = pc.cast(t.column(dst), pa.int64())
        out = pa.table({"a": pc.min_element_wise(s, d),
                        "b": pc.max_element_wise(s, d)})
        return out.filter(pc.not_equal(out.column("a"), out.column("b")))

    return unique(edges.map_batches(_canon, batch_format="pyarrow"),
                  by=["a", "b"])


def triangle_count(edges, src: str = "src", dst: str = "dst",
                   per_node: bool = False, **join_kw):
    """Exact triangle count of the undirected simple graph induced by an
    edge table (self-loops and parallel/reverse duplicates ignored).

    Classic distributed formulation (MR triangle enumeration, Cohen
    2009): canonical ``a<b`` edges, wedge join ``(a,m) ⋈ (m,c)`` on the
    middle vertex (each triangle a<m<c is enumerated exactly once), then
    a semi join closing ``(a,c)`` against the edge set — three
    co-partitioned hash joins over the packed exchange, nothing on the
    driver. Returns the global count (int); ``per_node=True`` instead
    returns a Dataset ``(node, triangles)`` counting, per vertex, the
    triangles it participates in (wedge rows explode 3× then one grouped
    sum — still bounded by triangle count, not corpus size).

    Skew note: the wedge join fan-out is Σ deg(v)² on middle vertices —
    for power-law graphs route the hot vertices through ``skew_join``
    semantics by passing ``num_buckets``/``target_task_bytes`` to bound
    per-task bytes (forwarded to every join)."""
    from tenzir_ray.stages.join import hash_join
    from tenzir_ray.stages.summarize import summarize

    e = _canon_edges(edges, src, dst)

    def _low_mid(t: pa.Table) -> pa.Table:
        return pa.table({"a": t.column("a"), "m": t.column("b")})

    def _mid_high(t: pa.Table) -> pa.Table:
        return pa.table({"m": t.column("a"), "c": t.column("b")})

    wedges = hash_join(e.map_batches(_low_mid, batch_format="pyarrow"),
                       e.map_batches(_mid_high, batch_format="pyarrow"),
                       on="m", **join_kw)
    closed = hash_join(wedges, e, on=["a", "c"], right_on=["a", "b"],
                       how="semi", **join_kw)
    if not per_node:
        return closed.count()

    def _explode(t: pa.Table) -> pa.Table:
        import numpy as np

        cols = [t.column("a").to_numpy(zero_copy_only=False),
                t.column("m").to_numpy(zero_copy_only=False),
                t.column("c").to_numpy(zero_copy_only=False)]
        return pa.table({"node": np.concatenate(cols)})

    return summarize(closed.map_batches(_explode, batch_format="pyarrow"),
                     by="node", triangles="count(*)")


ship_by_value(sys.modules[__name__])
