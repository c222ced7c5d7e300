"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship CDC replay at sf0.001.
``queries()`` — one callable per implemented operator/pipeline
(SURVEY.md §2 + training-data extensions); each takes ``sf_dir``.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted for
non-SQL-expressible ops → driver does a rows-only check).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from typing import Any

import numpy as np


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# CDC flagship


def _cdc_events_for(sf_dir: str) -> int:
    # deterministic scale per sf tier
    sf = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": 5_000, "sf0.01": 50_000, "sf0.1": 500_000}.get(sf, 5_000)


def _cdc_replay(sf_dir: str):
    """Generate a deterministic change log (seed 42), replay it through the
    exactly-once lake apply in two epochs, return the final table."""
    import pyarrow.compute as pc

    from tenzir_ray.cdc import LakeTable, gen_changes

    n = _cdc_events_for(sf_dir)
    changes = gen_changes(n, seed=42)
    root = f"/tmp/tenzir_ray_cdc/{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(root, ignore_errors=True)
    lake = LakeTable(root, num_partitions=16)
    lsn = changes.column("lsn")
    lake.apply_changes(changes.filter(pc.less(lsn, n // 2)), epoch_id="e1")
    lake.apply_changes(changes.filter(pc.greater_equal(lsn, n // 2)), epoch_id="e2")
    return lake.final_table()


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return _cdc_replay("/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# queries


def queries() -> dict[str, Callable[[str], Any]]:
    from tenzir_ray.stages import dedup as D
    from tenzir_ray.stages import similarity as SIM
    from tenzir_ray.stages import summarize as S
    from tenzir_ray.stages import text as TX
    from tenzir_ray.stages import transforms as T
    from tenzir_ray.state.context import LookupTable, enrich

    def q1_pricing_summary(sf):
        import pyarrow as pa
        import pyarrow.compute as pc

        ds = _read(sf, "lineitem")
        ds = T.where(ds, "l_shipdate <= '1998-09-01'")

        # Money columns are 2-/4-decimal grid-aligned; summing them as
        # scaled INTEGERS makes the aggregate exact and bit-identical
        # across engines (parallel double sums differ in the last ulp,
        # and decimal rounding of ~1e9 sums cannot mask that).
        def _cents(t: pa.Table) -> pa.Table:
            price = t.column("l_extendedprice")
            disc = t.column("l_discount")
            t = t.append_column(
                "base_c", pc.cast(pc.round(pc.multiply(price, 100)), pa.int64())
            )
            t = t.append_column(
                "disc_dm",
                pc.cast(
                    pc.round(
                        pc.multiply(pc.multiply(price, pc.subtract(1.0, disc)), 10000)
                    ),
                    pa.int64(),
                ),
            )
            t = t.append_column(
                "disc_c", pc.cast(pc.round(pc.multiply(disc, 100)), pa.int64())
            )
            return t

        ds = ds.map_batches(_cents, batch_format="pyarrow")
        agg = S.summarize(
            ds,
            by=["l_returnflag", "l_linestatus"],
            sum_qty="sum(l_quantity)",
            sum_base_c="sum(base_c)",
            sum_disc_dm="sum(disc_dm)",
            sum_disc_c="sum(disc_c)",
            count_order="count(*)",
        )

        def _finish(t: pa.Table) -> pa.Table:
            n = pc.cast(t.column("count_order"), pa.float64())
            base = pc.divide(pc.cast(t.column("sum_base_c"), pa.float64()), 100.0)
            t = t.append_column("sum_base_price", base)
            t = t.append_column(
                "sum_disc_price",
                pc.divide(pc.cast(t.column("sum_disc_dm"), pa.float64()), 10000.0),
            )
            t = t.append_column("avg_qty", pc.divide(t.column("sum_qty"), n))
            t = t.append_column("avg_price", pc.divide(base, n))
            t = t.append_column(
                "avg_disc",
                pc.divide(
                    pc.divide(pc.cast(t.column("sum_disc_c"), pa.float64()), 100.0), n
                ),
            )
            return t.select(
                ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
                 "sum_disc_price", "avg_qty", "avg_price", "avg_disc", "count_order"]
            )

        return agg.map_batches(_finish, batch_format="pyarrow")

    def where_project(sf):
        ds = T.where(
            _read(sf, "lineitem"), "l_quantity > 45 and l_returnflag == 'A'"
        )
        return T.select(ds, ["l_orderkey", "l_linenumber", "l_quantity"])

    def revenue_put(sf):
        return T.put(
            _read(sf, "lineitem"),
            l_orderkey="l_orderkey",
            l_linenumber="l_linenumber",
            revenue="l_extendedprice * (1 - l_discount) * (1 + l_tax)",
        )

    def top_event_types(sf):
        return T.top(_read(sf, "events"), "event_type", 3)

    def rare_event_types(sf):
        return T.rare(_read(sf, "events"), "event_type", 2)

    def events_daily(sf):
        ds = S.time_bucket(_read(sf, "events"), "ts", "1d", out="day")
        ds = S.summarize(ds, by="day", n="count(*)", total_value="sum(value)")
        # micro-units: cross-engine float rounding is ulp-unstable
        ds = T.scale_int_cols(ds, ["total_value"])

        def _day_us(t):
            import pyarrow as pa

            i = t.schema.get_field_index("day")
            return t.set_column(i, "day", t.column("day").cast(pa.timestamp("us")))

        return ds.map_batches(_day_us, batch_format="pyarrow")

    def stats_by_type(sf):
        ds = S.summarize(
            _read(sf, "events"),
            by="event_type",
            sd="stddev(value)",
            var="variance(value)",
            users="count_distinct(user_id)",
            vmin="min(value)",
            vmax="max(value)",
        )
        return T.scale_int_cols(ds, ["sd", "var"])

    def global_stats(sf):
        return S.summarize(
            _read(sf, "lineitem"),
            total_qty="sum(l_quantity)",
            n="count(*)",
            distinct_parts="count_distinct(l_partkey)",
        )

    def sort_topk_orders(sf):
        ds = T.sort(_read(sf, "orders"), ["o_totalprice", "o_orderkey"],
                    descending=[True, False])
        return T.select(T.head(ds, 10), ["o_orderkey", "o_totalprice"])

    def enrich_orders_segment(sf):
        import pyarrow as pa

        orders = _read(sf, "orders", columns=["o_orderkey", "o_custkey"])
        cust = pa.concat_tables(
            list(
                _read(sf, "customer", columns=["c_custkey", "c_mktsegment"]).iter_batches(
                    batch_format="pyarrow"
                )
            )
        )
        ctx = LookupTable(cust, key="c_custkey")
        return enrich(orders, ctx, field="o_custkey")

    def semi_join_events_users(sf):
        import pyarrow as pa

        events = _read(sf, "events", columns=["event_id", "user_id"])
        cust = pa.concat_tables(
            list(
                _read(sf, "customer", columns=["c_custkey", "c_name"]).iter_batches(
                    batch_format="pyarrow"
                )
            )
        )
        ctx = LookupTable(cust, key="c_custkey")
        return enrich(events, ctx, field="user_id", filter_unmatched=True)

    def unroll_embeddings(sf):
        ds = T.where(_read(sf, "embeddings"), "vec_id < 20")
        ds = T.unroll(T.select(ds, ["vec_id", "embedding"]), "embedding")
        return ds

    def hash_documents(sf):
        ds = T.hash_(_read(sf, "documents"), "text", out="text_sha256")
        return T.select(ds, ["doc_id", "text_sha256"])

    def parse_json_props(sf):
        ds = T.parse_json(_read(sf, "events"), "props", prefix="p_")
        return T.select(ds, ["event_id", "p_k"])

    def dedup_documents_exact(sf):
        ds = D.exact_dedup(
            T.select(_read(sf, "documents"), ["doc_id", "text"]),
            "text",
            keep_order_by="doc_id",
        )
        return ds

    def taste_per_type(sf):
        ds = T.taste(
            _read(sf, "events", columns=["event_id", "event_type"]),
            3,
            by="event_type",
            order_by="event_id",
        )
        return ds

    def dedup_limit2_per_type(sf):
        return T.deduplicate(
            _read(sf, "events", columns=["event_id", "event_type"]),
            by=["event_type"],
            limit=2,
            order_by="event_id",
        )

    def token_count_docs(sf):
        ds = TX.token_count(_read(sf, "documents", columns=["doc_id", "text"]))
        return T.select(ds, ["doc_id", "ws_tokens"])

    def doc_quality(sf):
        ds = TX.quality_score(_read(sf, "documents", columns=["doc_id", "text"]))
        return T.select(ds, ["doc_id", "n_tokens", "alpha_ratio", "quality"])

    def doc_langid(sf):
        ds = TX.lang_id(_read(sf, "documents", columns=["doc_id", "text", "lang"]))
        return T.select(ds, ["doc_id", "lang", "lang_pred", "lang_score"])

    def doc_fingerprint(sf):
        ds = TX.fingerprint(_read(sf, "documents", columns=["doc_id", "text"]))
        return T.select(ds, ["doc_id", "fingerprint"])

    def minhash_dedup_groups(sf):
        return D.minhash_lsh_dedup(
            _read(sf, "documents", columns=["doc_id", "text"]), "doc_id", "text"
        )

    def simhash_docs(sf):
        ds = D.simhash(_read(sf, "documents", columns=["doc_id", "text"]))
        return T.select(ds, ["doc_id", "simhash"])

    def ann_cosine_topk(sf):
        import pyarrow.parquet as pq

        q_tbl = pq.read_table(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).slice(0, 2)
        queries_m = np.stack([np.asarray(v) for v in q_tbl.column("embedding").to_pylist()])
        return SIM.brute_force_topk(_read(sf, "embeddings"), queries_m, k=5)

    def embedding_near_dups(sf):
        # plant exact duplicates (union with an id-shifted copy) so the
        # near-dup path always has work: every vector pairs with its clone
        ds = _read(sf, "embeddings", columns=["vec_id", "embedding"])
        shifted = T.set_(ds, vec_id="vec_id + 1000000")
        return SIM.embedding_near_dup(
            ds.union(shifted), threshold=0.999, n_planes=6
        )

    def cdc_replay(sf):
        return _cdc_replay(sf)

    def median_by_type(sf):
        return T.scale_int_cols(
            S.summarize(_read(sf, "events"), by="event_type", med="median(value)"),
            ["med"],
        )

    def any_all_by_type(sf):
        ds = T.set_(_read(sf, "events"), big="value > 50")
        return S.summarize(ds, by="event_type", anyv="any(big)", allv="all(big)")

    def slice_orders(sf):
        ds = T.slice_(
            _read(sf, "orders", columns=["o_orderkey", "o_totalprice"]),
            20, 30, order_by="o_orderkey",
        )
        return ds

    def enumerate_per_type(sf):
        return T.enumerate_per_group(
            _read(sf, "events", columns=["event_id", "event_type"]),
            by="event_type", out="idx", order_by="event_id",
        )

    def unique_type_user(sf):
        return T.unique(
            _read(sf, "events", columns=["event_type", "user_id"]),
            by=["event_type", "user_id"],
        )

    def timeshift_events(sf):
        from datetime import datetime

        ds = T.timeshift(
            _read(sf, "events", columns=["event_id", "ts"]),
            "ts", start=datetime(2020, 1, 1),
        )
        return ds

    def sigma_match(sf):
        from tenzir_ray.stages.sigma import sigma

        rule = {
            "detection": {
                "selection": {"event_type": ["click", "view"], "value|gt": 90},
                "condition": "selection",
            }
        }
        return T.select(
            sigma(_read(sf, "events"), rule), ["event_id", "event_type", "value"]
        )

    def pipeline_revenue(sf):
        from tenzir_ray.pipelines import Pipeline

        out = Pipeline(
            [
                {"op": "read_parquet", "paths": f"{sf}/lineitem.parquet"},
                {
                    "op": "summarize",
                    "by": "l_returnflag",
                    "aggs": {"total_qty": "sum(l_quantity)", "n": "count(*)"},
                },
            ]
        ).run()
        return out

    def syslog_parse(sf):
        import ray.data

        import pyarrow as pa

        # deterministic synthetic syslog lines derived from event ids
        import pyarrow.parquet as pq

        ev = pq.read_table(f"{sf}/events.parquet", columns=["event_id", "user_id"])
        lines = [
            f"<{13 + (i % 8)}>1 2024-01-01T00:00:{i % 60:02d}Z host{u} app {i} ID{i} - msg {i}"
            for i, u in zip(
                ev.column("event_id").to_pylist()[:500],
                ev.column("user_id").to_pylist()[:500],
            )
        ]
        from tenzir_ray.sources import parse_syslog

        return parse_syslog(ray.data.from_arrow(pa.table({"text": lines})))

    def streaming_dedup_types(sf):
        from tenzir_ray.stages.streaming import streaming_deduplicate

        return streaming_deduplicate(
            _read(sf, "events", columns=["event_id", "event_type"]),
            by=["event_type"], limit=3,
        )

    def pseudonymize_ips(sf):
        import pandas as pd

        def _mk(df: pd.DataFrame) -> pd.DataFrame:
            df["ip"] = "10.0." + (df["user_id"] % 256).astype(str) + "." + (
                df["event_id"] % 256
            ).astype(str)
            return df

        ds = _read(sf, "events", columns=["event_id", "user_id"]).map_batches(
            _mk, batch_format="pandas"
        )
        return T.pseudonymize(ds, "ip", salt="bench")

    def revenue_per_order(sf):
        from tenzir_ray.stages.summarize import summarize_hash

        ds = T.set_(
            _read(sf, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]),
            rev="l_extendedprice * (1 - l_discount)",
        )
        # high-cardinality groupby (one group per order) via the
        # hash-bucketed aggregation path
        out = summarize_hash(ds, by="l_orderkey", revenue="sum(rev)", n="count(*)")
        return T.scale_int_cols(out, ["revenue"])

    def session_windows(sf):
        from tenzir_ray.stages.window import session_window

        return session_window(
            _read(sf, "events", columns=["user_id", "ts"]), "ts", gap="1h",
            by="user_id",
        )

    def sliding_windows(sf):
        from tenzir_ray.stages.window import sliding_window

        return sliding_window(
            _read(sf, "events", columns=["ts", "value"]), "ts",
            size="1d", slide="6h",
        )

    def subnet_enrich(sf):
        import pyarrow as pa

        from tenzir_ray.state.context import SubnetTable, enrich_subnet

        cidrs = pa.table(
            {
                "net": ["10.0.0.0/8", "10.0.0.0/16", "10.0.0.0/24"],
                "zone": ["wide", "mid", "narrow"],
            }
        )
        import pandas as pd

        def _mk(df: pd.DataFrame) -> pd.DataFrame:
            df["ip"] = "10." + (df["user_id"] % 2 * 99).astype(str) + ".0." + (
                df["event_id"] % 200
            ).astype(str)
            return df

        ds = _read(sf, "events", columns=["event_id", "user_id"]).map_batches(
            _mk, batch_format="pandas"
        )
        return enrich_subnet(ds, SubnetTable(cidrs, "net"), field="ip")

    def ann_ivf_topk(sf):
        import pyarrow.parquet as pq

        q_tbl = pq.read_table(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).slice(0, 2)
        queries_m = np.stack(
            [np.asarray(v) for v in q_tbl.column("embedding").to_pylist()]
        )
        return SIM.ivf_topk(
            _read(sf, "embeddings"), queries_m, k=5, nlist=16, nprobe=6
        )

    def dedup_components(sf):
        # transitive near-dup clusters: planted duplicate chain via union
        # with two shifted copies, LSH candidates -> connected components
        ds = _read(sf, "documents", columns=["doc_id", "text"])
        groups = D.minhash_lsh_dedup(ds, "doc_id", "text")
        import pandas as pd

        def _pairs(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["doc_id"] != df["dup_group"]]
            return pd.DataFrame({"id_a": df["dup_group"], "id_b": df["doc_id"]})

        edges = groups.map_batches(_pairs, batch_format="pandas")
        if edges.count() == 0:
            import pyarrow as pa

            return pa.table({"id_a": pa.array([], pa.int64()),
                             "component": pa.array([], pa.int64())})
        return D.connected_components(edges)

    def join_revenue_by_priority(sf):
        import pyarrow as pa
        import pyarrow.compute as pc

        from tenzir_ray.stages.join import hash_join

        li = _read(sf, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

        def _cents(t: pa.Table) -> pa.Table:
            rev = pc.multiply(
                pc.multiply(t.column("l_extendedprice"),
                            pc.subtract(1.0, t.column("l_discount"))), 10000)
            return t.select(["l_orderkey"]).append_column(
                "rev_dm", pc.cast(pc.round(rev), pa.int64())
            )

        li = li.map_batches(_cents, batch_format="pyarrow")
        orders = _read(sf, "orders", columns=["o_orderkey", "o_orderpriority"])
        joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")
        agg = S.summarize(
            joined, by="o_orderpriority", rev_dm="sum(rev_dm)", n="count(*)"
        )

        def _money(t: pa.Table) -> pa.Table:
            return t.append_column(
                "revenue",
                pc.divide(pc.cast(t.column("rev_dm"), pa.float64()), 10000.0),
            ).drop_columns(["rev_dm"])

        return agg.map_batches(_money, batch_format="pyarrow")

    def asof_status(sf):
        import pandas as pd

        from tenzir_ray.stages.join import asof_join

        left = _read(sf, "events", columns=["event_id", "user_id", "ts"])

        def _status_side(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["event_id"] % 7 == 0]
            return pd.DataFrame(
                {"user_id": df["user_id"], "ts": df["ts"], "status_id": df["event_id"]}
            )

        right = _read(sf, "events", columns=["event_id", "user_id", "ts"]).map_batches(
            _status_side, batch_format="pandas"
        )
        out = asof_join(left, right, by="user_id", on="ts")

        def _typed(df: pd.DataFrame) -> pd.DataFrame:
            # the padded-union join leaves pass-through columns as object
            # dtype; pin types so values hash identically to the SQL oracle
            # (nullable status_id as float64, like DuckDB's pandas export)
            return df.astype(
                {"event_id": "int64", "user_id": "int64", "status_id": "float64"}
            )

        return out.map_batches(_typed, batch_format="pandas")

    return {
        "asof_status": asof_status,
        "join_revenue_by_priority": join_revenue_by_priority,
        "ann_ivf_topk": ann_ivf_topk,
        "dedup_components": dedup_components,
        "session_windows": session_windows,
        "sliding_windows": sliding_windows,
        "subnet_enrich": subnet_enrich,
        "revenue_per_order": revenue_per_order,
        "median_by_type": median_by_type,
        "any_all_by_type": any_all_by_type,
        "slice_orders": slice_orders,
        "enumerate_per_type": enumerate_per_type,
        "unique_type_user": unique_type_user,
        "timeshift_events": timeshift_events,
        "sigma_match": sigma_match,
        "pipeline_revenue": pipeline_revenue,
        "syslog_parse": syslog_parse,
        "streaming_dedup_types": streaming_dedup_types,
        "pseudonymize_ips": pseudonymize_ips,
        "q1_pricing_summary": q1_pricing_summary,
        "where_project": where_project,
        "revenue_put": revenue_put,
        "top_event_types": top_event_types,
        "rare_event_types": rare_event_types,
        "events_daily": events_daily,
        "stats_by_type": stats_by_type,
        "global_stats": global_stats,
        "sort_topk_orders": sort_topk_orders,
        "enrich_orders_segment": enrich_orders_segment,
        "semi_join_events_users": semi_join_events_users,
        "unroll_embeddings": unroll_embeddings,
        "hash_documents": hash_documents,
        "parse_json_props": parse_json_props,
        "dedup_documents_exact": dedup_documents_exact,
        "taste_per_type": taste_per_type,
        "dedup_limit2_per_type": dedup_limit2_per_type,
        "token_count_docs": token_count_docs,
        "doc_quality": doc_quality,
        "doc_langid": doc_langid,
        "doc_fingerprint": doc_fingerprint,
        "minhash_dedup_groups": minhash_dedup_groups,
        "simhash_docs": simhash_docs,
        "ann_cosine_topk": ann_cosine_topk,
        "embedding_near_dups": embedding_near_dups,
        "cdc_replay": cdc_replay,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            WITH t AS (
                SELECT l_returnflag, l_linestatus,
                       sum(l_quantity) AS sum_qty,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_c,
                       sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS sum_disc_dm,
                       sum(CAST(round(l_discount * 100) AS BIGINT)) AS sum_disc_c,
                       count(*) AS count_order
                FROM lineitem
                WHERE l_shipdate <= TIMESTAMP '1998-09-01'
                GROUP BY l_returnflag, l_linestatus)
            SELECT l_returnflag, l_linestatus, sum_qty,
                   CAST(sum_base_c AS DOUBLE) / 100.0 AS sum_base_price,
                   CAST(sum_disc_dm AS DOUBLE) / 10000.0 AS sum_disc_price,
                   sum_qty / CAST(count_order AS DOUBLE) AS avg_qty,
                   (CAST(sum_base_c AS DOUBLE) / 100.0) / CAST(count_order AS DOUBLE) AS avg_price,
                   (CAST(sum_disc_c AS DOUBLE) / 100.0) / CAST(count_order AS DOUBLE) AS avg_disc,
                   count_order
            FROM t
        """,
        "where_project": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_quantity > 45 AND l_returnflag = 'A'
        """,
        "revenue_put": """
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice * (1 - l_discount) * (1 + l_tax) AS revenue
            FROM lineitem
        """,
        "top_event_types": """
            SELECT event_type, count(*) AS count FROM events
            GROUP BY event_type ORDER BY count DESC, event_type LIMIT 3
        """,
        "rare_event_types": """
            SELECT event_type, count(*) AS count FROM events
            GROUP BY event_type ORDER BY count ASC, event_type LIMIT 2
        """,
        "events_daily": """
            SELECT time_bucket(INTERVAL '1 day', ts) AS day,
                   count(*) AS n, CAST(round(sum(value) * 1000000) AS BIGINT) AS total_value
            FROM events GROUP BY 1
        """,
        "stats_by_type": """
            SELECT event_type, CAST(round(stddev_pop(value) * 1000000) AS BIGINT) AS sd,
                   CAST(round(var_pop(value) * 1000000) AS BIGINT) AS var,
                   count(DISTINCT user_id) AS users,
                   min(value) AS vmin, max(value) AS vmax
            FROM events GROUP BY event_type
        """,
        "global_stats": """
            SELECT sum(l_quantity) AS total_qty, count(*) AS n,
                   count(DISTINCT l_partkey) AS distinct_parts
            FROM lineitem
        """,
        "sort_topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "enrich_orders_segment": """
            SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "semi_join_events_users": """
            SELECT e.event_id, e.user_id, c.c_name
            FROM events e JOIN customer c ON e.user_id = c.c_custkey
        """,
        "unroll_embeddings": """
            SELECT vec_id, unnest(embedding) AS embedding
            FROM embeddings WHERE vec_id < 20
        """,
        "hash_documents": """
            SELECT doc_id, sha256(text) AS text_sha256 FROM documents
        """,
        "parse_json_props": """
            SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS p_k
            FROM events
        """,
        "dedup_documents_exact": """
            SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
        """,
        "taste_per_type": """
            SELECT event_id, event_type FROM (
                SELECT event_id, event_type,
                       row_number() OVER (PARTITION BY event_type ORDER BY event_id) rn
                FROM events) WHERE rn <= 3
        """,
        "dedup_limit2_per_type": """
            SELECT event_id, event_type FROM (
                SELECT event_id, event_type,
                       row_number() OVER (PARTITION BY event_type ORDER BY event_id) rn
                FROM events) WHERE rn <= 2
        """,
        "token_count_docs": """
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS ws_tokens
            FROM documents
        """,
        "asof_status": """
            SELECT l.event_id, l.user_id, l.ts, r.status_id
            FROM events l
            ASOF LEFT JOIN (SELECT user_id, ts, event_id AS status_id FROM events
                            WHERE event_id % 7 = 0) r
            ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "join_revenue_by_priority": """
            WITH j AS (
                SELECT o.o_orderpriority,
                       CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT) AS rev_dm
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
            SELECT o_orderpriority,
                   CAST(sum(rev_dm) AS DOUBLE) / 10000.0 AS revenue,
                   count(*) AS n
            FROM j GROUP BY o_orderpriority
        """,
        "session_windows": """
            WITH marked AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            > INTERVAL '1 hour' OR
                            lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       THEN 1 ELSE 0 END AS brk
                FROM events),
            sess AS (
                SELECT user_id, ts,
                       sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
                FROM marked)
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n
            FROM sess GROUP BY user_id, sid
        """,
        "revenue_per_order": """
            SELECT l_orderkey,
                   CAST(round(sum(l_extendedprice * (1 - l_discount)) * 1000000) AS BIGINT) AS revenue,
                   count(*) AS n
            FROM lineitem GROUP BY l_orderkey
        """,
        "median_by_type": """
            SELECT event_type, CAST(round(median(value) * 1000000) AS BIGINT) AS med FROM events GROUP BY event_type
        """,
        "any_all_by_type": """
            SELECT event_type, bool_or(value > 50) AS anyv,
                   bool_and(value > 50) AS allv
            FROM events GROUP BY event_type
        """,
        "slice_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_orderkey LIMIT 10 OFFSET 20
        """,
        "enumerate_per_type": """
            SELECT event_id, event_type,
                   row_number() OVER (PARTITION BY event_type ORDER BY event_id) - 1 AS idx
            FROM events
        """,
        "unique_type_user": """
            SELECT DISTINCT event_type, user_id FROM events
        """,
        "timeshift_events": """
            SELECT event_id,
                   TIMESTAMP '2020-01-01' + (ts - (SELECT min(ts) FROM events)) AS ts
            FROM events
        """,
        "sigma_match": """
            SELECT event_id, event_type, value FROM events
            WHERE event_type IN ('click', 'view') AND value > 90
        """,
        "pipeline_revenue": """
            SELECT l_returnflag, sum(l_quantity) AS total_qty, count(*) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        # doc_quality / doc_langid / doc_fingerprint / minhash / simhash /
        # ann / near-dup / cdc_replay / syslog_parse / streaming_dedup /
        # pseudonymize: non-SQL-expressible (heuristic scoring, sketches,
        # replay engine, stream state, keyed crypto) → rows-only checks.
    }
