"""Velociraptor source: VQL queries / artifact subscriptions → Dataset.

Engine half of the reference's `velociraptor` operator
(plugins/velociraptor/src/plugin.cpp:44-170,215-240): issue VQL requests
over the Velociraptor gRPC API and parse the VQLResponse stream — data
messages (JSON-array payload in ``response``) become
``velociraptor.response`` rows carrying timestamp/query_id/query/part
plus the response record; control messages (``log``) become
``velociraptor.log`` rows.

The transport is dependency-injected: any object with
``query(name, vql, org_id) -> iterable[dict]`` works (the dict mirrors
the proto::VQLResponse fields). ``GrpcVelociraptorClient`` is the real
client shape behind an import guard — grpcio is not in this container,
so it raises with instructions; ``FakeVelociraptorClient`` is the
deterministic test double that exercises the full parse path.

Velociraptor is a control-plane stream (hunt results, not bulk
telemetry): volume is operator-bounded, so the driver-side pull into one
Dataset block mirrors the reference's single-actor operator and is the
right scale trade. Fan-out happens in the pipeline stages downstream.
"""

from __future__ import annotations

import json
import sys

import pyarrow as pa

from tenzir_ray._ship import ship_by_value


def make_subscribe_query(artifact: str) -> str:
    """VQL that follows completed flows containing ``artifact`` and
    re-selects their results (the reference's subscribe template,
    plugin.cpp:73-117, re-expressed minimally)."""
    return (
        "SELECT * FROM foreach("
        "row={ SELECT Flow.client_id AS ClientId, Flow.session_id AS FlowId "
        "FROM watch_monitoring(artifact='System.Flow.Completion') "
        f"WHERE '{artifact}' IN Flow.artifacts_with_results }}, "
        "query={ SELECT * FROM source("
        f"client_id=ClientId, flow_id=FlowId, artifact='{artifact}') }})"
    )


class FakeVelociraptorClient:
    """Deterministic stand-in for the gRPC API: yields ``n_parts`` data
    messages of ``rows_per_part`` rows plus one log message."""

    def __init__(self, n_parts: int = 2, rows_per_part: int = 3,
                 base_ts_us: int = 1_700_000_000_000_000):
        self.n_parts = n_parts
        self.rows_per_part = rows_per_part
        self.base_ts_us = base_ts_us
        self.requests: list[tuple[str, str, str]] = []

    def query(self, name: str, vql: str, org_id: str = ""):
        self.requests.append((name, vql, org_id))
        for part in range(self.n_parts):
            rows = [
                {"ClientId": f"C.{part}-{i}", "Pid": part * 100 + i}
                for i in range(self.rows_per_part)
            ]
            yield {
                "timestamp": self.base_ts_us + part,
                "query_id": 1,
                "part": part,
                "query": {"name": name, "vql": vql},
                "response": json.dumps(rows),
                "log": "",
            }
        yield {
            "timestamp": self.base_ts_us + self.n_parts,
            "query_id": 1,
            "part": self.n_parts,
            "query": {"name": name, "vql": vql},
            "response": "",
            "log": "query completed",
        }


class GrpcVelociraptorClient:
    """Real-transport client shape (mTLS gRPC, plugin.cpp:215-240):
    reads the client API config (ca/key/cert PEM + api_connection_string)
    and streams proto VQLResponse messages. grpcio and the generated
    velociraptor proto stubs are not in this container, so construction
    fails fast with instructions; the surface is locked by the
    conformance test against :class:`FakeVelociraptorClient`."""

    def __init__(self, api_config: dict):
        try:
            import grpc  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "velociraptor transport needs grpcio + the Velociraptor "
                "API proto stubs (pip install grpcio; generate stubs from "
                "proto/velociraptor.proto) — inject a client object with "
                ".query(name, vql, org_id) instead"
            ) from e
        self.api_config = api_config

    def query(self, name: str, vql: str, org_id: str = ""):
        raise NotImplementedError("grpc transport stub (no grpcio here)")


def _parse_responses(responses, max_rows: int | None):
    data_rows: list[dict] = []
    log_rows: list[dict] = []
    for resp in responses:
        ts = int(resp.get("timestamp", 0))
        payload = resp.get("response") or ""
        if payload:
            objects = json.loads(payload)
            if not isinstance(objects, list):
                raise ValueError(
                    "expected JSON array in Velociraptor response")
            for obj in objects:
                if not isinstance(obj, dict):
                    raise ValueError(
                        "expected objects in Velociraptor response")
                data_rows.append({
                    "timestamp": ts,
                    "query_id": int(resp.get("query_id", 0)),
                    "query_name": str(resp.get("query", {}).get("name", "")),
                    "query_vql": str(resp.get("query", {}).get("vql", "")),
                    "part": int(resp.get("part", 0)),
                    "response": json.dumps(obj, sort_keys=True),
                })
                if max_rows is not None and len(data_rows) >= max_rows:
                    return data_rows, log_rows
        elif resp.get("log"):
            log_rows.append({"timestamp": ts, "log": str(resp["log"])})
    return data_rows, log_rows


_SCHEMA = pa.schema([
    ("timestamp", pa.timestamp("us")),
    ("query_id", pa.int64()),
    ("query_name", pa.string()),
    ("query_vql", pa.string()),
    ("part", pa.int64()),
    ("response", pa.string()),  # JSON record; `parse_json` explodes it
])


def read_velociraptor(vql: str | None = None, *, artifact: str | None = None,
                      name: str = "tenzir_ray", org_id: str = "",
                      client=None, max_rows: int | None = None,
                      logs: bool = False):
    """Run ``vql`` (or subscribe to ``artifact`` results) and return the
    response stream as a Dataset. ``logs=True`` returns the control/log
    messages instead (the reference's velociraptor.log schema)."""
    import ray.data

    if (vql is None) == (artifact is None):
        raise ValueError("exactly one of vql= or artifact= required")
    if artifact is not None:
        vql = make_subscribe_query(artifact)
    if client is None:
        raise ValueError(
            "pass client= (GrpcVelociraptorClient(api_config) for the "
            "real transport, or any object with .query(name, vql, org_id))"
        )
    data_rows, log_rows = _parse_responses(
        client.query(name, vql, org_id), max_rows)
    if logs:
        tbl = pa.table({
            "timestamp": pa.array([r["timestamp"] for r in log_rows],
                                  pa.timestamp("us")),
            "log": pa.array([r["log"] for r in log_rows], pa.string()),
        })
        return ray.data.from_arrow(tbl)
    tbl = pa.table(
        {f.name: pa.array([r[f.name] for r in data_rows], f.type)
         for f in _SCHEMA}
    )
    return ray.data.from_arrow(tbl)


ship_by_value(sys.modules[__name__])
