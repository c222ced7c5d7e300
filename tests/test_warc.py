"""WARC/WET source + sink tests."""

from __future__ import annotations

import gzip
import os

import pyarrow as pa
import pytest

from tenzir_ray.sources.warc import (
    format_warc_record,
    parse_warc_bytes,
    read_warc,
    write_warc,
)


def _two_records() -> bytes:
    a = format_warc_record(
        "warcinfo", None, "2024-01-01T00:00:00Z",
        b"software: test\r\n", record_id="<urn:uuid:1>",
        content_type="application/warc-fields")
    b = format_warc_record(
        "conversion", "https://x.example/1", "2024-01-01T00:00:01Z",
        "héllo world".encode(), record_id="<urn:uuid:2>",
        content_type="text/plain")
    return a + b


def test_parse_plain_and_kinds_filter():
    t = parse_warc_bytes(_two_records())
    assert t.num_rows == 2
    assert t.column("warc_type").to_pylist() == ["warcinfo", "conversion"]
    only = parse_warc_bytes(_two_records(), kinds=("conversion",))
    assert only.num_rows == 1
    assert only.column("url").to_pylist() == ["https://x.example/1"]
    assert only.column("content").to_pylist() == ["héllo world"]
    # content-length is OCTETS (the é is 2 bytes)
    assert only.column("length").to_pylist() == [12]


def test_parse_gzip_whole_file_and_members():
    raw = _two_records()
    assert parse_warc_bytes(gzip.compress(raw)).num_rows == 2
    # per-record gzip members (Common Crawl layout)
    recs = [format_warc_record("conversion", f"u{i}", None,
                               f"body {i}".encode()) for i in range(3)]
    multi = b"".join(gzip.compress(r) for r in recs)
    t = parse_warc_bytes(multi)
    assert t.column("url").to_pylist() == ["u0", "u1", "u2"]


def test_parse_errors():
    with pytest.raises(ValueError, match="version"):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")
    ok = _two_records()
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_bytes(ok[: len(ok) - 20])


def test_write_read_roundtrip_dataset(ray_session, tmp_path):
    import ray.data

    tbl = pa.table({
        "url": [f"https://x.example/{i}" for i in range(50)],
        "content": [f"document body {i} " + "x" * (i % 7) for i in range(50)],
    })
    dest = str(tmp_path / "wet")
    stats = write_warc(ray.data.from_arrow(tbl).repartition(4), dest,
                       compress=True)
    assert stats["rows"].sum() == 50
    assert all(f.endswith(".warc.gz") for f in os.listdir(dest))
    back = (read_warc(dest).to_pandas()
            .sort_values("url", ignore_index=True))
    want = tbl.to_pandas().sort_values("url", ignore_index=True)
    assert back["content"].tolist() == want["content"].tolist()
    assert (back["warc_type"] == "conversion").all()


def test_header_values_crlf_safe_and_date_mandatory():
    rec = format_warc_record("conversion", "https://x/\r\nevil: 1",
                             None, b"body")
    t = parse_warc_bytes(rec + format_warc_record(
        "conversion", "u2", "2024-05-06T07:08:09Z", b"tail"))
    assert t.num_rows == 2  # framing survived the CRLF-bearing URL
    assert t.column("url").to_pylist()[0] == "https://x/%0D%0Aevil: 1"
    assert t.column("content").to_pylist() == ["body", "tail"]
    # WARC-Date is always present (epoch placeholder when unset)
    assert t.column("date").to_pylist() == [
        "1970-01-01T00:00:00Z", "2024-05-06T07:08:09Z"]
