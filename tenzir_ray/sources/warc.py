"""WARC / WET (web-archive) source and sink.

Common Crawl-style corpora arrive as WARC ("response" records carrying
HTTP payloads) or WET ("conversion" records carrying extracted text)
files — the standard container for web-scale pretraining ingest. This
module implements the WARC/1.0 record grammar (version line, CRLF
header block, Content-Length-delimited block, CRLF CRLF trailer;
ISO 28500) plus the two gzip conventions (whole-file gzip and the
per-record-member gzip that Common Crawl uses — both are just
multi-member streams to ``zlib``).

Scale shape: one task per WARC file (``read_binary_files`` → parse per
file), which matches how crawls are laid out (thousands of ~1 GB
segments); records never cross file boundaries so no inter-task state
is needed. The reference has no WARC connector — training-data
extension surface, like stages/url.py.
"""

from __future__ import annotations

import gzip
import io
import os
import sys
import uuid
import zlib

import pyarrow as pa

from tenzir_ray._ship import ship_by_value

_CRLF = b"\r\n"


def _gunzip_members(buf: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream — per-record
    members just concatenate."""
    out = []
    pos = 0
    while pos < len(buf):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(buf[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(buf) - len(tail)
    return b"".join(out)


def parse_warc_bytes(buf: bytes, *, kinds: "tuple | list | None" = None,
                     text: bool = True) -> pa.Table:
    """Parse one WARC/WET file's bytes into an Arrow table with columns
    ``(record_id, warc_type, url, date, content_type, length, content)``.
    ``kinds`` filters on WARC-Type (e.g. ``("response", "conversion")``);
    ``text=True`` decodes content as UTF-8 (replacement chars on binary
    payloads), else a binary column."""
    if buf[:2] == b"\x1f\x8b":
        buf = _gunzip_members(buf)
    ids, types, urls, dates, ctypes, lengths, contents = \
        [], [], [], [], [], [], []
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record blank lines
        while buf.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        head = buf[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line {head[0]!r}")
        fields = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except KeyError:
            raise ValueError("WARC record without Content-Length") from None
        body_start = hdr_end + 4
        body = buf[body_start:body_start + clen]
        if len(body) != clen:
            raise ValueError("truncated WARC record body")
        pos = body_start + clen
        rtype = fields.get("warc-type", "")
        if kinds is None or rtype in kinds:
            ids.append(fields.get("warc-record-id"))
            types.append(rtype)
            urls.append(fields.get("warc-target-uri"))
            dates.append(fields.get("warc-date"))
            ctypes.append(fields.get("content-type"))
            lengths.append(clen)
            contents.append(body.decode("utf-8", "replace") if text else body)
    return pa.table({
        "record_id": pa.array(ids, pa.string()),
        "warc_type": pa.array(types, pa.string()),
        "url": pa.array(urls, pa.string()),
        "date": pa.array(dates, pa.string()),
        "content_type": pa.array(ctypes, pa.string()),
        "length": pa.array(lengths, pa.int64()),
        "content": pa.array(contents, pa.string() if text else pa.binary()),
    })


def read_warc(paths, *, kinds: "tuple | list | None" = None,
              text: bool = True):
    """WARC/WET files → Dataset of records (one parse task per file;
    gzip — whole-file or per-record members — handled transparently)."""
    import ray.data

    ds = ray.data.read_binary_files(paths)

    def _parse(batch: pa.Table) -> pa.Table:
        tabs = [parse_warc_bytes(b.as_py(), kinds=kinds, text=text)
                for b in batch.column("bytes")]
        return (pa.concat_tables(tabs) if tabs
                else parse_warc_bytes(b"", text=text))

    return ds.map_batches(_parse, batch_format="pyarrow")


def _hdr(v: str) -> bytes:
    """Header-safe value: CR/LF percent-encoded so one malformed crawled
    URL cannot terminate the header block early and desync the record
    framing (Content-Length would then delimit the wrong bytes)."""
    return v.replace("\r", "%0D").replace("\n", "%0A").encode()


def format_warc_record(warc_type: str, url: "str | None",
                       date: "str | None", content: bytes,
                       record_id: "str | None" = None,
                       content_type: "str | None" = None) -> bytes:
    rid = record_id or f"<urn:uuid:{uuid.uuid4()}>"
    lines = [b"WARC/1.0",
             b"WARC-Type: " + _hdr(warc_type),
             b"WARC-Record-ID: " + _hdr(rid)]
    if url is not None:
        lines.append(b"WARC-Target-URI: " + _hdr(url))
    # WARC-Date is mandatory per ISO 28500 — callers that pass None get
    # the deterministic epoch placeholder (resumable identical output)
    lines.append(b"WARC-Date: " + _hdr(date or "1970-01-01T00:00:00Z"))
    if content_type is not None:
        lines.append(b"Content-Type: " + _hdr(content_type))
    lines.append(b"Content-Length: " + str(len(content)).encode())
    return _CRLF.join(lines) + b"\r\n\r\n" + content + b"\r\n\r\n"


class _WarcWriter:
    """One .warc(.gz) file per input block (resumable layout: the sink
    dir is the unit of retry, files are temp-written then renamed)."""

    def __init__(self, path: str, warc_type: str, url_col: "str | None",
                 date_col: "str | None", content_col: str, compress: bool):
        self.path = path
        self.warc_type = warc_type
        self.url_col, self.date_col = url_col, date_col
        self.content_col = content_col
        self.compress = compress

    def __call__(self, batch: pa.Table) -> pa.Table:
        bio = io.BytesIO()
        urls = (batch.column(self.url_col).to_pylist()
                if self.url_col and self.url_col in batch.column_names
                else [None] * batch.num_rows)
        dates = (batch.column(self.date_col).to_pylist()
                 if self.date_col and self.date_col in batch.column_names
                 else [None] * batch.num_rows)
        contents = batch.column(self.content_col).to_pylist()
        for url, date, content in zip(urls, dates, contents):
            body = (content.encode("utf-8")
                    if isinstance(content, str) else (content or b""))
            rec = format_warc_record(self.warc_type, url, date, body,
                                     content_type="text/plain")
            if self.compress:  # per-record gzip member (Common Crawl form)
                bio.write(gzip.compress(rec))
            else:
                bio.write(rec)
        ext = ".warc.gz" if self.compress else ".warc"
        rel = f"part-{uuid.uuid4().hex[:12]}{ext}"
        tmp = os.path.join(self.path, rel + ".tmp")
        with open(tmp, "wb") as f:
            f.write(bio.getvalue())
        os.replace(tmp, os.path.join(self.path, rel))
        return pa.table({"path": pa.array([rel]),
                         "rows": pa.array([batch.num_rows], pa.int64())})


def write_warc(ds, path: str, *, warc_type: str = "conversion",
               url_col: "str | None" = "url",
               date_col: "str | None" = None,
               content_col: str = "content",
               compress: bool = False,
               batch_size: int | None = None):
    """Dataset → directory of WARC/WET files (eager, like Ray write_*;
    returns per-file stats). ``compress=True`` writes per-record gzip
    members, the Common Crawl convention."""
    os.makedirs(path, exist_ok=True)
    return ds.map_batches(
        _WarcWriter(path, warc_type, url_col, date_col, content_col,
                    compress),
        batch_format="pyarrow", batch_size=batch_size).to_pandas()


ship_by_value(sys.modules[__name__])
