"""FTP connector + SMTP email sink (reference connectors/curl.cpp:371-383
``ftp``/``ftps`` and connectors/email.cpp).

The reference treats both as curl byte-stream endpoints: ``ftp`` is a
loader/saver over an ``ftp://`` URL; ``email`` is a saver that uploads
the rendered pipeline output over ``smtp://`` with From/To/Subject
headers (email.cpp:23-49, CURLOPT_MAIL_FROM/RCPT at :76-103). Here the
stdlib clients (``ftplib``/``smtplib``) replace libcurl; both are
loopback-tested in tests/test_round4_ops.py against in-process servers.

Sinks are DRIVER-side and bounded: an email body is not a 100 TB
artifact — ``write_email`` caps the rendered rows (``max_rows``) and
streams batches via ``iter_batches`` so nothing materializes beyond the
cap. ``read_ftp`` downloads to a local spool file and dispatches to the
matching reader, so the Ray-side plumbing (parallel parquet/csv decode)
is identical to local files.
"""

from __future__ import annotations

import io
import os
import tempfile
from urllib.parse import unquote, urlparse


def _parse_ftp_url(url: str):
    u = urlparse(url)
    if u.scheme not in ("ftp", "ftps"):
        raise ValueError(f"not an ftp url: {url!r}")
    return (
        u.hostname or "localhost",
        u.port or 21,
        unquote(u.username or "anonymous"),
        unquote(u.password or "anonymous@"),
        u.path or "/",
        u.scheme == "ftps",
    )


def _ftp_client(host, port, user, password, tls: bool, timeout: float):
    import ftplib

    if tls:
        ftp = ftplib.FTP_TLS(timeout=timeout)
    else:
        ftp = ftplib.FTP(timeout=timeout)
    ftp.connect(host, port)
    ftp.login(user, password)
    if tls:
        ftp.prot_p()
    return ftp


def ftp_fetch(url: str, local_path: str | None = None,
              timeout: float = 30.0) -> str:
    """RETR an ``ftp://[user:pass@]host[:port]/path`` into a local file;
    returns the local path (the loader half of the reference's ftp
    connector)."""
    host, port, user, pw, path, tls = _parse_ftp_url(url)
    if local_path is None:
        suffix = os.path.splitext(path)[1]
        fd, local_path = tempfile.mkstemp(prefix="tenzir_ray_ftp_",
                                          suffix=suffix)
        os.close(fd)
    ftp = _ftp_client(host, port, user, pw, tls, timeout)
    try:
        with open(local_path, "wb") as f:
            ftp.retrbinary(f"RETR {path}", f.write)
    finally:
        try:
            ftp.quit()
        except Exception:
            ftp.close()
    return local_path


def ftp_store(url: str, data: bytes, timeout: float = 30.0) -> int:
    """STOR bytes to an ftp url (the saver half). Returns len(data)."""
    host, port, user, pw, path, tls = _parse_ftp_url(url)
    ftp = _ftp_client(host, port, user, pw, tls, timeout)
    try:
        ftp.storbinary(f"STOR {path}", io.BytesIO(data))
    finally:
        try:
            ftp.quit()
        except Exception:
            ftp.close()
    return len(data)


def read_ftp(url: str, format: str | None = None, timeout: float = 30.0,
             **reader_kwargs):
    """Download an ftp file and read it as a Dataset — format inferred
    from the extension (parquet/csv/tsv/json/ndjson/feather/lines) or
    forced via ``format=``."""
    import atexit

    from tenzir_ray.sources import readers

    local = ftp_fetch(url, timeout=timeout)
    # the Dataset reads the spool lazily, so it can't be unlinked here —
    # reclaim it at interpreter exit instead of leaking one file per call
    atexit.register(lambda p=local: os.path.exists(p) and os.unlink(p))
    ext = (format or os.path.splitext(url)[1].lstrip(".")).lower()
    dispatch = {
        "parquet": readers.read_parquet,
        "csv": readers.read_csv,
        "tsv": lambda p, **kw: readers.read_csv(p, delimiter="\t", **kw),
        "json": readers.read_json, "ndjson": readers.read_json,
        "jsonl": readers.read_json,
        "feather": readers.read_feather, "arrow": readers.read_feather,
        "lines": readers.read_lines, "txt": readers.read_lines,
        "log": readers.read_lines,
    }
    fn = dispatch.get(ext)
    if fn is None:
        raise ValueError(f"read_ftp: cannot infer a reader from {url!r}; "
                         f"pass format= one of {sorted(dispatch)}")
    return fn(local, **reader_kwargs)


# ---------------------------------------------------------------------------
# email (SMTP) sink


def _render_rows(ds, format: str, max_rows: int) -> tuple[str, int]:
    """Render up to max_rows of a Dataset (or pandas/arrow object) as
    text — ndjson | csv | table (ascii)."""
    import pandas as pd

    if hasattr(ds, "iter_batches"):  # Dataset: stream until the cap
        frames = []
        seen = 0
        for b in ds.iter_batches(batch_format="pandas", batch_size=8192):
            frames.append(b.iloc[: max_rows - seen])
            seen += len(frames[-1])
            if seen >= max_rows:
                break
        df = (pd.concat(frames, ignore_index=True)
              if frames else pd.DataFrame())
    elif hasattr(ds, "to_pandas"):
        df = ds.to_pandas().head(max_rows)
    else:
        df = pd.DataFrame(ds).head(max_rows)
    if format == "ndjson":
        return (df.to_json(orient="records", lines=True,
                           date_format="iso") or "", len(df))
    if format == "csv":
        return df.to_csv(index=False), len(df)
    if format == "table":
        return df.to_string(index=False), len(df)
    raise ValueError(f"write_email: unknown format {format!r}")


def write_email(ds, endpoint: str, to: str | list[str],
                from_: str | None = None, subject: str | None = None,
                format: str = "ndjson", max_rows: int = 100_000,
                timeout: float = 30.0) -> dict:
    """Send pipeline output as an email (reference email.cpp saver:
    endpoint/to/from/subject options; plain body = the rendered events,
    the non-mime path). ``endpoint`` is ``smtp://host[:port]`` or
    ``smtps://`` (TLS). Bounded by ``max_rows`` — an alerting/report
    sink, not a bulk exporter."""
    import smtplib
    from email.message import EmailMessage

    u = urlparse(endpoint)
    if u.scheme not in ("smtp", "smtps"):
        raise ValueError(f"write_email: endpoint must be smtp[s]://, "
                         f"got {endpoint!r}")
    host = u.hostname or "localhost"
    port = u.port or (465 if u.scheme == "smtps" else 25)
    tos = [to] if isinstance(to, str) else list(to)
    sender = from_ or "tenzir-ray@localhost"

    body, nrows = _render_rows(ds, format, max_rows)
    msg = EmailMessage()
    msg["From"] = sender
    msg["To"] = ", ".join(tos)
    if subject:
        msg["Subject"] = subject
    msg.set_content(body)

    cls = smtplib.SMTP_SSL if u.scheme == "smtps" else smtplib.SMTP
    with cls(host, port, timeout=timeout) as s:
        s.send_message(msg, from_addr=sender, to_addrs=tos)
    return {"to": tos, "bytes": len(body), "rows": nrows}
