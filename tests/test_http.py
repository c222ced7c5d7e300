"""HTTP connector breadth (curl.cpp analog): methods, headers, auth,
three pagination styles, and the save side — loopback-tested against a
mock API server."""

import json
import threading

import pyarrow as pa
import pytest

from tenzir_ray.sources.net import (
    http_request,
    read_http_json,
    write_http,
)


class _MockApi:
    """Tiny loopback REST server exercising every connector feature."""

    def __init__(self):
        self.posted: list[bytes] = []
        self.post_headers: list[dict] = []
        self._httpd = None

    def start(self) -> int:
        import http.server
        from urllib.parse import parse_qs, urlparse

        outer = self

        class _H(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, obj, status=200):
                body = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                q = parse_qs(u.query)
                if u.path == "/items":
                    self._send([{"id": i, "v": f"x{i}"} for i in range(5)])
                elif u.path == "/one":
                    self._send({"id": 99, "v": "solo"})
                elif u.path == "/secure":
                    if self.headers.get("Authorization") != "Bearer sesame":
                        self._send({"error": "unauthorized"}, 401)
                    else:
                        self._send([{"ok": True}])
                elif u.path == "/paged":
                    page = int(q.get("page", ["1"])[0])
                    items = ([{"id": (page - 1) * 3 + i} for i in range(3)]
                             if page <= 3 else [])
                    self._send(items)
                elif u.path == "/cursor":
                    tok = int(q.get("cursor", ["0"])[0])
                    nxt = tok + 1 if tok < 2 else None
                    self._send({"items": [{"id": tok * 10}],
                                "next_token": nxt})
                elif u.path == "/linked":
                    p = int(q.get("p", ["1"])[0])
                    host, port = self.server.server_address
                    nxt = (f"http://{host}:{port}/linked?p={p+1}"
                           if p < 3 else None)
                    self._send({"data": {"items": [{"id": p * 100}]},
                                "next": nxt})
                else:
                    self._send({"error": "nope"}, 404)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                outer.posted.append(self.rfile.read(n))
                outer.post_headers.append(dict(self.headers))
                self._send({"accepted": True})

        self._httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _H)
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()
        return self._httpd.server_address[1]

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()


@pytest.fixture()
def api():
    srv = _MockApi()
    port = srv.start()
    yield srv, f"http://127.0.0.1:{port}"
    srv.stop()


def test_http_request_methods_auth_errors(api):
    srv, base = api
    status, _h, body = http_request(f"{base}/one")
    assert status == 200 and json.loads(body)["id"] == 99
    # 4xx comes back as a status, not an exception
    status, _h, _b = http_request(f"{base}/secure")
    assert status == 401
    status, _h, body = http_request(f"{base}/secure", auth="sesame")
    assert status == 200
    # basic auth builds the right header shape
    status, _h, _b = http_request(f"{base}/one", auth=("u", "p"))
    assert status == 200
    # POST with json_body
    status, _h, _b = http_request(f"{base}/ingest", method="POST",
                                  json_body={"a": 1})
    assert status == 200
    assert json.loads(srv.posted[-1]) == {"a": 1}
    assert srv.post_headers[-1]["Content-Type"] == "application/json"


def test_read_http_json_plain_and_object(ray_session, api):
    _srv, base = api
    ds = read_http_json(f"{base}/items")
    assert sorted(r["id"] for r in ds.take_all()) == [0, 1, 2, 3, 4]
    one = read_http_json(f"{base}/one")
    assert one.take_all()[0]["v"] == "solo"
    # auth required
    with pytest.raises(IOError):
        read_http_json(f"{base}/secure")
    ok = read_http_json(f"{base}/secure", auth="sesame")
    assert ok.take_all()[0]["ok"] is True


def test_read_http_json_pagination_styles(ray_session, api):
    _srv, base = api
    # page_param: pages 1..3 of 3 rows each, stop on empty
    ds = read_http_json(f"{base}/paged",
                        paginate={"kind": "page_param", "param": "page"})
    assert sorted(r["id"] for r in ds.take_all()) == list(range(9))
    # token_param: tokens 0,1,2 then null
    ds = read_http_json(f"{base}/cursor", items_path="items",
                        paginate={"kind": "token_param", "param": "cursor",
                                  "path": "next_token"})
    assert sorted(r["id"] for r in ds.take_all()) == [0, 10, 20]
    # next_url with nested items_path
    ds = read_http_json(f"{base}/linked", items_path="data.items",
                        paginate={"kind": "next_url", "path": "next"})
    assert sorted(r["id"] for r in ds.take_all()) == [100, 200, 300]


def test_write_http_roundtrip(ray_session, api):
    import ray.data as rd

    srv, base = api
    t = pa.table({"id": pa.array(range(20), pa.int64()),
                  "v": pa.array([f"r{i}" for i in range(20)])})
    res = write_http(rd.from_arrow(t).repartition(4), f"{base}/ingest",
                     auth="sesame", batch_size=5)
    assert res["rows"] == 20 and res["requests"] >= 1
    rows = []
    for blob in srv.posted:
        rows.extend(json.loads(line) for line in blob.decode().splitlines())
    assert sorted(r["id"] for r in rows) == list(range(20))
    assert all(h.get("Authorization") == "Bearer sesame"
               for h in srv.post_headers)
    assert srv.post_headers[0]["Content-Type"] == "application/x-ndjson"
