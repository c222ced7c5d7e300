"""MaxMind-DB binary format: writer/reader roundtrip, longest-prefix
semantics, IPv4-in-IPv6 trees, and the enrich stage."""

import pyarrow as pa
import pytest

from tenzir_ray.sources.mmdb import MmdbReader, enrich_mmdb, write_mmdb

ENTRIES = [
    ("10.0.0.0/8", {"country": {"iso_code": "US",
                                "names": {"en": "United States"}},
                    "location": {"latitude": 38.0, "longitude": -97.0},
                    "asn": 64512}),
    # more-specific than 10/8 — longest prefix must win
    ("10.9.0.0/16", {"country": {"iso_code": "CA",
                                 "names": {"en": "Canada"}},
                     "asn": 64513}),
    ("192.168.0.0/16", {"country": {"iso_code": "DE",
                                    "names": {"en": "Germany"}},
                        "asn": 64514}),
]


def test_mmdb_roundtrip_and_longest_prefix(tmp_path):
    p = str(tmp_path / "geo.mmdb")
    write_mmdb(p, ENTRIES)
    r = MmdbReader(p)
    assert r.metadata["ip_version"] == 4
    assert r.metadata["binary_format_major_version"] == 2
    assert r.lookup("10.1.2.3")["country"]["iso_code"] == "US"
    assert r.lookup("10.1.2.3")["location"]["latitude"] == 38.0
    assert r.lookup("10.9.4.4")["country"]["iso_code"] == "CA"  # /16 beats /8
    assert r.lookup("10.9.4.4")["asn"] == 64513
    assert r.lookup("192.168.77.1")["country"]["names"]["en"] == "Germany"
    assert r.lookup("11.0.0.1") is None
    assert r.lookup("8.8.8.8") is None
    assert r.lookup("not-an-ip") is None
    assert r.lookup("2001:db8::1") is None  # v6 against a v4 db
    r.close()


def test_mmdb_default_route_slash_zero(tmp_path):
    """A /0 entry is a catch-all; more-specific networks still win
    regardless of insert order (ADVICE r3: /0 was silently dropped)."""
    for order in (0, 1):
        p = str(tmp_path / f"d{order}.mmdb")
        ents = [("0.0.0.0/0", {"country": {"iso_code": "XX"}}),
                ("10.0.0.0/8", {"country": {"iso_code": "US"}})]
        write_mmdb(p, ents if order == 0 else list(reversed(ents)))
        r = MmdbReader(p)
        assert r.lookup("8.8.8.8")["country"]["iso_code"] == "XX"
        assert r.lookup("10.1.2.3")["country"]["iso_code"] == "US"


def test_mmdb_insert_order_independent(tmp_path):
    a, b = str(tmp_path / "a.mmdb"), str(tmp_path / "b.mmdb")
    write_mmdb(a, ENTRIES)
    write_mmdb(b, list(reversed(ENTRIES)))  # specific BEFORE covering
    ra, rb = MmdbReader(a), MmdbReader(b)
    for ip in ("10.1.2.3", "10.9.4.4", "10.9.255.255", "10.8.255.255",
               "192.168.0.1", "1.2.3.4"):
        assert ra.lookup(ip) == rb.lookup(ip), ip
    ra.close(), rb.close()


def test_mmdb_ipv6_tree_with_v4(tmp_path):
    p = str(tmp_path / "v6.mmdb")
    write_mmdb(p, [
        ("2001:db8::/32", {"country": {"iso_code": "NL"}}),
        ("10.0.0.0/8", {"country": {"iso_code": "US"}}),
    ], ip_version=6)
    r = MmdbReader(p)
    assert r.lookup("2001:db8::42")["country"]["iso_code"] == "NL"
    # v4 lookups traverse the 96-zero-bit prefix automatically
    assert r.lookup("10.200.1.1")["country"]["iso_code"] == "US"
    assert r.lookup("11.0.0.1") is None
    assert r.lookup("2001:db9::1") is None
    r.close()


def test_enrich_mmdb_stage(ray_session, tmp_path):
    import ray.data as rd

    p = str(tmp_path / "geo.mmdb")
    write_mmdb(p, ENTRIES)
    t = pa.table({
        "ip": pa.array(["10.1.2.3", "10.9.4.4", "8.8.8.8", "192.168.0.7",
                        "10.1.2.3"]),
        "n": pa.array(range(5), pa.int64()),
    })
    out = enrich_mmdb(rd.from_arrow(t), p, "ip").to_pandas().sort_values("n")
    assert out["geo_country_iso_code"].tolist() == ["US", "CA", None, "DE", "US"]
    assert out["geo_asn"].tolist()[0] == 64512
    only = enrich_mmdb(rd.from_arrow(t), p, "ip",
                       filter_unmatched=True).to_pandas()
    assert len(only) == 4
