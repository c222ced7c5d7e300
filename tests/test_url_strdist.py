"""Session-10 operator tests: URL parse/canonicalize, string distances."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------- url


URLS = [
    "https://User@WWW.Example.COM:443/A/b?utm_source=x&q=1&fbclid=z#frag",
    "http://example.org:8080/",
    "http://example.org",
    "ftp://Files.example.net:21/pub/file.txt",
    "https://example.com/path?utm_a=1&utm_b=2",
    "mailto:someone@example.com",
    "//cdn.example.com/asset.js",
    "/relative/path?x=1",
    None,
]


def _one_table():
    return pa.table({"i": list(range(len(URLS))),
                     "url": pa.array(URLS, pa.string())})


def test_parse_url_components(ray_session):
    import ray.data

    from tenzir_ray.stages.url import parse_url

    df = (parse_url(ray.data.from_arrow(_one_table()), "url")
          .to_pandas().sort_values("i", ignore_index=True))
    assert df.loc[0, "url_scheme"] == "https"
    assert df.loc[0, "url_host"] == "WWW.Example.COM"  # parse keeps case
    assert df.loc[0, "url_port"] == 443
    assert df.loc[0, "url_path"] == "/A/b"
    assert df.loc[0, "url_query"] == "utm_source=x&q=1&fbclid=z"
    assert df.loc[0, "url_fragment"] == "frag"
    # no explicit port -> null port; no query/fragment -> null
    assert pd.isna(df.loc[2, "url_port"])
    assert pd.isna(df.loc[2, "url_query"])
    assert pd.isna(df.loc[2, "url_path"])  # absent path is null, not ""
    # scheme-less network path and path-only references
    assert pd.isna(df.loc[6, "url_scheme"])
    assert df.loc[6, "url_host"] == "cdn.example.com"
    assert pd.isna(df.loc[7, "url_host"])
    assert df.loc[7, "url_path"] == "/relative/path"
    # mailto: opaque path, no authority
    assert df.loc[5, "url_scheme"] == "mailto"
    assert df.loc[5, "url_path"] == "someone@example.com"
    # null input -> all-null components
    assert pd.isna(df.loc[8, "url_scheme"]) and pd.isna(df.loc[8, "url_host"])


def test_canonical_url_rules(ray_session):
    import ray.data

    from tenzir_ray.stages.url import canonical_url

    df = (canonical_url(ray.data.from_arrow(_one_table()), "url")
          .to_pandas().sort_values("i", ignore_index=True))
    # lowercased host, default port stripped, tracking params dropped,
    # fragment dropped, userinfo kept
    assert df.loc[0, "canonical_url"] == "https://User@www.example.com/A/b?q=1"
    # non-default port kept; empty path -> "/"
    assert df.loc[1, "canonical_url"] == "http://example.org:8080/"
    assert df.loc[2, "canonical_url"] == "http://example.org/"
    # ftp default port 21 stripped
    assert df.loc[3, "canonical_url"] == "ftp://files.example.net/pub/file.txt"
    # all params tracking -> no "?"
    assert df.loc[4, "canonical_url"] == "https://example.com/path"
    assert df.loc[5, "canonical_url"] == "mailto:someone@example.com"
    assert df.loc[7, "canonical_url"] == "/relative/path?x=1"
    assert pd.isna(df.loc[8, "canonical_url"])


def test_url_host_groups(ray_session):
    import ray.data

    from tenzir_ray.stages.url import url_host

    df = (url_host(ray.data.from_arrow(_one_table()), "url")
          .to_pandas().sort_values("i", ignore_index=True))
    assert df.loc[0, "host"] == "www.example.com"
    assert df.loc[6, "host"] == "cdn.example.com"


# ---------------------------------------------------------------- strdist


def test_levenshtein_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from tenzir_ray.stages.text import string_distance

    rng = np.random.default_rng(3)
    alpha = list("abcdef")
    a = ["".join(rng.choice(alpha, rng.integers(0, 12))) for _ in range(300)]
    b = ["".join(rng.choice(alpha, rng.integers(0, 12))) for _ in range(300)]
    tbl = pa.table({"i": np.arange(300), "a": a, "b": b})
    got = (string_distance(ray.data.from_arrow(tbl), "a", "b",
                           metrics={"lev": "levenshtein"})
           .to_pandas().sort_values("i", ignore_index=True))
    con = duckdb.connect()
    want = con.execute(
        "SELECT i, levenshtein(a, b) AS lev FROM tbl ORDER BY i").df()
    assert (got["lev"].to_numpy(np.int64)
            == want["lev"].to_numpy(np.int64)).all()


def test_hamming_jaccard_and_nulls(ray_session):
    import ray.data

    from tenzir_ray.stages.text import string_distance

    tbl = pa.table({
        "i": [0, 1, 2],
        "a": pa.array(["karolin", "abcabc", None], pa.string()),
        "b": pa.array(["kathrin", "cbacba", "x"], pa.string()),
    })
    df = (string_distance(ray.data.from_arrow(tbl), "a", "b",
                          metrics={"ham": "hamming", "jac": "jaccard"})
          .to_pandas().sort_values("i", ignore_index=True))
    assert df.loc[0, "ham"] == 3
    assert df.loc[1, "jac"] == 1.0
    assert pd.isna(df.loc[2, "ham"]) and pd.isna(df.loc[2, "jac"])


def test_hamming_unequal_length_raises(ray_session):
    import ray.data

    from tenzir_ray.stages.text import string_distance

    tbl = pa.table({"a": ["ab"], "b": ["abc"]})
    with pytest.raises(Exception, match="equal-length"):
        string_distance(ray.data.from_arrow(tbl), "a", "b",
                        metrics={"h": "hamming"}).materialize()


# ------------------------------------------------------------ unicode


def test_normalize_unicode_forms(ray_session):
    import ray.data

    from tenzir_ray.stages.text import normalize_unicode

    decomp = "Cre" + chr(0x301) + "me"
    comp = "Cr" + chr(0xE9) + "me"
    lig = "e" + chr(0xFB01) + "cient"  # fi ligature
    tbl = pa.table({"i": [0, 1, 2],
                    "text": pa.array([decomp, comp, lig], pa.string())})

    def run(form):
        return (normalize_unicode(ray.data.from_arrow(tbl), "text",
                                  form=form, out="n")
                .to_pandas().sort_values("i", ignore_index=True)["n"])

    nfc = run("NFC")
    assert nfc[0] == comp and nfc[1] == comp and nfc[2] == lig
    nfkc = run("NFKC")
    assert nfkc[2] == "eficient"
    with pytest.raises(ValueError, match="unknown normalization"):
        normalize_unicode(ray.data.from_arrow(tbl), "text", form="NFX")


def test_strip_accents_expression(ray_session):
    import ray.data

    from tenzir_ray.stages.transforms import put

    tbl = pa.table({"s": ["Cr" + chr(0xE9) + "me",
                          chr(0xC5) + "ngstr" + chr(0xF6) + "m"]})
    df = put(ray.data.from_arrow(tbl), bare="s.strip_accents()").to_pandas()
    assert sorted(df["bare"]) == ["Angstrom", "Creme"]
    # composing forms are rejected with a pointer at the stage
    with pytest.raises(Exception, match="normalize_unicode"):
        put(ray.data.from_arrow(tbl),
            n='s.normalize("NFC")').materialize()


def test_jaro_winkler_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from tenzir_ray.stages.text import string_distance

    rng = np.random.default_rng(11)
    alpha = list("abcdefg")
    a = ["".join(rng.choice(alpha, rng.integers(0, 10))) for _ in range(200)]
    b = ["".join(rng.choice(alpha, rng.integers(0, 10))) for _ in range(200)]
    tbl = pa.table({"i": np.arange(200), "a": a, "b": b})
    got = (string_distance(ray.data.from_arrow(tbl), "a", "b",
                           metrics={"jaro": "jaro", "jw": "jaro_winkler"})
           .to_pandas().sort_values("i", ignore_index=True))
    con = duckdb.connect()
    want = con.execute(
        "SELECT i, jaro_similarity(a, b) AS jaro,"
        "       jaro_winkler_similarity(a, b) AS jw FROM tbl ORDER BY i"
    ).df()
    assert np.allclose(got["jaro"], want["jaro"], rtol=0, atol=1e-12)
    assert np.allclose(got["jw"], want["jw"], rtol=0, atol=1e-12)


def test_greatest_least_nullif_nulls(ray_session):
    import ray.data

    from tenzir_ray.stages.transforms import put

    tbl = pa.table({
        "a": pa.array([1, None, None], pa.int64()),
        "b": pa.array([5, 2, None], pa.int64()),
    })
    df = put(ray.data.from_arrow(tbl),
             g="greatest(a, b)", l="least(a, b)",
             nf="nullif(b, 2)").to_pandas()
    assert df["g"].tolist()[0] == 5
    assert df["g"].tolist()[1] == 2      # null skipped, DuckDB-style
    assert pd.isna(df["g"].tolist()[2])  # all-null -> null
    assert df["l"].tolist()[0] == 1
    assert pd.isna(df["nf"].tolist()[1]) and df["nf"].tolist()[0] == 5


def test_time_part_methods(ray_session):
    import datetime as dt

    import ray.data

    from tenzir_ray.stages.transforms import put

    ts = [dt.datetime(1995, 3, 15, 14, 30, 45),   # Wednesday
          dt.datetime(2000, 1, 2, 3, 4, 5),       # Sunday
          None]
    tbl = pa.table({"i": [0, 1, 2], "ts": pa.array(ts, pa.timestamp("us"))})
    df = (put(ray.data.from_arrow(tbl), i="i",
              y="ts.year()", dow="ts.dow()", idow="ts.isodow()",
              iw="ts.week()", tm='ts.trunc("month")',
              eus="ts.epoch_us()")
          .to_pandas().sort_values("i", ignore_index=True))
    assert df.loc[0, "y"] == 1995
    assert df.loc[0, "dow"] == 3 and df.loc[1, "dow"] == 0  # Sun=0
    assert df.loc[0, "idow"] == 3 and df.loc[1, "idow"] == 7
    assert df.loc[1, "iw"] == 52  # ISO week of 1999
    assert df.loc[0, "tm"] == pd.Timestamp("1995-03-01")
    assert df.loc[0, "eus"] == 795277845000000
    assert pd.isna(df.loc[2, "y"])


def test_review_fixes_url_and_epoch(ray_session):
    import datetime as dt

    import ray.data

    from tenzir_ray.stages.transforms import put
    from tenzir_ray.stages.url import canonical_url, parse_url

    tbl = pa.table({"i": [0, 1, 2], "url": [
        "https://e.com/?fbclid2=9&q=1",        # NOT a tracking param
        "https://e.com/a?x=1&gclid_src=2",     # NOT a tracking param
        "http://host:99999999999999999999999/p",
    ]})
    df = (canonical_url(parse_url(ray.data.from_arrow(tbl), "url"), "url")
          .to_pandas().sort_values("i", ignore_index=True))
    assert df.loc[0, "canonical_url"] == "https://e.com/?fbclid2=9&q=1"
    assert df.loc[1, "canonical_url"] == "https://e.com/a?x=1&gclid_src=2"
    assert pd.isna(df.loc[2, "url_port"])  # out-of-range -> null

    ns = pa.table({"ts": pa.array(
        [dt.datetime(1995, 3, 15, 14, 30, 45)]).cast(pa.timestamp("ns"))})
    out = put(ray.data.from_arrow(ns), eus="ts.epoch_us()").to_pandas()
    assert out["eus"].iloc[0] == 795277845000000  # us, not raw ns


def test_standardize_and_minmax(ray_session):
    import ray.data

    from tenzir_ray.stages.analytics import minmax_scale, standardize

    tbl = pa.table({
        "g": ["a", "a", "a", "b", "b", "c"],
        "x": [1.0, 2.0, 3.0, 10.0, 10.0, 7.0],
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    df = standardize(ds, "x", by="g", out="z").to_pandas()
    a = df[df["g"] == "a"].sort_values("x")["z"].to_numpy()
    assert np.allclose(a, [-1.0, 0.0, 1.0])      # ddof=1: sd=1
    assert df[df["g"] == "b"]["z"].isna().all()  # constant group -> null
    assert df[df["g"] == "c"]["z"].isna().all()  # single row -> null

    pop = standardize(ds, "x", by="g", out="z", ddof=0).to_pandas()
    a0 = pop[pop["g"] == "a"].sort_values("x")["z"].to_numpy()
    assert np.allclose(a0, [-np.sqrt(3 / 2), 0.0, np.sqrt(3 / 2)])
    assert pop[pop["g"] == "b"]["z"].isna().all()  # sd=0 -> null

    mm = minmax_scale(ds, "x", out="m").to_pandas().sort_values("x")
    assert np.allclose(mm["m"].to_numpy(),
                       (mm["x"].to_numpy() - 1.0) / 9.0)
    gm = minmax_scale(ds, "x", by="g", out="m").to_pandas()
    assert gm[gm["g"] == "b"]["m"].isna().all()  # degenerate range


def test_concat_and_casts(ray_session):
    import ray.data

    from tenzir_ray.stages.transforms import put

    t = pa.table({"id": [1, 2],
                  "lang": pa.array(["en", None], pa.string())})
    df = (put(ray.data.from_arrow(t), id="id",
              u='concat("d-", id.str(), "-", lang)', f="id.float()")
          .to_pandas().sort_values("id", ignore_index=True))
    assert df["u"].tolist() == ["d-1-en", "d-2-"]  # null -> empty
    assert df["f"].tolist() == [1.0, 2.0]


def test_concat_bool_and_bad_literals(ray_session):
    import ray.data

    from tenzir_ray.stages.transforms import put

    t = pa.table({"id": [7]})
    df = put(ray.data.from_arrow(t),
             u='concat("f:", true, "-", id.str())').to_pandas()
    assert df["u"].tolist() == ["f:true-7"]  # DuckDB lowercase booleans
    with pytest.raises(Exception, match="unsupported argument"):
        put(ray.data.from_arrow(t), u='concat("x", [1, 2])').materialize()


def test_url_codec_and_canonical_idempotence(ray_session):
    import ray.data

    from tenzir_ray.stages.url import canonical_url, url_decode, url_encode

    raws = ["a b/c?x=1&y=é", "no-escapes", "%zz invalid", None]
    tbl = pa.table({"i": range(4), "s": pa.array(raws, pa.string())})
    ds = url_encode(ray.data.from_arrow(tbl), "s", out="enc")
    df = (url_decode(ds, "enc", out="dec")
          .to_pandas().sort_values("i", ignore_index=True))
    # decode(encode(x)) == x for all non-null rows
    assert df["dec"].tolist()[:3] == raws[:3]
    assert pd.isna(df.loc[3, "dec"])
    # invalid escape passes through decode untouched
    one = url_decode(ray.data.from_arrow(
        pa.table({"s": ["%zz%20ok"]})), "s").to_pandas()
    assert one["s"].tolist() == ["%zz ok"]

    # canonicalization is idempotent: canonical(canonical(u)) == canonical(u)
    canon1 = (canonical_url(ray.data.from_arrow(_one_table()), "url",
                            out="c1"))
    both = (canonical_url(canon1, "c1", out="c2")
            .to_pandas().sort_values("i", ignore_index=True))
    mask = both["c1"].notna()
    assert (both.loc[mask, "c1"] == both.loc[mask, "c2"]).all()


def test_unroll_indexed_positions(ray_session):
    import ray.data

    from tenzir_ray.stages.transforms import unroll_indexed

    tbl = pa.table({"k": [1, 2, 3],
                    "v": [[10, 11], [], [20, 21, 22]]})
    df = (unroll_indexed(ray.data.from_arrow(tbl), "v")
          .to_pandas().sort_values(["k", "pos"], ignore_index=True))
    assert df["k"].tolist() == [1, 1, 3, 3, 3]  # empty list dropped
    assert df["pos"].tolist() == [1, 2, 1, 2, 3]  # restarts per list
    assert df["v"].tolist() == [10, 11, 20, 21, 22]
    z = (unroll_indexed(ray.data.from_arrow(tbl), "v", base=0)
         .to_pandas())
    assert z["pos"].min() == 0
