"""YARA engine: parser, string kinds, condition semantics, Dataset stage.

Reference surface: plugins/yara (libyara scanner → one yara.match event
per matching rule; web/docs/operators/yara.md documents the exact output
record), exercised here against the documented example and the public
YARA v4 language spec."""

import base64
import json

import pyarrow as pa
import pytest

from tenzir_ray.stages.yara import (
    CompiledRule,
    compile_rules,
    parse_rules,
    yara_,
    yara_scan_bytes,
)

DOC_EXAMPLE = """
rule test {
  meta:
    string = "string meta data"
    integer = 42
    boolean = true
  strings:
    $foo = "foo"
    $bar = "bar"
    $baz = "baz"
  condition:
    ($foo and $bar) or $baz
}
"""


def test_reference_doc_example():
    """The docs' `echo 'foo bar' | yara test.yara` walkthrough, field
    for field (web/docs/operators/yara.md)."""
    ev = yara_scan_bytes(b"foo bar", DOC_EXAMPLE)
    assert len(ev) == 1
    r = ev[0]["rule"]
    assert r["identifier"] == "test"
    assert r["namespace"] == "default"
    assert r["meta"] == {"string": "string meta data", "integer": 42,
                         "boolean": True}
    assert set(r["strings"]) == {"$foo", "$bar", "$baz"}
    m = ev[0]["matches"]
    assert m["$foo"] == [{"data": "Zm9v", "base": 0, "offset": 0,
                          "match_length": 3}]
    assert m["$bar"][0]["offset"] == 4
    assert "$baz" not in m
    assert yara_scan_bytes(b"nothing", DOC_EXAMPLE) == []
    assert yara_scan_bytes(b"... baz ...", DOC_EXAMPLE)


def test_parse_tags_comments_multirule():
    src = """
    // line comment
    rule a : exe malware { strings: $x = "A" condition: $x }
    /* block
       comment */
    private rule b { condition: true }
    """
    rules = parse_rules(src)
    assert [r["identifier"] for r in rules] == ["a", "b"]
    assert rules[0]["tags"] == ["exe", "malware"]
    assert rules[1]["strings"] == {}


def test_hex_strings_wildcards_jumps():
    src = """rule h { strings:
      $a = { 4D 5A ?? 00 }
      $b = { FF [2-4] FE }
      $c = { A? ?B }
      $d = { ( 01 | 02 ) 03 }
    condition: $a or $b or $c or $d }"""
    [r] = compile_rules(src)
    assert r.scan(b"\x4d\x5a\x99\x00")
    assert r.scan(b"\xff12\xfe")
    assert r.scan(b"\xff1234\xfe")
    assert r.scan(b"\xff1\xfe") is None  # jump below range
    assert r.scan(b"\xa7\x5b")  # A? matches 0xA7, ?B matches 0x5B
    assert r.scan(b"\x02\x03") and r.scan(b"\x01\x03")
    assert r.scan(b"\x04\x03") is None


def test_text_modifiers():
    src = """rule t { strings:
      $n = "MiXeD" nocase
      $w = "wide" wide
      $f = "word" fullword
    condition: $n or $w or $f }"""
    [r] = compile_rules(src)
    assert r.scan(b"xx mixed yy")
    assert r.scan(b"w\x00i\x00d\x00e\x00")
    assert r.scan(b"wide") is None  # wide-only string, ascii input
    assert r.scan(b"a word here")
    assert r.scan(b"sword") is None
    assert r.scan(b"words") is None


def test_regex_strings():
    src = r"""rule re { strings:
      $r = /ab+c/
      $i = /HeLLo/i
    condition: $r or $i }"""
    [r] = compile_rules(src)
    assert r.scan(b"xabbbcx")
    assert r.scan(b"hello")
    assert r.scan(b"abc ")


def test_condition_counts_offsets_uint_filesize():
    src = """rule c { strings:
      $a = "ha"
    condition:
      #a >= 3 and @a == 0 and filesize < 1KB and uint8(0) == 0x68
      and uint16(0) == 0x6168
    }"""
    [r] = compile_rules(src)
    assert r.scan(b"hahaha")
    assert r.scan(b"xhahaha") is None  # @a == 1, uint8(0) != 'h'


def test_condition_of_sets_and_at_in():
    src = """rule o { strings:
      $a1 = "alpha"
      $a2 = "beta"
      $b1 = "gamma"
    condition:
      2 of ($a*) or all of them or $b1 at 10 or $a1 in (5..20)
    }"""
    [r] = compile_rules(src)
    assert r.scan(b"alpha beta")
    assert r.scan(b"0123456789gamma")
    assert r.scan(b"12345alpha")
    assert r.scan(b"gamma") is None
    assert r.scan(b"alpha") is None  # at offset 0, not in (5..20)


def test_unsupported_constructs_raise():
    with pytest.raises(ValueError):
        compile_rules("rule m { condition: pe.is_dll() }")
    with pytest.raises(ValueError):
        compile_rules("no rules here at all")
    with pytest.raises(ValueError):
        compile_rules('rule s { strings: $a = "x" frobnicate condition: $a }')
    with pytest.raises(ValueError):  # for..of placeholder form not built
        compile_rules("""rule f { strings: $a = "x"
                         condition: for all of them : ( $ ) }""")


def test_yara_dataset_stage(ray_session):
    """Blockwise Dataset scan: one output row per (blob, rule) match,
    keep columns carried through, match offsets exact."""
    import ray.data as rd

    src = """
    rule foo_bar { strings: $foo = "foo" $bar = "bar"
                   condition: $foo and $bar }
    rule baz { strings: $baz = "baz" condition: $baz }
    """
    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 3, 4],
        "data": [b"foo bar", b"only baz here", b"foo baz bar", b"none"],
    }))
    out = yara_(ds, src, field="data", keep=("id",)).to_pandas()
    got = sorted(zip(out["id"], out["rule_identifier"]))
    assert got == [(1, "foo_bar"), (2, "baz"), (3, "baz"), (3, "foo_bar")]
    row = out[(out["id"] == 1)].iloc[0]
    ms = list(row["matches"])
    foo = [m for m in ms if m["identifier"] == "$foo"][0]
    assert foo["offset"] == 0 and foo["match_length"] == 3
    assert base64.b64decode(foo["data"]) == b"foo"
    meta = json.loads(row["rule_meta"])
    assert meta == {}


def test_yara_string_column_and_registry(ray_session):
    """String columns scan as UTF-8 bytes; the `yara` registry op wires
    through run_pipeline."""
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    ds = rd.from_arrow(pa.table({"doc_id": [10, 20],
                                 "text": ["evil payload", "clean"]}))
    out = Pipeline([
        {"op": "yara",
         "rules": "rule evil { strings: $e = \"evil\" condition: $e }",
         "field": "text", "keep": ("doc_id",)},
    ]).run(ds).to_pandas()
    assert out["doc_id"].tolist() == [10]
    assert out["rule_identifier"].tolist() == ["evil"]


def test_match_cap_bounds_memory():
    [r] = compile_rules('rule x { strings: $a = "A" condition: #a > 5 }')
    hits = r.scan(b"A" * 100_000)
    assert len(hits["$a"]) == 10_000  # capped, like libyara


# ---- review-fix regressions -------------------------------------------------


def test_neq_operator_tokenizes():
    [r] = compile_rules('rule n { strings: $a = "x" condition: #a != 0 }')
    assert r.scan(b"zxz")
    assert r.scan(b"zzz") is None


def test_regex_with_escaped_slashes_not_a_comment():
    src = r'rule u { strings: $r = /https:\/\/[a-z]+/ condition: $r }'
    [r] = compile_rules(src)
    assert r.scan(b"see https://example for details")
    assert r.scan(b"no url") is None


def test_undefined_comparisons_are_false():
    """YARA: any comparison against undefined is false — @a with no
    match must NOT satisfy `@a < 5` (the -1 sentinel bug)."""
    src = """rule u { strings: $a = "qq" $b = "zz"
             condition: @a < 5 and $b }"""
    [r] = compile_rules(src)
    assert r.scan(b"zz only") is None  # @a undefined -> comparison false
    assert r.scan(b"qq and zz")        # @a == 0 < 5, $b present
    # uint past EOF is undefined, != included
    src2 = "rule v { condition: uint32(0) != 0 }"
    [v] = compile_rules(src2)
    assert v.scan(b"ab") is None           # 2 bytes: read undefined
    assert v.scan(b"abcd") is not None     # defined and nonzero
    # @a[i] out of range is undefined
    src3 = 'rule w { strings: $a = "x" condition: @a[5] >= 0 }'
    [w] = compile_rules(src3)
    assert w.scan(b"x") is None


def test_overlapping_matches_counted():
    """libyara counts overlapping occurrences: 'aa' in b'aaa' matches
    at offsets 0 AND 1."""
    [r] = compile_rules('rule o { strings: $a = "aa" condition: #a >= 2 }')
    hits = r.scan(b"aaa")
    assert hits and [h[0] for h in hits["$a"]] == [0, 1]
    assert r.scan(b"aab") is None


def test_empty_of_set_is_compile_error():
    with pytest.raises(ValueError):
        compile_rules("""rule e { strings: $a1 = "x"
                         condition: all of ($z*) }""")


def test_wide_fullword_boundaries():
    """fullword on a wide string checks the adjacent WIDE character,
    not the raw byte (which is NUL and always looked non-word)."""
    src = 'rule wf { strings: $w = "wide" wide fullword condition: $w }'
    [r] = compile_rules(src)
    assert r.scan("wide".encode("utf-16-le"))
    assert r.scan(("a wide b").encode("utf-16-le"))
    assert r.scan("swide".encode("utf-16-le")) is None
    assert r.scan("wides".encode("utf-16-le")) is None


def test_xor_modifier():
    """xor: plaintext XORed with every key in range compiles to one
    alternation scan (libyara's expansion)."""
    src = 'rule x { strings: $a = "cmd.exe" xor condition: $a }'
    [r] = compile_rules(src)
    plain = b"cmd.exe"
    for key in (0x00, 0x01, 0x7F, 0xFF):
        blob = b"__" + bytes(b ^ key for b in plain) + b"__"
        assert r.scan(blob), hex(key)
    assert r.scan(b"nothing here") is None

    # explicit key range excludes keys outside it
    src2 = 'rule y { strings: $a = "secret" xor(0x10-0x1f) condition: $a }'
    [y] = compile_rules(src2)
    assert y.scan(bytes(b ^ 0x15 for b in b"secret"))
    assert y.scan(b"secret") is None          # key 0 not in range
    assert y.scan(bytes(b ^ 0x40 for b in b"secret")) is None

    with pytest.raises(ValueError):  # spec: xor + nocase is invalid
        compile_rules('rule z { strings: $a = "q" xor nocase condition: $a }')


def test_xor_wide_is_applied_after_widening():
    """libyara XORs the widened (UTF-16-LE) byte form, so the
    interleaved gap bytes carry the key — not 0x00 (ADVICE r3)."""
    src = 'rule xw { strings: $a = "ab" xor(0x01) wide condition: $a }'
    [r] = compile_rules(src)
    libyara_form = bytes(b ^ 0x01 for b in "ab".encode("utf-16-le"))
    assert libyara_form == bytes([0x60, 0x01, 0x63, 0x01])
    assert r.scan(b"__" + libyara_form + b"__")
    # the old (wrong) form: xor plaintext then widen — must NOT match
    wrong = b"".join(bytes([b ^ 0x01, 0x00]) for b in b"ab")
    assert r.scan(wrong) is None

    # full key range: every key's widened-then-xored form matches
    src2 = 'rule xw2 { strings: $a = "cmd" xor wide condition: $a }'
    [r2] = compile_rules(src2)
    for key in (0x00, 0x2a, 0xFF):
        blob = bytes(b ^ key for b in "cmd".encode("utf-16-le"))
        assert r2.scan(b"_" + blob + b"_"), hex(key)


def test_base64_modifier():
    """base64: matches the encoding of the string at any of its three
    phase alignments inside a longer base64 stream."""
    import base64 as b64

    src = 'rule b { strings: $a = "malicious payload" base64 condition: $a }'
    [r] = compile_rules(src)
    for prefix in (b"", b"x", b"xy", b"xyz", b"longer prefix!"):
        enc = b64.b64encode(prefix + b"malicious payload" + b"suffix")
        assert r.scan(enc), prefix
    assert r.scan(b64.b64encode(b"innocent content")) is None
    assert r.scan(b"malicious payload") is None  # raw form not matched

    src2 = 'rule w { strings: $a = "evil" base64wide condition: $a }'
    [w] = compile_rules(src2)
    enc = b64.b64encode(b"__evil__")
    wide = b"".join(bytes([c]) + b"\x00" for c in enc)
    assert w.scan(wide)


def test_for_loop_numeric():
    """for any/all/N over a numeric range with @a[i] in the body."""
    src = """rule f { strings: $a = "x"
             condition: for all i in (1..#a) : ( @a[i] < 10 ) }"""
    [r] = compile_rules(src)
    assert r.scan(b"x.x.x")                    # offsets 0,2,4 all < 10
    assert r.scan(b"x" + b"." * 20 + b"x") is None  # @a[2] == 21

    src2 = """rule g { strings: $a = "x"
              condition: for any i in (1..#a) : ( @a[i] == 4 ) }"""
    [g] = compile_rules(src2)
    assert g.scan(b"....x")
    assert g.scan(b"x....") is None

    src3 = """rule h { strings: $a = "x"
              condition: for 2 i in (1..#a) : ( @a[i] >= 3 ) }"""
    [h] = compile_rules(src3)
    assert h.scan(b"...x.x")
    assert h.scan(b"x..x") is None  # only one offset >= 3

    # zero matches: range (1..0) is empty -> all is false, any is false
    assert r.scan(b"no hits here") is None
    assert g.scan(b"none") is None


def test_vector_path_equals_scan_path():
    """The Arrow-kernel prefilter must agree with the per-blob scan on
    every (blob, rule) verdict AND the extracted offsets — randomized
    corpus, rules mixing vectorizable and non-vectorizable conditions."""
    import random

    from tenzir_ray.stages.yara import YaraScanner

    rng = random.Random(42)
    vocab = ["data", "merge", "spark", "beacon", "sword", "Data", "xx"]
    blobs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30)))
        for _ in range(400)
    ]
    rules = """
    rule v1 { strings: $a = "data" fullword $b = "MERGE" nocase
              condition: ($a and #b >= 2) or #a >= 3 }
    rule v2 { strings: $s = "spark" $w = "beacon"
              condition: any of them and filesize > 10 }
    rule nv { strings: $x = "sword"
              condition: $x at 0 or @x > 50 }
    """
    sc = YaraScanner(rules, field="t", keep=("i",))
    # v1 contains a nocase string: since the round-3 review fix, nocase
    # is vec-INELIGIBLE (Arrow folds Unicode-wide, the exact scan folds
    # ASCII bytes — U+212A would silently diverge), so only v2 keeps
    # the Arrow-kernel path
    assert [r.vec is not None for r in sc.rules] == [False, True, False]
    t = pa.table({"i": list(range(len(blobs))), "t": blobs})
    fast = sc(t)
    for r in sc.rules:
        r.vec = None
    slow = sc(t)
    assert fast.column("i").to_pylist() == slow.column("i").to_pylist()
    assert (fast.column("rule_identifier").to_pylist()
            == slow.column("rule_identifier").to_pylist())
    assert fast.column("matches").to_pylist() == slow.column("matches").to_pylist()


def test_vec_spec_eligibility_gates():
    """Self-overlapping literals, hex/regex strings and offset-using
    conditions must NOT take the vector path (counts would diverge)."""
    from tenzir_ray.stages.yara import compile_rules

    [r] = compile_rules('rule o { strings: $a = "aa" condition: #a >= 2 }')
    assert r.vec is None  # "aa" self-overlaps
    [h] = compile_rules("rule h { strings: $a = { 41 41 } condition: $a }")
    assert h.vec is None  # hex string
    [w] = compile_rules(
        'rule w { strings: $a = "ab" wide fullword condition: $a }')
    assert w.vec is None  # RE2 lookbehind gap
    [g] = compile_rules('rule g { strings: $a = "abc" condition: @a == 0 }')
    assert g.vec is None  # offsets need the scan
    [nc] = compile_rules(
        'rule k { strings: $a = "abc" $b = "DEF" nocase condition: $a and #b > 1 }')
    assert nc.vec is None  # nocase: Arrow Unicode fold vs ASCII scan fold
    [ok] = compile_rules(
        'rule k2 { strings: $a = "abc" $b = "DEF" condition: $a and #b > 1 }')
    assert ok.vec is not None


# ------------------------------------------------ round-3 review findings


def test_xor_fullword_and_uppercase_hex_keys():
    from tenzir_ray.stages.yara import compile_rules

    r = compile_rules(
        'rule x { strings: $a = "cmd" xor fullword condition: $a }')[0]
    assert r.scan(b"run cmdline now") is None          # mid-word: reject
    assert r.scan(b"run cmd now") is not None          # word-bounded hit
    key = bytes(b ^ 0xAB for b in b"cmd")
    r2 = compile_rules(
        'rule y { strings: $a = "cmd" xor(0xAB) fullword condition: $a }')[0]
    assert r2.scan(b"|" + key + b"|") is not None      # uppercase hex key
    assert r2.scan(b"a" + key + b"b") is None
    import pytest as _pt
    with _pt.raises(ValueError, match="0 <= lo <= hi"):
        compile_rules('rule z { strings: $a = "q" xor(0x1f-0x10) '
                      'condition: $a }')
    with _pt.raises(ValueError, match="incompatible"):
        compile_rules('rule w { strings: $a = "q" xor base64wide '
                      'condition: $a }')


def test_wide_base64_encodes_utf16_plaintext():
    import base64 as b64

    from tenzir_ray.stages.yara import compile_rules

    r = compile_rules(
        'rule wb { strings: $a = "evil" wide base64 condition: $a }')[0]
    wide = "evil".encode("utf-16-le")
    assert r.scan(b64.b64encode(wide)) is not None     # wide plaintext
    assert r.scan(b64.b64encode(b"evil")) is None      # narrow: no match


def test_vec_prefilter_parity_edges(ray_session):
    """The three fast/slow divergences the review caught: nocase Unicode
    folding, #-count cap, cross-variant overlap — all must now agree."""
    import ray.data as rd

    from tenzir_ray.stages.yara import compile_rules, yara_

    def both_paths(rule_src, payloads):
        rules = compile_rules(rule_src)
        slow = [i for i, p in enumerate(payloads)
                if rules[0].scan(p if isinstance(p, bytes)
                                 else p.encode()) is not None]
        ds = rd.from_arrow(pa.table({
            "rid": list(range(len(payloads))), "data": payloads}))
        df = yara_(ds, rule_src, field="data", keep=("rid",)).to_pandas()
        fast = sorted(df["rid"].unique().tolist()) if "rid" in df.columns else []
        return slow, fast

    # nocase with a case-foldable non-ASCII char (Kelvin sign) — the
    # rule must now take the exact-scan path on both sides
    s, f = both_paths(
        'rule k { strings: $a = "k" nocase condition: $a }',
        ["K here", "plain K", "none"])
    assert s == f

    # #-count around the 10k cap
    s, f = both_paths(
        'rule c { strings: $a = "xy" condition: #a > 10000 }',
        ["xy" * 10500, "xy" * 9000])
    assert s == f == []

    # cross-variant border (ascii suffix == wide prefix via NUL)
    s, f = both_paths(
        r'rule o { strings: $a = "aa\x00" wide ascii condition: #a >= 2 }',
        [b"aa\x00a\x00\x00\x00", b"zz"])
    assert s == f


def test_for_all_early_exit_speed():
    import time

    from tenzir_ray.stages.yara import compile_rules

    r = compile_rules(
        'rule f { strings: $a = "zz" condition: '
        'for all i in (1..filesize) : ( uint8(i) == 0 ) }')[0]
    blob = b"\x01" * 5_000_000  # byte 1 nonzero → first iteration fails
    t0 = time.perf_counter()
    assert r.scan(blob) is None
    assert time.perf_counter() - t0 < 1.0  # was ~minutes without the exit


def test_regex_dotall_matches_libyara_default():
    from tenzir_ray.stages.yara import compile_rules

    r = compile_rules('rule d { strings: $r = /a.b/ condition: $r }')[0]
    assert r.scan(b"a\nb") is None          # `.` must NOT cross newlines
    assert r.scan(b"axb") is not None
    rs = compile_rules('rule s { strings: $r = /a.b/ s condition: $r }')[0]
    assert rs.scan(b"a\nb") is not None     # explicit s flag opts in


def test_undefined_string_ref_rejected_at_compile():
    import pytest as _pt

    from tenzir_ray.stages.yara import compile_rules

    with _pt.raises(ValueError, match="undefined string"):
        compile_rules('rule u { strings: $a = "foo" condition: $a and $b }')
    with _pt.raises(ValueError, match="wildcard"):
        compile_rules('rule w { strings: $a = "foo" '
                      'condition: any of ($z*) }')
