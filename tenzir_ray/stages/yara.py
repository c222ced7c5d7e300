"""YARA rule subset → byte scanners over binary/string columns.

The reference wraps libyara as the ``yara`` operator
(plugins/yara/src/plugin.cpp, web/docs/operators/yara.md): it buffers
byte chunks and emits one ``yara.match`` event per matching rule, with
the rule descriptor and per-string match offsets.  In a Dataset engine
each ROW of a binary/string column is one self-contained scan unit (the
reference's ``--blockwise`` mode — the only meaningful unit for a
Dataset of blobs); rules are parsed and compiled ONCE per actor
(:class:`YaraScanner` ``__init__``) into Python ``re`` byte patterns, so
the per-blob scan runs in C, and the rule condition is evaluated per
blob over the resulting match table.

Supported subset of the public YARA v4 language:

- text strings (``$a = "foo"``) with escapes (``\\" \\\\ \\t \\n \\r
  \\xNN``) and modifiers ``nocase`` / ``ascii`` / ``wide`` /
  ``fullword`` / ``xor`` (+ key ranges) / ``base64`` / ``base64wide``;
- hex strings (``$h = { AA ?? B? [2-4] CC }``) with full/nibble
  wildcards, ``[n]`` / ``[n-m]`` / ``[-]`` jumps and ``( .. | .. )``
  alternation;
- regex strings (``$r = /foo[0-9]+/ nocase``);
- conditions: ``and / or / not``, parentheses, ``$a`` (presence),
  ``#a`` (match count), ``@a`` / ``@a[i]`` (offset), ``!a`` / ``!a[i]``
  (length), comparisons, integer literals (``0x..``, ``KB`` / ``MB``),
  ``filesize``, ``uint8/16/32(off)`` (+ ``be`` variants and signed
  ``int*``), ``any/all/N of them`` / ``of ($a, $b*)``, ``$a at off``,
  ``$a in (lo..hi)``, ``true`` / ``false``, numeric ``for`` loops
  (``for any i in (1..#a) : ( @a[i] < 100 )``) with undefined
  propagating to false per the spec.

Out of scope (documented, raises at parse time): modules (``pe.``,
``math.`` …) and the ``for .. of <string-set>`` placeholder form.
"""

from __future__ import annotations

import base64
import json
import re
import sys

import numpy as np
import pyarrow as pa

from tenzir_ray._ship import ship_by_value

_MAX_MATCHES_PER_STRING = 10_000  # libyara caps too; bounds memory on
# pathological blobs (e.g. a 1 GiB run of a 1-byte pattern)

_WORD = b"0-9A-Za-z_"  # YARA fullword boundary class (ASCII, like \b)


# --------------------------------------------------------------------------
# rule-file tokenization / parsing
# --------------------------------------------------------------------------

def _strip_comments(text: str) -> str:
    out, i, n = [], 0, len(text)
    while i < n:
        c = text[i]
        if c == '"':  # don't strip inside string literals
            j = i + 1
            while j < n and text[j] != '"':
                j += 2 if text[j] == "\\" else 1
            out.append(text[i : j + 1])
            i = j + 1
        elif c == "/" and i + 1 < n and text[i + 1] == "/":
            while i < n and text[i] != "\n":
                i += 1
        elif c == "/" and i + 1 < n and text[i + 1] == "*":
            j = text.find("*/", i + 2)
            i = n if j < 0 else j + 2
            out.append(" ")
        elif c == "/":
            # regex string literal (YARA has no `/` operator, so a lone
            # slash always opens one): copy verbatim to the closing
            # unescaped `/` so `\/\/` inside a URL pattern is not
            # mistaken for a `//` comment
            j = i + 1
            while j < n and text[j] != "/" and text[j] != "\n":
                j += 2 if text[j] == "\\" else 1
            out.append(text[i : j + 1])
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def parse_rules(text: str) -> list[dict]:
    """Parse YARA source into rule dicts:
    ``{identifier, tags, meta, strings: {id: (kind, spec, mods)},
    condition: str}``."""
    text = _strip_comments(text)
    rules = []
    # rule header: [global|private]* rule NAME [: tag tag] {
    hdr = re.compile(
        r"(?:\b(?:global|private)\s+)*\brule\s+([A-Za-z_][A-Za-z0-9_]*)"
        r"\s*(?::\s*([A-Za-z0-9_ \t]+?))?\s*\{"
    )
    pos = 0
    while True:
        m = hdr.search(text, pos)
        if not m:
            break
        body_start = m.end()
        end = _match_brace(text, body_start - 1)
        body = text[body_start:end]
        rules.append(
            {
                "identifier": m.group(1),
                "tags": (m.group(2) or "").split(),
                **_parse_body(body, m.group(1)),
            }
        )
        pos = end + 1
    if not rules:
        raise ValueError("no YARA rules found in input")
    return rules


def _match_brace(text: str, open_idx: int) -> int:
    depth, i, n = 0, open_idx, len(text)
    while i < n:
        c = text[i]
        if c == '"':
            i += 1
            while i < n and text[i] != '"':
                i += 2 if text[i] == "\\" else 1
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("unbalanced braces in YARA rule")


def _string_spans(text: str) -> list[tuple[int, int]]:
    return [m.span() for m in re.finditer(r'"(?:[^"\\]|\\.)*"', text)]


def _parse_body(body: str, name: str) -> dict:
    sections: dict[str, str] = {}
    sec = re.compile(r"\b(meta|strings|condition)\s*:")
    quoted = _string_spans(body)
    marks = [
        (m.group(1), m.start(), m.end())
        for m in sec.finditer(body)
        if not any(a <= m.start() < b for a, b in quoted)
    ]
    if not any(k == "condition" for k, _, _ in marks):
        raise ValueError(f"rule {name}: missing condition section")
    for idx, (key, _, e) in enumerate(marks):
        nxt = marks[idx + 1][1] if idx + 1 < len(marks) else len(body)
        sections[key] = body[e:nxt]
    return {
        "meta": _parse_meta(sections.get("meta", "")),
        "strings": _parse_strings(sections.get("strings", ""), name),
        "condition": " ".join(sections["condition"].split()),
    }


def _parse_meta(sec: str) -> dict:
    meta = {}
    for m in re.finditer(
        r"([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(\"(?:[^\"\\]|\\.)*\"|true|false|-?\d+)",
        sec,
    ):
        k, v = m.group(1), m.group(2)
        if v.startswith('"'):
            meta[k] = v[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        elif v in ("true", "false"):
            meta[k] = v == "true"
        else:
            meta[k] = int(v)
    return meta


_STR_DEF = re.compile(
    r"\$([A-Za-z0-9_]*)\s*=\s*"
    r"(\"(?:[^\"\\]|\\.)*\"|\{[^}]*\}|/(?:[^/\\\n]|\\.)+/)"
    # A-F included: `xor(0xAB)` keys with uppercase hex are valid YARA
    r"([a-zA-Z0-9()\- \t]*)",
)

_XOR_MOD = re.compile(r"^xor(?:\((0x[0-9A-Fa-f]+|\d+)"
                      r"(?:-(0x[0-9A-Fa-f]+|\d+))?\))?$")


def _parse_strings(sec: str, name: str) -> dict:
    out = {}
    for m in _STR_DEF.finditer(sec):
        sid, spec, mods_s = m.group(1), m.group(2), m.group(3)
        mods = set(mods_s.split())
        bad = {
            x for x in mods
            if x not in {"nocase", "ascii", "wide", "fullword", "private",
                         "base64", "base64wide",
                         "i", "s"}  # i/s: regex-string flag suffixes
            and not _XOR_MOD.match(x)
        }
        if bad:
            raise ValueError(f"rule {name}: unsupported modifier(s) {bad}")
        xor_tok = next((x for x in mods if _XOR_MOD.match(x)), None)
        if xor_tok is not None and (
                "nocase" in mods or {"base64", "base64wide"} & mods):
            raise ValueError(f"rule {name}: xor is incompatible with "
                             "nocase/base64/base64wide (YARA spec)")
        if xor_tok is not None:
            g = _XOR_MOD.match(xor_tok).groups()
            klo = int(g[0], 0) if g[0] else 0
            khi = int(g[1], 0) if g[1] else (klo if g[0] else 255)
            if not (0 <= klo <= khi <= 255):
                raise ValueError(
                    f"rule {name}: xor key range 0x{klo:x}-0x{khi:x} must "
                    "satisfy 0 <= lo <= hi <= 255"
                )
        if {"base64", "base64wide"} & mods and (
                {"nocase", "fullword"} & mods):
            raise ValueError(f"rule {name}: base64 is incompatible with "
                             "nocase/fullword (YARA spec)")
        if spec.startswith('"'):
            kind, body = "text", spec[1:-1]
        elif spec.startswith("{"):
            kind, body = "hex", spec[1:-1]
        else:
            kind, body = "regex", spec[1:-1]
        out["$" + sid] = (kind, body, mods)
    if re.search(r"\$[A-Za-z0-9_]*\s*=", sec) and not out:
        raise ValueError(f"rule {name}: could not parse strings section")
    return out


# --------------------------------------------------------------------------
# string compilation → bytes regex
# --------------------------------------------------------------------------

def _unescape_text(s: str) -> bytes:
    out, i, n = bytearray(), 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            e = s[i + 1]
            if e == "x" and i + 3 < n:
                out.append(int(s[i + 2 : i + 4], 16))
                i += 4
                continue
            out.append({"n": 10, "t": 9, "r": 13}.get(e, ord(e)))
            i += 2
        else:
            out += c.encode("utf-8")
            i += 1
    return bytes(out)


def _hex_to_regex(body: str) -> bytes:
    """Hex string tokens → bytes-regex source (evaluated with DOTALL)."""
    toks = re.findall(
        r"\?\?|[0-9A-Fa-f]\?|\?[0-9A-Fa-f]|[0-9A-Fa-f]{2}"
        r"|\[\s*\d*\s*-?\s*\d*\s*\]|\(|\)|\|",
        body,
    )
    parts: list[bytes] = []
    for t in toks:
        if t == "??":
            parts.append(b".")
        elif t == "(":
            parts.append(b"(?:")
        elif t == ")":
            parts.append(b")")
        elif t == "|":
            parts.append(b"|")
        elif t.startswith("["):
            lo, dash, hi = re.match(
                r"\[\s*(\d*)\s*(-?)\s*(\d*)\s*\]", t
            ).groups()
            if not dash:  # [n] fixed jump
                parts.append(b".{%d}" % int(lo or 0))
            else:  # [n-m] / [n-] / [-m] / [-]
                l = (lo or "0").encode()
                h = hi.encode() if hi else b""
                parts.append(b".{" + l + b"," + h + b"}")
        elif "?" in t:  # nibble wildcard
            if t[1] == "?":  # high nibble fixed: A? → 0xA0-0xAF
                base = int(t[0], 16) << 4
                parts.append(b"[%s-%s]" % (re.escape(bytes([base])),
                                           re.escape(bytes([base + 15]))))
            else:  # low nibble fixed: ?A → {0x0A,0x1A,…}
                low = int(t[1], 16)
                cls = b"".join(
                    re.escape(bytes([(h << 4) | low])) for h in range(16)
                )
                parts.append(b"[" + cls + b"]")
        else:
            parts.append(re.escape(bytes([int(t, 16)])))
    return b"".join(parts)


def _b64_fragments(raw: bytes) -> list[bytes]:
    """The three phase-shifted base64 encodings of ``raw``, trimmed to
    the characters whose 6 bits lie ENTIRELY inside ``raw`` — those are
    invariant to whatever bytes precede/follow it in the encoded stream
    (the yara `base64` modifier's published algorithm)."""
    frags = []
    for shift in range(3):
        enc = base64.b64encode(bytes(shift) + raw).rstrip(b"=")
        start = (shift * 8 + 5) // 6          # first char fully in raw
        end = (shift * 8 + len(raw) * 8) // 6  # one past the last
        frag = enc[start:end]
        if frag:
            frags.append(frag)
    return frags


def _widen(raw: bytes) -> bytes:
    return b"".join(bytes([b]) + b"\x00" for b in raw)


def _compile_string(kind: str, body: str, mods: set) -> re.Pattern:
    """Compile one rule string to a bytes regex. The whole pattern is
    wrapped in ``(?=(...))`` so finditer reports OVERLAPPING matches —
    libyara counts every occurrence, so ``#a >= 2`` on ``"aa"`` over
    ``b"aaa"`` must see offsets 0 AND 1 (the zero-width scan advances
    one byte per hit; match bytes come from group 1)."""
    # libyara default: `.` does NOT cross newlines in regex strings —
    # DOTALL applies only to hex strings (whose `??` must match any
    # byte) and to regex strings carrying the `s` flag suffix
    flags = 0
    if "nocase" in mods:
        flags |= re.IGNORECASE
    if kind == "hex":
        src = _hex_to_regex(body)
        flags = re.DOTALL
    elif kind == "regex":
        if "i" in mods:
            flags |= re.IGNORECASE
        if "s" in mods:
            flags |= re.DOTALL
        src = body.encode("utf-8", "surrogateescape")
    else:  # text
        raw = _unescape_text(body)
        xor_mod = next((x for x in mods if _XOR_MOD.match(x)), None)
        variants = []
        if xor_mod is not None:
            # xor: the plaintext XORed with every key in the range is a
            # fixed byte string — 256 literal alternatives compile into
            # ONE scan (libyara does the same expansion internally).
            # fullword applies to the RAW scanned bytes around the hit,
            # so the boundary lookarounds wrap each keyed variant.
            g = _XOR_MOD.match(xor_mod).groups()
            lo = int(g[0], 0) if g[0] else 0
            hi = int(g[1], 0) if g[1] else (lo if g[0] else 255)
            keys = range(lo, hi + 1)
            fw = "fullword" in mods
            # libyara XORs the FINAL byte form: the wide (UTF-16-LE)
            # encoding is widened FIRST, then every byte — including the
            # interleaved NULs — is XORed, so the gap bytes become the
            # key itself. Fullword boundaries are checked on the raw
            # scanned data (plain space), not un-xored, per libyara's
            # _yr_scan_verify_literal_match.
            if "wide" in mods:
                wraw = _widen(raw)
                for k in keys:
                    w = re.escape(bytes(b ^ k for b in wraw))
                    if fw:
                        w = (b"(?<![" + _WORD + b"]\x00)" + w
                             + b"(?![" + _WORD + b"]\x00)")
                    variants.append(w)
            if "ascii" in mods or "wide" not in mods:
                for k in keys:
                    a = re.escape(bytes(b ^ k for b in raw))
                    if fw:
                        a = (b"(?<![" + _WORD + b"])" + a
                             + b"(?![" + _WORD + b"])")
                    variants.append(a)
        elif {"base64", "base64wide"} & mods:
            # wide/ascii pick the PLAINTEXT encodings fed to base64
            # (YARA: `wide base64` encodes the UTF-16-LE plaintext);
            # base64 vs base64wide pick the ENCODED-side width
            raws = []
            if "wide" in mods:
                raws.append(_widen(raw))
            if "ascii" in mods or "wide" not in mods:
                raws.append(raw)
            for r0 in raws:
                frags = _b64_fragments(r0)
                if "base64" in mods:
                    variants += [re.escape(f) for f in frags]
                if "base64wide" in mods:
                    variants += [re.escape(_widen(f)) for f in frags]
        else:
            if "wide" in mods:
                w = re.escape(_widen(raw))
                if "fullword" in mods:
                    # wide boundaries are two-byte: the adjacent WIDE
                    # char (word byte + NUL) must not be a word char
                    w = (b"(?<![" + _WORD + b"]\x00)" + w
                         + b"(?![" + _WORD + b"]\x00)")
                variants.append(w)
            if "ascii" in mods or "wide" not in mods:
                a = re.escape(raw)
                if "fullword" in mods:
                    a = (b"(?<![" + _WORD + b"])" + a
                         + b"(?![" + _WORD + b"])")
                variants.append(a)
        src = (b"(?:" + b"|".join(variants) + b")"
               if len(variants) > 1 else variants[0])
    return re.compile(b"(?=(" + src + b"))", flags)


# --------------------------------------------------------------------------
# condition compilation (recursive descent → closure tree)
# --------------------------------------------------------------------------

_COND_TOKEN = re.compile(
    r"\s*(?:"
    r"(?P<num>0x[0-9A-Fa-f]+|\d+(?:KB|MB)?)"
    # op BEFORE strref: a lone `!` would otherwise match as a
    # zero-length !-ref and make `!=` untokenizable
    r"|(?P<op>==|!=|<=|>=|<|>|\(|\)|\[|\]|,|\.\.|\*|:)"
    r"|(?P<strref>[$#@!][A-Za-z0-9_]*)"
    r"|(?P<word>[A-Za-z_][A-Za-z0-9_]*)"
    r")"
)


def _tokenize_cond(s: str) -> list[str]:
    toks, i = [], 0
    while i < len(s):
        m = _COND_TOKEN.match(s, i)
        if not m:
            if s[i].isspace():
                i += 1
                continue
            raise ValueError(f"bad condition token at {s[i:]!r}")
        toks.append(m.group().strip())
        i = m.end()
    return toks


class _Undefined:
    """YARA's `undefined` value (spec: any comparison against undefined
    is false, and undefined in boolean context is false): produced by
    ``@a``/``!a`` with no match, an out-of-range ``[i]``, or ``uint*``
    reads past EOF."""

    def __bool__(self) -> bool:
        return False

    def __repr__(self) -> str:
        return "undefined"


_UNDEF = _Undefined()


class _Cond:
    """Compiles a condition string into ``eval(ctx)`` where ctx is
    ``(matches: dict[str, list[(off, len)]], data: bytes)``."""

    def __init__(self, cond: str, string_ids: list[str]):
        self.toks = _tokenize_cond(cond)
        self.ids = string_ids
        self.i = 0
        self._loopvars: set[str] = set()  # bound `for` iterators in scope
        self.fn = self._or()
        if self.i != len(self.toks):
            raise ValueError(
                f"trailing tokens in condition: {self.toks[self.i:]}")

    # -- token helpers
    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, t):
        got = self._next()
        if got != t:
            raise ValueError(f"expected {t!r}, got {got!r}")

    # -- grammar
    def _or(self):
        left = self._and()
        while self._peek() == "or":
            self._next()
            right = self._and()
            left = (lambda l, r: lambda c: l(c) or r(c))(left, right)
        return left

    def _and(self):
        left = self._not()
        while self._peek() == "and":
            self._next()
            right = self._not()
            left = (lambda l, r: lambda c: l(c) and r(c))(left, right)
        return left

    def _not(self):
        if self._peek() == "not":
            self._next()
            inner = self._not()
            return lambda c: not inner(c)
        return self._cmp()

    _CMP = {
        "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
        "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
    }

    def _cmp(self):
        left = self._primary()
        t = self._peek()
        if t in self._CMP:
            self._next()
            op = self._CMP[t]
            right = self._primary()

            def cmp(c, l=left, r=right, o=op):
                lv, rv = l(c), r(c)
                if lv is _UNDEF or rv is _UNDEF:
                    return False  # undefined compares false, always
                return o(lv, rv)

            return cmp
        return left

    def _int(self, tok: str) -> int:
        if tok.startswith("0x"):
            return int(tok, 16)
        if tok.endswith("KB"):
            return int(tok[:-2]) * 1024
        if tok.endswith("MB"):
            return int(tok[:-2]) * 1024 * 1024
        return int(tok)

    def _string_set(self) -> list[str]:
        """``them`` or ``($a, $b*, …)`` → concrete string ids."""
        if self._peek() == "them":
            self._next()
            return list(self.ids)
        self._expect("(")
        ids: list[str] = []
        while True:
            t = self._next()
            if not t or not t.startswith("$"):
                raise ValueError(f"expected $id in string set, got {t!r}")
            if self._peek() == "*":
                self._next()
                matching = [s for s in self.ids if s.startswith(t)]
                if not matching:
                    raise ValueError(
                        f"{t}* matches no declared strings")
                ids.extend(matching)
            else:
                ids.append(t)
            t = self._next()
            if t == ")":
                break
            if t != ",":
                raise ValueError(f"expected , or ) in string set, got {t!r}")
        if not ids:
            # libyara rejects this at compile time; silently-empty sets
            # would make `all of (...)` vacuously match EVERY blob
            raise ValueError("string set matches no declared strings")
        return ids

    def _of(self, need):
        """``N/any/all of <set>``: need is int, 'any' or 'all'."""
        self._expect("of")
        ids = self._string_set()
        if need == "any":
            n = 1
        elif need == "all":
            n = len(ids)
        else:
            n = need
        return lambda c, ids=tuple(ids), n=n: (
            sum(1 for s in ids if c[0].get(s)) >= n
        )

    def _for(self):
        """Numeric iteration: ``for any|all|N <var> in (lo..hi) :
        ( <bool> )`` — the loop variable binds in the body's scope and
        resolves from ctx[2] at eval time (so ``@a[i]``/comparisons see
        each value). The string-set ``for .. of`` form with ``$``
        placeholders is not implemented (documented)."""
        quant = self._next()
        if quant not in ("any", "all") and not re.fullmatch(
                r"0x[0-9A-Fa-f]+|\d+", quant or ""):
            raise ValueError(f"for: expected any/all/N, got {quant!r}")
        var = self._next()
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", var or ""):
            raise ValueError(f"for: expected iterator name, got {var!r}")
        self._expect("in")
        self._expect("(")
        lo = self._primary()
        self._expect("..")
        hi = self._primary()
        self._expect(")")
        self._expect(":")
        self._expect("(")
        self._loopvars.add(var)
        try:
            body = self._or()
        finally:
            self._loopvars.discard(var)
        self._expect(")")
        need = quant if quant in ("any", "all") else self._int(quant)

        def forloop(c, lo=lo, hi=hi, body=body, var=var, need=need):
            l, h = lo(c), hi(c)
            if l is _UNDEF or h is _UNDEF:
                return False
            total = hits = 0
            for v in range(l, h + 1):
                total += 1
                if body((c[0], c[1], {**c[2], var: v})):
                    hits += 1
                    if need == "any" or (need != "all" and hits >= need):
                        return True
                elif need == "all":
                    return False  # one miss decides `for all` — don't
                    # walk the rest of a potentially huge range
            if need == "all":
                return total > 0 and hits == total
            return need != "any" and hits >= need

        return forloop

    def _uint(self, word):
        signed = word.startswith("int")
        be = word.endswith("be")
        bits = int(re.search(r"\d+", word).group())
        self._expect("(")
        off = self._primary()
        self._expect(")")
        width = bits // 8

        def read(c, off=off, width=width, be=be, signed=signed):
            o = off(c)
            if o is _UNDEF or o < 0:
                return _UNDEF
            chunk = c[1][o : o + width]
            if len(chunk) < width:
                return _UNDEF  # read past EOF
            return int.from_bytes(
                chunk, "big" if be else "little", signed=signed)

        return read

    def _primary(self):
        t = self._next()
        if t is None:
            raise ValueError("unexpected end of condition")
        if t == "(":
            inner = self._or()
            self._expect(")")
            return inner
        if t == "true":
            return lambda c: True
        if t == "false":
            return lambda c: False
        if t == "filesize":
            return lambda c: len(c[1])
        if t in ("any", "all"):
            return self._of(t)
        if t == "for":
            return self._for()
        if t in self._loopvars:
            return lambda c, nm=t: c[2][nm]
        if re.fullmatch(r"0x[0-9A-Fa-f]+|\d+(?:KB|MB)?", t or ""):
            v = self._int(t)
            if self._peek() == "of":
                return self._of(v)
            return lambda c, v=v: v
        if re.fullmatch(r"u?int(?:8|16|32)(?:be)?", t or ""):
            return self._uint(t)
        if t.startswith("$"):
            sid = t
            nxt = self._peek()
            if nxt == "at":
                self._next()
                off = self._primary()

                def at(c, s=sid, o=off):
                    ov = o(c)
                    if ov is _UNDEF:
                        return False
                    return any(m[0] == ov for m in c[0].get(s, ()))

                return at
            if nxt == "in":
                self._next()
                self._expect("(")
                lo = self._primary()
                self._expect("..")
                hi = self._primary()
                self._expect(")")

                def inrange(c, s=sid, lo=lo, hi=hi):
                    lv, hv = lo(c), hi(c)
                    if lv is _UNDEF or hv is _UNDEF:
                        return False
                    return any(lv <= m[0] <= hv for m in c[0].get(s, ()))

                return inrange
            return lambda c, s=sid: bool(c[0].get(s))
        if t.startswith("#"):
            sid = "$" + t[1:]
            return lambda c, s=sid: len(c[0].get(s, ()))
        if t.startswith("@") or t.startswith("!"):
            sid = "$" + t[1:]
            idx = 0
            if self._peek() == "[":
                self._next()
                idx_fn = self._primary()
                self._expect("]")
                idx = None
            which = 0 if t[0] == "@" else 1
            if idx is None:
                def ref_i(c, s=sid, w=which, f=idx_fn):
                    i = f(c)  # YARA @a[i] is 1-based
                    if i is _UNDEF or not (
                            len(c[0].get(s, ())) >= i >= 1):
                        return _UNDEF
                    return c[0][s][i - 1][w]

                return ref_i
            return lambda c, s=sid, w=which: (
                c[0][s][0][w] if c[0].get(s) else _UNDEF)
        raise ValueError(f"unsupported condition construct {t!r} "
                         "(modules and for-loops are out of scope)")


# --------------------------------------------------------------------------
# vectorized fast path: Arrow-kernel counts + vector condition
# --------------------------------------------------------------------------

class _VecCond:
    """Vector twin of :class:`_Cond`: compiles the SAME grammar subset
    that is computable from per-string match COUNTS alone ($presence,
    #counts, filesize, ints, and/or/not, comparisons, of-sets) into
    closures over ``(counts: dict[sid, ndarray], sizes: ndarray)``
    evaluating the whole batch elementwise. Raises ValueError on any
    construct that needs offsets/bytes (@ ! at in uint for) — the
    caller falls back to the per-blob scan."""

    def __init__(self, cond: str, string_ids: list[str]):
        self.toks = _tokenize_cond(cond)
        self.ids = string_ids
        self.i = 0
        self.fn = self._or()
        if self.i != len(self.toks):
            raise ValueError("trailing tokens")

    _peek = _Cond._peek
    _next = _Cond._next
    _expect = _Cond._expect
    _int = _Cond._int
    _string_set = _Cond._string_set

    def _or(self):
        import numpy as _np

        left = self._and()
        while self._peek() == "or":
            self._next()
            right = self._and()
            left = (lambda l, r: lambda c: _np.logical_or(l(c), r(c)))(
                left, right)
        return left

    def _and(self):
        import numpy as _np

        left = self._not()
        while self._peek() == "and":
            self._next()
            right = self._not()
            left = (lambda l, r: lambda c: _np.logical_and(l(c), r(c)))(
                left, right)
        return left

    def _not(self):
        import numpy as _np

        if self._peek() == "not":
            self._next()
            inner = self._not()
            return lambda c: _np.logical_not(inner(c))
        return self._cmp()

    def _cmp(self):
        left = self._primary()
        t = self._peek()
        if t in _Cond._CMP:
            self._next()
            op = _Cond._CMP[t]
            right = self._primary()
            return (lambda l, r, o: lambda c: o(l(c), r(c)))(left, right, op)
        return left

    def _of(self, need):
        self._expect("of")
        ids = self._string_set()
        n = 1 if need == "any" else (len(ids) if need == "all" else need)
        return lambda c, ids=tuple(ids), n=n: sum(
            (c[0][s] > 0) for s in ids) >= n

    def _primary(self):
        t = self._next()
        if t is None:
            raise ValueError("unexpected end")
        if t == "(":
            inner = self._or()
            self._expect(")")
            return inner
        if t == "true":
            return lambda c: np.ones(len(c[1]), dtype=bool)
        if t == "false":
            return lambda c: np.zeros(len(c[1]), dtype=bool)
        if t == "filesize":
            return lambda c: c[1]
        if t in ("any", "all"):
            return self._of(t)
        if re.fullmatch(r"0x[0-9A-Fa-f]+|\d+(?:KB|MB)?", t or ""):
            v = self._int(t)
            if self._peek() == "of":
                return self._of(v)
            return lambda c, v=v: v
        if t.startswith("$") and self._peek() not in ("at", "in"):
            return lambda c, s=t: c[0][s] > 0
        if t.startswith("#") and self._peek() != "[":
            sid = "$" + t[1:]
            return lambda c, s=sid: c[0][s]
        raise ValueError(f"not vectorizable: {t!r}")


def _no_self_overlap(b: bytes) -> bool:
    """True if no proper prefix equals a suffix (KMP border check):
    finditer's non-overlapping count then equals the overlapping count,
    so Arrow kernels and the exact scan agree."""
    return not any(b[:l] == b[-l:] for l in range(1, len(b)))


def _variants_independent(variants: list[bytes]) -> bool:
    """True if no variant self-overlaps AND no variant can start inside
    or border another (containment / cross-variant suffix-prefix): only
    then does a non-overlapping alternation count equal the overlapping
    per-occurrence scan count."""
    for u in variants:
        if not _no_self_overlap(u):
            return False
        for v in variants:
            if u is v:
                continue
            if v in u:
                return False
            if any(u[-l:] == v[:l]
                   for l in range(1, min(len(u), len(v)))):
                return False
    return True


def _vec_spec(kind: str, body: str, mods: set):
    """(count kernel spec) for one string, or None if ineligible:
    ("plain", literal, False) → pc.count_substring;
    ("regex", pattern) → pc.count_substring_regex (RE2: no lookbehind,
    so wide+fullword is excluded; xor/base64 and non-ASCII literals are
    excluded for byte-vs-utf8 pattern fidelity; nocase is excluded
    because Arrow folds Unicode-wide while the exact scan folds ASCII
    bytes — U+212A vs 'k' would silently diverge)."""
    if kind != "text":
        return None
    if any(_XOR_MOD.match(x) for x in mods) or {"base64", "base64wide"} & mods:
        return None
    if "nocase" in mods:
        return None  # Unicode vs ASCII case folding mismatch (above)
    raw = _unescape_text(body)
    if not raw or any(b >= 128 for b in raw):
        return None
    if "wide" in mods and "fullword" in mods:
        return None  # RE2 has no lookbehind for the 2-byte boundary
    lit = raw.decode("ascii")
    variants = []
    if "wide" in mods:
        variants.append(_widen(raw))
    if "ascii" in mods or "wide" not in mods:
        variants.append(raw)
    if not _variants_independent(variants):
        return None  # overlapping matches would diverge from the scan
    if variants == [raw] and "fullword" not in mods:
        return ("plain", lit, False)
    alts = "|".join(re.escape(v.decode("latin-1")) for v in variants)
    pat = f"(?:{alts})" if len(variants) > 1 else alts
    if "fullword" in mods:
        pat = rf"\b{pat}\b"
    return ("regex", pat)


# --------------------------------------------------------------------------
# compiled rules + scanning
# --------------------------------------------------------------------------

def _validate_string_refs(cond: str, ids: list[str], name: str) -> None:
    """Reject conditions referencing undeclared strings at COMPILE time
    (libyara does; and the permissive fallback previously diverged —
    the exact scan treated ``$undeclared`` as false while the vector
    path crashed with KeyError)."""
    toks = _tokenize_cond(cond)
    idset = set(ids)
    for k, t in enumerate(toks):
        if not re.fullmatch(r"[$#@!][A-Za-z0-9_]+", t):
            continue
        base = "$" + t[1:]
        if k + 1 < len(toks) and toks[k + 1] == "*":
            if not any(i.startswith(base) for i in idset):
                raise ValueError(
                    f"rule {name}: wildcard {t}* matches no declared string")
        elif base not in idset:
            raise ValueError(
                f"rule {name}: condition references undefined string {t}")


class CompiledRule:
    __slots__ = ("identifier", "tags", "meta", "patterns", "cond",
                 "strings_src", "vec")

    def __init__(self, rule: dict):
        _validate_string_refs(rule["condition"],
                              list(rule["strings"]), rule["identifier"])
        self.identifier = rule["identifier"]
        self.tags = rule["tags"]
        self.meta = rule["meta"]
        self.strings_src = {
            sid: (body if kind == "text" else f"{{{body}}}"
                  if kind == "hex" else f"/{body}/")
            for sid, (kind, body, _m) in rule["strings"].items()
        }
        self.patterns = {
            sid: _compile_string(kind, body, mods)
            for sid, (kind, body, mods) in rule["strings"].items()
        }
        self.cond = _Cond(rule["condition"], list(self.patterns)).fn
        # vectorized batch path: count specs + vector condition, or None
        try:
            specs = {
                sid: _vec_spec(kind, body, mods)
                for sid, (kind, body, mods) in rule["strings"].items()
            }
            if any(v is None for v in specs.values()):
                raise ValueError("string not vectorizable")
            self.vec = (specs,
                        _VecCond(rule["condition"], list(self.patterns)).fn)
        except ValueError:
            self.vec = None

    def scan_strings(self, data: bytes) -> dict:
        """``{sid: [(offset, length), …]}`` for every string with hits."""
        matches = {}
        for sid, pat in self.patterns.items():
            hits = []
            for m in pat.finditer(data):
                hits.append((m.start(), len(m.group(1))))
                if len(hits) >= _MAX_MATCHES_PER_STRING:
                    break
            if hits:
                matches[sid] = hits
        return matches

    def scan(self, data: bytes):
        """Return ``{sid: [(offset, length), …]}`` if the condition
        holds, else None."""
        matches = self.scan_strings(data)
        return matches if self.cond((matches, data, {})) else None


def compile_rules(source: str | list[str]) -> list[CompiledRule]:
    if isinstance(source, list):
        source = "\n".join(source)
    return [CompiledRule(r) for r in parse_rules(source)]


_MATCH_TYPE = pa.list_(pa.struct([
    ("identifier", pa.string()),
    ("data", pa.string()),       # base64, like the reference's JSON output
    ("base", pa.int64()),
    ("offset", pa.int64()),
    ("match_length", pa.int64()),
]))


class YaraScanner:
    """Actor-pool stage: one ``yara.match`` output row per (blob, rule)
    match. Rules compile once per actor; each blob scan is C-speed
    ``re`` over bytes. ``keep`` columns are copied onto every emitted
    match so Dataset rows stay joinable back to their source."""

    def __init__(self, rules: str | list[str], field: str = "data",
                 keep: tuple[str, ...] = (), namespace: str = "default",
                 include_data: bool = True):
        self.rules = compile_rules(rules)
        self.field = field
        self.keep = tuple(keep)
        self.namespace = namespace
        self.include_data = include_data

    __name__ = "YaraScanner"

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column(self.field)
        n = batch.num_rows
        kept = {k: batch.column(k) for k in self.keep}
        out: dict[str, list] = {k: [] for k in self.keep}
        out.update(rule_identifier=[], rule_namespace=[], rule_tags=[],
                   rule_meta=[], matches=[])

        # vector prefilter: Arrow count kernels decide each vectorizable
        # rule for the WHOLE batch (C speed); the per-blob Python scan
        # then runs only on surviving (row, rule) pairs to extract exact
        # offsets. Non-vectorizable rules scan every row (as before).
        cand = np.ones((n, len(self.rules)), dtype=bool)
        if n and any(r.vec is not None for r in self.rules):
            sizes = pc.fill_null(pc.binary_length(col), 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            cache: dict[tuple, np.ndarray] = {}
            for j, rule in enumerate(self.rules):
                if rule.vec is None:
                    continue
                specs, vec_fn = rule.vec
                counts = {}
                for sid, spec in specs.items():
                    arr = cache.get(spec)
                    if arr is None:
                        if spec[0] == "plain":
                            a = pc.count_substring(
                                col, spec[1], ignore_case=spec[2])
                        else:
                            a = pc.count_substring_regex(col, spec[1])
                        arr = pc.fill_null(a, 0).to_numpy(
                            zero_copy_only=False).astype(np.int64)
                        # scan_strings caps at _MAX_MATCHES_PER_STRING;
                        # cap the kernel counts identically so #-count
                        # conditions can't diverge between the paths
                        arr = np.minimum(arr, _MAX_MATCHES_PER_STRING)
                        cache[spec] = arr
                    counts[sid] = arr
                cand[:, j] = np.asarray(
                    vec_fn((counts, sizes)), dtype=bool)

        for i in np.nonzero(cand.any(axis=1))[0] if n else ():
            raw = col[i].as_py()
            if raw is None:
                continue
            data = raw.encode("utf-8") if isinstance(raw, str) else raw
            for j, rule in enumerate(self.rules):
                if not cand[i, j]:
                    continue
                if rule.vec is None:
                    hits = rule.scan(data)
                    if hits is None:
                        continue
                else:
                    # the vector condition already held (counts are
                    # exact, no-self-overlap gate); only extract offsets
                    hits = rule.scan_strings(data)
                for k, arr in kept.items():
                    out[k].append(arr[i].as_py())
                out["rule_identifier"].append(rule.identifier)
                out["rule_namespace"].append(self.namespace)
                out["rule_tags"].append(rule.tags)
                out["rule_meta"].append(json.dumps(rule.meta, sort_keys=True))
                out["matches"].append([
                    {
                        "identifier": sid,
                        "data": base64.b64encode(
                            data[off : off + ln]).decode()
                        if self.include_data else "",
                        "base": 0,
                        "offset": off,
                        "match_length": ln,
                    }
                    for sid, hs in sorted(hits.items()) for off, ln in hs
                ])
        arrays, names = [], []
        for k in self.keep:
            names.append(k)
            arrays.append(pa.array(out[k], type=batch.schema.field(k).type))
        names += ["rule_identifier", "rule_namespace", "rule_tags",
                  "rule_meta", "matches"]
        arrays += [
            pa.array(out["rule_identifier"], type=pa.string()),
            pa.array(out["rule_namespace"], type=pa.string()),
            pa.array(out["rule_tags"], type=pa.list_(pa.string())),
            pa.array(out["rule_meta"], type=pa.string()),
            pa.array(out["matches"], type=_MATCH_TYPE),
        ]
        return pa.Table.from_arrays(arrays, names=names)


def yara_(ds, rules: str | list[str], field: str = "data",
          keep: tuple[str, ...] = (), namespace: str = "default",
          include_data: bool = True, concurrency=(1, 8), batch_size=256):
    """The ``yara`` operator (blockwise: each row is one scan unit)."""
    return ds.map_batches(
        YaraScanner,
        fn_constructor_kwargs=dict(rules=rules, field=field, keep=keep,
                                   namespace=namespace,
                                   include_data=include_data),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def yara_scan_bytes(data: bytes, rules: str | list[str],
                    namespace: str = "default") -> list[dict]:
    """One-shot whole-stream scan (the reference's default accumulate
    mode: the scanner fires once when the input is exhausted). Driver
    side by design — a single logical byte stream is not a Dataset."""
    events = []
    for rule in compile_rules(rules):
        hits = rule.scan(data)
        if hits is None:
            continue
        events.append({
            "rule": {
                "identifier": rule.identifier,
                "namespace": namespace,
                "tags": rule.tags,
                "meta": rule.meta,
                "strings": rule.strings_src,
            },
            "matches": {
                sid: [
                    {
                        "data": base64.b64encode(
                            data[off : off + ln]).decode(),
                        "base": 0,
                        "offset": off,
                        "match_length": ln,
                    }
                    for off, ln in hs
                ]
                for sid, hs in sorted(hits.items())
            },
        })
    return events


ship_by_value(sys.modules[__name__])
