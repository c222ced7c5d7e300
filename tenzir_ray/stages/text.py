"""Text-analysis stages for training-data pipelines over `documents`.

All stages are actor-pool ``map_batches`` classes: regexes/tables are
compiled once per actor in ``__init__`` (amortized), work per batch is
vectorized pandas/numpy. Beyond the reference's operator surface — these
are the large-scale-training-data operations the engine adds (language-ID
n-gram heuristic, quality scoring, token counting, rolling-hash
fingerprinting).
"""

from __future__ import annotations

import re
import sys

import numpy as np
import pandas as pd

from tenzir_ray._ship import ship_by_value

# tiny per-language stopword profiles for the n-gram/stopword heuristic —
# deterministic, dependency-free language ID (real deployments would swap
# in fastText/CLD3 via the same actor-pool stage)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "pas", "que"},
    "es": {"el", "la", "de", "que", "y", "los", "un", "una", "es", "no"},
    "pt": {"o", "a", "de", "que", "e", "os", "um", "uma", "não", "para"},
    "nl": {"de", "het", "een", "en", "van", "is", "dat", "niet", "op", "te"},
}


class LangId:
    """Language ID by stopword-profile voting (n-gram heuristic).

    Emits ``lang_pred`` (best profile, 'und' when nothing matches) and
    ``lang_score`` (fraction of tokens in the winning profile).
    """

    def __init__(self, column: str = "text"):
        self.column = column
        self.word_re = re.compile(r"[\w']+", re.UNICODE)
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.column].fillna("").str.lower().str.findall(self.word_re)
        langs, scores = [], []
        for words in toks:
            n = max(1, len(words))
            best, best_hits = "und", 0
            for lang, prof in self.profiles.items():
                hits = sum(1 for w in words if w in prof)
                if hits > best_hits:
                    best, best_hits = lang, hits
            langs.append(best if best_hits > 0 else "und")
            scores.append(best_hits / n)
        batch["lang_pred"] = langs
        batch["lang_score"] = np.asarray(scores, dtype=np.float64)
        return batch


class QualityScore:
    """Heuristic document quality: length, punctuation ratio, stopword
    ratio, mean word length, alpha ratio → a composite [0,1] score.
    Columns: n_tokens, punct_ratio, stop_ratio, alpha_ratio, quality."""

    def __init__(self, column: str = "text"):
        self.column = column
        self.word_re = re.compile(r"[\w']+", re.UNICODE)
        self.stop = frozenset(_LANG_PROFILES["en"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.column].fillna("")
        n_chars = text.str.len().clip(lower=1)
        n_alpha = text.str.count(r"[A-Za-z]")
        n_punct = text.str.count(r"[^\w\s]")
        toks = text.str.lower().str.findall(self.word_re)
        n_tokens = toks.str.len().clip(lower=0)
        stop_hits = toks.map(lambda ws: sum(w in self.stop for w in ws))
        batch["n_tokens"] = n_tokens.astype(np.int64)
        batch["punct_ratio"] = (n_punct / n_chars).astype(np.float64)
        batch["stop_ratio"] = (
            stop_hits / n_tokens.clip(lower=1)
        ).astype(np.float64)
        batch["alpha_ratio"] = (n_alpha / n_chars).astype(np.float64)
        # composite: reward length (saturating), alpha text, some stopwords
        length_term = np.minimum(batch["n_tokens"] / 100.0, 1.0)
        batch["quality"] = (
            0.4 * length_term
            + 0.3 * batch["alpha_ratio"]
            + 0.3 * np.minimum(batch["stop_ratio"] * 3.0, 1.0)
        ).astype(np.float64)
        return batch


class TokenCount:
    """Token counting: whitespace tokens + a BPE-ish regex sub-word count
    (GPT-2-style pretokenizer pattern, public knowledge)."""

    def __init__(self, column: str = "text"):
        self.column = column
        self.bpe_re = re.compile(
            r"'(?:[sdmt]|ll|ve|re)| ?\w+| ?[^\s\w]+|\s+(?!\S)|\s+"
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.column].fillna("")
        batch["ws_tokens"] = text.str.split().str.len().fillna(0).astype(np.int64)
        batch["bpe_tokens"] = text.str.findall(self.bpe_re).str.len().astype(np.int64)
        return batch


class Fingerprint:
    """Rolling-hash document fingerprint: min of 64-bit Rabin-Karp hashes
    over character n-gram windows (a winnowing-style content signature)."""

    def __init__(self, column: str = "text", ngram: int = 8, out: str = "fingerprint"):
        self.column = column
        self.ngram = ngram
        self.out = out
        self.base = 1_000_003
        self.mask = (1 << 61) - 1
        # hoisted: identical for every row
        self.powers = np.power(
            np.uint64(self.base), np.arange(ngram, dtype=np.uint64),
            dtype=np.uint64,
        )[::-1].copy()

    def _fp(self, s: str) -> int:
        n = self.ngram
        if len(s) < n:
            s = s.ljust(n, "\0")
        # vectorized rolling hash over all windows
        codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        win = np.lib.stride_tricks.sliding_window_view(codes, n)
        hashes = (win * self.powers).sum(axis=1) & np.uint64(self.mask)
        return int(hashes.min())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.out] = batch[self.column].fillna("").map(self._fp).astype(np.uint64)
        return batch


def lang_id(ds, column: str = "text", concurrency=(1, 4), batch_size: int = 4096):
    return ds.map_batches(
        LangId, fn_constructor_args=(column,), batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


def quality_score(ds, column: str = "text", concurrency=(1, 4), batch_size: int = 4096):
    return ds.map_batches(
        QualityScore, fn_constructor_args=(column,), batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


def token_count(ds, column: str = "text", concurrency=(1, 4), batch_size: int = 4096):
    return ds.map_batches(
        TokenCount, fn_constructor_args=(column,), batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


def fingerprint(ds, column: str = "text", ngram: int = 8, batch_size: int = 4096):
    return ds.map_batches(
        Fingerprint(column, ngram), batch_format="pandas", batch_size=batch_size
    )


def repetition_score(ds, column: str = "text", out: str = "rep_ratio",
                     batch_size: int = 4096):
    """Gopher-style within-document repetition metric: the fraction of
    word occurrences that are repeats, ``1 - distinct_words/words``
    (0 = no word repeats; → 1 for degenerate loops). Vectorized:
    explode whitespace tokens once per batch, one C groupby-nunique —
    no per-row Python."""

    def _rep(df: pd.DataFrame) -> pd.DataFrame:
        words = df[column].fillna("").str.split()
        n = words.str.len().to_numpy(dtype=np.float64)
        ex = words.explode()
        uniq = (
            ex.groupby(level=0).nunique()
            .reindex(df.index, fill_value=0)
            .to_numpy(dtype=np.float64)
        )
        ratio = np.where(n > 0, 1.0 - uniq / np.maximum(n, 1), 0.0)
        df = df.copy()
        df[out] = ratio
        return df

    return ds.map_batches(_rep, batch_format="pandas",
                          batch_size=batch_size)


#: the Gopher rule-7 stop list (Rae et al. 2021, appendix A1.1)
_GOPHER_STOPS = frozenset(
    ("the", "be", "to", "of", "and", "that", "have", "with"))


def gopher_quality(ds, column: str = "text", batch_size: int = 4096):
    """The full Gopher quality-filter rule battery (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", appendix A1.1 — public), as
    used by MassiveWeb/RefinedWeb-style corpus cleaning:

    1. word count (whitespace tokens) in [50, 100 000];
    2. mean word length in [3, 10];
    3. symbol-to-word ratio (``#`` + ``...``/``…``) ≤ 0.1;
    4. < 90 % of lines start with a bullet (``•``/``-``/``*``);
    5. ≤ 30 % of lines end with an ellipsis;
    6. > 80 % of words contain at least one alphabetic character;
    7. at least 2 DISTINCT words from the 8-word English stop list.

    Adds the metric columns ``wc, mwl, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_word_ratio, stop_hits`` plus the combined
    ``gopher_pass`` flag (filter on it with ``where``). Vectorized:
    whitespace/line explodes + C groupby reductions per batch, no
    per-row Python (the same shape as :func:`repetition_score`).
    Complements it — repetition (rules 8-13 of the paper) is
    :func:`repetition_score` / ``duplicate_spans``."""

    def _g(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        text = df[column].fillna("")
        # tokenize on the RE2 \s class ([\t\n\f\r ]) — NOT Python's
        # unicode \s — so counts agree with the string_split_regex
        # oracle on \x0b/NBSP/ideographic-space bytes in scraped text
        ex = text.str.split(r"[\t\n\f\r ]+", regex=True).explode().dropna()
        ex = ex[ex.str.len() > 0]
        wc = (ex.groupby(level=0).size()
              .reindex(df.index, fill_value=0).to_numpy(dtype=np.float64))
        wc_c = np.maximum(wc, 1.0)
        word_chars = (ex.str.len().groupby(level=0).sum()
                      .reindex(df.index, fill_value=0)
                      .to_numpy(dtype=np.float64))
        mwl = np.where(wc > 0, word_chars / wc_c, 0.0)
        n_hash = text.str.count("#", flags=0).to_numpy(dtype=np.float64)
        # str.count on the literal counts non-overlapping occurrences —
        # same convention the SQL replace()-length oracle uses
        n_ell = (text.str.count(r"\.\.\.")
                 + text.str.count("…")).to_numpy(dtype=np.float64)
        symbol_ratio = (n_hash + n_ell) / wc_c

        alpha = (ex.str.contains("[A-Za-z]", regex=True)
                 .groupby(level=0).sum()
                 .reindex(df.index, fill_value=0)
                 .to_numpy(dtype=np.float64))
        alpha_ratio = np.where(wc > 0, alpha / wc_c, 0.0)
        low = ex.str.lower()
        stop_hits = (low[low.isin(_GOPHER_STOPS)]
                     .groupby(level=0).nunique()
                     .reindex(df.index, fill_value=0)
                     .to_numpy(dtype=np.int64))

        lines = text.str.split("\n").explode().dropna()
        n_lines = lines.groupby(level=0).size() \
            .reindex(df.index, fill_value=0).to_numpy(dtype=np.float64)
        nl_c = np.maximum(n_lines, 1.0)
        # POSIX [[:space:]] (ASCII incl. \v), matching the oracle's RE2
        bullet = (lines.str.match(r"[ \t\n\r\f\v]*[•\-\*]", na=False)
                  .groupby(level=0).sum()
                  .reindex(df.index, fill_value=0)
                  .to_numpy(dtype=np.float64))
        ell_end = (lines.str.contains(r"(?:\.\.\.|…)[ \t\n\r\f\v]*$",
                                      regex=True, na=False)
                   .groupby(level=0).sum()
                   .reindex(df.index, fill_value=0)
                   .to_numpy(dtype=np.float64))

        df["wc"] = wc.astype(np.int64)
        df["mwl"] = mwl
        df["symbol_ratio"] = symbol_ratio
        df["bullet_frac"] = bullet / nl_c
        df["ellipsis_frac"] = ell_end / nl_c
        df["alpha_word_ratio"] = alpha_ratio
        df["stop_hits"] = stop_hits
        df["gopher_pass"] = (
            (wc >= 50) & (wc <= 100_000)
            & (mwl >= 3.0) & (mwl <= 10.0)
            & (symbol_ratio <= 0.1)
            & (df["bullet_frac"].to_numpy() < 0.9)
            & (df["ellipsis_frac"].to_numpy() <= 0.3)
            & (alpha_ratio > 0.8)
            & (stop_hits >= 2)
        )
        return df

    return ds.map_batches(_g, batch_format="pandas", batch_size=batch_size)


def ngram_counts(ds, column: str = "text", n: int = 2,
                 min_count: int = 1, buckets: int | None = None,
                 batch_size: int = 4096):
    """Corpus-level word n-gram counts: per batch explode n-grams
    vectorized (pandas shift-and-join, no per-row Python), pre-aggregate
    WITHIN the batch (combiner), then one exchange-backed grouped sum
    (`summarize_hash` policy — fine buckets, byte-coalesced tasks).
    ``min_count`` filters the tail AFTER the global sum. Returns
    ``(ngram, count)``. The streaming alternative for top-k-ish use is
    the Misra-Gries `heavy_hitters` sketch."""

    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"ngram": pd.Series([], dtype=str),
                              "count": pd.Series([], dtype=np.int64)})
        ex = df[column].fillna("").str.split().explode().dropna()
        if not len(ex):
            return empty
        # positional arrays: the exploded index (doc id) only gates
        # n-grams from crossing document boundaries
        w = ex.astype(str).to_numpy(dtype=object)
        doc = ex.index.to_numpy()
        base = pd.Series(w)  # fresh RangeIndex → positional str.cat
        mask = np.ones(len(w), dtype=bool)
        others = []
        for k in range(1, n):
            shifted = np.concatenate([w[k:], np.full(k, "", dtype=object)])
            same_doc = np.concatenate([doc[k:] == doc[:-k],
                                       np.zeros(k, dtype=bool)])
            mask &= same_doc
            others.append(pd.Series(shifted))
        joined = base.str.cat(others, sep=" ") if others else base
        joined = joined[mask]
        if not len(joined):
            return empty
        c = joined.value_counts()
        return pd.DataFrame({"ngram": c.index.astype(str),
                             "count": c.to_numpy(np.int64)})

    from tenzir_ray.stages.exchange import grouped_apply

    pre = ds.map_batches(_explode, batch_format="pandas",
                         batch_size=batch_size)

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("ngram", as_index=False, sort=False)["count"].sum()
        if min_count > 1:
            out = out[out["count"] >= min_count]
        return out

    return grouped_apply(pre, ["ngram"], _sum, num_buckets=buckets)


# --- PII redaction + HTML stripping (training-data sanitizers) -------------

#: (name, RE2 pattern, placeholder) — order matters: earlier rules win on
#: overlapping spans (an SSN-shaped substring inside a phone number is
#: redacted by whichever rule runs first). RE2-only syntax keeps the engine
#: (Arrow replace_substring_regex) bit-identical to SQL engines' RE2
#: regexp_replace — no lookarounds, no backrefs.
DEFAULT_PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # \+? BEFORE \b: space→'+' is not a word boundary, so \b\+? would
    # skip the plus and leave it behind in the redacted text
    ("phone", r"\+?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


class Redact:
    """PII redaction over a text column: each rule's matches are replaced
    by its typed placeholder, rules applied in order, all occurrences.

    Engine extension beyond the reference's `pseudonymize`
    (libtenzir/builtins/operators/pseudonymize.cpp redacts only ip fields;
    a training-data pipeline must sanitize free text). Vectorized Arrow
    ``replace_substring_regex`` (RE2) per rule — one C pass per rule, no
    Python row loop; patterns validated once per actor."""

    __name__ = "redact"

    def __init__(self, column: str = "text",
                 rules: "list[tuple[str, str, str]] | None" = None,
                 out: "str | None" = None):
        self.column = column
        self.rules = list(rules) if rules is not None else DEFAULT_PII_RULES
        self.out = out or column
        for name, pat, _ in self.rules:
            re.compile(pat)  # fail fast on bad patterns

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        col = batch.column(self.column)
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
            col = pc.cast(col, pa.string())
        for _, pat, repl in self.rules:
            col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
        if self.out in batch.column_names:
            i = batch.column_names.index(self.out)
            return batch.set_column(i, self.out, col)
        return batch.append_column(self.out, col)


#: minimal HTML entity table, decoded AFTER tag removal (same order as the
#: SQL oracle's chained replace()); &amp; last so freshly-decoded "&"s
#: can't re-combine into new entities
_HTML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                  ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


class StripHtml:
    """Strip HTML markup from a text column: remove ``<...>`` tags (RE2
    ``<[^>]*>``), then decode the common entities. The normalize step of a
    web-corpus cleaning pipeline; vectorized Arrow kernels per batch."""

    __name__ = "strip_html"

    def __init__(self, column: str = "text", out: "str | None" = None):
        self.column = column
        self.out = out or column

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        col = batch.column(self.column)
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
            col = pc.cast(col, pa.string())
        col = pc.replace_substring_regex(col, pattern=r"<[^>]*>", replacement="")
        for ent, ch in _HTML_ENTITIES:
            col = pc.replace_substring(col, pattern=ent, replacement=ch)
        if self.out in batch.column_names:
            i = batch.column_names.index(self.out)
            return batch.set_column(i, self.out, col)
        return batch.append_column(self.out, col)


def redact(ds, column: str = "text", rules=None, out=None,
           batch_size: int = 8192):
    return ds.map_batches(
        Redact(column, rules, out), batch_format="pyarrow",
        batch_size=batch_size,
    )


def strip_html(ds, column: str = "text", out=None, batch_size: int = 8192):
    return ds.map_batches(
        StripHtml(column, out), batch_format="pyarrow", batch_size=batch_size,
    )


# --- corpus relevance: BM25 and TF-IDF --------------------------------------

#: SQL-reproducible tokenizer: lowercase alnum runs (DuckDB
#: ``regexp_extract_all(lower(text), '[a-z0-9]+')``)
_WORD_RE = re.compile(r"[a-z0-9]+")


def _explode_tokens(df: pd.DataFrame, column: str) -> pd.Series:
    """Lowercased alnum tokens, index = originating row position."""
    return df[column].fillna("").str.lower().str.findall(_WORD_RE).explode().dropna()


def corpus_stats(ds, terms: list[str] | None = None, column: str = "text",
                 batch_size: int = 4096) -> dict:
    """ONE streaming pass → tiny driver reduce: total docs-with-tokens,
    total token count, and document frequency per term (for ``terms``,
    or the full vocabulary when None). Per-batch output is a handful of
    partial rows (∝ distinct terms in the batch), so the reduce is a
    bounded ``to_pandas`` — no shuffle. At 100 TB with an unbounded
    vocabulary, pass ``terms`` (query-sized) or post-filter with a
    ``min_df`` before broadcasting."""
    term_set = set(terms) if terms is not None else None

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = _explode_tokens(df, column)
        if not len(ex):
            return pd.DataFrame({"term": pd.Series([], dtype=str),
                                 "df": pd.Series([], dtype=np.int64),
                                 "docs": pd.Series([], dtype=np.int64),
                                 "tokens": pd.Series([], dtype=np.int64)})
        docs = int(ex.index.nunique())
        tokens = len(ex)
        pairs = ex.reset_index()
        pairs.columns = ["doc", "term"]
        if term_set is not None:
            pairs = pairs[pairs["term"].isin(term_set)]
        dfc = pairs.drop_duplicates().groupby("term", sort=False).size()
        out = pd.DataFrame({"term": dfc.index.astype(str),
                            "df": dfc.to_numpy(np.int64)})
        out["docs"] = np.int64(0)
        out["tokens"] = np.int64(0)
        stats = pd.DataFrame({"term": [""], "df": [np.int64(0)],
                              "docs": [np.int64(docs)],
                              "tokens": [np.int64(tokens)]})
        return pd.concat([out, stats], ignore_index=True)

    parts = ds.map_batches(
        _partial, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    df_map = (
        parts[parts["term"] != ""].groupby("term")["df"].sum().to_dict()
    )
    return {
        "n_docs": int(parts["docs"].sum()),
        "n_tokens": int(parts["tokens"].sum()),
        "df": {k: int(v) for k, v in df_map.items()},
    }


def bm25_score(ds, query: str, column: str = "text",
               id_column: str = "doc_id", k1: float = 1.2, b: float = 0.75,
               batch_size: int = 4096):
    """Okapi BM25 of every document against ``query`` — the standard
    two-streaming-pass shape: pass 1 collects corpus stats for the QUERY
    terms only (tiny — no full-vocab state), pass 2 scores each batch
    vectorized against the broadcast stats. Uses the Lucene-style
    non-negative idf ``ln((N - df + 0.5)/(df + 0.5) + 1)``. Emits
    ``(id_column, score)`` for documents containing ≥1 query term."""
    terms = sorted(set(_WORD_RE.findall(query.lower())))
    if not terms:
        raise ValueError("query has no tokens")
    stats = corpus_stats(ds, terms=terms, column=column,
                         batch_size=batch_size)
    n = stats["n_docs"]
    avgdl = stats["n_tokens"] / max(n, 1)
    idf = {
        t: float(np.log((n - d + 0.5) / (d + 0.5) + 1))
        for t, d in stats["df"].items()
    }

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_column: pd.Series([], dtype=df[id_column].dtype
                                                   if len(df) else np.int64),
                              "score": pd.Series([], dtype=np.float64)})
        if not len(df):
            return empty
        df = df.reset_index(drop=True)  # labels == positions for iloc below
        ex = _explode_tokens(df, column)
        dl = ex.groupby(level=0).size()
        hits = ex[ex.isin(idf)]
        if not len(hits):
            return empty
        tf = hits.groupby([hits.index, hits]).size()
        tf.index.names = ["row", "term"]
        s = tf.reset_index(name="tf")
        s["idf"] = s["term"].map(idf)
        s["dl"] = s["row"].map(dl).astype(np.float64)
        denom = s["tf"] + k1 * (1 - b + b * s["dl"] / avgdl)
        s["part"] = s["idf"] * (s["tf"] * (k1 + 1)) / denom
        agg = s.groupby("row", sort=False)["part"].sum()
        return pd.DataFrame({
            id_column: df[id_column].iloc[agg.index].to_numpy(),
            "score": agg.to_numpy(np.float64),
        })

    return ds.map_batches(_score, batch_format="pandas",
                          batch_size=batch_size)


def bigram_lm_score(ds, column: str = "text", id_column: str = "doc_id",
                    alpha: float = 0.1, min_count: int = 1,
                    batch_size: int = 4096):
    """Corpus-LM quality score (CCNet-style importance filtering shape):
    per document, the mean ``ln P(w_i | w_{i-1})`` under an add-alpha
    smoothed bigram model estimated from the corpus ITSELF —
    ``P(w2|w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V)``.

    Degenerate/boilerplate docs score high (their bigrams dominate the
    corpus), rare-garbage docs score very low; filtering the tails is
    the classic LM-based cleaning step. Two streaming passes: pass 1
    builds unigram+bigram counts with per-batch combiners (bounded by
    ``min_count`` at web scale before the broadcast), pass 2 scores each
    batch vectorized against the broadcast maps. Emits ``(id_column,
    n_bigrams, lm_score)`` for docs with ≥2 tokens."""

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        ex = _explode_tokens(df, column)
        empty = pd.DataFrame({"w1": pd.Series([], dtype=str),
                              "w2": pd.Series([], dtype=str),
                              "count": pd.Series([], dtype=np.int64)})
        if not len(ex):
            return empty
        w = ex.astype(str).to_numpy(dtype=object)
        doc = ex.index.to_numpy()
        uni = pd.Series(w).value_counts()
        frames = [pd.DataFrame({"w1": uni.index.astype(str), "w2": "",
                                "count": uni.to_numpy(np.int64)})]
        if len(w) > 1:
            same = doc[1:] == doc[:-1]
            if same.any():
                bg = pd.DataFrame({"w1": w[:-1][same], "w2": w[1:][same]})
                bgc = bg.value_counts()
                idx = bgc.index.to_frame(index=False)
                frames.append(pd.DataFrame({
                    "w1": idx["w1"].astype(str),
                    "w2": idx["w2"].astype(str),
                    "count": bgc.to_numpy(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    pre = ds.map_batches(_counts, batch_format="pandas",
                         batch_size=batch_size)
    if min_count > 1:
        # the broadcast bound must apply BEFORE the driver collect:
        # sum counts distributed (exchange-backed), filter the bigram
        # tail there, and only pull the surviving model to the driver
        from tenzir_ray.stages.exchange import grouped_apply

        def _sum(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby(["w1", "w2"], as_index=False,
                            sort=False)["count"].sum()
            return out[(out["w2"] == "") | (out["count"] >= min_count)]

        parts = grouped_apply(pre, ["w1", "w2"], _sum,
                              tag="bigram_lm").to_pandas()
    else:
        parts = pre.to_pandas()
    agg = parts.groupby(["w1", "w2"], sort=False)["count"].sum()
    uni_map = {k[0]: int(v) for k, v in agg.items() if k[1] == ""}
    bi_map = {k: int(v) for k, v in agg.items()
              if k[1] != "" and v >= min_count}
    vocab = len(uni_map)
    # MultiIndex series → vectorized reindex lookup inside _score
    bi_ser = pd.Series(bi_map, dtype=np.float64) if bi_map else pd.Series(
        dtype=np.float64,
        index=pd.MultiIndex.from_arrays([[], []]),
    )

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_column: pd.Series([], dtype=df[id_column].dtype
                                                   if len(df) else np.int64),
                              "n_bigrams": pd.Series([], dtype=np.int64),
                              "lm_score": pd.Series([], dtype=np.float64)})
        if not len(df):
            return empty
        df = df.reset_index(drop=True)
        ex = _explode_tokens(df, column)
        if len(ex) < 2:
            return empty
        w = ex.astype(str).to_numpy(dtype=object)
        doc = ex.index.to_numpy()
        same = doc[1:] == doc[:-1]
        if not same.any():
            return empty
        s = pd.DataFrame({"row": doc[:-1][same],
                          "w1": w[:-1][same], "w2": w[1:][same]})
        c_bi = bi_ser.reindex(
            pd.MultiIndex.from_arrays([s["w1"], s["w2"]])
        ).fillna(0.0).to_numpy(np.float64)
        c_uni = s["w1"].map(uni_map).fillna(0).to_numpy(np.float64)
        logp = np.log((c_bi + alpha) / (c_uni + alpha * vocab))
        g = pd.DataFrame({"row": s["row"], "logp": logp}).groupby(
            "row", sort=False)["logp"].agg(["mean", "size"])
        return pd.DataFrame({
            id_column: df[id_column].iloc[g.index].to_numpy(),
            "n_bigrams": g["size"].to_numpy(np.int64),
            "lm_score": g["mean"].to_numpy(np.float64),
        })

    return ds.map_batches(_score, batch_format="pandas",
                          batch_size=batch_size)


def tfidf_top_terms(ds, column: str = "text", id_column: str = "doc_id",
                    min_df: int = 1, batch_size: int = 4096):
    """Per-document most-distinctive term by TF-IDF
    (``tf * ln(N/df)``), ties broken lexicographically. Pass 1 builds
    the document-frequency map (bounded partials, driver reduce —
    ``min_df`` bounds the broadcast at web scale); pass 2 is a
    vectorized per-batch argmax against the broadcast map. Emits
    ``(id_column, top_term, tfidf)``."""
    stats = corpus_stats(ds, terms=None, column=column,
                         batch_size=batch_size)
    n = stats["n_docs"]
    df_map = {t: d for t, d in stats["df"].items() if d >= min_df}

    def _top(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_column: pd.Series([], dtype=df[id_column].dtype
                                                   if len(df) else np.int64),
                              "top_term": pd.Series([], dtype=str),
                              "tfidf": pd.Series([], dtype=np.float64)})
        if not len(df):
            return empty
        df = df.reset_index(drop=True)  # labels == positions for iloc below
        ex = _explode_tokens(df, column)
        ex = ex[ex.isin(df_map)]
        if not len(ex):
            return empty
        tf = ex.groupby([ex.index, ex]).size()
        tf.index.names = ["row", "term"]
        s = tf.reset_index(name="tf")
        s["idf"] = np.log(float(n) / s["term"].map(df_map).to_numpy(np.float64))
        s["s"] = s["tf"] * s["idf"]
        # argmax per row: sort by (score desc, term asc) and keep first
        s = s.sort_values(["row", "s", "term"],
                          ascending=[True, False, True], kind="mergesort")
        best = s.drop_duplicates("row", keep="first")
        return pd.DataFrame({
            id_column: df[id_column].iloc[best["row"]].to_numpy(),
            "top_term": best["term"].to_numpy(dtype=object),
            "tfidf": best["s"].to_numpy(np.float64),
        })

    return ds.map_batches(_top, batch_format="pandas",
                          batch_size=batch_size)


def normalize_unicode(ds, column: str = "text", form: str = "NFC",
                      out: "str | None" = None, batch_size: int = 16384):
    """Unicode-normalize a string column (NFC/NFD/NFKC/NFKD via
    CPython's unicodedata — the composing forms are done HERE because
    this pyarrow's ``utf8_normalize`` skips recomposition for NFC/NFKC;
    the quick-check fast path below makes already-normalized corpora
    ~free). DuckDB ``nfc_normalize`` parity for form="NFC"."""
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    out = out or column

    def _norm(df: pd.DataFrame) -> pd.DataFrame:
        is_norm = unicodedata.is_normalized
        norm = unicodedata.normalize
        df[out] = [
            (s if not isinstance(s, str) or is_norm(form, s)
             else norm(form, s))
            for s in df[column].to_numpy(dtype=object)
        ]
        return df

    return ds.map_batches(_norm, batch_format="pandas",
                          batch_size=batch_size)


def _levenshtein_row(sa: str, sb: str) -> int:
    """Edit distance of one pair, numpy DP with a fully-vectorized inner
    row: the sequential insertion chain cur[j] = min(cand[j], cur[j-1]+1)
    is the running minimum of (cand[k]-k), i.e. one minimum.accumulate —
    no per-character Python inner loop."""
    if sa == sb:
        return 0
    if not sa or not sb:
        return max(len(sa), len(sb))
    if len(sb) > len(sa):  # iterate over the shorter side
        sa, sb = sb, sa
    a = np.frombuffer(sa.encode("utf-32-le"), dtype=np.uint32)
    b = np.frombuffer(sb.encode("utf-32-le"), dtype=np.uint32)
    n = len(b)
    js = np.arange(n + 1, dtype=np.int64)
    prev = js.copy()
    cand = np.empty(n + 1, dtype=np.int64)
    for i, ca in enumerate(a, 1):
        cand[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (b != ca), out=cand[1:])
        np.subtract(cand, js, out=cand)
        np.minimum.accumulate(cand, out=cand)
        np.add(cand, js, out=cand)
        prev, cand = cand, prev
    return int(prev[n])


def _dist_kernels(metric: str):
    if metric == "levenshtein":
        return _levenshtein_row, np.int64
    if metric == "hamming":
        def _ham(sa: str, sb: str) -> int:
            if len(sa) != len(sb):
                raise ValueError(
                    "hamming distance needs equal-length strings "
                    f"({len(sa)} vs {len(sb)})")
            if not sa:
                return 0
            a = np.frombuffer(sa.encode("utf-32-le"), dtype=np.uint32)
            b = np.frombuffer(sb.encode("utf-32-le"), dtype=np.uint32)
            return int((a != b).sum())
        return _ham, np.int64
    if metric == "jaccard":
        def _jac(sa: str, sb: str) -> float:
            A, B = set(sa), set(sb)
            if not A and not B:
                return 1.0
            return len(A & B) / len(A | B)
        return _jac, np.float64
    if metric == "jaro":
        return _jaro_row, np.float64
    if metric == "jaro_winkler":
        def _jw(sa: str, sb: str) -> float:
            j = _jaro_row(sa, sb)
            if j <= 0.7:  # DuckDB boost threshold
                return j
            l = 0
            for x, y in zip(sa[:4], sb[:4]):
                if x != y:
                    break
                l += 1
            return j + l * 0.1 * (1.0 - j)
        return _jw, np.float64
    raise ValueError(f"unknown string-distance metric {metric!r}")


def _jaro_row(sa: str, sb: str) -> float:
    """Jaro similarity, DuckDB-parity (both-empty → 0.0, fuzz-verified
    to 1e-12 over random pairs): greedy windowed matching + half the
    out-of-order matches as transpositions."""
    la, lb = len(sa), len(sb)
    if la == 0 or lb == 0:
        return 0.0
    if sa == sb:
        return 1.0
    a = np.frombuffer(sa.encode("utf-32-le"), np.uint32)
    b = np.frombuffer(sb.encode("utf-32-le"), np.uint32)
    win = max(la, lb) // 2 - 1
    am = np.zeros(la, bool)
    bm = np.zeros(lb, bool)
    for i in range(la):
        lo, hi = max(0, i - win), min(lb, i + win + 1)
        # first yet-unmatched b position equal to a[i] inside the window
        cand = np.flatnonzero((b[lo:hi] == a[i]) & ~bm[lo:hi])
        if len(cand):
            am[i] = True
            bm[lo + cand[0]] = True
    m = int(am.sum())
    if m == 0:
        return 0.0
    t = int((a[am] != b[bm]).sum()) // 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def string_distance(ds, a: str, b: str,
                    metrics: "dict[str, str] | None" = None,
                    batch_size: int = 8192):
    """Pairwise string-distance columns between two string columns.

    ``metrics`` maps output column -> metric name (``levenshtein`` edit
    distance, ``hamming`` equal-length mismatch count, ``jaccard``
    character-set similarity — DuckDB-compatible semantics for all
    three; null in either input yields null). Default adds one
    ``levenshtein`` column. The per-pair DP is numpy-vectorized
    (O(max_len) vector steps per pair); fuzzy-join candidate verification
    at corpus scale should bound pair count first (LSH/banding — see
    stages/dedup.py)."""
    metrics = metrics or {"levenshtein": "levenshtein"}
    kernels = {out: _dist_kernels(m) for out, m in metrics.items()}

    def _dist(df: pd.DataFrame) -> pd.DataFrame:
        va = df[a].to_numpy(dtype=object)
        vb = df[b].to_numpy(dtype=object)
        valid = np.array(
            [isinstance(x, str) and isinstance(y, str)
             for x, y in zip(va, vb)], dtype=bool)
        for out, (fn, dt) in kernels.items():
            vals = np.empty(len(df), dtype=np.float64)
            vals.fill(np.nan)
            for i in np.flatnonzero(valid):
                vals[i] = fn(va[i], vb[i])
            if dt is np.int64 and valid.all():
                df[out] = vals.astype(np.int64)
            else:
                df[out] = vals  # float (nullable) when nulls present
        return df

    return ds.map_batches(_dist, batch_format="pandas",
                          batch_size=batch_size)


#: multiplicative hash constants: selection reuses hash_split's Knuth
#: constant (same rule, same SQL form); the two split-point hashes use
#: distinct constants — reusing the selection hash for a position would
#: bias prefixes into [0, rate·L)
_FIM_A2 = 2246822519
_FIM_A3 = 3266489917
_FIM_MOD = 1 << 32


def _fim_frac(k: "np.ndarray", a: int) -> "np.ndarray":
    """((k * a) % 2^32) / 2^32 in uint64 (no int64 overflow wrap; same
    integer path as splits._key_fractions)."""
    h = (k.astype(np.uint64) * np.uint64(a)) % np.uint64(_FIM_MOD)
    return h.astype(np.float64) / float(_FIM_MOD)


#: two more public multiplicative constants (xxhash PRIME32_4/5) for
#: the second span's position hashes
_SPAN_A4 = 668265263
_SPAN_A5 = 374761393


#: == splits._KNUTH (hash_split's selection constant): duplicated as a
#: plain literal because a deferred cross-module import inside the
#: shipped closure breaks workers outside the repo cwd; a pytest
#: asserts the two stay in sync
_SELECT_A1 = 2654435761


def _hash_select(df, key: str, rate: float, opname: str):
    """Shared key-validation + selection preamble of the deterministic
    rewriting ops (fim_transform / span_corrupt): returns
    ``(k int64, sel bool mask)`` — hash_split's Knuth selection rule,
    null keys unselected, non-numeric / negative keys rejected loudly
    (both silently break SQL hash parity)."""
    import pandas as pd

    kraw = pd.to_numeric(df[key], errors="coerce")
    knull = kraw.isna().to_numpy()
    if (knull & df[key].notna().to_numpy()).any():
        raise ValueError(f"{opname}: key column {key!r} must be numeric")
    kf = kraw.fillna(0).to_numpy(np.float64)
    if (kf % 1 != 0).any():
        raise ValueError(
            f"{opname}: key column {key!r} must be integral — a float "
            "key would silently truncate and break SQL hash parity")
    k = kf.astype(np.int64)
    if (k < 0).any():
        raise ValueError(f"{opname}: negative keys break SQL hash parity")
    sel = (_fim_frac(k, _SELECT_A1) < rate) & ~knull
    return k, sel


def span_corrupt(ds, key: str, column: str = "text",
                 input_col: str = "corrupt_input",
                 target_col: str = "corrupt_target", rate: float = 1.0,
                 sentinels: "tuple[str, str]" = ("<extra_id_0>",
                                                "<extra_id_1>"),
                 batch_size: int = 8192):
    """T5-style span corruption (arXiv:1910.10683) with DETERMINISTIC
    spans: for the hash-selected ``rate`` fraction of rows, two
    codepoint spans (one per half of the document, positions from the
    key's hash fractions) are cut out of ``column``; ``input_col``
    carries the text with each span replaced by its sentinel and
    ``target_col`` the sentinel-prefixed removed spans — the standard
    denoising pair. Unselected rows pass through with a null target.
    Like :func:`fim_transform`, everything is a pure function of key
    and length, so the SQL oracle is substr arithmetic; keys must be
    NON-NEGATIVE integers below 2^31 for exact SQL parity (same rules
    as fim — nulls pass through unselected, negatives and non-numeric
    keys raise).

    Span rule (0-based codepoints, ``L2 = L // 2``):
    ``s1 = floor(h2·L2)``, ``e1 = s1 + floor(h3·(L2 − s1))``,
    ``s2 = L2 + floor(h4·(L − L2))``, ``e2 = s2 + floor(h5·(L − s2))``
    — always ordered ``s1 ≤ e1 ≤ L2 ≤ s2 ≤ e2 ≤ L``."""
    import pandas as pd

    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"span_corrupt: rate must be in [0,1], got {rate}")
    t0, t1 = sentinels

    def _corrupt(df: pd.DataFrame) -> pd.DataFrame:
        k, sel = _hash_select(df, key, rate, "span_corrupt")
        h2 = _fim_frac(k, _FIM_A2)
        h3 = _fim_frac(k, _FIM_A3)
        h4 = _fim_frac(k, _SPAN_A4)
        h5 = _fim_frac(k, _SPAN_A5)
        texts = df[column].to_numpy(dtype=object)
        inp = list(texts)
        tgt: list = [None] * len(texts)
        for i in np.flatnonzero(sel):
            t = texts[i]
            if not isinstance(t, str):
                continue
            L = len(t)
            L2 = L // 2
            s1 = int(h2[i] * L2)
            e1 = s1 + int(h3[i] * (L2 - s1))
            s2 = L2 + int(h4[i] * (L - L2))
            e2 = s2 + int(h5[i] * (L - s2))
            inp[i] = f"{t[:s1]}{t0}{t[e1:s2]}{t1}{t[e2:]}"
            tgt[i] = f"{t0}{t[s1:e1]}{t1}{t[s2:e2]}"
        df[input_col] = inp
        df[target_col] = tgt
        return df

    return ds.map_batches(_corrupt, batch_format="pandas",
                          batch_size=batch_size)


def fim_transform(ds, key: str, column: str = "text",
                  out: "str | None" = None, rate: float = 0.5,
                  pre: str = "<PRE>", suf: str = "<SUF>",
                  mid: str = "<MID>", batch_size: int = 8192):
    """Fill-in-the-middle transform for code/LM training data
    (arXiv:2207.14255 PSM format): for a DETERMINISTIC ``rate``
    fraction of rows (selected by Knuth key hash, like
    :func:`tenzir_ray.stages.splits.hash_split`), split the document
    into prefix/middle/suffix at two hash-derived codepoint positions
    and emit ``<PRE>prefix<SUF>suffix<MID>middle``; the rest pass
    through unchanged. Everything is a pure function of ``key`` and
    the text length, so runs, partitionings — and the SQL oracle
    (substr arithmetic) — agree exactly.

    Split rule (codepoints, 0-based): ``p = floor(h2 * L)``,
    ``m = p + floor(h3 * (L - p))`` with ``h2/h3`` the key's second and
    third hash fractions (``h1``, the hash_split Knuth rule, selects) —
    prefix = [0, p), middle = [p, m), suffix = [m, L).

    Keys must be NON-NEGATIVE integers below 2^31 for exact SQL parity
    (DuckDB's ``key * const`` overflows BIGINT above ~3.4e9 and its
    ``%`` keeps the dividend's sign); negative keys raise, null keys
    pass through unselected.
    """
    out = out or column
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"fim_transform: rate must be in [0,1], got {rate}")
    def _fim(df: pd.DataFrame) -> pd.DataFrame:
        k, sel = _hash_select(df, key, rate, "fim_transform")
        h2 = _fim_frac(k, _FIM_A2)
        h3 = _fim_frac(k, _FIM_A3)
        texts = df[column].to_numpy(dtype=object)
        res = list(texts)
        for i in np.flatnonzero(sel):
            t = texts[i]
            if not isinstance(t, str):
                continue
            L = len(t)
            p = int(h2[i] * L)
            m = p + int(h3[i] * (L - p))
            res[i] = f"{pre}{t[:p]}{suf}{t[m:]}{mid}{t[p:m]}"
        df[out] = res
        df[out + "_fim"] = sel
        return df

    return ds.map_batches(_fim, batch_format="pandas",
                          batch_size=batch_size)


ship_by_value(sys.modules[__name__])
