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


ship_by_value(sys.modules[__name__])
