"""Text column functions + the shared constants their DuckDB oracles mirror.

Everything here is a native Spark expression (split/filter/transform/
aggregate higher-order functions) — zero Python UDFs, so the whole text
pipeline stays inside whole-stage codegen and scales linearly with input
splits. The DuckDB SQL equivalents in plans/catalog_text.py are generated
from the same constants; keep them in sync.

Hash primitive: md5 hex strings (identical in Spark and DuckDB), with
nibble values extracted via ``instr('0123456789abcdef', ch) - 1`` — the one
hex->int idiom both engines share.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tokenizer: lowercase, split on runs of non-alphanumerics, drop empties
TOKEN_SPLIT_RE = "[^a-z0-9]+"

#: shingle width for fingerprints / MinHash / Jaccard
SHINGLE_K = 5

#: number of MinHash hash functions and LSH band width
MINHASH_K = 16
MINHASH_BAND = 4

#: stopword lists for the language-ID heuristic (deterministic tie-break:
#: first list wins -> en > de > es > fr)
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "zu", "den", "mit", "ein", "nicht"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr": ("le", "la", "de", "et", "un", "que", "pour", "dans", "ce", "il"),
}

HEX_DIGITS = "0123456789abcdef"


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def stopword_count(toks: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def shingles(toks: Column) -> Column:
    """Word k-shingles as strings; whole doc if shorter than k."""
    n = F.size(toks)
    k = SHINGLE_K
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: min md5 over word shingles (order-insensitive,
    content-defined — a rolling-hash family member)."""
    return F.array_min(F.transform(shingles(tokens(col)), F.md5))
