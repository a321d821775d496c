"""Text-analysis + deduplication operators for LLM-data pipelines:
exact dedup, MinHash signatures + LSH banding, SimHash, n-gram
Jaccard, language-ID heuristic, quality scoring, token counting,
document fingerprinting.

Driver-mandated extensions beyond the reference (BASELINE north star;
the reference has no text processing — SURVEY §2 I-group note).

Design rules:
- ALL hashing is md5-based (first 15 hex chars → bigint), because md5
  is the one hash Spark and DuckDB compute identically — every
  operator here is therefore oracle-checkable, unlike builtin
  `xxhash64`/`hash` which differ per engine.
- Everything is a Catalyst expression over arrays (split/transform/
  aggregate/array_min) — no Python UDFs, no explode-shuffle for the
  per-document computations; the only shuffles are the final
  candidate-pair joins, keyed by (band, bucket) — the standard
  LSH-at-scale layout where each bucket join is local to its hash
  partition.
- MinHash parameters (16 perms = 4 bands × 4 rows) are module
  constants derived from a seeded RNG so Spark exprs and oracle SQL
  are generated from the SAME Python values.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_P = 2_147_483_647  # 2^31 − 1: keeps a·x + b inside int64

_rng = random.Random(42)
N_PERM = 16
BANDS = 4
ROWS_PER_BAND = N_PERM // BANDS
MINHASH_COEF: list[tuple[int, int]] = [
    (_rng.randrange(1, HASH_P), _rng.randrange(0, HASH_P)) for _ in range(N_PERM)
]

SIMHASH_BITS = 16

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "den"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "est", "que"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "不"],
}
LANG_PRIORITY = ["en", "de", "es", "fr", "zh"]  # deterministic tie-break


def word_hash(col: Column) -> Column:
    """Deterministic string→bigint hash, identical in DuckDB:
    ``CAST('0x'||substr(md5(x),1,15) AS BIGINT) % P``."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint") % HASH_P
    )


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(text), r"\s+")


def shingles(toks: Column, k: int = 3, sep: str = " ") -> Column:
    """k-grams over an array (words or chars), sep-joined, 1-indexed to
    mirror SQL list indexing. Empty array when fewer than k elements."""
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            sep, *[F.element_at(toks, i + off) for off in range(k)]
        ),
    )


def char_shingles(text: Column, k: int = 4) -> Column:
    """Character k-grams of the lowercased text — the MinHash input.
    Char shingles (vs word shingles) keep near-dup similarity high for
    documents sharing vocabulary, the standard fuzzy-dedup choice."""
    return shingles(F.split(F.lower(text), ""), k, sep="")


def minhash_signature(sh: Column) -> Column:
    """N_PERM-wide MinHash signature over a shingle array.

    sig_j = min over shingles of (a_j·h(s) + b_j) mod P — the classic
    permutation approximation. Pure expressions: per row this is
    N_PERM array_min/transform passes over an O(doc) array; no shuffle.
    Empty-shingle docs get sig_j = P (sentinel, never collides).
    """
    hashes = F.transform(sh, word_hash)

    def perm(a: int, b: int):
        # factory so the 1-arg lambda arity survives pyspark's
        # signature inspection (default-arg closures read as 3-arg)
        return lambda x: (a * x + b) % HASH_P

    return F.array(
        *[
            F.coalesce(
                F.array_min(F.transform(hashes, perm(a, b))),
                F.lit(HASH_P),
            )
            for a, b in MINHASH_COEF
        ]
    )


def lsh_bands(sig: Column) -> Column:
    """Band the signature: array of (band_id, bucket_key) structs where
    bucket_key joins ROWS_PER_BAND signature slots. Two docs land in
    the same (band_id, bucket_key) iff that band's slots all match."""
    return F.array(
        *[
            F.struct(
                F.lit(band).alias("band_id"),
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(sig, band * ROWS_PER_BAND + r + 1).cast("string")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("bucket_key"),
            )
            for band in range(BANDS)
        ]
    )


def simhash(toks: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash: per bit position, sum ±1 over token hashes' bit values;
    the fingerprint sets bit k iff the sum is positive. Integer
    arithmetic → order-independent → exactly reproducible in SQL."""
    hashes = F.transform(toks, word_hash)

    def bit_vote(k: int):
        return lambda acc, x: acc + F.when(
            F.shiftright(x, k).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0)
    for k in range(bits):
        bit_sum = F.aggregate(hashes, F.lit(0), bit_vote(k))
        out = out + F.when(bit_sum > 0, F.lit(2**k)).otherwise(F.lit(0))
    return out


def fingerprint(text: Column, prefix_len: int = 64) -> Column:
    """Polynomial rolling hash of the first `prefix_len` chars:
    h = fold(h·31 + ord(c)) mod P — a cheap stable document id for
    prefix-dup detection."""
    chars = F.split(F.substring(text, 1, prefix_len), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % HASH_P,
    )


def stopword_count(toks: Column, words: list[str]) -> Column:
    """Count of tokens in a stopword list (with repeats)."""
    wset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wset, t)))


def lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: stopword_count(toks, ws) for lang, ws in STOPWORDS.items()}


def lang_predict(scores: dict[str, Column]) -> Column:
    """Argmax with fixed priority-order tie-break (LANG_PRIORITY)."""
    pred = F.lit(LANG_PRIORITY[-1])
    # fold from lowest priority upward so earlier langs win ties
    for lang in reversed(LANG_PRIORITY[:-1]):
        later = [scores[l2] for l2 in LANG_PRIORITY[LANG_PRIORITY.index(lang) + 1 :]]
        cond = scores[lang] >= F.greatest(*later) if len(later) > 1 else (
            scores[lang] >= later[0]
        )
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return pred


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring feature battery: length, word stats, punctuation
    / stopword / uppercase ratios, and a fused [0,1] quality score."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_words = F.size(toks)
    avg_word_len = F.when(n_words > 0, n_chars.cast("double") / n_words).otherwise(0.0)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    upper_ratio = F.when(n_chars > 0, n_upper.cast("double") / n_chars).otherwise(0.0)
    n_stop = stopword_count(toks, STOPWORDS["en"])
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(0.0)
    quality = F.least(
        F.greatest(
            F.lit(0.0)
            + F.when((n_words >= 20) & (n_words <= 1000), 0.4).otherwise(0.0)
            + F.when((avg_word_len >= 3) & (avg_word_len <= 10), 0.2).otherwise(0.0)
            + F.when(punct_ratio <= 0.1, 0.2).otherwise(0.0)
            + F.when(stop_ratio >= 0.01, 0.2).otherwise(0.0),
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    return df.withColumns(
        {
            "n_words": n_words,
            "avg_word_len": avg_word_len,
            "punct_ratio": punct_ratio,
            "upper_ratio": upper_ratio,
            "stop_ratio": stop_ratio,
            "quality": quality,
        }
    )
