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


def char_shingles(text: Column, k: int = 4, prelowered: bool = False) -> Column:
    """Character k-grams of the lowercased text — the MinHash input.
    Char shingles (vs word shingles) keep near-dup similarity high for
    documents sharing vocabulary, the standard fuzzy-dedup choice.

    Implemented as direct ``substr(i, k)`` slices over the string —
    NOT a split-to-char-array + concat pass, which materializes a
    per-character string array and measured ~25× slower at sf0.1
    (78 s → 3 s for the exploded-shingle scan).

    ``prelowered=True`` skips the lower() — pass it when the caller
    has already projected a lowercased column. This matters because
    expressions inside higher-order-function lambdas are re-evaluated
    PER ELEMENT (no common-subexpression elimination across lambda
    bounds): an inlined lower() runs once per shingle, O(len²) chars
    per doc. Project the lowered text as a real column first and the
    lambda sees a cheap attribute reference."""
    src = text if prelowered else F.lower(text)
    n = F.length(src)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: src.substr(i, F.lit(k)))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sig: array<bigint>) — N_PERM-wide MinHash over char-4-gram
    shingles; sig_j = min over shingles of (a_j·h(s) + b_j) mod P.

    Relational layout, NOT a nested array expression: explode shingles
    → md5-hash each ONCE → one hash aggregate computing all N_PERM
    mins. This is the shape that scales (partial aggregation collapses
    shingles map-side; one shuffle row per doc) AND avoids the
    16×-inlined expression tree that blows codegen limits. Docs with
    no shingles get the sentinel signature (P, never collides).

    The input is round-robin repartitioned to the session's default
    parallelism before the CPU-heavy shingle+hash pass: document
    tables often arrive as few large row-groups (here: one file →
    one split), and the per-core cost is the bottleneck, not the
    scan. The tiny (id, text) shuffle buys full-core fan-out; at
    warehouse scale with many splits it is a near-no-op.
    """
    sc = df.sparkSession.sparkContext
    fanned = df.select(
        id_col, F.lower(F.col(text_col)).alias("__lt")
    ).repartition(sc.defaultParallelism)
    exploded = fanned.select(
        F.col(id_col),
        F.explode(char_shingles(F.col("__lt"), prelowered=True)).alias("sh"),
    ).withColumn("h", word_hash(F.col("sh")))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % HASH_P).alias(f"s{j}")
        for j, (a, b) in enumerate(MINHASH_COEF)
    ]
    sigs = exploded.groupBy(id_col).agg(*aggs)
    all_ids = df.select(id_col)
    joined = all_ids.join(sigs, id_col, "left")
    return joined.select(
        id_col,
        F.array(
            *[
                F.coalesce(F.col(f"s{j}"), F.lit(HASH_P))
                for j in range(N_PERM)
            ]
        ).alias("sig"),
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


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS) -> DataFrame:
    """(id, simhash) — per bit position, sum ±1 votes over token
    hashes; bit k of the fingerprint is set iff the vote is positive.

    Relational layout (explode tokens → hash once → one aggregate with
    `bits` conditional sums): order-independent integer arithmetic,
    partial-agg friendly, exactly reproducible in SQL. Tokenless docs
    get simhash 0."""
    exploded = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t")
    ).withColumn("h", word_hash(F.col("t")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), k).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{k}")
        for k in range(bits)
    ]
    agg = exploded.groupBy(id_col).agg(*votes)
    sh = None
    for k in range(bits):
        term = F.when(F.col(f"b{k}") > 0, F.lit(2**k)).otherwise(F.lit(0))
        sh = term if sh is None else sh + term
    out = df.select(id_col).join(agg, id_col, "left")
    return out.select(
        id_col, F.coalesce(sh, F.lit(0)).cast("bigint").alias("simhash")
    )


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


QC_BUCKETS = 1024  # hashing-trick weight slots (shared on collision)


def hashed_features(toks: Column) -> Column:
    """Unigram + adjacent-word-bigram feature strings — the fastText
    feature map (Joulin et al., "Bag of Tricks for Efficient Text
    Classification"), built as a pure array expression: no explode,
    no shuffle, no Python. Bigrams are ``shingles(k=2)`` joined with
    '_', which keeps them distinct from unigrams for ordinary text
    (a whitespace-split token containing a literal underscore, e.g.
    'a_b', collides with the bigram of ('a','b') — an accepted
    hashing-trick-style collision: both engines compute identically,
    and collisions already share weight slots by design)."""
    return F.concat(toks, shingles(toks, k=2, sep="_"))


def hashed_weight_sum(feats: Column, n_buckets: int = QC_BUCKETS) -> Column:
    """Hashing-trick linear-model dot product, in exact integers:
    each feature hashes to one of ``n_buckets`` weight slots
    (collisions SHARE a slot — the memory bound that lets a 100 TB
    corpus score against a fixed-size model), and the slot weight is
    an md5-derived integer in [-1000, 1000] — the deterministic
    stand-in for a trained fastText weight vector (loading externally
    trained weights through a broadcast is already proven by the
    trend_classifier_weights seam; swapping these derived weights for
    a broadcast lookup is mechanical). The fold accumulates INTEGER
    weights (bit-exact under any partitioning / re-run); callers
    divide once at the end to get the mean-pooled logit."""

    def w(f: Column) -> Column:
        bucket = word_hash(F.concat(F.lit("qcb:"), f)) % n_buckets
        return (
            word_hash(F.concat(F.lit("qcw:"), bucket.cast("string"))) % 2001
        ) - 1000

    return F.aggregate(
        feats, F.lit(0).cast("bigint"), lambda acc, f: acc + w(f)
    )


def quality_filter(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_feats, wsum, keep) — THE shared kernel for the batch
    quality classifier (suite/llm.py:q_quality_classifier) and its
    streaming twin (streaming/pipeline.py:quality_filter_stream):
    both engines score a document by the same hashed-linear integer
    fold, and keep iff wsum >= 0 (exact; sigmoid is monotone, so this
    equals prob >= 0.5). Stateless projection — streams with no state
    store or watermark.

    NULL text coalesces to '' BEFORE tokenizing (→ the single empty
    token, a deterministic wsum, and a non-NULL keep): without the
    guard Spark propagates NULL through split/size into
    (n_feats=-1, wsum=NULL, keep=NULL) while the oracle's coalesce
    lands elsewhere — and a NULL keep would silently vanish from
    BOTH sides of a boolean routing sink."""
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    feats = hashed_features(toks)
    return df.select(
        id_col,
        F.size(feats).cast("bigint").alias("n_feats"),
        hashed_weight_sum(feats).alias("wsum"),
    ).withColumn("keep", F.col("wsum") >= 0)


def passages(df: DataFrame, id_col: str, text_col: str, width: int = 8) -> DataFrame:
    """Sub-document passage rows: (id, pidx, ptext) — the text split
    into fixed-width word windows (non-overlapping), the granularity
    FineWeb-style pipelines dedup at below whole-document level.

    Built map-side with array expressions only (split → sequence →
    slice → posexplode): no shuffle, no Python — passage construction
    is free at any corpus size; downstream dedup pays only for the
    (hash → first-seen) aggregate shuffle."""
    w = F.split(F.col(text_col), " ")
    n_pass = F.ceil(F.size(w) / F.lit(width)).cast("int")
    parr = F.transform(
        F.sequence(F.lit(0), n_pass - 1),
        lambda i: F.array_join(F.slice(w, i * width + 1, width), " "),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.when(F.size(w) > 0, parr).otherwise(F.array().cast("array<string>"))
        ).alias("pidx", "ptext"),
    )


def passage_hashes(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", width: int = 8
) -> DataFrame:
    """(doc_id, pidx, phash, pkey) passage-hash rows — THE shared
    kernel for batch passage dedup (suite/llm.py:q_passage_dedup) and
    its streaming twin (streaming/pipeline.py:passage_dedup_stream):
    both mark a passage duplicate iff an equal-hash passage exists
    with a smaller pkey. The bigint cast keeps the pkey arithmetic
    immune to the id column drifting to a narrower physical type
    (ANSI would error on int32 overflow)."""
    return passages(df, id_col, text_col, width=width).select(
        id_col,
        "pidx",
        F.md5("ptext").alias("phash"),
        (F.col(id_col).cast("bigint") * 1_000_000 + F.col("pidx")).alias("pkey"),
    )


def chars(word: Column) -> Column:
    """Word → per-character symbol array via positional substr slices
    (identical construction to DuckDB `list_transform(generate_series
    (1, length(w)), i -> substr(w, i, 1))`, so fold oracles see the
    same initial segmentation)."""
    n = F.length(word)
    return F.transform(F.sequence(F.lit(1), n), lambda i: word.substr(i, F.lit(1)))


def apply_merge(syms: Column, left: str, right: str) -> Column:
    """One BPE merge (left, right) → left-to-right greedy replacement
    over a symbol array, as an `F.aggregate` expression fold (pure JVM,
    no UDF): walk the symbols, and whenever the accumulator's last
    symbol is `left` and the incoming one is `right`, replace the pair
    with the merged symbol — exactly the greedy left-to-right pass of a
    BPE tokenizer (overlaps resolve leftmost: 'aaa' under (a,a) →
    ['aa','a']). Single-symbol arrays skip the fold untouched."""
    merged = F.lit(left + right)
    first = F.slice(syms, 1, 1)
    rest = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
    fold = F.aggregate(
        rest,
        first,
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return F.when(F.size(syms) < 2, syms).otherwise(fold)


def bpe_learn(
    words: DataFrame, n_merges: int, word_col: str = "word", freq_col: str = "freq"
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Distributed BPE merge learning over a (word, freq) vocabulary —
    the tokenizer-training pass of an LLM data pipeline, structured the
    way it scales: the corpus collapses to DISTINCT words first (the
    classic Sennrich et al. 2016 setup), so every round touches the
    vocabulary relation, never raw text.

    Per round: adjacent symbol pairs explode map-side (bounded by word
    length), pair counts are a freq-weighted partial aggregate, and the
    argmax is a 1-row `TakeOrderedAndProject` — the only driver-side
    data movement is ONE (left, right, count) row per round (same
    collect discipline as the k-means centroid loop). The chosen merge
    is applied as an expression fold (`apply_merge`) and lineage is
    truncated per round with a lazy localCheckpoint (see SCALE.md on
    the cluster-deployment swap to reliable checkpoints).

    Returns (merge_table, final_segmentation): the learned merges as
    [(round, left, right, pair_count)] and the vocabulary DataFrame
    with a `syms` column holding each word's segmentation after all
    merges. Stops early when no adjacent pair remains.
    """
    cur = words.select(
        F.col(word_col).alias("word"),
        F.col(freq_col).cast("bigint").alias("freq"),
        chars(F.col(word_col)).alias("syms"),
    )
    # materialize the vocabulary ONCE before iterating: without this the
    # corpus scan + word aggregate re-executes under round 1's argmax
    # AND again when round 1's lazy checkpoint materializes (measured
    # 5.6 s → ~2 s at sf0.1). The vocab is the loop's working set —
    # collapse to it eagerly, then every round touches only that
    # relation (see SCALE.md on the localCheckpoint→reliable-checkpoint
    # swap for cluster deployment).
    cur = cur.localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        pair = F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("l"),
                    F.element_at(F.col("syms"), i + 1).alias("r"),
                ),
            )
        ).alias("pr")
        best = (
            cur.where(F.size("syms") >= 2)
            .select("freq", pair)
            .select("freq", "pr.l", "pr.r")
            .groupBy("l", "r")
            .agg(F.sum("freq").cast("bigint").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rnd, l, r, c))
        cur = cur.withColumn("syms", apply_merge(F.col("syms"), l, r))
        cur = cur.localCheckpoint(eager=False)
    return merges, cur
