"""Record linkage, Bloom-gated dedup, Count-Min sketching, containment
near-dup, and closed-form regression — the "structured-data curation"
suite block. These are the pipeline stages a 100 TB training-data
build needs BETWEEN the text-dedup family (suite/llm.py) and the
relational family (suite/relational.py): entity resolution over
structured records, constant-memory membership/frequency sketches,
max-containment duplicate detection for quote/subset pairs,
and one-pass model fitting via mergeable moments.

Scale design notes (the point of this block):

- ``dedup_bloom``: the Bloom bitset is built DISTRIBUTEDLY as a
  byte-indexed table (``pos >> 3`` → ``bit_or`` of lane masks) —
  at most M/8 rows regardless of corpus size — then broadcast, so
  membership probing is a map-side broadcast-hash-join + two bit ops
  per position. History text is hashed once; the probe side never
  touches historical text. No false negatives by construction (the
  property test pins it); false positives are priced by the exact
  verification column. At 100 TB: M grows with the historical key
  count (n·k/ln2 bits), but the byte table stays millions of rows —
  broadcastable — while the exact-join alternative would shuffle the
  full historical hash set per ingest batch.
- ``cms_heavy_hitters``: the Count-Min sketch is a D×W grid built by
  one hash-aggregate over (depth, cell) — a partial-agg-friendly,
  cell-wise-summable (mergeable across days/shards) shape. Estimates
  upper-bound true counts (min over D cells ≥ exact; pinned by a
  property test and the overcount audit column).
- ``record_linkage``: blocking on (name noun, p_type) turns the
  quadratic all-pairs comparison into per-block equi-join pairs; the
  edit-distance match runs ONLY inside blocks. At 10⁹ records the
  production recipe adds a secondary length-bucket key and routes
  oversized blocks through the LSH family (operators/text.py) — this
  query is the exact-verification stage that only ever sees candidate
  pairs.
- ``containment_dedup``: candidate pairs come from RARE shingles only
  (2 ≤ doc-frequency ≤ RARE_DF), which bounds candidate generation to
  O(RARE_DF · Σdf) instead of Σdf² — the hot-shingle analog of the
  hot-block rule used by the embedding near-dup path. The exact
  intersection is then computed only for candidates.
- ``ols_regression``: the normal-equation moments are EXACT decimal
  sums (one scan, map-side partial agg, 1-row exchange); the 2×2
  solve is a constant-size scalar expression. This is "ML at 100 TB"
  in its cheapest honest form: a single pass producing a mergeable
  sufficient statistic, no iteration, no driver data movement.

Cross-engine determinism: hash positions derive from md5 hex slices
(the suite-wide convention, suite/llm.py WORD_HASH_SQL); decimal sums
are exact in both engines before the single cast to double; the
closed-form arithmetic is the SAME expression text on both sides, so
IEEE doubles match bit-for-bit before the round(6).

Reference parity: the reference has no structured-record linkage or
sketch layer (its dedup surface is covered by suite/llm.py); this
block is part of the driver-mandated LLM-pipeline surface (build
brief: dedup / text analysis families) — SURVEY.md §2 notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zcode_iceberg_spark.sources.tables import load_table
from zcode_iceberg_spark.suite import Query
from zcode_iceberg_spark.suite.llm import INCR_SPLIT_FRAC, _reuse

# ------------------------------------------------------------------ bloom

BLOOM_M = 1 << 18  # bits in the filter (byte table ≤ 32768 rows)
# four independent 32-bit hash lanes = disjoint md5 hex slices
_BLOOM_SLICES = [(1, 8), (9, 8), (17, 8), (25, 8)]


def _bloom_pos_spark(col):
    """k Bloom positions for a string column (Spark side)."""
    h = F.md5(col)
    return [
        (F.conv(F.substring(h, start, width), 16, 10).cast("bigint") % BLOOM_M)
        for start, width in _BLOOM_SLICES
    ]


def _bloom_pos_sql(x: str) -> list[str]:
    """Same k positions, DuckDB spelling."""
    return [
        f"(CAST(concat('0x', substr(md5({x}), {start}, {width})) AS BIGINT)"
        f" % {BLOOM_M})"
        for start, width in _BLOOM_SLICES
    ]


def bloom_byte_table(hashed: DataFrame) -> DataFrame:
    """Bloom bitset over ``content_hash`` rows, as a distributed
    byte-indexed table: pos>>3 → bit_or of 1<<(pos&7) lane masks —
    at most M/8 rows whatever the input size. The shared kernel
    between the batch query, the persisted-state builder, and the
    streaming ingest twin (one derivation, three consumers)."""
    pos_cols = _bloom_pos_spark(F.col("content_hash"))
    # no distinct() before the groupBy: bit_or of repeated lane masks
    # is idempotent, so deduping positions first would only add a full
    # extra exchange for nothing (ADVICE r9) — the ONE shuffle here is
    # the byte_idx hash agg, with map-side partial bit_or combine.
    return (
        hashed.select(F.explode(F.array(*pos_cols)).alias("pos"))
        .select(
            F.expr("shiftright(pos, 3)").alias("byte_idx"),
            F.expr("shiftleft(1, CAST(pos & 7 AS INT))").alias("lane"),
        )
        .groupBy("byte_idx")
        .agg(F.bit_or("lane").alias("byte_mask"))
    )


def bloom_probe(new: DataFrame, bits: DataFrame) -> DataFrame:
    """Membership-test (doc_id, content_hash) rows against a Bloom
    byte table: broadcast join on byte_idx + two bit ops per position;
    a doc is a candidate iff ALL its (distinct) positions are set."""
    pos_cols = _bloom_pos_spark(F.col("content_hash"))
    new_pos = new.select(
        "doc_id",
        "content_hash",
        F.explode(F.array_distinct(F.array(*pos_cols))).alias("pos"),
    )
    probed = new_pos.join(
        F.broadcast(bits),
        F.expr("shiftright(pos, 3)") == F.col("byte_idx"),
        "left",
    ).select(
        "doc_id",
        "content_hash",
        F.coalesce(
            F.expr("(shiftright(byte_mask, CAST(pos & 7 AS INT)) & 1)"),
            F.lit(0),
        ).alias("hit"),
    )
    return probed.groupBy("doc_id", "content_hash").agg(
        (F.min("hit") == 1).alias("bloom_candidate")
    )


def _bloom_split(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, int]:
    """(historical hashes, batch hashes, cut) under the suite-wide
    incremental split rule."""
    d = load_table(spark, sf_dir, "documents")
    cut = d.agg(
        F.floor(F.lit(INCR_SPLIT_FRAC) * (F.max("doc_id") + 1)).cast("bigint")
    ).collect()[0][0]
    hashed = d.select("doc_id", F.md5("text").alias("content_hash"))
    return (
        hashed.filter(F.col("doc_id") < cut),
        hashed.filter(F.col("doc_id") >= cut),
        int(cut),
    )


def _bloom_exact_verify(cand: DataFrame, hist: DataFrame) -> DataFrame:
    return cand.join(
        hist.select("content_hash").distinct().withColumn("in_hist", F.lit(1)),
        "content_hash",
        "left",
    ).select(
        "doc_id",
        "bloom_candidate",
        F.col("in_hist").isNotNull().alias("is_exact_dup"),
    )


def q_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-gated incremental dedup: the newest {1-split} of doc ids
    play the incoming batch, membership-tested against a Bloom filter
    of the HISTORICAL corpus's content hashes, then exact-verified.

    Output per new doc: ``bloom_candidate`` (all k bit positions set)
    and ``is_exact_dup`` (true duplicate). bloom_candidate is a strict
    superset of is_exact_dup (no false negatives); the gap between the
    two columns is the filter's measured false-positive mass.

    Scale shape: the bitset is a ≤ M/8-row byte table (pos>>3 →
    bit_or of 1<<(pos&7)) built by one hash aggregate and BROADCAST;
    the probe is a map-side broadcast join + bit test. The exact
    verification join runs only over the (tiny) historical hash set —
    in production it runs only over bloom-positive rows, so the
    historical shuffle is proportional to the candidate mass, not the
    batch."""
    hist, new, _ = _bloom_split(spark, sf_dir)
    cand = bloom_probe(new, bloom_byte_table(hist))
    return _bloom_exact_verify(cand, hist)


def sweep_dead_bloom_scratch() -> None:
    from zcode_iceberg_spark.suite.llm import sweep_dead_scratch

    sweep_dead_scratch("zspark_bloom_state_")


def _bloom_state_dir(sf_dir: str) -> str:
    """PID-keyed scratch for the persisted Bloom byte table (same
    concurrent-process isolation contract as llm._hash_state_dir)."""
    import hashlib as _hl
    import os
    import tempfile

    sweep_dead_bloom_scratch()
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:10]
    return f"{tempfile.gettempdir()}/zspark_bloom_state_{tag}_p{os.getpid()}"


def bloom_table_fingerprint(bits: DataFrame) -> tuple:
    """Order-free fingerprint of a Bloom byte table (row count, mask
    sum, key-weighted mask sum) — enough to detect ANY single-byte
    difference between two states."""
    r = bits.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("byte_mask").alias("s"),
        F.sum(F.col("byte_idx") * F.col("byte_mask")).alias("w"),
    ).collect()[0]
    return (r["n"], r["s"], r["w"])


def build_bloom_state(
    spark: SparkSession, sf_dir: str, state_dir: str
) -> tuple[str, int]:
    """Materialize the historical Bloom byte table through the
    maintenance layer, in the two-day ingest shape of
    llm.build_incremental_hash_table:

    1. day-0 ingest: the older historical half's byte table is the
       initial state;
    2. day-1 ingest: the newer half OR-merges in
       (sinks.merge_bitwise_or);
    3. replay day-1: because bitwise-OR is a join-semilattice, the
       re-merge must leave the table byte-identical — verified by
       fingerprint here, with a RuntimeError (not assert: survives
       python -O) on violation. This is idempotence by ALGEBRA, in
       contrast to the epoch-keyed overwrite discipline the row
       ledgers need.

    Returns (bits_dir, cut). Rebuilt from scratch per call so the
    suite query stays deterministic whatever a prior run left."""
    import shutil as _shutil
    from pathlib import Path as _Path

    from zcode_iceberg_spark.sources.sinks import merge_bitwise_or

    if _Path(state_dir).exists():
        _shutil.rmtree(state_dir)
    hist, _, cut = _bloom_split(spark, sf_dir)
    day0 = hist.filter(F.col("doc_id") < cut // 2)
    day1 = hist.filter(F.col("doc_id") >= cut // 2)
    bits_dir = f"{state_dir}/bits"
    bloom_byte_table(day0).write.parquet(bits_dir)
    merge_bitwise_or(spark, bits_dir, bloom_byte_table(day1))
    before = bloom_table_fingerprint(spark.read.parquet(bits_dir))
    merge_bitwise_or(spark, bits_dir, bloom_byte_table(day1))  # replay
    after = bloom_table_fingerprint(spark.read.parquet(bits_dir))
    if before != after:
        raise RuntimeError(
            f"bloom OR-merge not idempotent: {before} != {after}"
        )
    return bits_dir, cut


def q_dedup_bloom_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_bloom`` with the bitset read from the PERSISTED byte
    table (built and OR-merged through the maintenance layer by
    :func:`build_bloom_state`, replay-idempotence verified in-build).
    Same output contract and oracle as ``dedup_bloom``; what changes
    is where the bits come from — the batch never touches historical
    text OR historical hashes for the probe (the exact-verify column
    remains the audit)."""
    hist, new, _ = _bloom_split(spark, sf_dir)
    bits_dir, _ = build_bloom_state(spark, sf_dir, _bloom_state_dir(sf_dir))
    cand = bloom_probe(new, spark.read.parquet(bits_dir))
    return _bloom_exact_verify(cand, hist)


_BP = _bloom_pos_sql("content_hash")
SQL_DEDUP_BLOOM = f"""
WITH cut AS (
  SELECT CAST(floor({INCR_SPLIT_FRAC} * (max(doc_id) + 1)) AS BIGINT) AS c
  FROM documents
),
hashed AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
hist AS (SELECT h.* FROM hashed h, cut WHERE h.doc_id < cut.c),
new AS (SELECT h.* FROM hashed h, cut WHERE h.doc_id >= cut.c),
hist_pos AS (
  SELECT unnest([{", ".join(_BP)}]) AS pos FROM hist
),
bits AS (
  SELECT pos >> 3 AS byte_idx, bit_or(1 << (pos & 7)) AS byte_mask
  FROM hist_pos GROUP BY 1
),
new_pos AS (
  SELECT doc_id, content_hash,
         unnest(list_distinct([{", ".join(_BP)}])) AS pos
  FROM new
),
probed AS (
  SELECT n.doc_id, n.content_hash,
         coalesce((b.byte_mask >> CAST(n.pos & 7 AS INT)) & 1, 0) AS hit
  FROM new_pos n LEFT JOIN bits b ON (n.pos >> 3) = b.byte_idx
),
cand AS (
  SELECT doc_id, content_hash, min(hit) = 1 AS bloom_candidate
  FROM probed GROUP BY 1, 2
)
SELECT c.doc_id, c.bloom_candidate,
       EXISTS (SELECT 1 FROM hist h WHERE h.content_hash = c.content_hash)
         AS is_exact_dup
FROM cand c
"""

# ------------------------------------------------------------------ CMS

CMS_W = 256  # cells per depth row
CMS_SEEDS = ["cms0", "cms1", "cms2"]  # depth = 3 independent lanes
CMS_TOPN = 20


def _cms_pos_spark(col, seed: str):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + "-"), col)), 1, 15), 16, 10
        ).cast("bigint")
        % CMS_W
    )


def _cms_pos_sql(x: str, seed: str) -> str:
    return (
        f"(CAST(concat('0x', substr(md5(concat('{seed}-', {x})), 1, 15)) "
        f"AS BIGINT) % {CMS_W})"
    )


_CMS_LANES = ", ".join(f"{i}, pos{i}" for i in range(len(CMS_SEEDS)))


def _cms_tokens(docs: DataFrame) -> DataFrame:
    """(tok) token stream — the shared input of sketch and audit. The
    explode fans out of the (often single-split) input scan first —
    the corpus_pipeline stage-barrier rule's fourth sighting."""
    sc = docs.sparkSession.sparkContext
    return (
        docs.select("doc_id", "text")
        .repartition(sc.defaultParallelism, "doc_id")
        .select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
        )
        .filter(F.col("tok") != "")
    )


def cms_cells(toks: DataFrame) -> DataFrame:
    """D×W Count-Min cell table over a token stream: one hash
    aggregate, ≤ D·W rows whatever the input size. The shared kernel
    between the batch query, the persisted builder, and the streaming
    ingest twin. Cells MERGE by cell-wise sum (counts add) — the
    re-aggregation contract the persisted/streaming paths lean on."""
    with_pos = toks.select(
        *[
            _cms_pos_spark(F.col("tok"), s).alias(f"pos{i}")
            for i, s in enumerate(CMS_SEEDS)
        ],
    )
    return (
        with_pos.select(
            F.expr(f"stack({len(CMS_SEEDS)}, {_CMS_LANES}) AS (d, pos)")
        )
        .groupBy("d", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _cms_estimate(exact_topk: DataFrame, cells: DataFrame) -> DataFrame:
    """min-over-depths estimate for each audited token, with the
    overcount column (estimates never undercount)."""
    probe = exact_topk.select(
        "tok",
        "exact_cnt",
        *[
            _cms_pos_spark(F.col("tok"), s).alias(f"pos{i}")
            for i, s in enumerate(CMS_SEEDS)
        ],
    ).select(
        "tok",
        "exact_cnt",
        F.expr(f"stack({len(CMS_SEEDS)}, {_CMS_LANES}) AS (d, pos)"),
    )
    return (
        probe.join(F.broadcast(cells), ["d", "pos"], "left")
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "tok",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
        )
    )


def _cms_exact_topk(toks: DataFrame) -> DataFrame:
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("tok"))
        .limit(CMS_TOPN)
    )


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch vs exact truth for the corpus's top tokens.

    Builds a D×W CMS over the token stream with ONE hash aggregate
    (depth, cell) → count — the mergeable shape: tomorrow's sketch
    adds cell-wise, shards union cell-wise, nothing is rescanned.
    Then estimates the exact top-CMS_TOPN tokens' frequencies from
    the sketch and reports the per-token overcount (CMS estimates
    never undercount; property-tested).

    Scale shape: the sketch is D×W rows TOTAL — constant in corpus
    size; the token stream is scanned once (reused via a persist
    barrier for the exact side, which at 100 TB would be replaced by
    the sketch consumer entirely — the exact side here IS the
    audit)."""
    d = load_table(spark, sf_dir, "documents")
    toks = _reuse(_cms_tokens(d))
    return _cms_estimate(_cms_exact_topk(toks), cms_cells(toks))


def _cms_state_dir(sf_dir: str) -> str:
    import hashlib as _hl
    import os
    import tempfile

    from zcode_iceberg_spark.suite.llm import sweep_dead_scratch

    sweep_dead_scratch("zspark_cms_state_")
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:10]
    return f"{tempfile.gettempdir()}/zspark_cms_state_{tag}_p{os.getpid()}"


def read_cms(spark: SparkSession, cells_dir: str) -> DataFrame:
    """Fold the per-epoch cell tables into ONE sketch: cell-wise sum
    over everything under ``cells_dir`` — the re-aggregation that
    makes daily/shard sketches composable without rescans."""
    return (
        spark.read.parquet(cells_dir)
        .groupBy("d", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )


def q_cms_heavy_hitters_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cms_heavy_hitters`` with the sketch read from PERSISTED
    per-epoch cell tables (two "days" of ingest written through
    streaming/pipeline.py:cms_ingest_step, then folded cell-wise by
    :func:`read_cms`). Same output and oracle as the inline query —
    counts add, so any split of the corpus into epochs yields the
    identical merged sketch. Unlike the Bloom byte table (idempotent
    by OR-algebra), COUNT state needs the epoch-keyed overwrite
    discipline: each epoch writes its own subdirectory with overwrite,
    so an at-least-once replay rewrites rather than double-counts
    (replay-idempotence pinned in tests/test_streaming.py)."""
    from zcode_iceberg_spark.streaming.pipeline import cms_ingest_step

    import shutil as _shutil
    from pathlib import Path as _Path

    state = _cms_state_dir(sf_dir)
    if _Path(state).exists():
        _shutil.rmtree(state)
    d = load_table(spark, sf_dir, "documents")
    mid = d.agg(F.floor(F.max("doc_id") / 2).cast("bigint")).collect()[0][0]
    cms_ingest_step(d.filter(F.col("doc_id") <= mid), 0, state)
    cms_ingest_step(d.filter(F.col("doc_id") > mid), 1, state)
    toks = _cms_tokens(d)
    return _cms_estimate(_cms_exact_topk(toks), read_cms(spark, state))


_CMS_POS = [_cms_pos_sql("tok", s) for s in CMS_SEEDS]
_CMS_LANES_SQL = " UNION ALL ".join(
    f"SELECT {i} AS d, {p} AS pos, tok FROM toks"
    for i, p in enumerate(_CMS_POS)
)
SQL_CMS_HEAVY_HITTERS = f"""
WITH toks AS (
  SELECT t.tok FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
    FROM documents
  ) t WHERE t.tok <> ''
),
lanes AS ({_CMS_LANES_SQL}),
cells AS (SELECT d, pos, count(*) AS cnt FROM lanes GROUP BY 1, 2),
exact AS (
  SELECT tok, count(*) AS exact_cnt FROM toks GROUP BY 1
  ORDER BY exact_cnt DESC, tok ASC LIMIT {CMS_TOPN}
),
probe AS (
  {" UNION ALL ".join(
    f"SELECT tok, exact_cnt, {i} AS d, {p} AS pos FROM exact"
    for i, p in enumerate(_CMS_POS)
  )}
)
SELECT p.tok, p.exact_cnt, min(c.cnt) AS cms_est,
       min(c.cnt) - p.exact_cnt AS overcount
FROM probe p LEFT JOIN cells c ON p.d = c.d AND p.pos = c.pos
GROUP BY p.tok, p.exact_cnt
"""

# ------------------------------------------------------------ record linkage

LINK_MAX_LEV = 2


def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution over the part catalog, in the
    two-stage shape that survives scale: (1) EXACT-collapse records to
    distinct (noun, p_type, p_name) entities — min-key representative
    + member count — then (2) fuzzy-pair only the DISTINCT spellings
    inside each (noun, p_type) block, linking edit-distance
    1..LINK_MAX_LEV variants ('new gear' / 'red gear') while lev=0
    pairs never exist (they were collapsed in stage 1).

    Scale shape: the pair count scales with distinct SPELLINGS, not
    records — pairing before collapsing is quadratic in per-name
    duplicate mass (measured 918 k pairs vs a few hundred at sf0.1).
    The self-join is an equi-join on the blocking key, never a
    cartesian; at 10⁹ records the production recipe adds a
    length-bucket secondary key and spills oversized blocks to the
    MinHash/LSH candidate path (operators/text.py). Levenshtein is
    evaluated JVM-side (built-in expression) on the bounded distinct
    pair set."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_type",
        F.regexp_extract(F.col("p_name"), r"(\S+)$", 1).alias("noun"),
    )
    ents = p.groupBy("noun", "p_type", "p_name").agg(
        F.min("p_partkey").alias("rep_id"),
        F.count(F.lit(1)).alias("n_members"),
    )
    a, b = ents.alias("a"), ents.alias("b")
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_type") == F.col("b.p_type"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_type").alias("p_type"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("a.rep_id").alias("rep_a"),
            F.col("b.rep_id").alias("rep_b"),
            F.col("a.n_members").alias("n_a"),
            F.col("b.n_members").alias("n_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias(
                "lev_dist"
            ),
        )
        .filter(F.col("lev_dist") <= LINK_MAX_LEV)
    )


SQL_RECORD_LINKAGE = rf"""
WITH p AS (
  SELECT p_partkey, p_name, p_type,
         regexp_extract(p_name, '(\S+)$', 1) AS noun
  FROM part
),
ents AS (
  SELECT noun, p_type, p_name,
         min(p_partkey) AS rep_id, count(*) AS n_members
  FROM p GROUP BY 1, 2, 3
)
SELECT a.p_type AS p_type,
       a.p_name AS name_a, b.p_name AS name_b,
       a.rep_id AS rep_a, b.rep_id AS rep_b,
       a.n_members AS n_a, b.n_members AS n_b,
       levenshtein(a.p_name, b.p_name) AS lev_dist
FROM ents a JOIN ents b
  ON a.noun = b.noun AND a.p_type = b.p_type
 AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {LINK_MAX_LEV}
"""

# ------------------------------------------------------------ containment

SHINGLE_W = 3  # words per shingle
RARE_DF = 8  # shingles rarer than this generate candidates
CONT_MIN = 0.5


def q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-containment near-dup over word {SHINGLE_W}-shingles:
    C_max(A,B) = |S(A)∩S(B)| / min(|S(A)|, |S(B)|) — i.e. the LARGER
    of the two directional containments C(A→B), C(B→A), computed
    symmetrically per unordered pair. This is the quote/subset
    detector that resemblance Jaccard (ngram_jaccard) misses when a
    small doc is embedded in a much larger one: if either doc is
    (mostly) contained in the other, C_max is high regardless of the
    size ratio. (Per-direction containment is C_max exactly when A is
    the smaller doc; a consumer needing both directions divides
    inter_cnt by each side's shingle count instead of the min.)

    Scale shape: candidate pairs are generated ONLY from rare shingles
    (2 ≤ df ≤ {RARE_DF}) — the hot-shingle analog of the embedding
    path's hot-block rule — bounding candidate generation at
    O(RARE_DF·Σdf) instead of the Σdf² all-pairs blowup a naive
    shared-shingle join hits on boilerplate shingles. The exact
    intersection count then runs only over the candidate pair set."""
    d = load_table(spark, sf_dir, "documents")
    # fan the CPU-heavy shingling out of the single input split BEFORE
    # the transform (the corpus_pipeline stage-barrier rule — measured
    # 14 s single-task vs ~1 s fanned at sf0.1); per-doc shingle sets
    # deduplicate MAP-SIDE (array_distinct, no global distinct
    # shuffle) and stay as ARRAYS so the candidate intersection is a
    # map-side array_intersect per pair, never a pair×shingle explode
    base = _reuse(
        d.select("doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("w"))
        .filter(F.size("w") >= SHINGLE_W)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(w) - {SHINGLE_W - 1}), "
                    "i -> concat_ws(' ', element_at(w, i), "
                    "element_at(w, i + 1), element_at(w, i + 2)))"
                )
            ).alias("shs"),
        )
    )
    sh = base.select(
        "doc_id",
        F.size("shs").alias("n_sh"),
        F.explode("shs").alias("shingle"),
    )
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    rare = dfreq.filter(
        (F.col("df") >= 2) & (F.col("df") <= RARE_DF)
    ).select("shingle")
    rsh = sh.join(rare, "shingle")
    cand = (
        rsh.alias("x")
        .join(
            rsh.alias("y"),
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    inter = (
        cand.join(
            base.select(
                F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a")
            ),
            "doc_a",
        )
        .join(
            base.select(
                F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("shs_a", "shs_b")).alias("inter_cnt"),
            F.least(F.size("shs_a"), F.size("shs_b")).alias("n_min"),
        )
    )
    return (
        inter.select(
            "doc_a",
            "doc_b",
            "inter_cnt",
            F.round(F.col("inter_cnt") / F.col("n_min"), 6).alias(
                "containment"
            ),
        )
        .filter(F.col("containment") >= CONT_MIN)
    )


SQL_CONTAINMENT_DEDUP = f"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           generate_series(1, len(w) - {SHINGLE_W - 1}),
           i -> concat_ws(' ', w[i], w[i + 1], w[i + 2]))) AS shingle
  FROM words WHERE len(w) >= {SHINGLE_W}
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
rare AS (SELECT shingle FROM dfreq WHERE df BETWEEN 2 AND {RARE_DF}),
rsh AS (SELECT s.* FROM sh s JOIN rare r ON s.shingle = r.shingle),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM rsh x JOIN rsh y
    ON x.shingle = y.shingle AND x.doc_id < y.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter_cnt
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter_cnt,
       round(i.inter_cnt / least(za.n_sh, zb.n_sh), 6) AS containment
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE round(i.inter_cnt / least(za.n_sh, zb.n_sh), 6) >= {CONT_MIN}
"""

# ------------------------------------------------------------------ OLS

# exact decimal moment sums: both engines aggregate the SAME exact
# decimal lattice, then cast ONCE to double — the closed-form solve
# below is the identical expression text on both sides, so the IEEE
# arithmetic matches bit-for-bit before the round(6).
_OLS_MOMENTS = {
    "n": "CAST(count(*) AS DOUBLE)",
    "sx1": "CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)",
    "sx2": "CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)",
    "sy": "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)",
    "sx1x1": (
        "CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * "
        "CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
    ),
    "sx2x2": (
        "CAST(sum(CAST(l_discount AS DECIMAL(4,2)) * "
        "CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)"
    ),
    "sx1x2": (
        "CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * "
        "CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)"
    ),
    "sx1y": (
        "CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * "
        "CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
    ),
    "sx2y": (
        "CAST(sum(CAST(l_discount AS DECIMAL(4,2)) * "
        "CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
    ),
    "syy": (
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * "
        "CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
    ),
}

def q_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS (y = extendedprice on quantity, discount) via
    the normal equations over ONE aggregation pass: exact decimal
    moment sums → centered 2×2 Gram → Cramer solve → R².

    Scale shape: a single scan with map-side partial aggregation into
    a 10-number sufficient statistic (mergeable across shards/days —
    the same contract as the sketch family), then constant scalar
    arithmetic. No iteration, no driver data, no shuffle beyond the
    1-row final agg. This is the pattern a 100 TB feature-correlation
    or calibration fit should use before reaching for an iterative
    solver."""
    li = load_table(spark, sf_dir, "lineitem")
    moments = li.agg(
        *[F.expr(e).alias(k) for k, e in _OLS_MOMENTS.items()]
    )
    # lateral-style chained projections keep each symbol single-eval
    solve = moments.selectExpr(
        "*",
        "sx1x1 - sx1 * sx1 / n AS s11",
        "sx2x2 - sx2 * sx2 / n AS s22",
        "sx1x2 - sx1 * sx2 / n AS s12",
        "sx1y - sx1 * sy / n AS s1y",
        "sx2y - sx2 * sy / n AS s2y",
        "syy - sy * sy / n AS syc",
    ).selectExpr("*", "s11 * s22 - s12 * s12 AS det")
    coef = solve.selectExpr(
        "*",
        "(s22 * s1y - s12 * s2y) / det AS b1",
        "(s11 * s2y - s12 * s1y) / det AS b2",
    )
    return coef.selectExpr(
        "CAST(n AS BIGINT) AS n_rows",
        "round((sy - b1 * sx1 - b2 * sx2) / n, 6) AS b0",
        "round(b1, 6) AS b1",
        "round(b2, 6) AS b2",
        "round(1 - (syc - b1 * s1y - b2 * s2y) / syc, 6) AS r2",
    )


def q_ols_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ols_regression`` partitioned by customer market segment — the
    demonstration that the sufficient-statistic pattern scales
    HORIZONTALLY: the same 10 exact-decimal moments accumulate under a
    groupBy instead of a global agg (map-side partials per segment,
    one shuffle of 10-number rows), and the per-group Cramer solve is
    the same constant scalar expression. At 100 TB a per-domain /
    per-source calibration fit is this exact plan: fact-fact join to
    attach the group key, then moments, never a per-group data pass.

    The one join (lineitem→orders→customer for the segment key) keeps
    customer broadcast; lineitem⋈orders is the standard fact-fact
    sort-merge on the clustered key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    keyed = li.join(
        o, li.l_orderkey == o.o_orderkey
    ).join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
    moments = keyed.groupBy("c_mktsegment").agg(
        *[F.expr(e).alias(k) for k, e in _OLS_MOMENTS.items()]
    )
    solve = moments.selectExpr(
        "*",
        "sx1x1 - sx1 * sx1 / n AS s11",
        "sx2x2 - sx2 * sx2 / n AS s22",
        "sx1x2 - sx1 * sx2 / n AS s12",
        "sx1y - sx1 * sy / n AS s1y",
        "sx2y - sx2 * sy / n AS s2y",
        "syy - sy * sy / n AS syc",
    ).selectExpr("*", "s11 * s22 - s12 * s12 AS det")
    coef = solve.selectExpr(
        "*",
        "(s22 * s1y - s12 * s2y) / det AS b1",
        "(s11 * s2y - s12 * s1y) / det AS b2",
    )
    return coef.selectExpr(
        "c_mktsegment",
        "CAST(n AS BIGINT) AS n_rows",
        "round((sy - b1 * sx1 - b2 * sx2) / n, 6) AS b0",
        "round(b1, 6) AS b1",
        "round(b2, 6) AS b2",
        "round(1 - (syc - b1 * s1y - b2 * s2y) / syc, 6) AS r2",
    )


_M = ",\n       ".join(f"{e} AS {k}" for k, e in _OLS_MOMENTS.items())
SQL_OLS_BY_SEGMENT = f"""
WITH keyed AS (
  SELECT c.c_mktsegment, l.l_quantity, l.l_discount, l.l_extendedprice
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
),
moments AS (
  SELECT c_mktsegment, {_M}
  FROM keyed GROUP BY c_mktsegment
),
centered AS (
  SELECT *,
         sx1x1 - sx1 * sx1 / n AS s11,
         sx2x2 - sx2 * sx2 / n AS s22,
         sx1x2 - sx1 * sx2 / n AS s12,
         sx1y - sx1 * sy / n AS s1y,
         sx2y - sx2 * sy / n AS s2y,
         syy - sy * sy / n AS syc
  FROM moments
),
dets AS (SELECT *, s11 * s22 - s12 * s12 AS det FROM centered),
coef AS (
  SELECT *,
         (s22 * s1y - s12 * s2y) / det AS b1,
         (s11 * s2y - s12 * s1y) / det AS b2
  FROM dets
)
SELECT c_mktsegment,
       CAST(n AS BIGINT) AS n_rows,
       round((sy - b1 * sx1 - b2 * sx2) / n, 6) AS b0,
       round(b1, 6) AS b1,
       round(b2, 6) AS b2,
       round(1 - (syc - b1 * s1y - b2 * s2y) / syc, 6) AS r2
FROM coef
"""

SQL_OLS_REGRESSION = f"""
WITH moments AS (
  SELECT {_M}
  FROM lineitem
),
centered AS (
  SELECT *,
         sx1x1 - sx1 * sx1 / n AS s11,
         sx2x2 - sx2 * sx2 / n AS s22,
         sx1x2 - sx1 * sx2 / n AS s12,
         sx1y - sx1 * sy / n AS s1y,
         sx2y - sx2 * sy / n AS s2y,
         syy - sy * sy / n AS syc
  FROM moments
),
dets AS (SELECT *, s11 * s22 - s12 * s12 AS det FROM centered),
coef AS (
  SELECT *,
         (s22 * s1y - s12 * s2y) / det AS b1,
         (s11 * s2y - s12 * s1y) / det AS b2
  FROM dets
)
SELECT CAST(n AS BIGINT) AS n_rows,
       round((sy - b1 * sx1 - b2 * sx2) / n, 6) AS b0,
       round(b1, 6) AS b1,
       round(b2, 6) AS b2,
       round(1 - (syc - b1 * s1y - b2 * s2y) / syc, 6) AS r2
FROM coef
"""


# -------------------------------------------------------- bloom decontam


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-gated benchmark decontamination: the TRAIN split's
    distinct word n-grams build a Bloom byte table (the same kernel as
    ``dedup_bloom``), and every TEST document's grams are
    membership-tested against the BROADCAST bitset — the screen that
    can NEVER miss contamination (Bloom has no false negatives; it
    only over-reports, the safe direction for leakage checks). The
    exact semi-join count rides along as the audit, so the per-doc
    ``bloom_overcount`` column prices the false-positive mass.

    Scale shape vs the exact ``decontaminate``: the exact form
    shuffles BOTH gram sides by gram hash; here the train side
    collapses to a ≤ M/8-row byte table broadcast to the test scan —
    the test grams never shuffle at all. At a 100 TB train corpus the
    bitset M grows with the distinct-gram count but stays a byte
    table; the per-batch eval screen becomes a map-side pass."""
    from zcode_iceberg_spark.operators import text as tx
    from zcode_iceberg_spark.suite.llm import (
        DECON_FLAG,
        DECON_N,
        SPLIT_TRAIN,
        SPLIT_VAL,
        _hash_u,
    )

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        _hash_u(F.col("doc_id"), "").alias("u"),
        tx.tokens(F.col("text")).alias("w"),
    ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
    grams = _reuse(
        base.select(
            "doc_id",
            "u",
            F.explode(
                F.array_distinct(
                    F.transform(
                        tx.shingles(F.col("w"), DECON_N),
                        lambda s: tx.word_hash(s),
                    )
                )
            ).alias("g"),
        )
    )
    train_h = (
        grams.where(F.col("u") < SPLIT_TRAIN)
        .select(F.col("g").cast("string").alias("content_hash"))
        .distinct()
    )
    test_g = grams.where(F.col("u") >= SPLIT_VAL).select("doc_id", "g")
    bits = bloom_byte_table(train_h)
    # bloom_probe keys on (doc_id, content_hash) — per (doc, gram) here
    probed = bloom_probe(
        test_g.select("doc_id", F.col("g").cast("string").alias("content_hash")),
        bits,
    )
    per_doc = probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.col("bloom_candidate").cast("int"))
        .cast("bigint")
        .alias("n_hit_bloom"),
    )
    exact = (
        test_g.join(
            grams.where(F.col("u") < SPLIT_TRAIN).select("g").distinct(),
            "g",
            "left_semi",
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_exact"))
    )
    frac = F.col("n_hit_bloom") / F.col("n_grams")
    return per_doc.join(exact, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        "n_hit_bloom",
        F.coalesce("n_hit_exact", F.lit(0)).alias("n_hit_exact"),
        (F.col("n_hit_bloom") - F.coalesce("n_hit_exact", F.lit(0))).alias(
            "bloom_overcount"
        ),
        F.round(frac, 6).alias("est_contamination"),
        (frac >= DECON_FLAG).alias("flagged"),
    )


def _sql_decontaminate_bloom() -> str:
    from zcode_iceberg_spark.suite.llm import (
        DECON_FLAG,
        DECON_N,
        SPLIT_TRAIN,
        SPLIT_VAL,
        TOKS_CTE,
        _GRAM_HASH_SQL,
        _U_SQL,
    )

    bp = _bloom_pos_sql("content_hash")
    return f"""
WITH {TOKS_CTE},
tu AS (
  SELECT doc_id, w, {_U_SQL} AS u FROM toks
),
grams AS (
  SELECT doc_id, u,
         unnest(list_distinct(list_transform(
           CASE WHEN len(w) >= {DECON_N}
                THEN generate_series(1, len(w) - {DECON_N - 1})
                ELSE [] END,
           i -> {_GRAM_HASH_SQL}))) AS g
  FROM tu
),
tr AS (SELECT DISTINCT g FROM grams WHERE u < {SPLIT_TRAIN}),
te AS (SELECT doc_id, g FROM grams WHERE u >= {SPLIT_VAL}),
trh AS (SELECT CAST(g AS VARCHAR) AS content_hash FROM tr),
hist_pos AS (
  SELECT unnest([{", ".join(bp)}]) AS pos FROM trh
),
bits AS (
  SELECT pos >> 3 AS byte_idx, bit_or(1 << (pos & 7)) AS byte_mask
  FROM hist_pos GROUP BY 1
),
tep AS (
  SELECT doc_id, g,
         unnest(list_distinct([{", ".join(bp)}])) AS pos
  FROM (SELECT doc_id, g, CAST(g AS VARCHAR) AS content_hash FROM te) x
),
probed AS (
  SELECT p.doc_id, p.g,
         coalesce((b.byte_mask >> CAST(p.pos & 7 AS INT)) & 1, 0) AS hit
  FROM tep p LEFT JOIN bits b ON (p.pos >> 3) = b.byte_idx
),
cand AS (
  SELECT doc_id, g, min(hit) = 1 AS bloom_hit FROM probed GROUP BY 1, 2
),
perdoc AS (
  SELECT doc_id, count(*) AS n_grams,
         CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hit_bloom
  FROM cand GROUP BY 1
),
exact AS (
  SELECT doc_id, count(*) AS n_hit_exact FROM te
  WHERE g IN (SELECT g FROM tr)
  GROUP BY 1
)
SELECT p.doc_id, p.n_grams, p.n_hit_bloom,
       coalesce(e.n_hit_exact, 0) AS n_hit_exact,
       p.n_hit_bloom - coalesce(e.n_hit_exact, 0) AS bloom_overcount,
       round(p.n_hit_bloom / p.n_grams, 6) AS est_contamination,
       (p.n_hit_bloom / p.n_grams) >= {DECON_FLAG} AS flagged
FROM perdoc p LEFT JOIN exact e USING (doc_id)
"""


# ---------------------------------------------------- cluster-safe split

SPLIT_SALT = "clsplit-v1"


def q_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test splitting: the split is assigned at
    NEAR-DUP-CLUSTER granularity (md5 membership on the canonical id,
    same fractions as doc_split) so near-duplicates can never straddle
    train and test — the failure mode a doc-level split silently ships
    (a test doc whose near-copy sits in train). The ``naive_leak``
    column audits exactly that: whether a doc-level assignment would
    have scattered this doc's cluster across splits.

    Scale shape: dedup_near's bounded star grouping + two map-side
    hash assignments + ONE window family over canonical_id for the
    leak audit. No new shuffles beyond the canonical grouping the
    dedup path already pays."""
    from zcode_iceberg_spark.suite.llm import (
        SPLIT_TRAIN,
        SPLIT_VAL,
        _hash_u,
        near_canonical_map,
    )

    near = near_canonical_map(spark, sf_dir)

    def split_of(u):
        return (
            F.when(u < SPLIT_TRAIN, "train")
            .when(u < SPLIT_VAL, "val")
            .otherwise("test")
        )

    assigned = near.select(
        "doc_id",
        "canonical_id",
        split_of(_hash_u(F.col("canonical_id"), SPLIT_SALT)).alias("split"),
        split_of(_hash_u(F.col("doc_id"), SPLIT_SALT)).alias("naive_split"),
    )
    from pyspark.sql import Window

    grp = Window.partitionBy("canonical_id")
    return assigned.select(
        "doc_id",
        "canonical_id",
        "split",
        (
            F.min("naive_split").over(grp) != F.max("naive_split").over(grp)
        ).alias("naive_leak"),
    )


def _sql_cluster_safe_split() -> str:
    from zcode_iceberg_spark.suite.llm import (
        SPLIT_TRAIN,
        SPLIT_VAL,
        SQL_DEDUP_NEAR,
        WORD_HASH_SQL,
    )

    def u_of(x: str) -> str:
        h = WORD_HASH_SQL.format(
            x=f"concat('{SPLIT_SALT}', CAST({x} AS VARCHAR))"
        )
        return f"(({h}) % 1000000) / 1000000.0"

    def split_of(u: str) -> str:
        return (
            f"CASE WHEN {u} < {SPLIT_TRAIN} THEN 'train' "
            f"WHEN {u} < {SPLIT_VAL} THEN 'val' ELSE 'test' END"
        )

    return f"""
WITH near AS ({SQL_DEDUP_NEAR}),
assigned AS (
  SELECT doc_id, canonical_id,
         {split_of(u_of("canonical_id"))} AS split,
         {split_of(u_of("doc_id"))} AS naive_split
  FROM near
)
SELECT doc_id, canonical_id, split,
       min(naive_split) OVER (PARTITION BY canonical_id)
         <> max(naive_split) OVER (PARTITION BY canonical_id)
         AS naive_leak
FROM assigned
"""


# ------------------------------------------------- quality keeper / mixing


def q_dedup_quality_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup dedup with a QUALITY keeper policy (the RefinedWeb/
    FineWeb rule): within each near-dup star cluster (dedup_near's
    canonical grouping — one-hop min over the LSH candidate graph),
    keep the highest-quality member, tie-broken by doc_id — instead of
    the min-id keeper exact dedup uses. Exact duplicates have
    identical text hence identical quality, which is why this policy
    only exists for NEAR duplicates, where the members genuinely
    differ.

    Scale shape: composition of three already-bounded stages — the LSH
    banding equi-join (never all-pairs), the map-side quality battery
    (pure expressions), and ONE window family over canonical_id
    (clusters are small by construction; the window sort is per-group).
    """
    from zcode_iceberg_spark.operators.text import quality_metrics
    from zcode_iceberg_spark.suite.llm import near_canonical_map

    d = load_table(spark, sf_dir, "documents")
    # the canonical map is shared session state (near_canonical_map):
    # the LSH candidate stage is priced by dedup_near's own entry, not
    # re-run inside every composition query (VERDICT r11 #4)
    near = near_canonical_map(spark, sf_dir)
    q = quality_metrics(d).select(
        "doc_id", F.round("quality", 6).alias("quality")
    )
    j = near.join(q, "doc_id")
    from pyspark.sql import Window

    grp = Window.partitionBy("canonical_id")
    rank = Window.partitionBy("canonical_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return j.select(
        "doc_id",
        "canonical_id",
        "quality",
        F.count(F.lit(1)).over(grp).alias("group_size"),
        (F.row_number().over(rank) == 1).alias("is_keeper"),
    )


def _sql_dedup_quality_keeper() -> str:
    from zcode_iceberg_spark.suite.llm import SQL_DEDUP_NEAR, SQL_TEXT_QUALITY

    return f"""
WITH near AS ({SQL_DEDUP_NEAR}),
q AS ({SQL_TEXT_QUALITY}),
j AS (
  SELECT n.doc_id, n.canonical_id, q.quality
  FROM near n JOIN q ON q.doc_id = n.doc_id
)
SELECT doc_id, canonical_id, quality,
       count(*) OVER (PARTITION BY canonical_id) AS group_size,
       row_number() OVER (
         PARTITION BY canonical_id ORDER BY quality DESC, doc_id ASC
       ) = 1 AS is_keeper
FROM j
"""


MIX_BUDGET_FRAC = 0.5  # token budget per source = frac × source mass
MIX_SALT = "mix-v1"


def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing: fill each source's token budget
    (MIX_BUDGET_FRAC of its total token mass) by walking docs in
    deterministic hash order and keeping those that START inside the
    budget — the "30% web / 50% code / 20% books, by TOKENS not docs"
    recipe a training-mix build runs, with md5-hash ordering standing
    in for the shuffle (same convention as corpus_shuffle: order is a
    pure function of ids, no RNG state, partition-count independent).

    Scale shape: one narrow projection, one per-source window cumsum
    (sources are few; each window partition is one source's docs), one
    broadcast join of the per-source totals. Selection is a map-side
    comparison; nothing quadratic, nothing driver-side."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.lower(F.col("text")), r"\s+"))
    skey = F.conv(
        F.substring(
            F.md5(F.concat_ws("-", F.lit(MIX_SALT), F.col("doc_id"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    base = d.select(
        "doc_id", "source", n_tok.alias("n_tokens"), skey.alias("skey")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("skey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = base.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    totals = base.groupBy("source").agg(
        F.floor(F.lit(MIX_BUDGET_FRAC) * F.sum("n_tokens"))
        .cast("bigint")
        .alias("budget")
    )
    return (
        cum.join(F.broadcast(totals), "source")
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("cum_before").cast("bigint").alias("cum_before"),
            (F.col("cum_before") < F.col("budget")).alias("selected"),
        )
    )


_MIX_KEY = (
    f"(CAST(concat('0x', substr(md5(concat('{MIX_SALT}', '-', "
    "CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT))"
)
SQL_TOKEN_BUDGET_MIX = rf"""
WITH base AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(lower(text), '\s+')) AS n_tokens,
         {_MIX_KEY} AS skey
  FROM documents
),
cum AS (
  SELECT *,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY skey, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM base
),
totals AS (
  SELECT source,
         CAST(floor({MIX_BUDGET_FRAC} * sum(n_tokens)) AS BIGINT) AS budget
  FROM base GROUP BY 1
)
SELECT c.doc_id, c.source,
       CAST(c.n_tokens AS BIGINT) AS n_tokens,
       CAST(c.cum_before AS BIGINT) AS cum_before,
       c.cum_before < t.budget AS selected
FROM cum c JOIN totals t ON c.source = t.source
"""


QUERIES = {
    "dedup_bloom": Query(q_dedup_bloom, SQL_DEDUP_BLOOM),
    "dedup_bloom_persisted": Query(q_dedup_bloom_persisted, SQL_DEDUP_BLOOM),
    "cms_heavy_hitters": Query(q_cms_heavy_hitters, SQL_CMS_HEAVY_HITTERS),
    "cms_heavy_hitters_persisted": Query(
        q_cms_heavy_hitters_persisted, SQL_CMS_HEAVY_HITTERS
    ),
    "record_linkage": Query(q_record_linkage, SQL_RECORD_LINKAGE),
    "containment_dedup": Query(q_containment_dedup, SQL_CONTAINMENT_DEDUP),
    "ols_regression": Query(q_ols_regression, SQL_OLS_REGRESSION),
    "ols_by_segment": Query(q_ols_by_segment, SQL_OLS_BY_SEGMENT),
    "dedup_quality_keeper": Query(
        q_dedup_quality_keeper, _sql_dedup_quality_keeper()
    ),
    "token_budget_mix": Query(q_token_budget_mix, SQL_TOKEN_BUDGET_MIX),
    "decontaminate_bloom": Query(
        q_decontaminate_bloom, _sql_decontaminate_bloom()
    ),
    "cluster_safe_split": Query(
        q_cluster_safe_split, _sql_cluster_safe_split()
    ),
}
