"""Build the "sf1" bench replica (VERDICT r9 #6): 10× the sf0.1
corpus via key-axis replication of events/documents/embeddings — the
SCALE.md replica-smoke recipe, applied whole-corpus so the full bench
(not a per-query smoke) can run at 10× and catch constant-factor
blowups the shape analysis can't see.

Replication semantics (distinct keys so cardinalities scale, not
duplicate-flood):
- events: event_id and user_id shift by replica × (max+1) — 10× keys,
  10× rows, per-key history length unchanged (the corpus grows by
  keys at 100 TB, not by one symbol getting 10× longer);
- documents: doc_id shifts; text gets a per-replica suffix token so
  dedup families see distinct docs (the r7 distinct-text recipe);
- embeddings: vec_id shifts; the first component is perturbed per
  replica so ANN neighborhoods don't collapse onto 10 identical
  copies; the query set (vec_id % 100 = 0) scales 10× with the ids.
TPC-H tables copy through unchanged (no top-20 query reads them; the
relational family's FK web is exercised by the driver at sf0.01).

Writes to /tmp/zspark_sf1_replica (idempotent: rebuilt if missing or
incomplete). Run: python tools/make_sf1_replica.py
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb

SRC = Path("/root/testdata/sf0.1")
DST = Path("/tmp/zspark_sf1_replica")
REPLICAS = 10
TPCH = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem",
]


def main() -> None:
    if DST.exists() and len(list(DST.glob("*.parquet"))) == 10:
        print(f"replica already present at {DST}")
        return
    shutil.rmtree(DST, ignore_errors=True)
    DST.mkdir(parents=True)
    con = duckdb.connect()
    for t in TPCH:
        shutil.copy(SRC / f"{t}.parquet", DST / f"{t}.parquet")
    con.execute(
        f"""
        COPY (
          SELECT e.event_id + r.i * (SELECT max(event_id) + 1 FROM
                   '{SRC}/events.parquet') AS event_id,
                 e.ts,
                 e.user_id + r.i * (SELECT max(user_id) + 1 FROM
                   '{SRC}/events.parquet') AS user_id,
                 e.event_type, e.value, e.props
          FROM '{SRC}/events.parquet' e
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS i) r
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.i * (SELECT max(doc_id) + 1 FROM
                   '{SRC}/documents.parquet') AS doc_id,
                 CASE WHEN r.i = 0 THEN d.text
                      ELSE d.text || ' replica' || r.i END AS text,
                 d.lang, d.source, d.n_chars
          FROM '{SRC}/documents.parquet' d
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS i) r
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT v.vec_id + r.i * (SELECT max(vec_id) + 1 FROM
                   '{SRC}/embeddings.parquet') AS vec_id,
                 list_prepend(
                   CAST(v.embedding[1] + r.i * 0.003 AS FLOAT),
                   v.embedding[2:]) AS embedding,
                 v.label
          FROM '{SRC}/embeddings.parquet' v
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS i) r
        ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    for t in ("events", "documents", "embeddings"):
        n = con.sql(
            f"SELECT count(*) FROM '{DST}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"replica at {DST}")


CLIQUE_FREE_DST = Path("/tmp/zspark_sf1_cliquefree")


def make_clique_free() -> None:
    """The VERDICT r10 #9 variant: same 10× key-axis replication, but
    the document replicas are NOT near-duplicates of each other. The
    standard replica's suffix-token recipe leaves replicas ~identical,
    so MinHash/LSH links every original doc's 10 copies into a
    10-clique — the CC edge set grows ~45× per group, a FIXTURE
    artifact that inflates dedup_cc/dedup_canonical wall at 10× and
    masks the plan's true scaling. Recipe: a BIJECTIVE per-replica
    CHARACTER substitution cipher (alnum permutation seeded by the
    replica id). The minhash kernel shingles CHAR-4-GRAMS, and a char
    bijection maps each replica's 4-gram space onto a disjoint image:
    within a replica every organic near-dup pair keeps its exact
    Jaccard (edges scale 10× with the corpus — the honest organic
    rate), across replicas gram overlap collapses to the rare
    all-space/punct grams — no cliques. Two failed attempts recorded
    for the next reader: a shared per-replica TAG token spliced
    between words (every unrelated same-replica pair gained a common
    gram vocabulary: 87k → 10.9M candidates), and a per-word PREFIX
    (same flood through the prefix's own 4-grams: → 60M). Bijection
    ON THE SHINGLE ALPHABET is the property that matters: transform
    similarity, never add it."""
    import random
    import string
    if (
        CLIQUE_FREE_DST.exists()
        and len(list(CLIQUE_FREE_DST.glob("*.parquet"))) == 10
    ):
        print(f"clique-free replica already present at {CLIQUE_FREE_DST}")
        return
    main()  # ensure the standard replica exists (sources all tables)
    shutil.rmtree(CLIQUE_FREE_DST, ignore_errors=True)
    CLIQUE_FREE_DST.mkdir(parents=True)
    for t in TPCH + ["events", "embeddings"]:
        shutil.copy(DST / f"{t}.parquet", CLIQUE_FREE_DST / f"{t}.parquet")
    con = duckdb.connect()
    n_src = con.sql(
        f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    pdf = con.sql(f"SELECT * FROM '{DST}/documents.parquet'").df()
    rep = (pdf["doc_id"] // n_src).astype(int)

    # the minhash kernel LOWERCASES before shingling — the cipher must
    # therefore be a permutation of the FOLDED alphabet applied
    # case-preservingly, or the composition lower∘cipher is
    # non-injective and true Jaccard inflates (measured: a mixed-case
    # permutation produced 5× the organic pair rate per replica)
    folded = string.ascii_lowercase + string.digits
    ciphers = {}
    for r in range(1, REPLICAS):
        dst = list(folded)
        random.Random(1000 + r).shuffle(dst)
        pi = dict(zip(folded, dst))
        table = {c: pi[c] for c in folded}
        table.update(
            {c.upper(): pi[c].upper() for c in string.ascii_lowercase}
        )
        ciphers[r] = str.maketrans(table)

    pdf["text"] = [
        t if r == 0 else t.translate(ciphers[r])
        for t, r in zip(pdf["text"], rep)
    ]
    pdf["n_chars"] = pdf["text"].str.len()
    con.register("docs_cf", pdf)
    con.execute(
        f"COPY (SELECT * FROM docs_cf ORDER BY doc_id) TO "
        f"'{CLIQUE_FREE_DST}/documents.parquet' (FORMAT PARQUET)"
    )
    n = con.sql(
        f"SELECT count(*) FROM '{CLIQUE_FREE_DST}/documents.parquet'"
    ).fetchone()[0]
    print(f"clique-free documents: {n} rows at {CLIQUE_FREE_DST}")


if __name__ == "__main__":
    if "--clique-free" in sys.argv:
        sys.exit(make_clique_free())
    sys.exit(main())
