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


if __name__ == "__main__":
    sys.exit(main())
