"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs a suite Query's Spark side and its DuckDB oracle on the same
parquet tables, then compares row count, column names, and an
order-insensitive view of the values — the same contract the driver's
CORRECTNESS_r{N}.json applies at sf0.01.
"""

from __future__ import annotations

import math
import struct

import duckdb
import pandas as pd


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Bound the oracle's memory and give it a spill path (VERDICT r9
    # #8): DuckDB's default limit is ~80% of physical RAM, which it
    # cannot actually get when the Spark JVM holds a large share —
    # observed once as an OOM kill of the heaviest unrolled-CTE oracle
    # (trend_dual_fusion) under full-suite pressure. A fixed cap +
    # temp_directory makes the heavy oracles spill instead of dying.
    # The cap is min(16GB, ~50% of physical RAM): a bare 16GB would
    # RAISE the limit above DuckDB's adaptive 80% default on hosts
    # under 20GB and make the OOM more likely, not less (ADVICE r10).
    import os
    import tempfile

    try:
        ram = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        cap_gb = max(1, min(16, int(ram * 0.5 / 2**30)))
    except (ValueError, OSError):
        cap_gb = 16
    con.execute(f"SET memory_limit = '{cap_gb}GB'")
    con.execute(
        f"SET temp_directory = '{tempfile.gettempdir()}/zspark_duck_spill'"
    )
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(v) if not isinstance(v, (list, tuple)) else str(list(v))
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _float_bits(s: pd.Series) -> pd.Series:
    """IEEE-754 bit view of a float column with NaN canonicalized.

    float64 via the raw int64 bit pattern — so -0.0 (0x8000...) and
    +0.0 (0x0000...) differ, as they do in the driver's hash. All NaNs
    collapse to the one canonical quiet-NaN so NaN matches NaN.
    """
    a = pd.to_numeric(s, errors="coerce").astype("float64").to_numpy(copy=True)
    a[pd.isna(a)] = float("nan")  # one canonical NaN payload
    return pd.Series(a.view("int64"))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "") -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rowcount {len(got)} != {len(want)}"
    # The driver's value hash is dtype-KIND-sensitive: a DuckDB HUGEINT
    # sum widened to float64 hash-mismatches a Spark int64 even when
    # every value is equal (the round-3 pii_scan failure), while plain
    # integer-width differences (Spark int32 rank vs DuckDB int64) have
    # always hashed green. Enforce kind equality locally so an
    # int-vs-float drift is caught before the driver sees it.
    gk = {c: got[c].dtype.kind.replace("u", "i") for c in got.columns}
    wk = {c: want[c].dtype.kind.replace("u", "i") for c in want.columns}
    assert gk == wk, f"{name}: dtype kinds differ: spark={gk} oracle={wk}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            # BIT-EXACT, like the driver's value hash: -0.0 vs +0.0 (or
            # any last-ulp drift) must FAIL here, not only at the driver
            # — a 1e-9 tolerance is how position_ledger stayed locally
            # "green" and driver-red for four straight rounds. NaNs are
            # canonicalized to one payload so NaN == NaN; everything
            # else compares as raw IEEE-754 bits.
            gb = _float_bits(g)
            wb = _float_bits(w)
            bad = (gb != wb).to_numpy().nonzero()[0]
            assert len(bad) == 0, (
                f"{name}: column {c} bit-mismatches at rows {bad[:5]}: "
                f"got {g.iloc[bad[:5]].tolist()} want {w.iloc[bad[:5]].tolist()}"
            )
        else:
            eq = (g == w) | (g.isna() & w.isna())
            bad = (~eq).to_numpy().nonzero()[0]
            assert len(bad) == 0, (
                f"{name}: column {c} mismatches at rows {bad[:5]}: "
                f"got {g.iloc[bad[:5]].tolist()} want {w.iloc[bad[:5]].tolist()}"
            )


def exact_hash_match(spark_df, con, sql: str) -> bool:
    """Stricter driver-style check: exact equality after canonical sort."""
    got = _canon(spark_df.toPandas())
    want = _canon(con.execute(sql).df())
    if list(got.columns) != list(want.columns) or len(got) != len(want):
        return False
    for c in got.columns:
        g, w = got[c], want[c]
        for a, b in zip(g, w):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                # bit-level: -0.0 vs +0.0 must mismatch (Python ==
                # says they're equal; the driver's hash does not)
                if struct.pack("<d", a) != struct.pack("<d", b):
                    return False
            elif a != b and not (pd.isna(a) and pd.isna(b)):
                return False
    return True
