"""Physical twin of the zorder_layout model query: write REAL parquet
files in z-order vs linear-time order, then prune row groups on their
footer min/max statistics — the exact mechanism a 100 TB scan uses.
The model query (suite/flow.py:q_zorder_layout) prices layouts with
bucket bounding boxes; this test checks the model's verdict against
parquet metadata produced by each physical sort."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from zcode_iceberg_spark.suite.flow import (
    ZP_HI,
    ZP_LO,
    _zgrid,
    _zvalue_sql,
    q_zorder_layout,
)

ROW_GROUP = 16  # small groups so sf0.001's ~1000 rows give ~60 zone maps


def _grid_pdf(spark, sf_dir):
    return (
        _zgrid(spark, sf_dir)
        .select("t16", "u16")
        .withColumn("z", F.expr(_zvalue_sql("t16", "u16", "DIV")))
        .toPandas()
    )


def _groups_scanned(path: str, t_rng, u_rng) -> tuple[int, int]:
    """(row groups intersecting the box, total row groups) from the
    parquet footer stats of (t16, u16) — zone-map pruning, verbatim."""
    md = pq.ParquetFile(path).metadata
    names = {md.schema.column(j).name: j for j in range(md.num_columns)}
    scanned = 0
    for i in range(md.num_row_groups):
        ts = md.row_group(i).column(names["t16"]).statistics
        us = md.row_group(i).column(names["u16"]).statistics
        if (
            ts.min <= t_rng[1]
            and ts.max >= t_rng[0]
            and us.min <= u_rng[1]
            and us.max >= u_rng[0]
        ):
            scanned += 1
    return scanned, md.num_row_groups


def _write_sorted(pdf, by: str, path: str) -> None:
    ordered = pdf.sort_values([by, "t16", "u16"]).reset_index(drop=True)
    pq.write_table(
        pa.Table.from_pandas(ordered[["t16", "u16"]], preserve_index=False),
        path,
        row_group_size=ROW_GROUP,
    )


def test_zorder_rowgroup_pruning_beats_linear_on_2d_box(
    spark, sf_dir, tmp_path
):
    pdf = _grid_pdf(spark, sf_dir)
    zpath = str(tmp_path / "z.parquet")
    lpath = str(tmp_path / "lin.parquet")
    _write_sorted(pdf, "z", zpath)
    _write_sorted(pdf, "t16", lpath)

    box = (ZP_LO, ZP_HI)
    z_scan, z_total = _groups_scanned(zpath, box, box)
    l_scan, l_total = _groups_scanned(lpath, box, box)
    assert z_total == l_total
    # The 2-D predicate is the z-order case: interleaving tightens the
    # user_id boxes enough to beat the time-sorted layout outright.
    assert z_scan < l_scan, (z_scan, l_scan)
    # Both layouts must scan at least every row group that holds a
    # matching row (zone maps never produce false negatives).
    n_match = int(
        (
            pdf["t16"].between(*box) & pdf["u16"].between(*box)
        ).sum()
    )
    assert z_scan * ROW_GROUP >= n_match
    assert l_scan * ROW_GROUP >= n_match


def test_linear_layout_wins_pure_time_predicate(spark, sf_dir, tmp_path):
    """The honest trade-off: on a time-ONLY predicate the time-sorted
    layout is optimal and z-order pays for the key bits it interleaved
    — the model is a decision between workloads, not a free win."""
    pdf = _grid_pdf(spark, sf_dir)
    zpath = str(tmp_path / "z.parquet")
    lpath = str(tmp_path / "lin.parquet")
    _write_sorted(pdf, "z", zpath)
    _write_sorted(pdf, "t16", lpath)

    t_box = (ZP_LO, ZP_HI)
    u_all = (0, 1 << 16)  # no key predicate
    z_scan, _ = _groups_scanned(zpath, t_box, u_all)
    l_scan, _ = _groups_scanned(lpath, t_box, u_all)
    assert l_scan <= z_scan, (l_scan, z_scan)


def test_model_query_orders_layouts(spark, sf_dir):
    """The audit query's modeled scan fractions must order the layouts
    the way the physical test does: zorder < linear_time < unclustered
    on the 2-D box, with identical rows_matched across layouts."""
    rows = {r["layout"]: r for r in q_zorder_layout(spark, sf_dir).collect()}
    assert set(rows) == {"zorder", "linear_time", "unclustered"}
    assert (
        rows["zorder"]["scan_fraction"]
        < rows["linear_time"]["scan_fraction"]
        < rows["unclustered"]["scan_fraction"]
    )
    matched = {r["rows_matched"] for r in rows.values()}
    assert len(matched) == 1


def test_cluster_rewrite_on_z_prunes_files(spark, sf_dir, tmp_path):
    """PRODUCT write path: sinks.cluster_rewrite on the z column
    (range-repartition + sortWithinPartitions + parquet) must deliver
    the model's prediction at FILE granularity — a 2-D box predicate
    touches fewer z-clustered files than time-clustered ones, judged
    purely by parquet footer stats (what any engine's planner reads).

    Granularity condition (measured, not assumed): z-order wins only
    when the per-file z tile is at most the predicate box — at 16
    files the 4×4 tiling is COARSER than the middle-eighth box in
    both dimensions and the time-sorted layout legitimately wins
    (5 vs 3 files); at 64 files the 8×8 tiles match the box and
    interleaving pays. The same file-count-vs-selectivity condition
    governs a production OPTIMIZE ZORDER target size."""
    import glob

    from zcode_iceberg_spark.sources.sinks import cluster_rewrite

    src = str(tmp_path / "grid_src")
    (
        _zgrid(spark, sf_dir)
        .withColumn("z", F.expr(_zvalue_sql("t16", "u16", "DIV")))
        .write.parquet(src)
    )
    n_files = 64

    def files_scanned(dst: str) -> tuple[int, int]:
        total = scanned = 0
        for path in glob.glob(f"{dst}/*.parquet"):
            md = pq.ParquetFile(path).metadata
            if md.num_rows == 0:
                continue
            names = {md.schema.column(j).name: j for j in range(md.num_columns)}
            t_lo = min(md.row_group(i).column(names["t16"]).statistics.min
                       for i in range(md.num_row_groups))
            t_hi = max(md.row_group(i).column(names["t16"]).statistics.max
                       for i in range(md.num_row_groups))
            u_lo = min(md.row_group(i).column(names["u16"]).statistics.min
                       for i in range(md.num_row_groups))
            u_hi = max(md.row_group(i).column(names["u16"]).statistics.max
                       for i in range(md.num_row_groups))
            total += 1
            if t_lo <= ZP_HI and t_hi >= ZP_LO and u_lo <= ZP_HI and u_hi >= ZP_LO:
                scanned += 1
        return scanned, total

    zdst = cluster_rewrite(spark, src, str(tmp_path / "bz"), ["z"], n_files)
    tdst = cluster_rewrite(spark, src, str(tmp_path / "bt"), ["t16"], n_files)
    z_scan, z_total = files_scanned(zdst)
    t_scan, t_total = files_scanned(tdst)
    assert z_total >= n_files // 2 and t_total >= n_files // 2
    assert z_scan < t_scan, (z_scan, t_scan)
