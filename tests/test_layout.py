"""Z-order layout: the written files' footer stats must show NARROW
per-file ranges on BOTH clustering keys (vs a single-column sort,
which leaves the other key full-range) — measured with pyarrow on the
actual parquet footers, not inferred from the plan."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from big_data_spark.sources.layout import morton_code, write_zordered


def _file_ranges(path_glob, col):
    """(min, max) per parquet file for col, from footer stats."""
    spans = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            spans.append((min(los), max(his)))
    return spans


def _avg_span(spans):
    return sum(hi - lo for lo, hi in spans) / len(spans)


def test_morton_code_interleaves_bits(spark):
    rows = spark.range(1).select(
        morton_code(F.lit(0b101), F.lit(0b011), bits=3).alias("z")
    ).collect()
    # a bits -> even positions (1,0,1 -> bits 0,2,4), b -> odd
    # a=101: bits 0 and 4 set -> 0b10001; b=011: bits 1,3 -> 0b01010
    assert rows[0]["z"] == 0b10001 | 0b01010


def test_zorder_narrows_both_key_ranges(spark, tmp_path):
    n = 1 << 14
    # two independent uniform keys over [0, 4096)
    df = spark.range(n).select(
        (F.hash(F.col("id")).bitwiseAND(F.lit(0xFFF))).alias("a"),
        (F.hash(F.col("id") + 7919).bitwiseAND(F.lit(0xFFF))).alias("b"),
    )
    zpath = str(tmp_path / "zord")
    apath = str(tmp_path / "asort")
    write_zordered(df, zpath, "a", "b", n_files=16, bits=12)
    # baseline: classic single-column sort layout
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(apath)
    )

    full = 0xFFF
    z_a = _avg_span(_file_ranges(zpath + "/*.parquet", "a"))
    z_b = _avg_span(_file_ranges(zpath + "/*.parquet", "b"))
    s_a = _avg_span(_file_ranges(apath + "/*.parquet", "a"))
    s_b = _avg_span(_file_ranges(apath + "/*.parquet", "b"))

    # single-column sort: tight on a, full-range on b
    assert s_a < 0.2 * full
    assert s_b > 0.9 * full
    # z-order: BOTH columns substantially narrowed vs full range —
    # with 16 files on a 2-D grid each dimension shrinks to ~1/4
    assert z_a < 0.45 * full, z_a
    assert z_b < 0.45 * full, z_b

    # layout preserves data exactly
    assert (
        spark.read.parquet(zpath).orderBy("a", "b").collect()
        == df.orderBy("a", "b").collect()
    )
