"""File-skipping effectiveness audit — the measured payoff of data layout.

At 100 TB the cheapest scan is the one that never happens: engines prune
parquet files whose (min, max) column statistics cannot satisfy the
predicate (Iceberg manifests, Delta data skipping). That only works if
the LAYOUT clusters the filter columns. This query simulates 16-file
layouts of the events table under (a) NATURAL insertion order (event_id
ranges) and (b) the Morton z-order key over (user_id, value) — the
zorder_write layout from sampling_packing.py — computes per-file min/max
stats for BOTH query dimensions, and counts how many files a standard
slice predicate on each dimension would have to scan. The expected
verdict, now measured instead of claimed: natural order prunes neither
dimension (every file spans the whole user/value domain), z-order prunes
both (each file covers a tight rectangle).

Determinism/scale notes:
- File assignment is a pure map expression: floor((key - lo) * 16 /
  span) over driver-collected domain bounds (6 scalars + 2 zkey bounds —
  the zorder_write pattern; bounded scalar collects, never data).
- The predicate grid is derived from the same bounds (4 slices of 1/8th
  domain width per dimension), so the whole audit is a deterministic
  function of the data.
- Everything else is two aggregates (per-file stats over ~16 rows per
  layout, then overlap counts against a broadcast literal grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table
from .sampling_packing import _MORTON_DUCK, _MORTON_SPARK

_N_FILES = 16
_N_PREDS = 4     # slices at offsets 0, 2, 4, 6 eighths of the domain


def _scaled(expr: str, lo: float, hi: float) -> str:
    span = max(float(hi) - float(lo), 1.0)
    return (f"cast(floor((cast({expr} as double) - {float(lo)}) "
            f"* 255.0 / {span}) as bigint) & 255")


@register(
    "file_skipping_audit",
    oracle=f"""
WITH b AS (SELECT min(event_id) le, max(event_id) he,
                  min(user_id) lu, max(user_id) hu,
                  min(value) lv, max(value) hv
           FROM events),
keyed AS (
  SELECT e.event_id, e.user_id, e.value,
         cast(floor((e.event_id - b.le) * {_N_FILES}.0
                    / (b.he - b.le + 1)) AS bigint) AS nfile,
         cast({_MORTON_DUCK.format(
             x="(cast(floor((cast(e.user_id as double) - b.lu) * 255.0 "
               "/ greatest(cast(b.hu - b.lu as double), 1.0)) as bigint) "
               "& 255)",
             y="(cast(floor((cast(e.value as double) - b.lv) * 255.0 "
               "/ greatest(b.hv - b.lv, 1.0)) as bigint) & 255)")}
              AS bigint) AS zkey
  FROM events e, b),
zb AS (SELECT min(zkey) lz, max(zkey) hz FROM keyed),
files AS (
  SELECT 'natural' AS layout, nfile AS file_id,
         min(user_id) mnu, max(user_id) mxu,
         min(value) mnv, max(value) mxv
  FROM keyed GROUP BY nfile
  UNION ALL
  SELECT 'zorder' AS layout,
         cast(floor((k.zkey - zb.lz) * {_N_FILES}.0
                    / (zb.hz - zb.lz + 1)) AS bigint) AS file_id,
         min(user_id), max(user_id), min(value), max(value)
  FROM keyed k, zb GROUP BY 2),
preds AS (
  SELECT 'user_id' AS dim, i,
         b.lu + i * (b.hu - b.lu + 1) / 8.0 AS lo,
         b.lu + (i + 1) * (b.hu - b.lu + 1) / 8.0 AS hi
  FROM b, (VALUES (0), (2), (4), (6)) v(i)
  UNION ALL
  SELECT 'value' AS dim, i,
         b.lv + i * (b.hv - b.lv) / 8.0 AS lo,
         b.lv + (i + 1) * (b.hv - b.lv) / 8.0 AS hi
  FROM b, (VALUES (0), (2), (4), (6)) v(i)),
scans AS (
  SELECT f.layout, p.dim, p.i,
         sum(CASE WHEN (p.dim = 'user_id'
                        AND f.mxu >= p.lo AND f.mnu < p.hi)
                   OR (p.dim = 'value'
                       AND f.mxv >= p.lo AND f.mnv < p.hi)
             THEN 1 ELSE 0 END) AS files_scanned
  FROM files f, preds p GROUP BY 1, 2, 3)
SELECT layout, dim,
       cast({_N_FILES} AS bigint) AS n_files,
       round(avg(files_scanned), 6) AS avg_files_scanned
FROM scans GROUP BY layout, dim ORDER BY layout, dim""",
    tags=("layout", "zorder", "scale-pattern"),
)
def file_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average files scanned (of {_N_FILES}) by 1/8th-domain slice
    predicates on user_id and value, under natural vs z-order file
    layouts (module docstring). avg(files_scanned) is a rational of
    small integers, round(,6)-stable cross-engine."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value")
    le, he, lu, hu, lv, hv = e.agg(
        F.min("event_id"), F.max("event_id"), F.min("user_id"),
        F.max("user_id"), F.min("value"), F.max("value")).collect()[0]
    zkey = F.expr(_MORTON_SPARK.format(
        x=f"({_scaled('user_id', lu, hu)})",
        y=f"({_scaled('value', lv, hv)})"))
    keyed = e.select(
        "user_id", "value",
        F.expr(f"cast(floor((event_id - {le}) * {_N_FILES}.0 "
               f"/ ({he} - {le} + 1)) as bigint)").alias("nfile"),
        zkey.alias("zkey")).localCheckpoint(eager=False)  # reused twice
    lz, hz = keyed.agg(F.min("zkey"), F.max("zkey")).collect()[0]
    nat = (keyed.groupBy(F.col("nfile").alias("file_id"))
           .agg(F.min("user_id").alias("mnu"), F.max("user_id").alias("mxu"),
                F.min("value").alias("mnv"), F.max("value").alias("mxv"))
           .select(F.lit("natural").alias("layout"), "file_id",
                   "mnu", "mxu", "mnv", "mxv"))
    zf = (keyed.groupBy(
        F.expr(f"cast(floor((zkey - {lz}) * {_N_FILES}.0 "
               f"/ ({hz} - {lz} + 1)) as bigint)").alias("file_id"))
        .agg(F.min("user_id").alias("mnu"), F.max("user_id").alias("mxu"),
             F.min("value").alias("mnv"), F.max("value").alias("mxv"))
        .select(F.lit("zorder").alias("layout"), "file_id",
                "mnu", "mxu", "mnv", "mxv"))
    files = nat.unionAll(zf)
    preds = []
    for i in (0, 2, 4, 6):
        preds.append(("user_id", i, lu + i * (hu - lu + 1) / 8.0,
                      lu + (i + 1) * (hu - lu + 1) / 8.0))
        preds.append(("value", i, lv + i * (hv - lv) / 8.0,
                      lv + (i + 1) * (hv - lv) / 8.0))
    pdf = spark.createDataFrame(
        preds, "dim string, i int, lo double, hi double")
    hit = ((F.col("dim") == "user_id")
           & (F.col("mxu") >= F.col("lo")) & (F.col("mnu") < F.col("hi"))
           ) | ((F.col("dim") == "value")
                & (F.col("mxv") >= F.col("lo"))
                & (F.col("mnv") < F.col("hi")))
    scans = (files.crossJoin(F.broadcast(pdf))
             .groupBy("layout", "dim", "i")
             .agg(F.sum(F.when(hit, 1).otherwise(0)).alias("files_scanned")))
    return (scans.groupBy("layout", "dim")
            .agg(F.lit(_N_FILES).cast("bigint").alias("n_files"),
                 F.round(F.avg("files_scanned"), 6)
                 .alias("avg_files_scanned"))
            .select("layout", "dim", "n_files", "avg_files_scanned")
            .orderBy("layout", "dim"))
