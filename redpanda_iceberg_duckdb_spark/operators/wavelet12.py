"""Haar wavelet energy decomposition of the hourly event-count series —
the multi-resolution twin of the SAX/PAA symbolic view (sax12.py) and the
classic synopsis structure for time-series similarity search and
compressed histograms (Matias/Vitter/Wang 1998). The per-level detail
energy localizes WHERE the series' variance lives: high levels = slow
daily/weekly structure, low levels = hour-to-hour burstiness.

Exactness: unnormalized Haar detail coefficients are signed INTEGER sums
(first half-block minus second half-block of counts), so coefficients,
energies, and the max|coef| are exact bigints; the only float is the
final dyadic normalization energy / 2^level, the identical division in
both engines.

Scale design — ONE shuffle for the whole transform: absent hours are
exact zeros and contribute nothing to any coefficient, so NO zero-fill
grid is needed; each observed hour explodes into its L = 10 (level, pos,
sign) contributions (a constant fan-out) and one groupBy(level, pos)
produces every coefficient of every level simultaneously. n log n work,
no per-level pass, no window, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_HOUR_US = 3_600_000_000
_LEVELS = 10   # block sizes 2..1024 hours — covers a month-scale series

_HAAR_ORACLE = f"""
WITH hc AS (SELECT epoch_us(ts) // {_HOUR_US} AS h,
                   cast(count(*) AS bigint) AS c
            FROM events GROUP BY 1),
b AS (SELECT min(h) AS h0 FROM hc),
idx AS (SELECT h - (SELECT h0 FROM b) AS i, c FROM hc),
contrib AS (
  SELECT l, i // (1 << l) AS pos,
         CASE WHEN i % (1 << l) < (1 << (l - 1)) THEN c ELSE -c END AS v
  FROM idx, (SELECT unnest(generate_series(1, {_LEVELS})) AS l)),
coef AS (SELECT l, pos, cast(sum(v) AS bigint) AS w
         FROM contrib GROUP BY l, pos)
SELECT l AS level,
       cast(1 << l AS bigint) AS block_hours,
       cast(count(*) AS bigint) AS n_nonzero_blocks,
       cast(sum(w * w) AS bigint) AS energy,
       cast(max(abs(w)) AS bigint) AS max_abs_coef,
       round(cast(sum(w * w) AS double) / (1 << l), 6) AS energy_norm
FROM coef WHERE w <> 0
GROUP BY l ORDER BY l"""


@register(
    "haar_energy_by_level",
    oracle=_HAAR_ORACLE,
    tags=("timeseries", "wavelet", "sketch", "scale-pattern"),
)
def haar_energy_by_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-level Haar detail energy of the hourly series: nonzero block
    count, exact integer energy and max|coefficient|, and the dyadic
    normalized energy — the whole L-level transform in one explode + one
    groupBy (module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    hc = (ev.select(F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("h"))
          .groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("c")))
    h0 = hc.agg(F.min("h").alias("h0"))
    idx = (hc.crossJoin(F.broadcast(h0))
           .select((F.col("h") - F.col("h0")).alias("i"), "c"))
    contrib = (idx.select(
        "i", "c",
        F.explode(F.sequence(F.lit(1), F.lit(_LEVELS))).alias("l"))
        .select(
            "l",
            F.expr("i div (shiftleft(1, l))").alias("pos"),
            F.expr("CASE WHEN i % shiftleft(1, l) < shiftleft(1, l - 1)"
                   " THEN c ELSE -c END").alias("v")))
    coef = (contrib.groupBy("l", "pos")
            .agg(F.sum("v").cast("long").alias("w"))
            .filter(F.col("w") != 0))
    return (coef.groupBy("l")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nonzero_blocks"),
                 F.sum(F.col("w") * F.col("w")).cast("long").alias("energy"),
                 F.max(F.abs("w")).cast("long").alias("max_abs_coef"))
            .select(F.col("l").alias("level"),
                    F.expr("cast(shiftleft(1, l) as bigint)")
                     .alias("block_hours"),
                    "n_nonzero_blocks", "energy", "max_abs_coef",
                    F.round(F.col("energy").cast("double")
                            / F.expr("shiftleft(1, l)"), 6)
                     .alias("energy_norm"))
            .orderBy("level"))
