"""SAX — Symbolic Aggregate approXimation (Lin/Keogh 2003) of the hourly
event-count series, with motif counting over the symbol string. SAX is the
workhorse discretization for time-series data mining: PAA (piecewise
aggregate approximation) shrinks the series 4 hours -> 1 value, z-scaled
breakpoints from the standard normal (+-0.6745 = the quartiles) map each
value to a 4-letter alphabet, and repeated 3-symbol words are the series'
motifs (recurring shapes: daily ramps, quiet nights, bursts).

Cross-engine determinism: the hour grid is zero-filled over the exact
[min, max] hour range, so counts, segment sums, and the global moments
are exact integers; mu/sigma and each breakpoint comparison are the
IDENTICAL float expression in both engines (no division by sigma — the
symbol test compares seg_sum/4.0 against mu + b*sigma, so a flat series
never divides by zero).

Scale stance: one hour-bucket aggregate over the corpus, then everything
lives on the hour grid (time-range-bounded, not corpus-bounded); the
symbol/lead windows run over the segment table — thousands of rows per
YEAR of data at 4-hour segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_HOUR_US = 3_600_000_000

_SAX_ORACLE = f"""
WITH hc AS (SELECT epoch_us(ts) // {_HOUR_US} AS h,
                   cast(count(*) AS bigint) AS c
            FROM events GROUP BY 1),
b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hc),
grid AS (SELECT g.h, coalesce(hc.c, 0) AS c
         FROM (SELECT unnest(generate_series((SELECT h0 FROM b),
                                             (SELECT h1 FROM b))) AS h) g
         LEFT JOIN hc ON hc.h = g.h),
m AS (SELECT cast(count(*) AS bigint) AS n, cast(sum(c) AS bigint) AS s,
             cast(sum(c * c) AS bigint) AS ss FROM grid),
seg AS (SELECT (h - (SELECT h0 FROM b)) // 4 AS sg,
               cast(sum(c) AS bigint) AS ssum, count(*) AS sn
        FROM grid GROUP BY 1),
sym AS (SELECT sg,
               CASE WHEN ssum / 4.0 < mu - 0.6745 * sig THEN 'a'
                    WHEN ssum / 4.0 < mu THEN 'b'
                    WHEN ssum / 4.0 < mu + 0.6745 * sig THEN 'c'
                    ELSE 'd' END AS sym
        FROM seg,
             (SELECT s * 1.0 / n AS mu,
                     sqrt(cast(n * ss - s * s AS double)) / n AS sig FROM m)
        WHERE sn = 4),
w AS (SELECT sym || lead(sym, 1) OVER (ORDER BY sg)
                 || lead(sym, 2) OVER (ORDER BY sg) AS word
      FROM sym)
SELECT word, cast(count(*) AS bigint) AS n
FROM w WHERE word IS NOT NULL
GROUP BY 1 ORDER BY n DESC, word"""


@register(
    "sax_hourly_motifs",
    oracle=_SAX_ORACLE,
    tags=("timeseries", "symbolic", "motif"),
)
def sax_hourly_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-symbol SAX motif counts over the zero-filled hourly event series
    (4-hour PAA segments, 4-letter alphabet at the normal quartile
    breakpoints — module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    hc = (ev.select(F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("h"))
          .groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("c")))
    b = hc.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (b.select(F.explode(F.sequence("h0", "h1")).alias("h"), "h0")
            .join(hc, "h", "left_outer")
            .select("h", "h0", F.coalesce("c", F.lit(0)).alias("c")))
    m = grid.agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("c").cast("long").alias("s"),
                 F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"))
    seg = (grid.groupBy(F.expr("(h - h0) div 4").alias("sg"))
           .agg(F.sum("c").cast("long").alias("ssum"),
                F.count(F.lit(1)).alias("sn"))
           .filter(F.col("sn") == 4))
    stats = m.select((F.col("s") * 1.0 / F.col("n")).alias("mu"),
                     (F.sqrt((F.col("n") * F.col("ss")
                              - F.col("s") * F.col("s")).cast("double"))
                      / F.col("n")).alias("sig"))
    paa = F.col("ssum") / 4.0
    sym = (seg.crossJoin(F.broadcast(stats))
           .select("sg", F.when(paa < F.col("mu") - 0.6745 * F.col("sig"), "a")
                   .when(paa < F.col("mu"), "b")
                   .when(paa < F.col("mu") + 0.6745 * F.col("sig"), "c")
                   .otherwise("d").alias("sym")))
    wlead = W.orderBy("sg")
    w = sym.select(F.concat(F.col("sym"),
                            F.lead("sym", 1).over(wlead),
                            F.lead("sym", 2).over(wlead)).alias("word"))
    return (w.filter(F.col("word").isNotNull())
            .groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy(F.col("n").desc(), "word"))
