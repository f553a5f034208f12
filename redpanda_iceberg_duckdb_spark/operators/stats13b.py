"""Three classical statistics the existing families imply but never
state, each exact-integer until the final division:

1. negative_binomial_fit_by_type — method-of-moments NB(r, p) on daily
   event counts per type: the overdispersion MODEL behind the Fano
   factor (fano_factor_burstiness measures var/mean; this fits the
   distribution a scheduler would simulate from). r = m^2/(v - m),
   p = m/v, computed from exact integer day-count moments; types with
   v <= m (under-dispersed — Poisson or better) report NULL r/p via a
   guard BOTH engines share.

2. weighted_jaccard_sources — token-frequency-weighted Jaccard between
   source pairs: sum(min(cf_a, cf_b)) / sum(max(cf_a, cf_b)) over the
   union vocabulary. The unweighted vocab overlap says WHETHER sources
   share words; the weighted form says how much of their MASS coincides
   (near 1 = same distribution, the mixture-dedup signal). Exact integer
   numerator/denominator.

3. runs_test_hourly — Wald-Wolfowitz randomness test on the hourly
   count series vs its median (strict above/below; ties-to-median rows
   dropped, stated identically in both engines): observed runs R, group
   sizes n1/n2, and the z-score against E[R] = 1 + 2 n1 n2 / n. The
   complement of Mann-Kendall: MK detects monotone trend, runs detect
   ANY serial structure.

Scale stance (100 TB): each reduces the corpus once to a bounded frame
(type x day grid; token-frequency vectors keyed by token — one shuffle;
the hourly grid), then runs grid algebra. The runs count uses a window
over the bounded hourly grid (lag by time order — ALLOW-listed with the
curve-table family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_NB_ORACLE = """
WITH dc AS (SELECT event_type AS et, date_trunc('day', ts) AS d,
                   cast(count(*) AS bigint) AS c
            FROM events GROUP BY 1, 2),
m AS (SELECT et, cast(count(*) AS bigint) AS nd,
             cast(sum(c) AS bigint) AS s1,
             cast(sum(c * c) AS bigint) AS s2
      FROM dc GROUP BY et)
SELECT et AS event_type, nd AS n_days,
       round(cast(s1 AS double) / nd, 6) AS mean_daily,
       round(cast(nd * s2 - s1 * s1 AS double) / (nd * nd), 6)
         AS var_daily,
       CASE WHEN nd * s2 - s1 * s1 > nd * s1 THEN
         round((cast(s1 AS double) / nd) * (cast(s1 AS double) / nd)
               / (cast(nd * s2 - s1 * s1 AS double) / (nd * nd)
                  - cast(s1 AS double) / nd), 6)
       END AS nb_r,
       CASE WHEN nd * s2 - s1 * s1 > nd * s1 THEN
         round((cast(s1 AS double) / nd)
               / (cast(nd * s2 - s1 * s1 AS double) / (nd * nd)), 6)
       END AS nb_p
FROM m ORDER BY event_type"""


@register(
    "negative_binomial_fit_by_type",
    oracle=_NB_ORACLE,
    tags=("statistics", "distribution-fit", "timeseries"),
)
def negative_binomial_fit_by_type(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Method-of-moments NB(r, p) on daily counts per event type (module
    docstring item 1); population variance, NULL fit when v <= m."""
    ev = load_table(spark, sf_dir, "events")
    dc = (ev.groupBy(F.col("event_type").alias("et"),
                     F.date_trunc("day", "ts").alias("d"))
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    m = dc.groupBy("et").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"))
    return (m.selectExpr(
        "et AS event_type", "nd AS n_days",
        "round(cast(s1 AS double) / nd, 6) AS mean_daily",
        "round(cast(nd * s2 - s1 * s1 AS double) / (nd * nd), 6)"
        " AS var_daily",
        "CASE WHEN nd * s2 - s1 * s1 > nd * s1 THEN"
        " round((cast(s1 AS double) / nd) * (cast(s1 AS double) / nd)"
        " / (cast(nd * s2 - s1 * s1 AS double) / (nd * nd)"
        "    - cast(s1 AS double) / nd), 6) END AS nb_r",
        "CASE WHEN nd * s2 - s1 * s1 > nd * s1 THEN"
        " round((cast(s1 AS double) / nd)"
        " / (cast(nd * s2 - s1 * s1 AS double) / (nd * nd)), 6)"
        " END AS nb_p")
        .orderBy("event_type"))


_WJ_ORACLE = """
WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents),
cf AS (SELECT source, tok, cast(count(*) AS bigint) AS cf
       FROM tk GROUP BY 1, 2),
pr AS (SELECT a.source AS sa, b.source AS sb FROM
       (SELECT DISTINCT source FROM cf) a
       JOIN (SELECT DISTINCT source FROM cf) b ON a.source < b.source),
j AS (SELECT pr.sa, pr.sb, cf.tok,
             sum(CASE WHEN cf.source = pr.sa THEN cf.cf ELSE 0 END) AS ca,
             sum(CASE WHEN cf.source = pr.sb THEN cf.cf ELSE 0 END) AS cb
      FROM pr JOIN cf ON cf.source = pr.sa OR cf.source = pr.sb
      GROUP BY 1, 2, 3)
SELECT sa AS src_a, sb AS src_b,
       cast(sum(least(ca, cb)) AS bigint) AS min_mass,
       cast(sum(greatest(ca, cb)) AS bigint) AS max_mass,
       round(cast(sum(least(ca, cb)) AS double)
             / sum(greatest(ca, cb)), 6) AS weighted_jaccard
FROM j GROUP BY sa, sb
ORDER BY weighted_jaccard DESC, src_a, src_b LIMIT 30"""


@register(
    "weighted_jaccard_sources",
    oracle=_WJ_ORACLE,
    tags=("text", "similarity", "mixture", "llm-pipeline"),
)
def weighted_jaccard_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-frequency-weighted Jaccard between source pairs (module
    docstring item 2), top 30 by similarity."""
    d = load_table(spark, sf_dir, "documents")
    cf = (d.select("source", F.explode(F.split("text", " ")).alias("tok"))
          .groupBy("source", "tok")
          .agg(F.count(F.lit(1)).cast("long").alias("cf")))
    srcs = cf.select("source").distinct()
    pr = (srcs.alias("a").join(srcs.alias("b"),
                               F.col("a.source") < F.col("b.source"))
          .select(F.col("a.source").alias("sa"),
                  F.col("b.source").alias("sb")))
    j = (F.broadcast(pr).join(
            cf, (F.col("source") == F.col("sa"))
            | (F.col("source") == F.col("sb")))
         .groupBy("sa", "sb", "tok")
         .agg(F.sum(F.when(F.col("source") == F.col("sa"), F.col("cf"))
                    .otherwise(0)).alias("ca"),
              F.sum(F.when(F.col("source") == F.col("sb"), F.col("cf"))
                    .otherwise(0)).alias("cb")))
    return (j.groupBy("sa", "sb")
            .agg(F.sum(F.least("ca", "cb")).cast("long").alias("min_mass"),
                 F.sum(F.greatest("ca", "cb")).cast("long")
                 .alias("max_mass"))
            .select(F.col("sa").alias("src_a"), F.col("sb").alias("src_b"),
                    "min_mass", "max_mass",
                    F.round(F.col("min_mass").cast("double")
                            / F.col("max_mass"), 6)
                    .alias("weighted_jaccard"))
            .orderBy(F.desc("weighted_jaccard"), "src_a", "src_b")
            .limit(30))


_RUNS_ORACLE = """
WITH hc AS (SELECT epoch_us(ts) // 3600000000 AS h,
                   cast(count(*) AS bigint) AS c
            FROM events GROUP BY 1),
med AS (SELECT c AS m FROM hc ORDER BY c, h
        LIMIT 1 OFFSET (SELECT (count(*) - 1) // 2 FROM hc)),
sgn AS (SELECT h, CASE WHEN c > (SELECT m FROM med) THEN 1 ELSE 0 END AS s
        FROM hc WHERE c <> (SELECT m FROM med)),
runs AS (SELECT s, lag(s) OVER (ORDER BY h) AS ps FROM sgn),
agg AS (SELECT cast(sum(CASE WHEN ps IS NULL OR s <> ps
                             THEN 1 ELSE 0 END) AS bigint) AS r,
               cast(sum(s) AS bigint) AS n1,
               cast(sum(1 - s) AS bigint) AS n2
        FROM runs)
SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
       round(1 + 2.0 * n1 * n2 / (n1 + n2), 6) AS expected_runs,
       round((r - (1 + 2.0 * n1 * n2 / (n1 + n2)))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))), 6)
         AS z_score
FROM agg"""


@register(
    "runs_test_hourly",
    oracle=_RUNS_ORACLE,
    tags=("statistics", "hypothesis-test", "timeseries"),
)
def runs_test_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test of the hourly series against its median
    (module docstring item 3): (n_runs, n_above, n_below, expected_runs,
    z_score). Median = lower middle by (count, hour) order; exact-median
    ties dropped — both stated identically in each engine."""
    hour_us = 3_600_000_000
    ev = load_table(spark, sf_dir, "events")
    hc = (ev.select(F.expr(f"unix_micros(ts) div {hour_us}").alias("h"))
          .groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("c")))
    # lower median via sorted array of (c, h) — grid-sized
    med = (hc.agg(F.array_sort(F.collect_list(F.struct("c", "h")))
                  .alias("a"))
           .selectExpr(
               "element_at(a, cast((size(a) - 1) div 2 AS int) + 1).c"
               " AS m"))
    sgn = (hc.crossJoin(F.broadcast(med))
           .filter(F.col("c") != F.col("m"))
           .select("h", (F.col("c") > F.col("m")).cast("int").alias("s")))
    runs = sgn.select("s", F.lag("s").over(W.orderBy("h")).alias("ps"))
    agg = runs.agg(
        F.sum(F.when(F.col("ps").isNull()
                     | (F.col("s") != F.col("ps")), 1).otherwise(0))
        .cast("long").alias("r"),
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"))
    return agg.selectExpr(
        "r AS n_runs", "n1 AS n_above", "n2 AS n_below",
        "round(1 + 2.0 * n1 * n2 / (n1 + n2), 6) AS expected_runs",
        "round((r - (1 + 2.0 * n1 * n2 / (n1 + n2)))"
        " / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)"
        " / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))), 6) AS z_score")
