"""Optimal transport distances between empirical distributions — the
distribution-shift metric family (1-D Wasserstein has a closed form the
KS/PSI drift queries lack: it weighs HOW FAR mass moved, not just whether
CDFs differ). Two operators:

1. wasserstein_value_by_type_pair — exact W1 between the value
   distributions of every event-type pair, on the cents lattice:
       W1 = integral |F_a(x) - F_b(x)| dx
          = sum over merged support of |n_b*C_a(x) - n_a*C_b(x)| * gap(x)
            / (n_a * n_b)
   with C the cumulative COUNTS — every term an exact integer, one float
   division at the end. (The common scale n_a*n_b clears both empirical
   CDF denominators.)

2. circular_emd_hours — earth-mover distance between the weekday and
   weekend hour-of-day profiles on the 24-hour CYCLE. On a cycle the
   optimal transport subtracts the MEDIAN of the prefix-sum flows
   (Werman et al. 1986): with D_i the integer prefix sums of
   (n_wend*c_wday_i - n_wday*c_wend_i), EMD = sum_i |D_i - median(D)|
   / (n_wday * n_wend), in hour units. Median = lower middle (index 12 of
   the 24 sorted values, 1-based) — any value between the two middles is
   optimal, so pinning the lower one keeps both engines identical.

Scale stance (100 TB): both reduce the corpus ONCE to distribution-sized
frames (distinct (type, cents) counts — bounded by the price lattice, not
the row count; 24-hour conditional counts). Pairwise work then runs on
those bounded frames: a per-pair window over merged support (partitioned
by pair — no global window) for W1; 24-row grid algebra on broadcast
frames for the circular EMD. No data-sized shuffle after the first
aggregate, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_W1_ORACLE = """
WITH pts AS (SELECT event_type AS et,
                    cast(round(value * 100) AS bigint) AS x
             FROM events),
c AS (SELECT et, x, cast(count(*) AS bigint) AS cnt FROM pts GROUP BY 1, 2),
n AS (SELECT et, sum(cnt) AS n FROM c GROUP BY 1),
pr AS (SELECT a.et AS ta, b.et AS tb, a.n AS na, b.n AS nb
       FROM n a JOIN n b ON a.et < b.et),
m AS (SELECT pr.ta, pr.tb, pr.na, pr.nb, c.x,
             sum(CASE WHEN c.et = pr.ta THEN c.cnt ELSE 0 END) AS ca,
             sum(CASE WHEN c.et = pr.tb THEN c.cnt ELSE 0 END) AS cb
      FROM pr JOIN c ON c.et = pr.ta OR c.et = pr.tb
      GROUP BY 1, 2, 3, 4, 5),
s AS (SELECT ta, tb, na, nb, x,
             sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb,
             lead(x) OVER w AS nx
      FROM m WINDOW w AS (PARTITION BY ta, tb ORDER BY x))
SELECT ta AS type_a, tb AS type_b,
       cast(na AS bigint) AS n_a, cast(nb AS bigint) AS n_b,
       round(cast(sum(abs(nb * cuma - na * cumb) * (nx - x)) AS double)
             / (na * nb) / 100, 6) AS w1_dollars
FROM s WHERE nx IS NOT NULL
GROUP BY ta, tb, na, nb ORDER BY 1, 2"""


@register(
    "wasserstein_value_by_type_pair",
    oracle=_W1_ORACLE,
    tags=("statistics", "drift", "optimal-transport"),
)
def wasserstein_value_by_type_pair(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein distance (dollars) between the value
    distributions of every event-type pair (module docstring item 1)."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(F.col("event_type").alias("et"),
                    F.round(F.col("value") * 100).cast("long").alias("x"))
    # Checkpointed: both the per-type totals (n) and the merged-support
    # build (m) read this frame, and without the checkpoint each branch
    # re-runs the events scan + (et, cents) aggregate (r10 multi-branch
    # lesson). The frame is bounded by types x the cents lattice, never
    # by the row count.
    c = pts.groupBy("et", "x").agg(F.count(F.lit(1)).cast("long")
                                   .alias("cnt")).localCheckpoint(eager=True)
    n = c.groupBy("et").agg(F.sum("cnt").alias("n"))
    pr = (n.alias("a").join(n.alias("b"),
                            F.col("a.et") < F.col("b.et"))
          .select(F.col("a.et").alias("ta"), F.col("b.et").alias("tb"),
                  F.col("a.n").alias("na"), F.col("b.n").alias("nb")))
    m = (F.broadcast(pr).join(
            c, (F.col("et") == F.col("ta")) | (F.col("et") == F.col("tb")))
         .groupBy("ta", "tb", "na", "nb", "x")
         .agg(F.sum(F.when(F.col("et") == F.col("ta"), F.col("cnt"))
                    .otherwise(0)).alias("ca"),
              F.sum(F.when(F.col("et") == F.col("tb"), F.col("cnt"))
                    .otherwise(0)).alias("cb")))
    w = W.partitionBy("ta", "tb").orderBy("x")
    s = m.select("ta", "tb", "na", "nb", "x",
                 F.sum("ca").over(w).alias("cuma"),
                 F.sum("cb").over(w).alias("cumb"),
                 F.lead("x").over(w).alias("nx"))
    return (s.filter(F.col("nx").isNotNull())
            .groupBy("ta", "tb", "na", "nb")
            .agg(F.sum(F.abs(F.col("nb") * F.col("cuma")
                             - F.col("na") * F.col("cumb"))
                       * (F.col("nx") - F.col("x"))).alias("mass"))
            .select(F.col("ta").alias("type_a"),
                    F.col("tb").alias("type_b"),
                    F.col("na").cast("long").alias("n_a"),
                    F.col("nb").cast("long").alias("n_b"),
                    F.round(F.col("mass").cast("double")
                            / (F.col("na") * F.col("nb")) / 100, 6)
                    .alias("w1_dollars"))
            .orderBy("type_a", "type_b"))


_CEMD_ORACLE = """
WITH pts AS (SELECT cast(extract(hour FROM ts) AS bigint) AS h,
                    CASE WHEN extract(isodow FROM ts) <= 5
                         THEN 1 ELSE 0 END AS wd
             FROM events),
hc AS (SELECT g.h,
              (SELECT coalesce(sum(CASE WHEN wd = 1 THEN 1 ELSE 0 END), 0)
               FROM pts WHERE pts.h = g.h) AS c1,
              (SELECT coalesce(sum(CASE WHEN wd = 0 THEN 1 ELSE 0 END), 0)
               FROM pts WHERE pts.h = g.h) AS c2
       FROM (SELECT unnest(range(24)) AS h) g),
n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM hc),
d AS (SELECT h, sum((SELECT n2 FROM n) * c1
                    - (SELECT n1 FROM n) * c2)
                OVER (ORDER BY h) AS dd
      FROM hc),
med AS (SELECT dd AS m FROM d ORDER BY dd LIMIT 1 OFFSET 11)
SELECT (SELECT cast(n1 AS bigint) FROM n) AS n_weekday,
       (SELECT cast(n2 AS bigint) FROM n) AS n_weekend,
       round(cast(sum(abs(dd - (SELECT m FROM med))) AS double)
             / ((SELECT n1 FROM n) * (SELECT n2 FROM n)), 6)
         AS emd_hours
FROM d"""


@register(
    "circular_emd_hours",
    oracle=_CEMD_ORACLE,
    tags=("statistics", "drift", "optimal-transport", "circular"),
)
def circular_emd_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular earth-mover distance (hours of mass-movement) between the
    weekday and weekend hour-of-day profiles, exact integers until the one
    final division (module docstring item 2 — the median-of-prefix-sums
    closed form on the cycle)."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.hour("ts").cast("long").alias("h"),
        (F.expr("extract(DAYOFWEEK_ISO FROM ts)") <= 5).cast("int")
        .alias("wd"))
    raw = pts.groupBy("h").agg(
        F.sum("wd").cast("long").alias("c1"),
        F.sum(1 - F.col("wd")).cast("long").alias("c2"))
    grid = spark.range(24).select(F.col("id").alias("h"))
    hc = (grid.join(raw, "h", "left_outer")
          .select("h", F.coalesce("c1", F.lit(0)).alias("c1"),
                  F.coalesce("c2", F.lit(0)).alias("c2")))
    n = hc.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    # Prefix sums over the 24-row grid via the tiny self-join (no global
    # window), then the lower-median via a sorted 24-element array.
    withn = hc.crossJoin(F.broadcast(n))
    d = (withn.alias("a")
         .join(F.broadcast(withn.alias("b")),
               F.col("b.h") <= F.col("a.h"))
         .groupBy(F.col("a.h").alias("h"))
         .agg(F.sum(F.col("b.n2") * F.col("b.c1")
                    - F.col("b.n1") * F.col("b.c2")).alias("dd"),
              F.max("a.n1").alias("n1"), F.max("a.n2").alias("n2")))
    return (d.groupBy("n1", "n2")
            .agg(F.array_sort(F.collect_list("dd")).alias("ds"),
                 F.collect_list("dd").alias("raw"))
            .select(F.col("n1").cast("long").alias("n_weekday"),
                    F.col("n2").cast("long").alias("n_weekend"),
                    F.round(F.expr(
                        "aggregate(raw, cast(0 AS bigint),"
                        " (acc, x) -> acc + abs(x - element_at(ds, 12)))")
                        .cast("double")
                        / (F.col("n1") * F.col("n2")), 6)
                    .alias("emd_hours")))


_CVM_ORACLE = """
WITH pts AS (SELECT CASE WHEN extract(isodow FROM ts) <= 5
                         THEN 1 ELSE 0 END AS wd,
                    cast(round(value * 100) AS bigint) AS x
             FROM events WHERE event_type = 'purchase'),
c AS (SELECT x, cast(sum(wd) AS bigint) AS cn,
             cast(sum(1 - wd) AS bigint) AS cm
      FROM pts GROUP BY x),
n AS (SELECT sum(cn) AS n, sum(cm) AS m FROM c),
s AS (SELECT x, cn, cm,
             sum(cn) OVER (ORDER BY x) AS cum_n,
             sum(cm) OVER (ORDER BY x) AS cum_m
      FROM c),
terms AS (SELECT (cn + cm)
                 * cast(((SELECT m FROM n) * cum_n
                         - (SELECT n FROM n) * cum_m) AS hugeint)
                 * cast(((SELECT m FROM n) * cum_n
                         - (SELECT n FROM n) * cum_m) AS hugeint) AS t
          FROM s)
SELECT (SELECT cast(n AS bigint) FROM n) AS n_weekday,
       (SELECT cast(m AS bigint) FROM n) AS n_weekend,
       round(cast(sum(t) AS double)
             / ((SELECT n FROM n) * (SELECT m FROM n))
             / (((SELECT n FROM n) + (SELECT m FROM n))
                * ((SELECT n FROM n) + (SELECT m FROM n))), 6) AS t_cvm
FROM terms"""


@register(
    "cramer_von_mises_value",
    oracle=_CVM_ORACLE,
    tags=("statistics", "drift", "hypothesis-test"),
)
def cramer_von_mises_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramer-von Mises statistic between weekday and weekend
    purchase-value distributions — the INTEGRAL companion of the KS
    supremum (ks_two_sample_value): T = sum over pooled observations of
    (F_n - G_m)^2, scaled. Per distinct cents value the term
    (cn+cm) * (m*CN - n*CM)^2 is an exact integer (common-denominator
    scaling clears both empirical CDFs); one double division at the end.

    The cumulative window runs over the DISTINCT-value table — bounded by
    the price lattice, not the row count — and is the allowed curve-table
    global window (ALLOW-listed with the KM/NA family)."""
    ev = load_table(spark, sf_dir, "events")
    pts = (ev.filter(F.col("event_type") == "purchase")
           .select((F.expr("extract(DAYOFWEEK_ISO FROM ts)") <= 5)
                   .cast("int").alias("wd"),
                   F.round(F.col("value") * 100).cast("long").alias("x")))
    c = pts.groupBy("x").agg(
        F.sum("wd").cast("long").alias("cn"),
        F.sum(1 - F.col("wd")).cast("long").alias("cm"))
    n = c.agg(F.sum("cn").alias("n"), F.sum("cm").alias("m"))
    wcum = W.orderBy("x").rowsBetween(W.unboundedPreceding, W.currentRow)
    s = (c.select("x", "cn", "cm",
                  F.sum("cn").over(wcum).alias("cum_n"),
                  F.sum("cm").over(wcum).alias("cum_m"))
         .crossJoin(F.broadcast(n)))
    dec = "decimal(38,0)"
    terms = s.selectExpr(
        "n", "m",
        f"(cn + cm) * cast(m * cum_n - n * cum_m AS {dec})"
        f" * cast(m * cum_n - n * cum_m AS {dec}) AS t")
    return terms.selectExpr(
        "cast(max(n) AS bigint) AS n_weekday",
        "cast(max(m) AS bigint) AS n_weekend",
        "round(cast(sum(t) AS double) / (max(n) * max(m))"
        " / ((max(n) + max(m)) * (max(n) + max(m))), 6) AS t_cvm")
