"""Two rounds of gradient-boosted regression stumps — the minimal honest
form of the GBDT training loop (decision_stump_hour_split fits ONE stump;
boosting requires fitting the NEXT learner on residuals, which is where
lattice discipline usually dies). Model: purchase value (cents) on
hour-of-day; each round picks the threshold split s (hour < s vs >= s)
maximizing the exact SSE reduction and predicts segment means.

Exactness: the corpus reduces once to the 24-row hour histogram
(n_h, sum_y_h); every split's gain TL^2/nL + TR^2/nR is evaluated in
double from exact integer moments (fixed tree; argmax ties broken by
smaller s). Round-1 predictions are snapped to integer micros with the
half-up div lattice ((2e6*T + n) div (2n), brier13's rule), so residual
moments r_h = 1e6*sum_y_h - n_h*p_side(h) are EXACT integers and round 2
runs the identical split search on them. Everything after the one
map-side-combinable aggregate is 24-row grid algebra.

Scale stance (100 TB): one aggregate keyed by hour; split search is a
23x24 grid join on broadcast frames; no window, no driver loop — the
boosting rounds are DATA-INDEPENDENT in depth (2 fixed rounds), so the
whole fit is one Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

# gain(s) over a (h, n, t) histogram, via cumulative sums at split s:
# splits come from a grid join (b.h < s), so no window anywhere.
_GAIN_CORE = """
sel AS (SELECT s, nl, tl, nt - nl AS nr, tt - tl AS tr
        FROM (SELECT g.s,
                     sum(CASE WHEN hh.h < g.s THEN hh.n ELSE 0 END) AS nl,
                     sum(CASE WHEN hh.h < g.s THEN hh.t ELSE 0 END) AS tl,
                     sum(hh.n) AS nt, sum(hh.t) AS tt
              FROM grid g, hh GROUP BY g.s)
        WHERE nl > 0 AND nt - nl > 0),
best AS (SELECT s, nl, tl, nr, tr,
                cast(tl AS double) * tl / nl
                + cast(tr AS double) * tr / nr
                - cast(tl + tr AS double) * (tl + tr) / (nl + nr) AS gain
         FROM sel ORDER BY gain DESC, s LIMIT 1)"""


def _boost_oracle() -> str:
    return f"""
WITH pts AS (SELECT cast(extract(hour FROM ts) AS bigint) AS h,
                    cast(round(value * 100) AS bigint) AS y
             FROM events WHERE event_type = 'purchase'),
hh AS (SELECT h, cast(count(*) AS bigint) AS n,
              cast(sum(y) AS bigint) AS t
       FROM pts GROUP BY h),
grid AS (SELECT unnest(range(1, 24)) AS s),
{_GAIN_CORE},
r2 AS (SELECT hh.h,
              hh.n,
              1000000 * hh.t - hh.n *
                (SELECT CASE WHEN hh.h < s
                        THEN (2000000 * tl + nl) // (2 * nl)
                        ELSE (2000000 * tr + nr) // (2 * nr) END
                 FROM best) AS t
       FROM hh),
sel2 AS (SELECT g.s,
                sum(CASE WHEN r2.h < g.s THEN r2.n ELSE 0 END) AS nl,
                sum(CASE WHEN r2.h < g.s THEN r2.t ELSE 0 END) AS tl,
                sum(r2.n) AS nt, sum(r2.t) AS tt
         FROM grid g, r2 GROUP BY g.s),
best2 AS (SELECT s, nl, tl, nt - nl AS nr, tt - tl AS tr,
                 cast(tl AS double) * tl / nl
                 + cast(tt - tl AS double) * (tt - tl) / (nt - nl)
                 - cast(tt AS double) * tt / nt AS gain
          FROM sel2 WHERE nl > 0 AND nt - nl > 0
          ORDER BY gain DESC, s LIMIT 1)
SELECT 1 AS round, cast(s AS int) AS split_hour,
       cast((2000000 * tl + nl) // (2 * nl) AS bigint) AS pred_left_micro,
       cast((2000000 * tr + nr) // (2 * nr) AS bigint) AS pred_right_micro,
       round(gain, 6) AS sse_reduction
FROM best
UNION ALL
SELECT 2, cast(s AS int),
       cast((2000000 * cast(tl AS hugeint) + nl * 1000000)
            // (2 * cast(nl AS hugeint) * 1000000) AS bigint),
       cast((2000000 * cast(tr AS hugeint) + nr * 1000000)
            // (2 * cast(nr AS hugeint) * 1000000) AS bigint),
       round(gain / 1000000 / 1000000, 6)
FROM best2
ORDER BY round"""


@register(
    "boosted_stumps_two_rounds",
    oracle=_boost_oracle(),
    tags=("ml", "regression", "boosting", "trees"),
)
def boosted_stumps_two_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(round, split_hour, pred_left_micro, pred_right_micro,
    sse_reduction) for two boosting rounds of hour-threshold stumps on
    purchase value; round-2 fits the EXACT integer micro residuals of
    round 1 (module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    pts = (ev.filter(F.col("event_type") == "purchase")
           .select(F.hour("ts").cast("long").alias("h"),
                   F.round(F.col("value") * 100).cast("long").alias("y")))
    hh = pts.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("n"),
                              F.sum("y").cast("long").alias("t"))
    grid = spark.range(1, 24).select(F.col("id").alias("s"))

    def best_split(hist: DataFrame) -> DataFrame:
        sel = (grid.crossJoin(F.broadcast(hist))
               .groupBy("s")
               .agg(F.sum(F.when(F.col("h") < F.col("s"), F.col("n"))
                          .otherwise(0)).alias("nl"),
                    F.sum(F.when(F.col("h") < F.col("s"), F.col("t"))
                          .otherwise(0)).alias("tl"),
                    F.sum("n").alias("nt"), F.sum("t").alias("tt"))
               .filter("nl > 0 AND nt - nl > 0")
               .selectExpr("s", "nl", "tl", "nt - nl AS nr",
                           "tt - tl AS tr", "nt", "tt"))
        return (sel.selectExpr(
            "s", "nl", "tl", "nr", "tr",
            "cast(tl AS double) * tl / nl + cast(tr AS double) * tr / nr"
            " - cast(tt AS double) * tt / nt AS gain")
            .orderBy(F.desc("gain"), "s").limit(1))

    b1 = best_split(hh).localCheckpoint(eager=True)   # 1 row, read 3x
    out1 = b1.selectExpr(
        "1 AS round", "cast(s AS int) AS split_hour",
        "cast((2000000 * tl + nl) div (2 * nl) AS bigint)"
        " AS pred_left_micro",
        "cast((2000000 * tr + nr) div (2 * nr) AS bigint)"
        " AS pred_right_micro",
        "round(gain, 6) AS sse_reduction")
    r2 = (hh.crossJoin(F.broadcast(b1.selectExpr(
            "s AS s1",
            "(2000000 * tl + nl) div (2 * nl) AS pl",
            "(2000000 * tr + nr) div (2 * nr) AS pr")))
          .selectExpr("h", "n",
                      "1000000 * t - n * (CASE WHEN h < s1 THEN pl"
                      " ELSE pr END) AS t"))
    # Round-2 numerators are signed and can pass int64: widen to
    # decimal(38,0) / hugeint. Both engines' integer division TRUNCATES
    # toward zero (Spark div; DuckDB // — probed: -7 // 2 = -3), so the
    # half-up snap becomes half-toward-zero for negative residmeans —
    # fine, the engines share it bit for bit.
    dec = "decimal(38,0)"
    out2 = best_split(r2).selectExpr(
        "2 AS round", "cast(s AS int) AS split_hour",
        f"cast((2000000 * cast(tl AS {dec}) + nl * 1000000)"
        f" div (2 * cast(nl AS {dec}) * 1000000) AS bigint)"
        " AS pred_left_micro",
        f"cast((2000000 * cast(tr AS {dec}) + nr * 1000000)"
        f" div (2 * cast(nr AS {dec}) * 1000000) AS bigint)"
        " AS pred_right_micro",
        "round(gain / 1000000 / 1000000, 6) AS sse_reduction")
    return out1.unionAll(out2).orderBy("round")
