"""Declarative data-quality constraint suite (the Deequ shape — Schelter
et al., VLDB 2018): evaluate a battery of column-level expectations in
ONE pass over the table and emit a (check, column, pass_fraction,
violations) report — the pre-ingest gate a 100 TB pipeline runs before
publishing a batch.

Scale stance: every expectation is an aggregatable predicate, so the
whole suite compiles to a SINGLE map-side-combinable aggregate over one
scan (Deequ's core trick) — adding a check adds a column to the
aggregate, not a pass over the data. The wide one-row result is then
unpivoted to the report shape driver-side of the aggregate (a constant-
width stack, not a shuffle). Completeness, domain membership, range,
positivity, and a referential containment check (orders.o_custkey ⊆
customer keys, via a broadcast existence join — the one check that
genuinely needs a second table) are each exact integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_STATUS_DOMAIN = ("F", "O", "P")
_PRIO_PREFIXES = ("1-", "2-", "3-", "4-", "5-")


def _oracle() -> str:
    prio = " OR ".join(
        f"o_orderpriority LIKE '{p}%'" for p in _PRIO_PREFIXES)
    dom = ", ".join(f"'{s}'" for s in _STATUS_DOMAIN)
    return f"""
WITH agg AS (
  SELECT count(*) AS n,
         sum(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS c_key,
         sum(CASE WHEN o_orderdate IS NOT NULL THEN 1 ELSE 0 END) AS c_date,
         sum(CASE WHEN o_orderstatus IN ({dom}) THEN 1 ELSE 0 END) AS c_dom,
         sum(CASE WHEN {prio} THEN 1 ELSE 0 END) AS c_prio,
         sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS c_pos,
         sum(CASE WHEN EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = orders.o_custkey)
                  THEN 1 ELSE 0 END) AS c_ref
  FROM orders)
SELECT * FROM (
  SELECT 'complete' AS check_name, 'o_orderkey' AS col,
         cast(n - c_key AS bigint) AS violations,
         round(cast(c_key AS double) / n, 6) AS pass_fraction FROM agg
  UNION ALL
  SELECT 'complete', 'o_orderdate', cast(n - c_date AS bigint),
         round(cast(c_date AS double) / n, 6) FROM agg
  UNION ALL
  SELECT 'in_domain', 'o_orderstatus', cast(n - c_dom AS bigint),
         round(cast(c_dom AS double) / n, 6) FROM agg
  UNION ALL
  SELECT 'prefix_format', 'o_orderpriority', cast(n - c_prio AS bigint),
         round(cast(c_prio AS double) / n, 6) FROM agg
  UNION ALL
  SELECT 'positive', 'o_totalprice', cast(n - c_pos AS bigint),
         round(cast(c_pos AS double) / n, 6) FROM agg
  UNION ALL
  SELECT 'ref_exists', 'o_custkey', cast(n - c_ref AS bigint),
         round(cast(c_ref AS double) / n, 6) FROM agg)
ORDER BY check_name, col"""


@register(
    "data_quality_checks",
    oracle=_oracle(),
    tags=("quality", "audit", "scale-pattern"),
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(check_name, col, violations, pass_fraction) for six expectations
    over orders, all folded into one aggregate over one scan (plus one
    broadcast existence join for the referential check). A green row
    proves every predicate compiles identically in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    # .distinct() makes the plan match the oracle's EXISTS semantics
    # structurally: a duplicated key in customer would otherwise fan out
    # orders rows through the left join and inflate EVERY counter in the
    # shared aggregate (not just c_ref). TPC-H keys happen to be unique,
    # but the suite must not depend on that.
    cust = (load_table(spark, sf_dir, "customer")
            .select("c_custkey").distinct())
    with_ref = (orders.join(
        F.broadcast(cust.withColumn("_ref", F.lit(1))),
        orders.o_custkey == cust.c_custkey, "left"))

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    prio = None
    for p in _PRIO_PREFIXES:
        c = F.col("o_orderpriority").startswith(p)
        prio = c if prio is None else (prio | c)
    agg = with_ref.agg(
        F.count(F.lit(1)).alias("n"),
        cnt(F.col("o_orderkey").isNotNull()).alias("c_key"),
        cnt(F.col("o_orderdate").isNotNull()).alias("c_date"),
        cnt(F.col("o_orderstatus").isin(*_STATUS_DOMAIN)).alias("c_dom"),
        cnt(prio).alias("c_prio"),
        cnt(F.col("o_totalprice") > 0).alias("c_pos"),
        cnt(F.col("_ref").isNotNull()).alias("c_ref"))
    checks = [("complete", "o_orderkey", "c_key"),
              ("complete", "o_orderdate", "c_date"),
              ("in_domain", "o_orderstatus", "c_dom"),
              ("prefix_format", "o_orderpriority", "c_prio"),
              ("positive", "o_totalprice", "c_pos"),
              ("ref_exists", "o_custkey", "c_ref")]
    stack = ", ".join(f"'{name}', '{col}', {c}" for name, col, c in checks)
    return (agg.select(
                "n",
                F.expr(f"stack({len(checks)}, {stack}) "
                       "AS (check_name, col, passed)"))
            .select("check_name", "col",
                    (F.col("n") - F.col("passed")).cast("long")
                    .alias("violations"),
                    F.round(F.col("passed").cast("double") / F.col("n"), 6)
                    .alias("pass_fraction"))
            .orderBy("check_name", "col"))


# ------------------------------------------------- cross-batch drift (tier 2)

# Batch boundary: the "current" ingest batch vs everything before it.
_DRIFT_CUT = "2000-01-01"

# (metric, relative-change tolerance). Shares and rates get tight bands;
# raw row count gets a loose one (batch sizes legitimately vary with the
# covered time span — the band only guards against collapse/explosion).
_DRIFT_BANDS = [
    ("row_count", 0.80),
    ("share_status_F", 0.15),
    ("share_status_O", 0.15),
    ("share_status_P", 0.15),
    ("share_prio_urgent", 0.15),
    ("avg_price_cents", 0.10),
]


def _drift_oracle() -> str:
    prof = f"""
  SELECT CASE WHEN o_orderdate >= TIMESTAMP '{_DRIFT_CUT}'
              THEN 1 ELSE 0 END AS b,
         count(*) AS n,
         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_f,
         sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS n_o,
         sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS n_p,
         sum(CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END) AS n_u,
         sum(cast(floor(o_totalprice * 100) AS bigint)) AS cents
  FROM orders GROUP BY 1"""
    metric_exprs = {
        "row_count": "cast(n AS double)",
        "share_status_F": "cast(n_f AS double) / n",
        "share_status_O": "cast(n_o AS double) / n",
        "share_status_P": "cast(n_p AS double) / n",
        "share_prio_urgent": "cast(n_u AS double) / n",
        "avg_price_cents": "cast(cents AS double) / n",
    }
    rows = []
    for metric, band in _DRIFT_BANDS:
        e = metric_exprs[metric]
        rows.append(f"SELECT '{metric}' AS metric, {e} AS v, "
                    f"{band} AS band, b FROM prof")
    return f"""
WITH prof AS ({prof}),
long AS ({' UNION ALL '.join(rows)}),
wide AS (
  SELECT metric, band,
         max(CASE WHEN b = 0 THEN v END) AS prior_value,
         max(CASE WHEN b = 1 THEN v END) AS current_value
  FROM long GROUP BY metric, band)
SELECT metric,
       round(prior_value, 6) AS prior_value,
       round(current_value, 6) AS current_value,
       round((current_value - prior_value) / prior_value, 6) AS rel_change,
       abs((current_value - prior_value) / prior_value) <= band
           AS within_band
FROM wide ORDER BY metric"""


@register(
    "dq_cross_batch_drift",
    oracle=_drift_oracle(),
    tags=("quality", "audit", "drift", "scale-pattern"),
)
def dq_cross_batch_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style anomaly detection (tier 2, round-9 verdict item 7): a
    batch's profile — row count, status-domain histogram shares, urgent-
    priority rate, average price — compared against the PRIOR batch's with
    per-metric relative-tolerance bands. The half of the reference's
    "validate before publish" contract that e2e.sh eyeballs by hand
    (/root/reference/validation/e2e.sh:147-148).

    Plan: one scan + one two-group aggregate builds BOTH profiles (all
    counters exact integers, so the derived ratios are bit-deterministic);
    the two profile rows broadcast-join and unpivot driver-free via stack.
    At 100 TB: each batch profile is one map-side-combinable aggregate over
    that batch's partition — in production the prior profile is a stored
    one-row artifact, not recomputed; the compare is O(#metrics)."""
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit(_DRIFT_CUT).cast("timestamp")

    def icnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    prof = (orders
            .groupBy((F.col("o_orderdate") >= cut).cast("int").alias("b"))
            .agg(F.count(F.lit(1)).alias("n"),
                 icnt(F.col("o_orderstatus") == "F").alias("n_f"),
                 icnt(F.col("o_orderstatus") == "O").alias("n_o"),
                 icnt(F.col("o_orderstatus") == "P").alias("n_p"),
                 icnt(F.col("o_orderpriority").startswith("1-"))
                 .alias("n_u"),
                 F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
                 .alias("cents")))
    metric_exprs = {
        "row_count": F.col("n").cast("double"),
        "share_status_F": F.col("n_f").cast("double") / F.col("n"),
        "share_status_O": F.col("n_o").cast("double") / F.col("n"),
        "share_status_P": F.col("n_p").cast("double") / F.col("n"),
        "share_prio_urgent": F.col("n_u").cast("double") / F.col("n"),
        "avg_price_cents": F.col("cents").cast("double") / F.col("n"),
    }
    long = None
    for metric, band in _DRIFT_BANDS:
        row = prof.select(F.lit(metric).alias("metric"),
                          metric_exprs[metric].alias("v"),
                          F.lit(band).alias("band"), "b")
        long = row if long is None else long.unionByName(row)
    wide = (long.groupBy("metric", "band")
            .agg(F.max(F.when(F.col("b") == 0, F.col("v")))
                 .alias("prior_value"),
                 F.max(F.when(F.col("b") == 1, F.col("v")))
                 .alias("current_value")))
    rel = (F.col("current_value") - F.col("prior_value")) / F.col(
        "prior_value")
    return (wide.select(
                "metric",
                F.round("prior_value", 6).alias("prior_value"),
                F.round("current_value", 6).alias("current_value"),
                F.round(rel, 6).alias("rel_change"),
                (F.abs(rel) <= F.col("band")).alias("within_band"))
            .orderBy("metric"))
