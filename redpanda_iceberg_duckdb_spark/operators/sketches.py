"""Sketch and fuzzy-match operators with deterministic cross-engine math:
a Flajolet-Martin distinct-count sketch (the ancestor of HyperLogLog) built
on the shared md5 hash — unlike engine-native approx_count_distinct, the
estimate itself is bit-identical on Spark and DuckDB — plus Levenshtein
fuzzy matching and explicit GROUPING SETS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table

# 2^31 hash space for the FM sketches. Trailing-zero runs are computed with
# the classic lowest-set-bit trick: (h & -h) is an exact power of two, so
# log2 of it is exact in both engines.
_M = 2_147_483_648


@register(
    "fm_distinct_sketch",
    oracle=f"""
WITH h AS (SELECT event_type,
                  {md5_mod_duck("cast(user_id AS varchar)", _M)} AS hv
           FROM events),
runs AS (SELECT event_type,
                max(CASE WHEN hv = 0 THEN 31
                         ELSE cast(floor(log2(hv & -hv)) AS int) END) AS r
         FROM h GROUP BY event_type)
SELECT event_type, r AS max_trailing_zeros,
       cast(round(pow(2, r) / 0.77351, 0) AS bigint) AS fm_estimate,
       (SELECT count(DISTINCT user_id) FROM events e
        WHERE e.event_type = runs.event_type) AS exact_distinct
FROM runs
ORDER BY event_type""",
    tags=("sketch", "approx"),
)
def fm_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flajolet-Martin distinct estimate per group, deterministic across
    engines: hash each key with the shared md5-u64, track the max
    trailing-zero run, estimate 2^R / 0.77351. One hash + one max-aggregate —
    the sketch that explains WHY approx_count_distinct scales (HLL = many FM
    buckets + harmonic mean); here single-bucket, so the estimate is coarse
    by design — the exact count rides along for calibration.

    log2/pow notes: hv & -hv is an exact power of two, so log2 of it and
    pow(2, r) are exact in both engines."""
    e = load_table(spark, sf_dir, "events")
    hv = F.expr(md5_mod_spark("cast(user_id AS string)", _M))
    h = e.select("event_type", hv.alias("hv"))
    runs = h.groupBy("event_type").agg(
        F.max(
            F.when(F.col("hv") == 0, 31).otherwise(
                F.floor(F.log2(F.expr("hv & -hv"))).cast("int"))
        ).alias("r"))
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"))
    return (runs.join(exact, "event_type")
            .select("event_type", F.col("r").alias("max_trailing_zeros"),
                    F.round(F.pow(F.lit(2.0), F.col("r")) / 0.77351, 0)
                    .cast("long").alias("fm_estimate"),
                    "exact_distinct")
            .orderBy("event_type"))


@register(
    "fuzzy_part_names",
    oracle="""
SELECT a.p_partkey k1, b.p_partkey k2,
       a.p_name n1, b.p_name n2,
       cast(levenshtein(a.p_name, b.p_name) AS int) AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2 AND a.p_name <> b.p_name
ORDER BY k1, k2""",
    tags=("text", "fuzzy", "join"),
)
def fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: near-identical part names (edit distance <= 2)
    within a brand. The brand equi-join bounds the candidate pairs — the
    blocking-key pattern every fuzzy-dedup pipeline uses to avoid O(n^2)
    levenshtein evaluations."""
    p = load_table(spark, sf_dir, "part")
    a = p.select(F.col("p_partkey").alias("k1"), F.col("p_name").alias("n1"),
                 F.col("p_brand").alias("b1"))
    b = p.select(F.col("p_partkey").alias("k2"), F.col("p_name").alias("n2"),
                 F.col("p_brand").alias("b2"))
    return (a.join(b, (F.col("b1") == F.col("b2")) & (F.col("k1") < F.col("k2")))
            .filter((F.levenshtein("n1", "n2") <= 2)
                    & (F.col("n1") != F.col("n2")))
            .select("k1", "k2", "n1", "n2",
                    F.levenshtein("n1", "n2").cast("int").alias("dist"))
            .orderBy("k1", "k2"))


@register(
    "grouping_sets_orders",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus) AS g_status,
       grouping(o_orderpriority) AS g_priority,
       count(*) AS n,
       cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY g_status, g_priority, o_orderstatus NULLS FIRST,
         o_orderpriority NULLS FIRST""",
    tags=("grouping",),
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() indicators — the general form
    behind cube/rollup, disambiguating real NULL keys from subtotal rows."""
    load_table(spark, sf_dir, "orders")
    return spark.sql("""
SELECT o_orderstatus, o_orderpriority,
       cast(grouping(o_orderstatus) AS int) AS g_status,
       cast(grouping(o_orderpriority) AS int) AS g_priority,
       count(*) AS n,
       cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY g_status, g_priority, o_orderstatus NULLS FIRST,
         o_orderpriority NULLS FIRST""")


@register(
    "hll_lite_distinct",
    oracle=f"""
WITH h AS (SELECT event_type,
                  {md5_mod_duck("cast(user_id AS varchar)", _M)} AS hv
           FROM events),
bucketed AS (SELECT event_type, hv % 16 AS bucket, hv // 16 AS rest FROM h),
runs AS (SELECT event_type, bucket,
                max(CASE WHEN rest = 0 THEN 27
                         ELSE cast(floor(log2(rest & -rest)) AS int) END) AS r
         FROM bucketed GROUP BY event_type, bucket),
est AS (SELECT event_type,
               count(*) AS n_buckets,
               cast(sum(cast(pow(2, r) AS bigint)) AS bigint) AS sum_pow
        FROM runs GROUP BY event_type)
SELECT event_type,
       n_buckets,
       sum_pow,
       cast(round(16.0 * sum_pow / n_buckets / 0.77351, 0) AS bigint)
           AS hll_lite_estimate,
       (SELECT count(DISTINCT user_id) FROM events e
        WHERE e.event_type = est.event_type) AS exact_distinct
FROM est
ORDER BY event_type""",
    tags=("sketch", "approx"),
)
def hll_lite_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-bucket FM sketch ("HLL-lite"): hash -> 16 buckets by low bits,
    max trailing-zero run per bucket, average the per-bucket 2^R estimates.
    This is the structure of HyperLogLog (minus bias-corrected harmonic
    mean), fully deterministic across engines because bucket assignment, run
    lengths, and the combine are exact integer/power-of-two arithmetic.

    Scale shape: ONE aggregation pass (groupBy event_type+bucket -> max),
    then a 16-row-per-group combine — mergeable partial state, exactly how
    distributed sketch aggregation works."""
    e = load_table(spark, sf_dir, "events")
    hv = F.expr(md5_mod_spark("cast(user_id AS string)", _M))
    b = e.select("event_type", (hv % 16).alias("bucket"),
                 F.expr(f"{md5_mod_spark('cast(user_id AS string)', _M)} div 16")
                 .alias("rest"))
    runs = b.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rest") == 0, 27).otherwise(
            F.floor(F.log2(F.expr("rest & -rest"))).cast("int"))).alias("r"))
    est = runs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.pow(F.lit(2.0), F.col("r")).cast("long")).alias("sum_pow"))
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"))
    return (est.join(exact, "event_type")
            .select("event_type", "n_buckets", "sum_pow",
                    F.round(16.0 * F.col("sum_pow") / F.col("n_buckets")
                            / 0.77351, 0).cast("long").alias("hll_lite_estimate"),
                    "exact_distinct")
            .orderBy("event_type"))


@register(
    "histogram_quantiles",
    oracle="""
WITH b AS (
  SELECT event_type, least(cast(floor(value / 5) as bigint), 99) AS bucket,
         count(*) AS cnt
  FROM events GROUP BY 1, 2),
c AS (
  SELECT event_type, bucket, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS total
  FROM b),
qs AS (SELECT unnest([cast(0.5 as double), cast(0.95 as double)]) AS q)
SELECT event_type, q,
       round(5.0 * bucket + 5.0 * (q * total - (cum - cnt)) / cnt, 6)
         AS estimate
FROM c, qs
WHERE cum >= q * total AND (cum - cnt) < q * total
ORDER BY event_type, q""",
    bench=True,
    tags=("sketch", "quantile"),
)
def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram quantiles: p50/p95 per event_type estimated from
    a fixed 100-bucket equi-width histogram (width 5 over [0, 500), tail
    clamped) with linear interpolation inside the landing bucket — the
    100 TB quantile answer when percentile_approx's per-group sketches are
    still too heavy: histogram counts merge by plain addition across
    partitions, days, or clusters (unlike exact percentiles, which need the
    data). Deterministic across engines: bucketing is exact floor
    arithmetic, cumulative counts are integers, and the one interpolation
    divide is the same IEEE double everywhere."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    b = (e.groupBy("event_type",
                   F.least(F.floor(F.col("value") / 5).cast("long"),
                           F.lit(99)).alias("bucket"))
         .agg(F.count(F.lit(1)).alias("cnt")))
    w_cum = (W.partitionBy("event_type").orderBy("bucket")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    w_all = W.partitionBy("event_type")
    c = (b.withColumn("cum", F.sum("cnt").over(w_cum))
         .withColumn("total", F.sum("cnt").over(w_all)))
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.95))).alias("q"))
    target = F.col("q") * F.col("total")
    return (c.crossJoin(F.broadcast(qs))
            .filter((F.col("cum") >= target)
                    & ((F.col("cum") - F.col("cnt")) < target))
            .select("event_type", "q",
                    F.round(F.lit(5.0) * F.col("bucket")
                            + F.lit(5.0) * (target - (F.col("cum") - F.col("cnt")))
                            / F.col("cnt"), 6).alias("estimate"))
            .orderBy("event_type", "q"))


# Count-Min sketch geometry: 4 independent hash rows x 256 counters.
_CMS_D, _CMS_W = 4, 256


@register(
    "count_min_heavy_hitters",
    oracle=f"""
WITH exact AS (
  SELECT event_type, user_id, count(*) AS exact_n
  FROM events GROUP BY 1, 2),
top5 AS (
  SELECT event_type, user_id, exact_n FROM
    (SELECT *, row_number() OVER (PARTITION BY event_type
                                  ORDER BY exact_n DESC, user_id) rn
     FROM exact) WHERE rn <= 5),
cells AS (
  SELECT event_type, d,
         {md5_mod_duck("cast(d as varchar) || ':' || cast(user_id as varchar)", _CMS_W)} AS col,
         count(*) AS c
  FROM events, unnest(range({_CMS_D})) r(d)
  GROUP BY 1, 2, 3),
est AS (
  SELECT t.event_type, t.user_id, t.exact_n, min(c.c) AS cms_est
  FROM top5 t
  JOIN cells c ON c.event_type = t.event_type
  AND c.col = {md5_mod_duck("cast(c.d as varchar) || ':' || cast(t.user_id as varchar)", _CMS_W)}
  GROUP BY 1, 2, 3)
SELECT event_type, user_id, exact_n, cms_est,
       cms_est >= exact_n AS est_ge_exact
FROM est ORDER BY event_type, exact_n DESC, user_id""",
    tags=("sketch", "frequency"),
)
def count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation: a 4x256 counter grid per
    event_type (cell = count of rows hashing there; estimate = min over the
    4 rows) — the mergeable heavy-hitter structure for 100 TB streams:
    cells merge by addition, size is fixed regardless of key cardinality,
    and estimates only ever OVER-count (est_ge_exact is provably always
    true — the oracle hashes identically, so the driver hash-checks that
    invariant too). Scored here for the exact top-5 users per type so the
    sketch error is visible next to ground truth."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    exact = (e.groupBy("event_type", "user_id")
             .agg(F.count(F.lit(1)).alias("exact_n")))
    top5 = (exact.withColumn("rn", F.row_number().over(
                W.partitionBy("event_type")
                .orderBy(F.desc("exact_n"), "user_id")))
            .filter(F.col("rn") <= 5).drop("rn"))
    d_vals = F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("d")
    cell_hash = md5_mod_spark(
        "concat(cast(d as string), ':', cast(user_id as string))", _CMS_W)
    cells = (e.select("event_type", "user_id").select(
                "event_type", "user_id", d_vals)
             .select("event_type", "d", F.expr(cell_hash).alias("col"))
             .groupBy("event_type", "d", "col")
             .agg(F.count(F.lit(1)).alias("c")))
    probe_hash = md5_mod_spark(
        "concat(cast(d as string), ':', cast(user_id as string))", _CMS_W)
    probes = (top5.select("event_type", "user_id", "exact_n", d_vals)
              .select("event_type", "user_id", "exact_n", "d",
                      F.expr(probe_hash).alias("col")))
    est = (cells.join(F.broadcast(probes), ["event_type", "d", "col"])
           .groupBy("event_type", "user_id", "exact_n")
           .agg(F.min("c").alias("cms_est")))
    return (est.select("event_type", "user_id", "exact_n", "cms_est",
                       (F.col("cms_est") >= F.col("exact_n"))
                       .alias("est_ge_exact"))
            .orderBy("event_type", F.desc("exact_n"), "user_id"))


# KMV sketch size: estimates stabilize at ~1/sqrt(k) relative error; 128
# keeps the fixture estimates within ~9% while the sketch stays tiny.
_KMV_K = 128


@register(
    "kmv_set_overlap",
    oracle=f"""
WITH uh AS (SELECT DISTINCT event_type,
       {md5_mod_duck(
           "user_id || ':' || cast(cast(ts AS date) AS varchar)", _M)} AS h
            FROM events),
sk AS (SELECT event_type, h FROM uh
       QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h)
               <= {_KMV_K}),
types AS (SELECT DISTINCT event_type FROM sk),
pairs AS (SELECT a.event_type t1, b.event_type t2
          FROM types a JOIN types b ON a.event_type < b.event_type),
ph AS (SELECT DISTINCT t1, t2, h FROM (
         SELECT p.t1, p.t2, s.h FROM pairs p JOIN sk s ON s.event_type = p.t1
         UNION ALL
         SELECT p.t1, p.t2, s.h FROM pairs p JOIN sk s ON s.event_type = p.t2)),
kk AS (SELECT t1, t2, h FROM ph
       QUALIFY row_number() OVER (PARTITION BY t1, t2 ORDER BY h)
               <= {_KMV_K}),
inboth AS (SELECT a.event_type t1, b.event_type t2, a.h
           FROM sk a JOIN sk b ON a.h = b.h AND a.event_type < b.event_type),
est AS (SELECT kk.t1, kk.t2, count(*) AS k_used,
               count(inboth.h) AS common_in_k
        FROM kk LEFT JOIN inboth
          ON inboth.t1 = kk.t1 AND inboth.t2 = kk.t2 AND inboth.h = kk.h
        GROUP BY kk.t1, kk.t2),
ud AS (SELECT DISTINCT event_type,
              user_id || ':' || cast(cast(ts AS date) AS varchar) AS k
       FROM events),
nu AS (SELECT event_type, count(*) n FROM ud GROUP BY event_type),
ex AS (SELECT a.event_type t1, b.event_type t2, count(*) AS n_inter
       FROM ud a JOIN ud b
         ON a.k = b.k AND a.event_type < b.event_type
       GROUP BY 1, 2)
SELECT est.t1, est.t2, k_used, common_in_k,
       round(common_in_k * 1.0 / k_used, 6) AS jaccard_est,
       round(n_inter * 1.0 / (n1.n + n2.n - n_inter), 6) AS jaccard_exact
FROM est
JOIN ex ON ex.t1 = est.t1 AND ex.t2 = est.t2
JOIN nu n1 ON n1.event_type = est.t1
JOIN nu n2 ON n2.event_type = est.t2
ORDER BY est.t1, est.t2""",
    tags=("sketch", "approx", "setop"),
)
def kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values sketch set overlap: per event_type keep the K=128
    smallest md5-u64 hashes of (user, activity-day) elements; for each type
    pair, Jaccard is estimated
    as |both-sketch hashes among the K smallest of the sketch union| / K.
    This is the sketch family FM/HLL cannot provide — set INTERSECTION
    estimation from mergeable per-partition state (kth-smallest merges by
    min-k of the union). Deterministic cross-engine because the hash is the
    shared md5 (engine-native approx sketches are not comparable
    bit-for-bit). The exact Jaccard rides along for calibration, as in
    fm_distinct_sketch.

    Scale: sketches are built with one distinct + one windowed top-k per
    group (WindowGroupLimit pushes the K filter map-side); everything after
    operates on K-sized sketch rows — pair joins cost |types|^2 * K,
    independent of event count."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    # set element = (user, activity day): type pairs overlap partially
    # (~0.21-0.23 exact Jaccard on the fixtures), so the estimate is a real
    # estimate — plain user sets are identical across types here (J = 1.0)
    elem = ("concat(cast(user_id AS string), ':', "
            "cast(cast(ts AS date) AS string))")
    uh = (e.select("event_type",
                   F.expr(md5_mod_spark(elem, _M)).alias("h"))
          .distinct())
    wt = W.partitionBy("event_type").orderBy("h")
    sk = (uh.withColumn("rn", F.row_number().over(wt))
          .filter(F.col("rn") <= _KMV_K).drop("rn").localCheckpoint(eager=True))
    types = sk.select("event_type").distinct()
    pairs = (types.select(F.col("event_type").alias("t1"))
             .join(types.select(F.col("event_type").alias("t2")),
                   F.col("t1") < F.col("t2")))
    s1 = sk.select(F.col("event_type").alias("t1"), "h")
    s2 = sk.select(F.col("event_type").alias("t2"), "h")
    ph = (pairs.join(s1, "t1").select("t1", "t2", "h")
          .unionAll(pairs.join(s2, "t2").select("t1", "t2", "h"))
          .distinct())
    wp = W.partitionBy("t1", "t2").orderBy("h")
    kk = (ph.withColumn("rn", F.row_number().over(wp))
          .filter(F.col("rn") <= _KMV_K).drop("rn"))
    both = (s1.join(s2, "h").filter(F.col("t1") < F.col("t2"))
            .select("t1", "t2", "h", F.lit(1).alias("in_both")))
    est = (kk.join(both, ["t1", "t2", "h"], "left_outer")
           .groupBy("t1", "t2")
           .agg(F.count(F.lit(1)).alias("k_used"),
                F.count("in_both").alias("common_in_k")))
    ud = (e.select("event_type", F.expr(elem).alias("k"))
          .distinct().localCheckpoint(eager=True))
    nu = ud.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ex = (ud.select(F.col("event_type").alias("t1"), "k")
          .join(ud.select(F.col("event_type").alias("t2"), "k"), "k")
          .filter(F.col("t1") < F.col("t2"))
          .groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n_inter")))
    return (est.join(ex, ["t1", "t2"])
            .join(nu.select(F.col("event_type").alias("t1"),
                            F.col("n").alias("n1")), "t1")
            .join(nu.select(F.col("event_type").alias("t2"),
                            F.col("n").alias("n2")), "t2")
            .select("t1", "t2", "k_used", "common_in_k",
                    F.round(F.col("common_in_k") / F.col("k_used"), 6)
                    .alias("jaccard_est"),
                    F.round(F.col("n_inter")
                            / (F.col("n1") + F.col("n2") - F.col("n_inter")),
                            6).alias("jaccard_exact"))
            .orderBy("t1", "t2"))
