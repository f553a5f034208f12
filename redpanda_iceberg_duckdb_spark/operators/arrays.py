"""Array/vector aggregation operators: element-wise centroid computation
(the offline half of IVF), unpivot/stack reshaping, and winnowing-style
rolling-hash fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5_mod_spark, md5_mod_duck
from ..registry import register
from ..tables import load_table, load_tables

_DIMS = 64


@register(
    "label_centroids",
    oracle="""
SELECT label, i AS dim,
       round(cast(sum(cast(cast(x AS double) AS decimal(20,12))) AS double)
             / count(*), 6) AS centroid,
       count(*) AS n_vectors
FROM (SELECT label, generate_subscripts(embedding, 1) - 1 AS i,
             unnest(embedding) AS x
      FROM embeddings)
GROUP BY label, i
ORDER BY label, i""",
    tags=("similarity", "array"),
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids (element-wise mean over array<float>): the
    training step of the IVF coarse quantizer used by ann_ivf_topk.

    Implementation: posexplode -> (label, dim) aggregate — one shuffle of
    N*dims skinny rows. At 100 TB this is the textbook mapreduce for
    centroids; exact-decimal sums keep it oracle-checkable. (float32 -> double
    is exact, so casting the element is enough.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("dim", "x"))
    return (
        ex.groupBy("label", F.col("dim").alias("dim"))
        .agg(F.round(
                F.sum(F.col("x").cast("double").cast("decimal(20,12)"))
                 .cast("double") / F.count(F.lit(1)), 6).alias("centroid"),
             F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("label", "dim")
        .select("label", "dim", "centroid", "n_vectors")
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
SELECT l_returnflag, 'quantity' AS measure,
       cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS total
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT l_returnflag, 'extendedprice' AS measure,
       cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS total
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT l_returnflag, 'discount' AS measure,
       cast(sum(cast(l_discount AS decimal(18,2))) AS double) AS total
FROM lineitem GROUP BY l_returnflag
ORDER BY l_returnflag, measure""",
    tags=("grouping", "unpivot"),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide measures -> long form) via stack(): one scan, the
    aggregate happens after the reshape so each measure is a group."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    long = li.select(
        "l_returnflag",
        F.expr("stack(3, 'quantity', l_quantity, "
               "'extendedprice', l_extendedprice, "
               "'discount', l_discount) AS (measure, v)"),
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("total"))
        .orderBy("l_returnflag", "measure")
    )


@register(
    "winnow_fingerprints",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
grams AS (SELECT doc_id, i,
                 {md5_mod_duck("ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]")} AS h
          FROM w, unnest(range(greatest(len(ws) - 2, 0))) r(i)),
win AS (SELECT doc_id, i,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
               max(i) OVER (PARTITION BY doc_id) AS max_i
        FROM grams)
SELECT doc_id, count(DISTINCT wmin) AS n_fingerprints,
       cast(min(wmin) AS bigint) AS min_fp, cast(max(wmin) AS bigint) AS max_fp
FROM win WHERE i + 3 <= max_i
GROUP BY doc_id
ORDER BY doc_id""",
    tags=("dedup", "text"),
)
def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD 2003) document fingerprints:
    hash every trigram, slide a window of 4 positions, keep each window's
    minimum — the selected hashes are robust local fingerprints. Reported
    per-doc as count/min/max of distinct fingerprints.

    All window work is per-doc (partitioned), hashes are the cross-engine
    md5 u64 — no global state, embarrassingly parallel. Spread: the per-gram
    md5 is the CPU-heavy step (see tables.load_table_spread)."""
    from ..tables import load_table_spread
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    from pyspark.sql import Window as W

    grams = (
        d.select("doc_id", F.split("text", " ").alias("ws"))
        .select("doc_id", F.expr(
            "case when size(ws) >= 3 then "
            "transform(sequence(0, size(ws) - 3), i -> "
            "concat_ws(' ', ws[i], ws[i + 1], ws[i + 2])) "
            "else array() end").alias("tgs"))
        # posexplode_outer: the non-outer Generate makes Catalyst infer
        # size(tgs)>0 AND isnotnull(tgs) and push it to the SCAN, where it
        # re-evaluates the whole trigram transform twice per row on the
        # pre-spread (single-split) side. The outer variant infers nothing;
        # the null rows it adds are filtered AFTER the explode for pennies.
        .select("doc_id", F.posexplode_outer("tgs").alias("i", "tg"))
        .filter(F.col("tg").isNotNull())
        .select("doc_id", "i", F.expr(md5_mod_spark("tg")).alias("h"))
    )
    wf = (W.partitionBy("doc_id").orderBy("i").rowsBetween(0, 3))
    wp = W.partitionBy("doc_id")
    win = grams.select(
        "doc_id", "i",
        F.min("h").over(wf).alias("wmin"),
        F.max("i").over(wp).alias("max_i"),
    )
    return (
        win.filter(F.col("i") + 3 <= F.col("max_i"))
        .groupBy("doc_id")
        .agg(F.countDistinct("wmin").alias("n_fingerprints"),
             F.min("wmin").alias("min_fp"),
             F.max("wmin").alias("max_fp"))
        .orderBy("doc_id")
    )


@register(
    "embedding_quantization_audit",
    oracle="""
WITH q AS (
  SELECT label,
         (SELECT max(abs(cast(x AS double)
                 - (mn + round((cast(x AS double) - mn) / s) * s)))
          FROM unnest(embedding) AS t(x)) AS max_err
  FROM (SELECT label, embedding,
               cast(list_min(embedding) AS double) AS mn,
               (cast(list_max(embedding) AS double)
                - cast(list_min(embedding) AS double)) / 255.0 AS s
        FROM embeddings)
  WHERE s > 0),
n AS (SELECT label, cast(floor(max_err * 1e9) AS bigint) AS err_ns FROM q)
SELECT label, count(*) AS n_vectors,
       round(sum(err_ns) * 1.0 / count(*) / 1e9, 6) AS avg_max_abs_err,
       max(err_ns) AS worst_err_ns
FROM n GROUP BY label ORDER BY label""",
    tags=("similarity", "array", "quantization"),
)
def embedding_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 (256-level) per-vector min/max quantization error audit — the
    check a pipeline runs before shipping compressed embeddings: quantize
    each float32 to round((x-min)/scale), dequantize, and report the worst
    absolute reconstruction error per vector, aggregated per label.

    Determinism: float32 widens to double exactly; quantize/dequantize are
    identical IEEE expressions in both engines; the per-vector max is
    order-free; and cross-vector aggregation happens on floor-scaled
    integer nanounits (exact sums, order-independent), with the single
    quotient rounded at 6 dp. Plan: one scan, all per-vector work in
    whole-stage-codegen higher-order functions (no explode — the array
    never leaves its row), one small aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    mn = F.array_min("embedding").cast("double")
    mx = F.array_max("embedding").cast("double")
    base = (emb.select("label", "embedding", mn.alias("mn"),
                       ((mx - mn) / F.lit(255.0)).alias("s"))
            .filter(F.col("s") > 0))
    err = F.transform(
        "embedding",
        lambda x: F.abs(x.cast("double")
                        - (F.col("mn")
                           + F.round((x.cast("double") - F.col("mn"))
                                     / F.col("s"), 0) * F.col("s"))))
    per_vec = base.select(
        "label",
        F.floor(F.array_max(err) * F.lit(1e9)).cast("bigint").alias("err_ns"))
    return (per_vec.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vectors"),
                 F.round(F.sum("err_ns") / F.count(F.lit(1)) / F.lit(1e9), 6)
                  .alias("avg_max_abs_err"),
                 F.max("err_ns").alias("worst_err_ns"))
            .orderBy("label"))
