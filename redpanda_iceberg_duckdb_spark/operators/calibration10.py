"""Model-evaluation calibration metrics: expected calibration error
(ECE, Naeini et al. AAAI 2015 / Guo et al. ICML 2017) and Cohen's kappa
inter-annotator agreement (Cohen 1960) — the two checks an eval pipeline
runs before trusting a quality classifier or a labeling pass.

Exactness discipline: the fixture "model score" is p = (event_id mod 100
+ 0.5) / 100, so 200·p = 2k+1 is an INTEGER and every calibration
quantity reduces to integer arithmetic:

    conf_b  = sum_b(2k+1) / (200 n_b)
    acc_b   = pos_b / n_b
    |acc-conf| = |200·pos_b - sum_b| / (200 n_b)
    ECE = sum_b n_b/N · |acc_b-conf_b| = sum_b |200·pos_b - sum_b| / (200 N)

— one exact bigint numerator, ONE final double division. Same for kappa:
po and pe are ratios of exact confusion counts. No float accumulation
anywhere, so both engines agree bit-for-bit before the display rounding.

Scale stance: each metric is one map-side-combinable aggregate over one
scan (ECE adds a 10-row bin regroup); kappa's confusion matrix is four
conditional counters in a single aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_BINS = 10
_KAPPA_CHARS = 250  # labeler B: n_chars >= threshold


def _ece_oracle() -> str:
    return f"""
WITH scored AS (
  SELECT (event_id % 100) * 2 + 1 AS p200,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
binned AS (
  SELECT p200 // (200 // {_BINS}) AS bin,
         count(*) AS n, sum(y) AS pos, sum(p200) AS s200
  FROM scored GROUP BY 1),
tot AS (SELECT sum(n) AS nn FROM binned)
SELECT cast(bin AS bigint) AS bin, cast(n AS bigint) AS n,
       round(cast(s200 AS double) / (200 * n), 6) AS avg_conf,
       round(cast(pos AS double) / n, 6) AS frac_pos,
       round(cast(abs(200 * pos - s200) AS double) / (200 * n), 6)
         AS abs_gap,
       round(cast((SELECT sum(abs(200 * pos - s200)) FROM binned) AS double)
             / (200 * (SELECT nn FROM tot)), 6) AS ece
FROM binned ORDER BY bin"""


@register(
    "ece_calibration_bins",
    oracle=_ece_oracle(),
    tags=("evaluation", "calibration", "scale-pattern"),
)
def ece_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bin, n, avg_conf, frac_pos, abs_gap, ece): the 10-bin reliability
    table of the deterministic pseudo-score p = (event_id mod 100 + .5)/100
    against the purchase label, with the corpus ECE repeated per row —
    every quantity an exact integer ratio (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        (F.pmod("event_id", 100) * 2 + 1).alias("p200"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"))
    binned = (scored
              .groupBy(F.expr(f"p200 div {200 // _BINS}").cast("long")
                       .alias("bin"))
              .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"),
                   F.sum("p200").alias("s200")))
    tot = binned.agg(
        F.sum("n").alias("nn"),
        F.sum(F.abs(200 * F.col("pos") - F.col("s200"))).alias("gapsum"))
    return (binned.crossJoin(F.broadcast(tot))
            .select("bin", F.col("n").cast("long").alias("n"),
                    F.round(F.col("s200").cast("double")
                            / (200 * F.col("n")), 6).alias("avg_conf"),
                    F.round(F.col("pos").cast("double") / F.col("n"), 6)
                    .alias("frac_pos"),
                    F.round(F.abs(200 * F.col("pos") - F.col("s200"))
                            .cast("double") / (200 * F.col("n")), 6)
                    .alias("abs_gap"),
                    F.round(F.col("gapsum").cast("double")
                            / (200 * F.col("nn")), 6).alias("ece"))
            .orderBy("bin"))


def _kappa_oracle() -> str:
    return f"""
WITH lab AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
         CASE WHEN n_chars >= {_KAPPA_CHARS} THEN 1 ELSE 0 END AS b
  FROM documents),
cm AS (SELECT count(*) AS n, sum(a) AS na, sum(b) AS nb,
              sum(a * b) AS n11,
              sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree
       FROM lab)
SELECT cast(n AS bigint) AS n_docs,
       cast(na AS bigint) AS a_positive, cast(nb AS bigint) AS b_positive,
       cast(agree AS bigint) AS n_agree,
       round(cast(agree AS double) / n, 6) AS po,
       round((cast(na AS double) * nb + (n - na) * (n - nb))
             / (cast(n AS double) * n), 6) AS pe,
       round((cast(agree AS double) / n
              - (cast(na AS double) * nb + (n - na) * (n - nb))
                / (cast(n AS double) * n))
             / (1 - (cast(na AS double) * nb + (n - na) * (n - nb))
                    / (cast(n AS double) * n)), 6) AS kappa
FROM cm"""


@register(
    "cohens_kappa_labelers",
    oracle=_kappa_oracle(),
    tags=("evaluation", "agreement", "scale-pattern"),
)
def cohens_kappa_labelers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic document labelers (A:
    lang = 'en'; B: n_chars >= 250): chance-corrected agreement from ONE
    confusion-matrix aggregate — the qualification gate a labeling
    pipeline runs between annotator passes. po, pe, kappa are ratios of
    exact integer counts; one row out."""
    d = load_table(spark, sf_dir, "documents")
    lab = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("a"),
        F.when(F.col("n_chars") >= _KAPPA_CHARS, 1).otherwise(0).alias("b"))
    cm = lab.agg(F.count(F.lit(1)).alias("n"), F.sum("a").alias("na"),
                 F.sum("b").alias("nb"),
                 F.sum(F.col("a") * F.col("b")).alias("n11"),
                 F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
                 .alias("agree"))
    po = F.col("agree").cast("double") / F.col("n")
    pe = ((F.col("na").cast("double") * F.col("nb")
           + (F.col("n") - F.col("na")) * (F.col("n") - F.col("nb")))
          / (F.col("n").cast("double") * F.col("n")))
    return cm.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("na").cast("long").alias("a_positive"),
        F.col("nb").cast("long").alias("b_positive"),
        F.col("agree").cast("long").alias("n_agree"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"))


# ------------------------------------------- isotonic calibration (PAV)

def _iso_oracle() -> str:
    return f"""
WITH scored AS (
  SELECT (event_id % 100) * 2 + 1 AS p200,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
bins AS (
  SELECT p200 // (200 // {_BINS}) AS bin, count(*) AS n, sum(y) AS pos
  FROM scored GROUP BY 1),
pref AS (
  SELECT bin, n, pos,
         sum(pos) OVER (ORDER BY bin) AS cp,
         sum(n) OVER (ORDER BY bin) AS cn
  FROM bins),
segs AS (
  SELECT j.bin AS j, k.bin AS k,
         cast(k.cp - (j.cp - j.pos) AS double)
           / (k.cn - (j.cn - j.n)) AS avg
  FROM pref j JOIN pref k ON j.bin <= k.bin),
inner_min AS (
  SELECT i.bin AS bin, s.j, min(s.avg) AS m
  FROM pref i JOIN segs s ON s.j <= i.bin AND s.k >= i.bin
  GROUP BY 1, 2),
iso AS (SELECT bin, max(m) AS v FROM inner_min GROUP BY 1)
SELECT cast(b.bin AS bigint) AS bin, cast(b.n AS bigint) AS n,
       round(cast(b.pos AS double) / b.n, 6) AS frac_pos,
       round(iso.v, 6) AS iso_prob
FROM bins b JOIN iso ON iso.bin = b.bin ORDER BY bin"""


@register(
    "isotonic_calibration_bins",
    oracle=_iso_oracle(),
    tags=("evaluation", "calibration", "scale-pattern"),
)
def isotonic_calibration_bins(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """(bin, n, frac_pos, iso_prob): the isotonic (monotone-nondecreasing)
    calibration map over the reliability bins, via the PAV minimax
    identity — iso_i = max_{j<=i} min_{k>=i} mean(y over bins j..k) —
    which turns the sequential pool-adjacent-violators algorithm into a
    CLOSED FORM over segment prefix sums: no iteration, no driver loop,
    O(B^3) tiny-frame joins on the B=10 bin table. The heavy lift (the
    bin aggregate) is the only data pass; segment means are exact integer
    ratios, so both engines take identical branches in the min/max."""
    e = load_table(spark, sf_dir, "events")
    bins = (e.select(
                (F.pmod("event_id", 100) * 2 + 1).alias("p200"),
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                .alias("y"))
            .groupBy(F.expr(f"p200 div {200 // _BINS}").cast("long")
                     .alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")))
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    pref = (bins.withColumn("cp", F.sum("pos").over(w))
            .withColumn("cn", F.sum("n").over(w))
            .localCheckpoint(eager=False))   # B rows; reused three times
    j = pref.select(F.col("bin").alias("j"),
                    (F.col("cp") - F.col("pos")).alias("cpj"),
                    (F.col("cn") - F.col("n")).alias("cnj"))
    k = pref.select(F.col("bin").alias("k"), F.col("cp").alias("cpk"),
                    F.col("cn").alias("cnk"))
    segs = (j.join(k, F.col("j") <= F.col("k"))
            .select("j", "k",
                    ((F.col("cpk") - F.col("cpj")).cast("double")
                     / (F.col("cnk") - F.col("cnj"))).alias("avg")))
    i = pref.select(F.col("bin").alias("i"))
    inner = (i.join(segs, (F.col("j") <= F.col("i"))
                    & (F.col("k") >= F.col("i")))
             .groupBy("i", "j").agg(F.min("avg").alias("m")))
    iso = inner.groupBy("i").agg(F.max("m").alias("v"))
    return (bins.join(iso, bins.bin == iso.i)
            .select("bin", F.col("n").cast("long").alias("n"),
                    F.round(F.col("pos").cast("double") / F.col("n"), 6)
                    .alias("frac_pos"),
                    F.round("v", 6).alias("iso_prob"))
            .orderBy("bin"))
