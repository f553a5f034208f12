"""Round-15 Spark 4 SQL-surface operators: pipe syntax (SQL |>
operators, Spark 4.0+), collation-aware grouping (UTF8_LCASE), and the
built-in session_window aggregation in BATCH mode.

Why these: they complete the Spark-4 API tour the engine already covers
(VARIANT, Python DataSources, transformWithState, LATERAL, UDTF) with
the three remaining user-visible SQL features a migrating user would
reach for. Each is oracled in plain ANSI SQL — the point is that the
NEW surface computes the SAME answer as the classical formulation
(pipe = nested query, collation = lower()-normalized grouping,
session_window = gaps-and-islands).

Exactness: counts are bigints; money sums ride DECIMAL(18,2) and cast
to double once at the end (scalar.py convention); session durations are
exact integer microsecond differences.

Scale stance (100 TB): all three are single groupBy shuffles on their
keys — the pipe query is byte-identical to its Catalyst plan without
pipes; collated grouping hashes the collation key exactly like any
group key; session_window is Spark's native gap-sessionization operator
(the same state machine streaming uses, here in batch where it
partitions by user and never global-sorts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_PIPE_ORACLE = """
SELECT cast(year(o_orderdate) AS int) AS yr,
       o_orderpriority AS priority,
       count(*) AS n_orders,
       cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS revenue
FROM orders
WHERE o_orderstatus <> 'P'
GROUP BY yr, priority
ORDER BY yr, priority"""


@register(
    "pipe_syntax_orders",
    oracle=_PIPE_ORACLE,
    tags=("sql", "spark4", "pipe-syntax"),
)
def pipe_syntax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly revenue by order priority written in Spark 4 SQL pipe
    syntax (FROM ... |> WHERE ... |> EXTEND ... |> AGGREGATE): the pipe
    chain must lower to the exact plan (and values) of the classical
    GROUP BY formulation the oracle uses."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "pipe15_orders")
    return spark.sql("""
        FROM pipe15_orders
        |> WHERE o_orderstatus <> 'P'
        |> EXTEND cast(year(o_orderdate) AS int) AS yr
        |> AGGREGATE count(*) AS n_orders,
                     cast(sum(cast(o_totalprice AS decimal(18,2)))
                          AS double) AS revenue
           GROUP BY yr, o_orderpriority
        |> SELECT yr, o_orderpriority AS priority, n_orders, revenue
        |> ORDER BY yr, priority""")


# Deliberately case-diverse token: TPC-H text is uniformly lowercase, so
# the demo re-cases the first word of p_name by partkey residue — the
# collation must merge all three casings back into one group.
_CASE_SQL = """CASE WHEN p_partkey % 3 = 0 THEN upper(tok)
     WHEN p_partkey % 3 = 1
       THEN upper(substr(tok, 1, 1)) || substr(tok, 2)
     ELSE tok END"""

_COLLATE_ORACLE = f"""
WITH t AS (SELECT p_partkey, split_part(p_name, ' ', 1) AS tok
           FROM part),
c AS (SELECT p_partkey, {_CASE_SQL} AS ctok FROM t)
SELECT lower(ctok) AS token, count(*) AS n,
       count(DISTINCT ctok) AS n_casings
FROM c GROUP BY token ORDER BY token"""


@register(
    "collation_lcase_groups",
    oracle=_COLLATE_ORACLE,
    tags=("sql", "spark4", "collation"),
)
def collation_lcase_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group case-mangled part-name tokens under the UTF8_LCASE
    collation: Spark's collation-aware hash grouping must produce
    exactly the lower()-normalized groups of the oracle, including the
    per-group distinct-casing count (collated DISTINCT would merge
    casings; the audit counts them binarily on purpose)."""
    p = load_table(spark, sf_dir, "part")
    c = (p.select("p_partkey",
                  F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
                  .alias("tok"))
         .select("p_partkey", F.expr(_CASE_SQL).alias("ctok")))
    return (c.groupBy(F.collate(F.col("ctok"), "UTF8_LCASE").alias("k"))
            .agg(F.count(F.lit(1)).alias("n"),
                 # distinct over the BINARY casing inside collated groups
                 F.count_distinct(F.collate(F.col("ctok"), "UTF8_BINARY"))
                 .alias("n_casings"))
            .select(F.lower(F.collate(F.col("k"), "UTF8_BINARY"))
                    .alias("token"), "n", "n_casings")
            .orderBy("token"))


_GAP_MIN = 30

_SESSION_ORACLE = f"""
WITH o AS (SELECT user_id, epoch_us(ts) AS us,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS prev_us
           FROM events),
m AS (SELECT user_id, us,
             CASE WHEN prev_us IS NULL
                  OR us - prev_us > {_GAP_MIN * 60 * 1_000_000}
                  THEN 1 ELSE 0 END AS is_start
      FROM o),
s AS (SELECT user_id, us,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY us
                                 ROWS UNBOUNDED PRECEDING) AS sess
      FROM m),
g AS (SELECT user_id, sess, count(*) AS n_events,
             max(us) - min(us) AS dur_us
      FROM s GROUP BY user_id, sess)
SELECT cast(count(*) AS bigint) AS n_sessions,
       cast(count(*) FILTER (WHERE n_events = 1) AS bigint) AS singletons,
       cast(max(n_events) AS bigint) AS max_events,
       cast(sum(dur_us) AS bigint) AS total_duration_us
FROM g"""


@register(
    "session_window_builtin",
    oracle=_SESSION_ORACLE,
    tags=("sql", "spark4", "session-window"),
)
def session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via Spark's BUILT-IN session_window
    aggregation (30-minute gap, batch mode) — the operator form of the
    gaps-and-islands SQL the oracle (and the engine's own sessionization
    query) uses. Probed merge semantics: events exactly gap-apart MERGE,
    so the oracle's new-session condition is strictly > gap, in exact
    microseconds. The final rollup is a 1-row summary, so comparison is
    independent of window-struct representation."""
    e = load_table(spark, sf_dir, "events")
    g = (e.groupBy("user_id",
                   F.session_window("ts", f"{_GAP_MIN} minutes"))
         .agg(F.count(F.lit(1)).alias("n_events"),
              (F.unix_micros(F.max("ts"))
               - F.unix_micros(F.min("ts"))).alias("dur_us")))
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long").alias("singletons"),
        F.max("n_events").cast("long").alias("max_events"),
        F.sum("dur_us").cast("long").alias("total_duration_us"))
