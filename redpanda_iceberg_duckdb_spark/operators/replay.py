"""Batch replay of the streaming ingest contract (SURVEY.md section 2.9 St5):
the schema-enforcement + dead-letter split that streaming/ingest.py applies
to every micro-batch, exercised as a driver-checkable registered query.

The streaming path itself cannot meet the driver's DuckDB oracle (no Kafka
broker, and readStream output isn't a deterministic DataFrame expression),
but the TRANSFORM is identical batch vs streaming — from_json decode, then
``validate_stream``'s required-field split (streaming/ingest.py:41-51). This
query replays it over a deterministic corrupted-JSON corpus derived from the
events table, so the split semantics hold a driver-green CORRECTNESS row
instead of only a pytest one.

Corruption plan (synthetic but fully deterministic, replicated verbatim in
the oracle):

- ``event_id % 11 == 0``  -> JSON truncated to 10 chars (malformed payload;
  the broker-garbage class)
- ``event_id % 7 == 0``   -> valid JSON missing the required ``user_id``
  field (the schema-drift class); ``% 77`` rows are claimed by the
  malformed branch first — precedence is part of the contract
- otherwise               -> well-formed full payload

Reference parity: the reference rejects schema-mismatched records at the
broker via the registry (/root/reference/validation/e2e.sh:67-105); this is
the dead-letter re-expression of that gate.

Scale stance: one scan builds the payloads, from_json decodes JVM-side, and
the good/bad split is two filters over the same decoded projection — no
shuffle until the final 3-row aggregate. At 100 TB the identical transform
runs inside the streaming micro-batch (ingest_kafka_shaped); nothing here
is driver-resident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..streaming.ingest import validate_stream
from ..tables import load_table

_REQUIRED = ["event_id", "user_id", "event_type"]

_ORACLE = """
WITH base AS (
  SELECT event_id, user_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
js AS (
  SELECT event_id,
    CASE
      WHEN event_id % 11 = 0 THEN substring(cast(to_json(struct_pack(
        event_id := event_id, user_id := user_id,
        event_type := event_type)) AS varchar), 1, 10)
      WHEN event_id % 7 = 0 THEN cast(to_json(struct_pack(
        event_id := event_id, event_type := event_type)) AS varchar)
      ELSE cast(to_json(struct_pack(
        event_id := event_id, user_id := user_id,
        event_type := event_type)) AS varchar)
    END AS raw
  FROM base),
parsed AS (
  SELECT
    CASE WHEN json_valid(raw)
         THEN try_cast(json_extract_string(raw, '$.event_id') AS bigint)
    END AS p_event_id,
    CASE WHEN json_valid(raw)
         THEN try_cast(json_extract_string(raw, '$.user_id') AS bigint)
    END AS p_user_id,
    CASE WHEN json_valid(raw)
         THEN json_extract_string(raw, '$.event_type')
    END AS p_event_type
  FROM js),
cls AS (
  SELECT
    CASE
      WHEN p_event_id IS NOT NULL AND p_user_id IS NOT NULL
           AND p_event_type IS NOT NULL THEN 'good'
      WHEN p_event_id IS NULL THEN 'dead_letter_malformed'
      ELSE 'dead_letter_missing_field'
    END AS status,
    p_event_type
  FROM parsed)
SELECT status, count(*) AS n,
       count(DISTINCT p_event_type) AS n_types
FROM cls GROUP BY status ORDER BY status"""

_SCHEMA = "event_id bigint, user_id bigint, event_type string"


@register(
    "streaming_validate_replay",
    oracle=_ORACLE,
    tags=("streaming", "validation", "dead_letter"),
)
def streaming_validate_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """St5 dead-letter split, replayed as a batch over synthetic corruption
    so the driver's cross-engine gate can check it (module docstring has the
    corruption plan). The split itself IS streaming/ingest.validate_stream —
    not a reimplementation — so the green row certifies the code the
    micro-batch path runs."""
    e = load_table(spark, sf_dir, "events")
    base = (e.select("event_id", "user_id", "event_type")
            .filter(F.col("user_id").isNotNull()
                    & F.col("event_type").isNotNull()))
    full = F.to_json(F.struct("event_id", "user_id", "event_type"))
    raw = (base.select(
        F.when(F.pmod("event_id", 11) == 0, F.substring(full, 1, 10))
         .when(F.pmod("event_id", 7) == 0,
               F.to_json(F.struct("event_id", "event_type")))
         .otherwise(full).alias("raw")))
    parsed = raw.select(F.from_json("raw", _SCHEMA).alias("r")).select("r.*")
    good, bad = validate_stream(parsed, _REQUIRED)
    tagged = (good.select(F.lit("good").alias("status"), "event_type")
              .unionAll(bad.select(
                  F.when(F.col("event_id").isNull(),
                         F.lit("dead_letter_malformed"))
                   .otherwise(F.lit("dead_letter_missing_field"))
                   .alias("status"),
                  "event_type")))
    return (tagged.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("event_type").alias("n_types"))
            .orderBy("status"))


# --- Kafka wire-codec replay (S1/S2/S7, F2/F3 made driver-visible) --------

_WIRE_ORACLE = f"""
WITH wire AS (
  SELECT cast(o_orderkey AS varchar) AS k,
         to_json(struct_pack(
             o_orderkey := o_orderkey, o_custkey := o_custkey,
             o_orderstatus := o_orderstatus,
             o_orderpriority := o_orderpriority)) AS v,
         o_orderstatus, o_custkey
  FROM orders)
SELECT o_orderstatus AS status,
       count(*) AS n_msgs,
       cast(sum(o_custkey) AS bigint) AS sum_custkey,
       cast(sum(length(k)) AS bigint) AS sum_key_bytes,
       cast(sum(length(v)) AS bigint) AS sum_value_bytes,
       bit_xor({{h}}) AS wire_checksum
FROM wire GROUP BY o_orderstatus ORDER BY o_orderstatus"""


def _wire_oracle() -> str:
    from ..functions.hashing import md5_mod_duck
    return _WIRE_ORACLE.format(h=md5_mod_duck("v"))


@register(
    "kafka_wire_replay",
    oracle=_wire_oracle(),
    tags=("kafka", "wire", "replay"),
)
def kafka_wire_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kafka producer/consumer wire codec (sources/kafka.py
    encode_keyed_json -> decode_json_values, the S1/S2/S7 surface) run as
    a batch replay with a driver oracle: orders rows are encoded to the
    exact keyed-JSON wire shape the reference's producer emits
    (/root/reference/redpanda/producer.py:98-100 semantics), decoded back
    through the real consumer transform, and summarized per order status —
    message counts, decoded-field sums (proves decode returns the original
    values), wire byte totals, and an order-independent XOR checksum over
    the raw value JSON (proves the serialized bytes themselves, not just
    the round trip: DuckDB reconstructs the identical compact JSON). Only
    int/string fields ride the wire here — float JSON formatting is
    engine-specific, and the streaming ingest path (ingest.py) declares
    its schemas the same way. One scan, codec map-side, one aggregate."""
    from pyspark.sql import types as T

    from ..functions.hashing import md5_mod_spark
    from ..sources.kafka import decode_json_values, encode_keyed_json

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    wire = encode_keyed_json(o, "o_orderkey")
    schema = T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_orderpriority", T.StringType()),
    ])
    parsed = decode_json_values(wire, schema)
    stats = parsed.select(
        F.col("data.o_orderstatus").alias("status"),
        F.col("data.o_custkey").alias("ck"),
        F.length("_key").alias("key_bytes"),
        F.length("_raw").alias("value_bytes"),
        F.expr(md5_mod_spark("_raw")).alias("h"))
    return (stats.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n_msgs"),
                 F.sum("ck").cast("bigint").alias("sum_custkey"),
                 F.sum("key_bytes").cast("bigint").alias("sum_key_bytes"),
                 F.sum("value_bytes").cast("bigint").alias("sum_value_bytes"),
                 F.expr("bit_xor(h)").alias("wire_checksum"))
            .orderBy("status"))


# --- Keyed-produce order preservation (St6 made driver-visible) -----------

def _keyed_order_oracle() -> str:
    from ..functions.hashing import md5_mod_duck
    h = md5_mod_duck("k || ':' || cast(seq AS varchar)")
    return f"""
WITH seqd AS (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderkey) AS seq
  FROM orders),
wire AS (
  SELECT cast(o_custkey AS varchar) AS k,
         to_json(struct_pack(o_custkey := o_custkey,
                             o_orderkey := o_orderkey,
                             seq := seq)) AS v
  FROM seqd),
decoded AS (
  SELECT k,
         try_cast(json_extract_string(v, '$.o_custkey') AS bigint) AS ck,
         try_cast(json_extract_string(v, '$.o_orderkey') AS bigint) AS ok,
         try_cast(json_extract_string(v, '$.seq') AS integer) AS seq
  FROM wire),
checked AS (
  SELECT k, ck, seq,
         row_number() OVER (PARTITION BY k ORDER BY ok) AS rn,
         {h} AS h
  FROM decoded)
SELECT ck % 8 AS key_bucket,
       cast(count(DISTINCT ck) AS bigint) AS n_keys,
       cast(count(*) AS bigint) AS n_msgs,
       cast(sum(CASE WHEN seq <> rn THEN 1 ELSE 0 END) AS bigint)
         AS order_violations,
       cast(sum(seq) AS bigint) AS seq_checksum,
       bit_xor(h) AS wire_checksum
FROM checked GROUP BY ck % 8 ORDER BY key_bucket"""


@register(
    "kafka_keyed_order_replay",
    oracle=_keyed_order_oracle(),
    tags=("kafka", "wire", "replay", "ordering"),
)
def kafka_keyed_order_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """St6 keyed-produce order preservation, driver-visible (round-8
    verdict item 5): each order is produced keyed by customer with the
    per-key sequence number the producer assigns (row_number over produce
    order = orderkey within custkey), rides the REAL wire codec
    (sources/kafka.py encode_keyed_json -> decode_json_values — the same
    functions the streaming sink uses), and the consumer side re-derives
    each key's arrival rank from the broker-offset surrogate (orderkey)
    and checks seq == rank per message. `order_violations` must be 0 in
    every bucket — Kafka's per-key ordering contract is exactly "the
    consumer's per-key rank sequence equals the producer's" — and the
    wire checksum over (key, seq) proves the sequence numbers themselves
    rode the wire, not a recomputation. Per-key windows shard by key;
    one codec map + two window ranks + one aggregate."""
    from ..functions.hashing import md5_mod_spark
    from ..sources.kafka import decode_json_values, encode_keyed_json
    from pyspark.sql import Window as W, types as T

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    seqd = o.withColumn("seq", F.row_number().over(
        W.partitionBy("o_custkey").orderBy("o_orderkey")))
    wire = encode_keyed_json(seqd, "o_custkey")
    schema = T.StructType([
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("seq", T.IntegerType()),
    ])
    decoded = decode_json_values(wire, schema)
    checked = (decoded.select(
        F.col("_key").alias("k"),
        F.col("data.o_custkey").alias("ck"),
        F.col("data.o_orderkey").alias("ok"),
        F.col("data.seq").alias("seq"))
        .withColumn("rn", F.row_number().over(
            W.partitionBy("k").orderBy("ok")))
        .withColumn("h", F.expr(md5_mod_spark(
            "concat(k, ':', cast(seq as string))"))))
    return (checked.groupBy(F.pmod("ck", F.lit(8)).alias("key_bucket"))
            .agg(F.countDistinct("ck").alias("n_keys"),
                 F.count(F.lit(1)).alias("n_msgs"),
                 F.sum(F.when(F.col("seq") != F.col("rn"), 1).otherwise(0))
                 .cast("bigint").alias("order_violations"),
                 F.sum("seq").cast("bigint").alias("seq_checksum"),
                 F.expr("bit_xor(h)").alias("wire_checksum"))
            .orderBy("key_bucket"))
