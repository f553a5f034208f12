"""Driver-style oracle parity for every registered query that has an oracle,
at smoke scale (sf0.001) for all and correctness scale (sf0.01) for the
non-reference extended operators (reference ones are covered in
test_reference_queries.py)."""

from __future__ import annotations

import pytest

from redpanda_iceberg_duckdb_spark.registry import all_queries

from .oracle_harness import run_compare

EXTENDED = [n for n, q in all_queries().items()
            if q.oracle is not None and "reference" not in q.tags]


@pytest.mark.parametrize("name", EXTENDED)
def test_extended_oracle_smoke(spark, sf_smoke, name):
    run_compare(spark, all_queries()[name], sf_smoke)


@pytest.mark.oracle_sf2
@pytest.mark.parametrize("name", EXTENDED)
def test_extended_oracle_sf001(spark, sf_correct, name):
    run_compare(spark, all_queries()[name], sf_correct)


def test_histogram_quantile_error_bounded_by_bucket_width(spark, tmp_path):
    """The histogram estimate must land within one bucket width (5.0) of the
    true rank-interpolated quantile — the sketch's accuracy contract — on
    corpora with very different shapes (uniform, heavy-tailed, clustered)."""
    import numpy as np

    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    shapes = {
        "uniform": rng.uniform(0, 500, 4000),
        "heavy": np.minimum(rng.exponential(40, 4000), 499.9),
        "clustered": np.concatenate([rng.normal(50, 3, 2000),
                                     rng.normal(400, 8, 2000)]).clip(0, 499.9),
    }
    rows = []
    i = 0
    base = np.datetime64("2024-01-01T00:00:00")
    for etype, vals in shapes.items():
        for v in vals:
            rows.append((i, etype, float(v)))
            i += 1
    pdf = spark.createDataFrame(rows, "event_id long, event_type string, value double") \
        .withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp")) \
        .withColumn("user_id", F.col("event_id") % 100) \
        .withColumn("props", F.lit("{}"))
    out = tmp_path / "hq"
    out.mkdir()
    pdf.coalesce(1).write.parquet(str(out / "_tmp"))
    import glob, shutil
    shutil.copy(glob.glob(str(out / "_tmp" / "part-*.parquet"))[0],
                str(out / "events.parquet"))

    got = {(r.event_type, r.q): r.estimate for r in
           all_queries()["histogram_quantiles"].fn(spark, str(out)).collect()}
    assert len(got) == 6
    for etype, vals in shapes.items():
        for q in (0.5, 0.95):
            # the defensible contract: within one bucket width of the
            # ORDER-STATISTIC interval at the target rank. (Midpoint
            # interpolation like numpy's default can land far inside an
            # EMPTY gap between clusters; clamping to a populated bucket
            # is the histogram behaving correctly, not an error.)
            lo = float(np.quantile(vals, q, method="lower"))
            hi = float(np.quantile(vals, q, method="higher"))
            est = got[(etype, q)]
            assert lo - 5.0 - 1e-6 <= est <= hi + 5.0 + 1e-6, \
                (etype, q, est, lo, hi)
