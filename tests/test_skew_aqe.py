"""AQE skew-join evidence (VERDICT r4 next-round #3, skew half).

SCALE.md claims Zipfian keys in the CDC/join paths are handled by AQE's
runtime skew splitting rather than manual salting. This test *proves the
mechanism engages*: a Zipf-distributed key column (one key owning ~70% of
a 400k-row fact side) is joined through the same shuffle shape as
`join_interval_attribution` / the post-LWW sink join, with the skew
thresholds scaled down to sandbox data sizes (at 100 TB the defaults --
256 MB / factor 5 -- play the same role). The assertion reads the
*executed* adaptive plan and requires the `skew=true` marker plus a
result identical to ground truth computed in plain Python.
"""

import pytest
from pyspark.sql import functions as F

N = 400_000
HOT = int(N * 0.7)
KEYS = 10_000

SKEW_CONFS = {
    # scaled-down triggers: the sandbox's hot partition is ~MBs, not GBs
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
    # force the shuffled-join path the skew handler applies to
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_spark(spark):
    old = {}
    for k in SKEW_CONFS:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _key(i: int) -> int:
    return 0 if i < HOT else i % KEYS


def _zipf_fact(spark):
    """key 0 owns 70% of all rows; the rest spread over 10k keys."""
    return spark.range(N).select(
        F.when(F.col("id") < HOT, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(KEYS))).alias("k"),
        (F.col("id") % 1000).alias("v"),
    )


def test_aqe_splits_zipf_hot_key(skew_spark):
    dim = skew_spark.range(KEYS).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("grp"))
    joined = _zipf_fact(skew_spark).join(dim, "k").groupBy("grp").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"))
    rows = {r["grp"]: (r["n"], r["sv"]) for r in joined.collect()}

    executed = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in executed, (
        "AQE skew splitting did not engage on the Zipf hot key:\n"
        + executed[:2000])

    # the split must not change results: full ground truth in Python
    want: dict[int, list[int]] = {}
    for i in range(N):
        g = _key(i) % 50
        acc = want.setdefault(g, [0, 0])
        acc[0] += 1
        acc[1] += i % 1000
    assert rows == {g: tuple(acc) for g, acc in want.items()}


def test_lww_result_stable_under_skew_confs(skew_spark):
    """last_write_wins on a Zipf PK: the window exchange itself is not
    skew-split by AQE (OSS splits joins only -- the hot-key risk lives in
    the downstream sink join, proven above), but the LWW result must be
    identical under the skew confs."""
    from flink_cdc_dsql_master_spark.partitioning import last_write_wins

    n, hot, keys = 50_000, 35_000, 500
    log = skew_spark.range(n).select(
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(keys))).alias("pk"),
        F.col("id").alias("__seq"),
        F.lit("+I").alias("__op"),
        (F.col("id") % 97).alias("val"),
    )
    out = last_write_wins(log, ["pk"], seq_col="__seq")
    got = {r["pk"]: (r["__seq"], r["val"]) for r in out.collect()}
    best: dict[int, int] = {}
    for i in range(n):
        pk = 0 if i < hot else i % keys
        best[pk] = max(best.get(pk, -1), i)
    assert got == {pk: (s, s % 97) for pk, s in best.items()}
