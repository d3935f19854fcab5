"""CLI front end (cli.py): validate + batch run, the flink-cdc.sh twin."""

import duckdb

from flink_cdc_dsql_master_spark.cli import main

YAML = """
source:
  type: parquet
  path: "/root/testdata/sf0.001"
  table-list: ["tpch.public.region"]
sink:
  type: values
transform:
  - source-table: tpch.public.region
    projection: "r_regionkey AS rk, UPPER(r_name) AS region_name"
    filter: "r_regionkey >= 1"
route:
  - source-table: tpch.public.region
    sink-table: analytics.out.regions
pipeline:
  name: cli-test
"""


def _write_yaml(tmp_path, text=YAML):
    p = tmp_path / "pipeline.yaml"
    p.write_text(text)
    return str(p)


def test_validate_ok(tmp_path, capsys):
    rc = main(["validate", _write_yaml(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "pipeline: cli-test" in out
    assert "tpch.public.region -> analytics.out.regions" in out


def test_validate_rejects_garbage(tmp_path, capsys):
    p = tmp_path / "bad.yaml"
    p.write_text("source: {type: }")
    rc = main(["validate", str(p)])
    assert rc == 2
    assert "invalid pipeline definition" in capsys.readouterr().err


def test_validate_missing_file(tmp_path, capsys):
    rc = main(["validate", str(tmp_path / "nope.yaml")])
    assert rc == 2


def test_run_lands_parquet(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    rc = main(["run", _write_yaml(tmp_path), "--output-dir", out_dir])
    assert rc == 0
    assert "analytics.out.regions" in capsys.readouterr().out

    got = duckdb.connect().execute(
        f"SELECT rk, region_name FROM "
        f"read_parquet('{out_dir}/analytics.out.regions/*.parquet') "
        f"ORDER BY rk").fetchall()
    exp = duckdb.connect().execute(
        "SELECT r_regionkey, UPPER(r_name) FROM "
        "read_parquet('/root/testdata/sf0.001/region.parquet') "
        "WHERE r_regionkey >= 1 ORDER BY 1").fetchall()
    assert got == exp


def test_table_verbs_roundtrip(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
    from flink_cdc_dsql_master_spark.lakehouse import (
        merge_into_versioned_parquet, with_bucket_partition,
    )
    from flink_cdc_dsql_master_spark.schema import Schema

    b1 = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "k long, v double") \
        .withColumn(OP_COLUMN, F.lit("+I")) \
        .withColumn(SEQ_COLUMN, F.lit(1).cast("long"))
    schema = Schema.of(b1.drop("__op", "__seq").schema,
                       primary_keys=["k"])
    path = str(tmp_path / "t")
    merge_into_versioned_parquet(
        path, with_bucket_partition(b1, "k", 4), schema)

    assert main(["table", "versions", path]) == 0
    assert capsys.readouterr().out.strip() == "1"

    assert main(["table", "delete", path, "k >= 15", "--pk", "k"]) == 0
    out = capsys.readouterr().out
    assert "deleted=5" in out

    assert main(["table", "stats", path]) == 0
    out = capsys.readouterr().out
    assert "n_rows=15" in out and "minmax_exact=False" in out

    assert main(["table", "history", path]) == 0
    out = capsys.readouterr().out
    assert out.startswith("v2") and "v1" in out

    assert main(["table", "vacuum", path, "--keep-last", "1"]) == 0
    assert "expired=[1]" in capsys.readouterr().out


def test_lint_clean_and_unknown(spark, capsys):
    assert main(["lint", "timeseries_ohlc_bars",
                 "--sf-dir", "/root/testdata/sf0.001"]) == 0
    assert "plan clean" in capsys.readouterr().out
    assert main(["lint", "no_such_query"]) == 2


def test_run_streaming_honors_paimon_sink(spark, tmp_path, capsys):
    """`run --streaming` dispatches the YAML sink type (previously the
    declared sink was ignored and everything landed as parquet-merge):
    a paimon sink commits per-batch append snapshots readable through
    the strict layout walk."""
    import json as _json

    from flink_cdc_dsql_master_spark.cli import main
    from flink_cdc_dsql_master_spark.paimon_export import read_paimon

    src = tmp_path / "topic"
    src.mkdir()
    with open(src / "b1.jsonl", "w") as f:
        for i in range(1, 6):
            env = {"before": None, "after": {"id": i, "v": f"n{i}"},
                   "op": "c"}
            f.write(_json.dumps({"value": _json.dumps(env),
                                 "offset": i}) + "\n")

    wh = tmp_path / "wh"
    yml = tmp_path / "p.yaml"
    yml.write_text(f"""
source:
  type: file-debezium
  path: "{src}"
  schema: "id int, v string"
  table: db.s.t
  primary-keys: [id]
sink:
  type: paimon
  path: "{wh}"
route:
  - source-table: db.s.t
    sink-table: wh.db.logs
pipeline:
  name: stream-to-paimon
""")
    rc = main(["run", str(yml), "--streaming",
               "--output-dir", str(tmp_path / "out"),
               "--checkpoint", str(tmp_path / "ckpt")])
    assert rc == 0
    got = read_paimon(spark, str(wh / "logs"))
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3, 4, 5]


def test_run_streaming_paimon_dynamic_changelog_and_metrics(
        spark, tmp_path, capsys):
    """CLI streaming dispatch of the round-13 PK sink options:
    `buckets: -1` (dynamic hash-index assignment), `changelog-producer:
    input`, and `--metrics-json` dumping the run's registry (readable
    back through the `report` subcommand)."""
    import json as _json
    import os

    from flink_cdc_dsql_master_spark.cli import main
    from flink_cdc_dsql_master_spark.paimon_pk import (
        read_paimon_pk, read_paimon_pk_changelog)

    src = tmp_path / "topic"
    src.mkdir()
    with open(src / "b1.jsonl", "w") as f:
        for i in range(1, 7):
            env = {"before": None, "after": {"id": i, "v": f"n{i}"},
                   "op": "c"}
            f.write(_json.dumps({"value": _json.dumps(env),
                                 "offset": i}) + "\n")

    wh = tmp_path / "wh"
    yml = tmp_path / "p.yaml"
    yml.write_text(f"""
source:
  type: file-debezium
  path: "{src}"
  schema: "id int, v string"
  table: db.s.t
  primary-keys: [id]
sink:
  type: paimon
  path: "{wh}"
  buckets: -1
  dynamic-bucket.target-row-num: 3
  changelog-producer: input
route:
  - source-table: db.s.t
    sink-table: wh.db.logs
pipeline:
  name: stream-dyn-clp
""")
    mjson = tmp_path / "metrics.json"
    rc = main(["run", str(yml), "--streaming",
               "--output-dir", str(tmp_path / "out"),
               "--checkpoint", str(tmp_path / "ckpt"),
               "--metrics-json", str(mjson)])
    assert rc == 0
    dest = str(wh / "logs")

    # dynamic table created with the options threaded through
    sj = _json.load(open(os.path.join(dest, "schema", "schema-0")))
    assert sj["options"]["bucket"] == "-1"
    assert sj["options"]["dynamic-bucket.target-row-num"] == "3"
    assert sj["options"]["changelog-producer"] == "input"
    # 6 keys / target 3 → 2 buckets; all rows readable
    got = sorted(r["id"] for r in read_paimon_pk(spark, dest).collect())
    assert got == [1, 2, 3, 4, 5, 6]
    assert os.path.isdir(os.path.join(dest, "bucket-1"))
    cl = read_paimon_pk_changelog(spark, dest)
    assert cl.count() == 6

    # metrics dumped + renderable
    snap = _json.loads(mjson.read_text())
    assert snap["registry"] == "stream-dyn-clp"
    lat = [k for k in snap["timers"]
           if k.startswith("cdc.processing.latency")]
    assert lat, snap["timers"].keys()
    capsys.readouterr()
    assert main(["report", str(mjson)]) == 0
    assert "cdc.processing.latency" in capsys.readouterr().out
