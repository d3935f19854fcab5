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
