"""PySpark-native CDC pipeline + analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference (`syhxz/flink-cdc-dsql-master`, an Apache Flink CDC fork with an
Aurora DSQL sink), re-expressed idiomatically on Spark DataFrames, Spark
SQL/Catalyst and Structured Streaming — plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) designed
for 100 TB scale.

Layout
------
- ``types``        reference type lattice ↔ Spark types
- ``schema``       TableId, Schema wrapper, versioned SchemaManager
- ``events``       change-event model (op codes, changelog DataFrame shape)
- ``merging``      least-common-type widening + schema merge (fan-in routes)
- ``functions``    compat scalar functions (exact reference semantics)
- ``exprs``        reference SQL dialect → Spark SQL rewrite
- ``transform``    projection/filter transform rules (pre/post transform)
- ``route``        TableIdRouter (fan-in / fan-out)
- ``partitioning`` PK-hash partitioning + last-write-wins dedup
- ``evolve``       runtime schema evolution behaviors
- ``pipeline``     YAML → PipelineDef
- ``compose``      PipelineDef → batch/streaming execution
- ``sources``      chunked JDBC snapshot, debezium/canal decode, handoff
- ``connectors``   MySQL/Postgres pipeline-source option surfaces + plans
- ``sinks``        JDBC upsert, kafka JSON envelopes, parquet-merge
- ``udf``          user-defined-function registry (reference lifecycle)
- ``testing``      values-style scripted event fixtures + collect sink
- ``operators``    dedup / similarity / text-analysis / multimodal
- ``streaming``    stateful streaming ops (applyInPandasWithState)
- ``plans``        physical-plan scale linter (lint_plan/explain_scale)
- ``queries``      registered conformance queries + DuckDB oracle SQL
"""

__version__ = "0.1.0"
