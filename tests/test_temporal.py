"""Semantics tests for the temporal operator family (as-of join, range
join, time-range window, hypertable rollup) plus the sampling/sketch
additions — edge cases the sf-fixture differential tests can't pin:
ties, empty matches, exact band boundaries, sketch error bounds.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from node_js_etl_processor_spark.catalog import load_table
from node_js_etl_processor_spark.operators import relational, temporal

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


def test_asof_join_ties_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(100)), (2, 10, _ts(50)), (3, 20, _ts(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(100), 1.0), (10, _ts(60), 2.0), (20, _ts(99), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r
        for r in temporal.asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts", value_cols=["value"]
        ).collect()
    }
    # tie: right_ts == left_ts is included (>= semantics)
    assert out[1]["asof_ts"] == _ts(100) and out[1]["asof_value"] == 1.0
    # latest prior, not just any prior
    assert out[2]["asof_ts"] is None or out[2]["asof_ts"] <= _ts(50)
    # user 10 at t=50 has no right row <= 50 → nulls (left-outer)
    assert out[2]["asof_ts"] is None and out[2]["asof_value"] is None
    # user 20's only right row is later than the left row → null
    assert out[3]["asof_ts"] is None


def test_range_join_band_boundaries(spark):
    # purchase at t=0; events at t=0 (self, excluded: strict >),
    # t=300s (included: inclusive upper bound), t=300.000001s (excluded)
    rows = [
        (0, _ts(0), 5, "purchase", 1.0, "{}"),
        (1, _ts(300), 5, "view", 2.0, "{}"),
        (2, _ts(300.000001), 5, "view", 4.0, "{}"),
        (3, _ts(0), 5, "view", 8.0, "{}"),  # same instant: excluded (strict >)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = temporal.q_range_join(events).collect()
    assert len(out) == 1
    assert out[0]["n_follow"] == 1
    assert out[0]["follow_value"] == 2.0


def test_window_range_trailing_hour(spark):
    rows = [
        (0, _ts(0), 1, "view", 1.0, "{}"),
        (1, _ts(3600), 1, "view", 2.0, "{}"),  # exactly 1h later: included
        (2, _ts(7201), 1, "view", 4.0, "{}"),  # >1h after event 1: only itself
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = {r["event_id"]: r for r in temporal.q_window_range(events).collect()}
    assert out[0]["n_1h"] == 1
    assert out[1]["n_1h"] == 2 and out[1]["sum_1h"] == 3.0
    assert out[2]["n_1h"] == 1 and out[2]["sum_1h"] == 4.0


def test_hypertable_rollup_grains_consistent(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = temporal.q_hypertable_rollup(events)
    day = out.filter(F.col("is_day_grain") == 1)
    hour = out.filter(F.col("is_day_grain") == 0)
    # hour-grain rows must sum to their day-grain parents
    re_rolled = (
        hour.groupBy("day_bucket", "event_type")
        .agg(F.sum("n_events").alias("n_events"))
        .collect()
    )
    day_map = {(r["day_bucket"], r["event_type"]): r["n_events"] for r in day.collect()}
    for r in re_rolled:
        assert day_map[(r["day_bucket"], r["event_type"])] == r["n_events"]


def test_approx_distinct_error_bound(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    exact = {
        r["o_orderpriority"]: r["n_customers"]
        for r in relational.q_distinct_agg(orders).collect()
    }
    approx = {
        r["o_orderpriority"]: r["approx_customers"]
        for r in relational.approx_distinct_sketch(orders).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, n, approx[k])
    # the declared validation form reports the bound check itself
    for r in relational.q_approx_distinct(orders).collect():
        assert r["customers_within_5pct"] and r["days_within_5pct"]


def test_sample_hash_deterministic_and_sized(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    a = sorted(r["o_orderkey"] for r in relational.q_sample_hash(orders).collect())
    b = sorted(
        r["o_orderkey"]
        for r in relational.q_sample_hash(orders.repartition(13)).collect()
    )
    assert a == b  # partition-layout independent
    n = orders.count()
    assert 0.05 * n < len(a) < 0.15 * n


def test_multimodal_features_deterministic(spark, sf_dir):
    from node_js_etl_processor_spark.operators.multimodal import q_multimodal_features

    docs = load_table(spark, sf_dir, "documents").limit(50)
    a = [tuple(r) for r in q_multimodal_features(docs).collect()]
    b = [tuple(r) for r in q_multimodal_features(docs).collect()]
    assert a == b
    assert all(r[3] == 8 for r in a)  # feature_dim


def test_connected_components_graph_shapes(spark):
    from node_js_etl_processor_spark.operators.dedup import connected_components

    # chain 1-2-3-4, star 10-(11,12,13), disjoint pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
        "doc_a long, doc_b long",
    )
    expect = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}
    # hybrid default (driver union-find finish for a small graph)
    comp = {r["doc_id"]: r["component_id"] for r in connected_components(edges).collect()}
    assert comp == expect
    # forced distributed large-star/small-star rounds: same answer
    comp_dist = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(edges, small_graph_threshold=0).collect()
    }
    assert comp_dist == expect


def test_connected_components_string_ids_both_paths(spark):
    # the driver union-find finish derives its schema from the input's
    # node type, so string doc ids behave identically on both paths
    from node_js_etl_processor_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "doc_a string, doc_b string"
    )
    expect = {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    comp = {r["doc_id"]: r["component_id"] for r in connected_components(edges).collect()}
    assert comp == expect
    comp_dist = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(edges, small_graph_threshold=0).collect()
    }
    assert comp_dist == expect


def test_dedup_clusters_cover_all_docs(spark, sf_dir):
    from node_js_etl_processor_spark.catalog import load_table
    from node_js_etl_processor_spark.operators.dedup import q_dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    clusters = q_dedup_clusters(docs)
    total = clusters.agg(F.sum("cluster_size")).first()[0]
    assert total == docs.count()  # partition: every doc in exactly one cluster
    assert clusters.filter(F.col("keeper_doc_id") != F.col("component_id")).count() == 0


def test_asof_join_right_tiebreak_deterministic(spark):
    """Multiple right rows sharing (key, ts): with right_tiebreak set,
    the winner is the tied row with the largest tiebreak value."""
    left = spark.createDataFrame(
        [(1, 10, _ts(100))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts(50), 7.0), (10, _ts(50), 3.0), (10, _ts(50), 5.0)],
        "user_id long, ts timestamp, value double",
    )
    out = temporal.asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"], right_tiebreak="value",
    ).collect()
    assert len(out) == 1 and out[0]["asof_value"] == 7.0

    import pytest

    with pytest.raises(ValueError, match="value_cols"):
        temporal.asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            value_cols=[], right_tiebreak="value",
        )


def test_connected_components_long_chain_and_nonconvergence_guard(spark):
    """A 60-node chain (diameter 59) must resolve to one component —
    star contraction needs O(log n) rounds where label propagation
    needed O(diameter). And exhausting max_iterations must raise, not
    return wrong labels."""
    from node_js_etl_processor_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 60)], "doc_a long, doc_b long"
    )
    comp = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(edges, small_graph_threshold=0).collect()
    }
    assert comp == {i: 1 for i in range(1, 61)}

    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=1, small_graph_threshold=0)
