"""Datapipe operator units: connected components, contamination,
repetition signals, shingle guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from feldera_spark.datapipe.dedup import connected_components, token_shingles
from feldera_spark.datapipe.text import contamination, repetition_signals


def test_connected_components_path_graph(spark):
    """A path graph 0-1-2-...-9 has diameter 9 — forces multiple
    propagation rounds (LSH quasi-cliques converge in ~2; this checks
    the loop itself)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)] + [(20, 21)], ["id_a", "id_b"]
    )
    verts = spark.createDataFrame([(i,) for i in range(10)] + [(20,), (21,), (30,)], ["doc_id"])
    out = {r.doc_id: r.cluster_id for r in
           connected_components(edges, verts, "doc_id").collect()}
    assert all(out[i] == 0 for i in range(10))
    assert out[20] == out[21] == 20
    assert out[30] == 30  # isolated vertex labels itself


def test_token_shingles_short_doc_guard(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "a"), (4, "")], ["id", "text"]
    )
    got = token_shingles(df, "text", n=3).groupBy("id").count().collect()
    counts = {r.id: r["count"] for r in got}
    assert counts == {1: 2}  # docs with < 3 tokens yield ZERO shingles


def test_contamination_flags(spark):
    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),          # benchmark doc (id % 2 == 0 pred)
            (1, "alpha beta gamma delta epsilon"),  # heavy overlap -> flagged
            (3, "one two three four five"),         # no overlap
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in contamination(
        df, "doc_id", "text", bench_pred=F.col("doc_id") % 2 == 0,
        shingle_n=3, threshold=0.5,
    ).collect()}
    assert set(out) == {1, 3}  # benchmark docs are not scored
    assert out[1].flagged == 1 and out[1].n_contaminated == 2
    assert out[3].flagged == 0 and out[3].n_contaminated == 0


def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"),
         (2, "all of these words in this longer doc differ from one another")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in
           repetition_signals(df, "doc_id", "text").collect()}
    assert out[1].repetitive == 1 and out[1].top_token_ratio == 1.0
    assert out[2].repetitive == 0 and out[2].distinct_ratio == 1.0
