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


def test_lsh_pairs_bucket_group_equals_self_join(spark):
    """The grouped in-bucket pair generation must emit exactly the
    self-join's pair set: every unordered pair of docs sharing >= 1
    band bucket, once."""
    from feldera_spark.datapipe.dedup import lsh_candidate_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, "completely different text with no overlap here at all"),
            (5, "another unrelated document about spark and parquet files"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(docs, "doc_id", "text").collect()
    }
    # reference: brute-force over the bucket frame
    from feldera_spark.datapipe.dedup import lsh_band_buckets_wide, minhash_wide

    buckets = lsh_band_buckets_wide(
        minhash_wide(docs, "doc_id", "text", 8, 3), "doc_id", 8, 2
    ).collect()
    by_bucket: dict = {}
    for r in buckets:
        by_bucket.setdefault((r["band"], r["bucket"]), []).append(r["doc_id"])
    want = set()
    for ids in by_bucket.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                want.add((ids[i], ids[j]))
    assert got == want and (1, 3) in got


def test_materialize_shared_modes(spark):
    """Every spark.feldera.materialize mode returns the same rows; an
    unknown mode fails loudly."""
    import pytest

    from feldera_spark.materialize import materialize_shared

    df = spark.range(10).withColumnRenamed("id", "x")
    want = set(range(10))
    for mode in ("localCheckpoint", "persistDisk", "checkpoint"):
        spark.conf.set("spark.feldera.materialize", mode)
        try:
            got = {r["x"] for r in materialize_shared(df).collect()}
            assert got == want, mode
        finally:
            spark.conf.unset("spark.feldera.materialize")
    spark.conf.set("spark.feldera.materialize", "bogus")
    try:
        with pytest.raises(ValueError, match="bogus"):
            materialize_shared(df)
    finally:
        spark.conf.unset("spark.feldera.materialize")


def test_collect_vec_side_cap(spark):
    """_collect_vec_side enforces the bounded-by-contract cap loudly."""
    import pytest

    from pyspark.sql import functions as F

    from feldera_spark.datapipe.similarity import _collect_vec_side

    df = spark.range(50).select(
        F.col("id"), F.array(F.lit(1).cast("long")).alias("v")
    )
    spark.conf.set("spark.feldera.similarity.collectCap", "10")
    try:
        with pytest.raises(ValueError, match="collectCap"):
            _collect_vec_side(df, "id", "v")
    finally:
        spark.conf.unset("spark.feldera.similarity.collectCap")
    ids, mat, nrm = _collect_vec_side(df, "id", "v")
    assert len(ids) == 50 and mat.shape == (50, 1)
