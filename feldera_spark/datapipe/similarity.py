"""Similarity search over embedding columns (array<float>).

Two paths:
- ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the corpus; one pass, no shuffle of the corpus. The
  baseline and the verifier for approximate methods.
- ``hyperplane_lsh_buckets`` — random-hyperplane LSH: each vector gets a
  b-bit signature (sign of dot with b pseudo-random hyperplanes derived
  deterministically from md5, so results are reproducible and
  oracle-checkable). ANN search = equi-join on bucket → candidate set ~
  corpus/2^b per query; the 100 TB scale path.

Numeric determinism: embeddings are scaled to integers (×1e7) before dot
products; partial sums stay < 2^53 so double accumulation is exact and
order-independent — identical results on any engine, any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10_000_000


def _int_vec(col) -> F.Column:
    # cast to double BEFORE scaling so float32 inputs promote identically
    # on every engine (float*int staying in float32 would diverge)
    return F.transform(col, lambda x: F.round(x.cast("double") * SCALE).cast("long"))


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_int_embedding(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn("__iv", _int_vec(F.col(vec_col))).withColumn(
        "__norm", F.sqrt(_dot(F.col("__iv"), F.col("__iv")))
    )


from feldera_spark.sources.registry import ensure_parallel as _ensure_parallel


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank). Queries are broadcast;
    the corpus is scanned once with no shuffle until the final per-query
    top-k (a tiny aggregation keyed by query id).
    """
    from pyspark.sql.window import Window

    q = with_int_embedding(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__iv").alias("qv"),
        F.col("__norm").alias("qn"),
    )
    c = with_int_embedding(_ensure_parallel(corpus), vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__iv").alias("cv"),
        F.col("__norm").alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_lsh_buckets(
    df: DataFrame, id_col: str, vec_col: str, n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """Deterministic random-hyperplane LSH signature per vector.

    Plane p's component i is md5_i64(p ':' i) % 2001 - 1000 (a fixed
    pseudo-random integer vector). Signature bit p = [dot(v, w_p) > 0].
    Returns (id, bucket). ANN candidate generation = self-join on bucket.
    """
    from feldera_spark.functions import md5_i64

    spark = df.sparkSession
    planes = (
        spark.range(n_planes)
        .select(F.col("id").cast("int").alias("p"))
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))))
        .withColumn(
            "w",
            md5_i64(F.concat_ws(":", F.col("p").cast("string"), F.col("i").cast("string")))
            % 2001
            - 1000,
        )
        .groupBy("p")
        .agg(F.array_sort(F.collect_list(F.struct("i", "w"))).alias("wv"))
        .select("p", F.transform("wv", lambda s: s["w"]).alias("wv"))
    )
    v = df.select(F.col(id_col).alias("id"), _int_vec(F.col(vec_col)).alias("iv"))
    scored = v.join(F.broadcast(planes)).withColumn(
        "bit", F.when(_dot(F.col("iv"), F.col("wv")) > 0, F.lit(1)).otherwise(F.lit(0))
    )
    return (
        scored.groupBy("id")
        .agg(
            F.sum(F.col("bit") * F.expr("CAST(pow(2, p) AS BIGINT)")).alias("bucket")
        )
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    The dedup scale path for embedding-indexed corpora: candidates are
    pairs sharing a full LSH signature (equi-join on bucket — candidate
    count ~ corpus/2^b per bucket, never a pairwise scan), then the exact
    integer-scaled cosine verifies each candidate. Recall is tunable via
    ``n_planes`` (fewer planes → bigger buckets → higher recall, more
    verification work) — the same precision/recall dial as MinHash-LSH
    banding for text.
    """
    buckets = hyperplane_lsh_buckets(df, id_col, vec_col, n_planes, dim)
    a = buckets.select(F.col("id").alias("id_a"), "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "bucket")
    cand = (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    v = with_int_embedding(df, vec_col).select(
        F.col(id_col).alias("vid"), F.col("__iv").alias("v"), F.col("__norm").alias("n")
    )
    va = v.select(F.col("vid").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    vb = v.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    return (
        cand.join(va, on="id_a")
        .join(vb, on="id_b")
        .withColumn("cosine", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _lloyd_round(samp: DataFrame, cent: DataFrame) -> DataFrame:
    """One deterministic Lloyd iteration: assign each sample vector to
    its nearest centroid (cosine, ties broken by cell id), then move
    each centroid to the element-wise mean of its members.

    Mean = floor(sum/count + 0.5) over the EXACT long sums — identical
    on every engine and partitioning (no double-summation order, no
    rounding-mode skew: both Spark's round() and DuckDB's disagree on
    halves, floor(x+0.5) does not). Cells that lose all members drop
    out (their id simply stops being probeable)."""
    from pyspark.sql.window import Window

    # argmax by (scos desc, cell asc) as ONE hash aggregation (max_by on
    # a (scos, -cell) ordering struct) — a partial-agg shuffle instead of
    # a window's shuffle + per-partition sort
    assigned = (
        samp.join(F.broadcast(cent))
        .withColumn(
            "scos",
            _dot(F.col("sv"), F.col("centv")) / (F.col("sn") * F.col("centn")),
        )
        .groupBy("sid")
        .agg(
            F.max_by(
                F.col("cell"),
                F.struct(F.col("scos"), (-F.col("cell")).alias("nc")),
            ).alias("cell"),
            F.any_value(F.col("sv")).alias("sv"),
        )
        .select("cell", "sv")
    )
    means = (
        assigned.select("cell", F.posexplode("sv").alias("i", "x"))
        .groupBy("cell", "i")
        .agg(
            F.floor(F.sum("x").cast("double") / F.count(F.lit(1)) + 0.5)
            .cast("long")
            .alias("m")
        )
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("s"))
        .select("cell", F.transform("s", lambda st: st["m"]).alias("centv"))
    )
    return means.withColumn("centn", F.sqrt(_dot(F.col("centv"), F.col("centv"))))


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int | None = None,
    n_probe: int | None = None,
    lloyd_rounds: int = 1,
    sample_mod: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the coarse-quantizer ANN
    scale path.

    Centroids: seeded from the first ``n_cells`` corpus vectors by id,
    then refined with ``lloyd_rounds`` deterministic k-means iterations
    over a modulus sample of the corpus (``id % sample_mod == 0`` — a
    fixed, engine-independent sample; at 100 TB the sample is what keeps
    the Lloyd shuffles tiny while centroids still track the data
    distribution). ``n_cells`` defaults to max(16, floor(sqrt(N)+0.5))
    — cell population ~sqrt(N) each, the standard IVF sizing — and
    ``n_probe`` to max(4, floor(sqrt(n_cells)+0.5)), so probed work per
    query stays ~N^(3/4) as the corpus grows instead of a fixed 1/4 of
    it. A query probes only its ``n_probe`` closest cells. Centroids and
    probe lists are tiny → broadcast; the only corpus-sized operations
    are one argmax assignment pass and the probed-cell scoring join.
    Every step (sums, floor-rounded means, tie-breaks) is deterministic,
    so the whole index is oracle-checkable in SQL.
    """
    import math

    from pyspark.sql.window import Window

    c = with_int_embedding(corpus, vec_col).select(
        F.col(id_col).alias("cid_"), F.col("__iv").alias("cv"), F.col("__norm").alias("cn")
    )
    if n_cells is None:
        # one parquet-metadata-cheap count sizes the index
        n_cells = max(16, int(math.floor(math.sqrt(corpus.count()) + 0.5)))
    if n_probe is None:
        n_probe = max(4, int(math.floor(math.sqrt(n_cells) + 0.5)))
    cent = (
        c.orderBy("cid_").limit(n_cells)
        .select(F.col("cid_").alias("cell"), F.col("cv").alias("centv"), F.col("cn").alias("centn"))
    )
    if lloyd_rounds > 0:
        samp = c.select(
            F.col("cid_").alias("sid"), F.col("cv").alias("sv"), F.col("cn").alias("sn")
        )
        if sample_mod > 1:
            samp = samp.filter(F.col("sid") % sample_mod == 0)
        # same single-task-scan trap as the assignment pass below: the
        # Lloyd argmax over sample x cells must parallelize regardless
        # of the input file layout
        samp = _ensure_parallel(samp)
        for _ in range(lloyd_rounds):
            cent = _lloyd_round(samp, cent)
        # tiny frame reused by assignment AND probing: pin it once
        cent = cent.localCheckpoint(eager=True)

    def _cos(av, an, bv, bn):
        return _dot(av, bv) / (an * bn)

    # assign: argmax cosine over centroids (deterministic tiebreak on
    # cell) — hash-agg max_by, not a window sort; one partial-agg
    # shuffle over the corpus, the only corpus-sized pass in the build.
    # The corpus is parallelized first (layout-adaptive, see
    # _ensure_parallel): the N x n_cells dot-product pass is the index
    # build's CPU bulk, and its parallelism must come from the
    # operator, not the input layout (a single-file parquet scan is one
    # row group = ONE task; measured 0.4s + 0.7s single-task stages at
    # sf0.1 on 32 cores).
    c = _ensure_parallel(c)
    assigned = (
        c.join(F.broadcast(cent))
        .withColumn("ccos", _cos(F.col("cv"), F.col("cn"), F.col("centv"), F.col("centn")))
        .groupBy("cid_")
        .agg(
            F.max_by(
                F.col("cell"),
                F.struct(F.col("ccos"), (-F.col("cell")).alias("nc")),
            ).alias("cell"),
            F.any_value(F.col("cv")).alias("cv"),
            F.any_value(F.col("cn")).alias("cn"),
        )
        .select(F.col("cid_").alias("neighbor_id"), "cell", F.col("cv"), F.col("cn"))
    )

    q = with_int_embedding(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("__iv").alias("qv"), F.col("__norm").alias("qn")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("pcos").desc(), F.col("cell").asc()
    )
    probes = (
        q.join(F.broadcast(cent))
        .withColumn("pcos", _cos(F.col("qv"), F.col("qn"), F.col("centv"), F.col("centn")))
        .withColumn("prn", F.row_number().over(w_probe))
        .filter(F.col("prn") <= n_probe)
        .select("query_id", "qv", "qn", "cell")
    )

    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        assigned.join(F.broadcast(probes), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _cos(F.col("qv"), F.col("qn"), F.col("cv"), F.col("cn")))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
