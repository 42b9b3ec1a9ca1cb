"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB: every operator here is expressed as hash → groupBy /
equi-join, never a pairwise comparison over the full corpus:

- exact dedup: one shuffle on a 64-bit content hash;
- MinHash+LSH: shingle explode → per-(doc, seed) min-hash aggregation →
  band-bucket equi-join. Only docs sharing a band bucket are ever paired,
  so the candidate set is ~linear in corpus size for a fixed threshold;
- SimHash: per-doc fingerprint via bit-vote aggregation (explode is
  bounded: tokens × n_bits);
- n-gram Jaccard: inverted-index self-join on shingles (the brute-force
  verifier applied AFTER LSH pruning at scale; exposed directly for
  small candidate sets).

Hashing is md5-based (``md5_i64``) so signatures are engine-portable and
deterministic — no Python in the hot path, everything is Catalyst
expressions over JVM codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feldera_spark.functions import md5_i64


def _tokens(text_col) -> F.Column:
    return F.split(text_col, " ")


def token_shingles(df: DataFrame, text: str, n: int = 3) -> DataFrame:
    """Explode each doc into its n-token shingles (space-joined)."""
    toks = _tokens(F.col(text))
    # guard: sequence(1, 0) DESCENDS in Spark — a doc with < n tokens
    # must yield zero shingles, not junk slices at indices 0 and 1
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return df.withColumn("shingle", F.explode(shingles))


def exact_dedup(
    df: DataFrame, key_expr, id_col: str
) -> DataFrame:
    """Exact dedup: group on a content hash, keep the smallest id.

    Returns (content_hash, canonical_id, n_copies). One shuffle on the
    hash; at 100 TB this is the cheapest possible full-corpus dedup.
    """
    return (
        df.select(md5_i64(key_expr).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# MinHash permutation constants: h_j = (A_j * h32 + B_j) mod P32.
# P32 = largest prime < 2^32; A_j/B_j < 2^29 so A_j*h32 < 2^61 (no int64
# overflow). Derived once from md5 so both engines can restate them.
MINHASH_P = 4294967291
MINHASH_COEFFS = [
    (421400231, 268121467),
    (140405764, 477040398),
    (59417442, 534414089),
    (383588186, 201378225),
    (511614406, 314398789),
    (236295454, 417365620),
    (435393046, 517602440),
    (274931387, 8405223),
]


def minhash_wide(
    df: DataFrame, id_col: str, text: str, num_hashes: int = 8, shingle_n: int = 3
) -> DataFrame:
    """One row per doc: (id, sig0..sigN-1).

    ONE md5 per shingle, then ``num_hashes`` linear permutations
    h_j = (A_j*h + B_j) mod P computed as parallel aggregate columns —
    no row explosion, a single shuffle on the doc id. (The classic
    universal-hash minhash construction; 8× cheaper than hashing
    (seed, shingle) pairs and the scale path at 100 TB.)
    """
    assert num_hashes <= len(MINHASH_COEFFS)
    sh = (
        token_shingles(df.select(id_col, text), text, n=shingle_n)
        .select(id_col, "shingle")
        .withColumn("h", md5_i64(F.col("shingle")) % F.lit(4294967296))
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"sig{j}")
        for j, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_signatures(
    df: DataFrame, id_col: str, text: str, num_hashes: int = 8, shingle_n: int = 3
) -> DataFrame:
    """MinHash signature rows (id, seed j, min-hash value) — the row form
    of ``minhash_wide`` (stack is a narrow transform, no extra shuffle)."""
    wide = minhash_wide(df, id_col, text, num_hashes, shingle_n)
    stack_args = ", ".join(f"{j}, sig{j}" for j in range(num_hashes))
    return wide.select(
        id_col, F.expr(f"stack({num_hashes}, {stack_args}) AS (j, minv)")
    )


def lsh_band_buckets(
    signatures: DataFrame, id_col: str, rows_per_band: int = 2
) -> DataFrame:
    """Group signature rows into bands; bucket = hash of the band's values
    in seed order. Docs sharing any (band, bucket) are near-dup candidates."""
    banded = signatures.withColumn("band", F.floor(F.col("j") / rows_per_band))
    return (
        banded.groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "minv"))),
                    lambda s: s["minv"].cast("string"),
                ),
                ",",
            ).alias("band_key")
        )
        .withColumn(
            "bucket",
            md5_i64(
                F.concat_ws(":", F.col("band").cast("string"), F.col("band_key"))
            ),
        )
        .drop("band_key")
    )


def lsh_band_buckets_wide(
    wide: DataFrame, id_col: str, num_hashes: int, rows_per_band: int = 2
) -> DataFrame:
    """Band buckets computed from the wide signature row — a narrow
    projection + explode, NO re-grouping shuffle (vs. the row-form path
    which re-aggregates (id, band)). Bucket values are identical to
    ``lsh_band_buckets``: md5(band ':' minv,minv,... in seed order)."""
    n_bands = num_hashes // rows_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                md5_i64(
                    F.concat_ws(
                        ":",
                        F.lit(str(b)),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"sig{b * rows_per_band + r}").cast("string")
                                for r in range(rows_per_band)
                            ],
                        ),
                    )
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return wide.select(id_col, F.explode(bands).alias("bb")).select(
        id_col, "bb.band", "bb.bucket"
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing >= 1 LSH band bucket.

    Plan shape: one groupBy shuffle (signatures), a narrow band-bucket
    projection, one equi-join shuffle on (band, bucket), one distinct.
    """
    wide = minhash_wide(df, id_col, text, num_hashes, shingle_n)
    buckets = lsh_band_buckets_wide(wide, id_col, num_hashes, rows_per_band)
    # Pair generation is a GROUP, not a self-join: one exchange on
    # (band, bucket) collects each bucket's member ids (unique within a
    # bucket — a doc has exactly one bucket per band), then a narrow
    # array transform emits the i<j pairs in-place. The previous
    # self-join consumed the bucket frame twice (forcing a
    # localCheckpoint to share the shingle→md5→minhash pipeline) and at
    # sf0.1 got planned as a BROADCAST of the corpus-sized bucket frame
    # — impossible at 100 TB. Now: single consumer (checkpoint gone),
    # one hash exchange instead of broadcast+join, and the per-bucket
    # quadratic fan-out happens as an in-memory array transform in the
    # same task that would have produced the same pairs from the join.
    # The global distinct (the oracle's exactness contract — a pair may
    # share several bands) is unchanged; its map-side partial aggregate
    # now sees locally bucket-unique pairs only.
    ids = F.array_sort(F.collect_list(F.col(id_col)))
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda a, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
            ),
        )
    )
    return (
        buckets.groupBy("band", "bucket")
        .agg(ids.alias("ids"))
        .filter(F.size(F.col("ids")) >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text: str,
    shingle_n: int = 3,
    threshold: float = 0.2,
    candidates: DataFrame | None = None,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Pairs with shingle-set Jaccard >= threshold.

    Inverted-index join: |A∩B| counted by joining distinct (doc, shingle)
    postings on shingle; |A∪B| = |A|+|B|-|A∩B|. If ``candidates`` is given
    (e.g. from LSH), intersections are only computed for those pairs —
    the scale path.

    ``max_doc_freq`` caps stop-shingles: a shingle appearing in more than
    that many documents is dropped from BOTH the postings join and the
    per-doc sizes, so the metric stays a true Jaccard over the capped
    shingle space. Without a cap, one ubiquitous shingle ("the of the")
    appearing in n docs contributes n² rows to the self-join — the
    classic inverted-index hot-bucket blow-up; with it, the join's
    per-bucket fan-out is bounded by max_doc_freq² regardless of corpus
    size (and ultra-common shingles carry no near-dup signal anyway).
    At 100 TB always set a cap; at the default None the metric is the
    exact textbook Jaccard.
    """
    postings = (
        token_shingles(df.select(id_col, text), text, n=shingle_n)
        .select(F.col(id_col).alias("id"), "shingle")
        .distinct()
    )
    # postings feeds THREE consumers (the doc-frequency cap, the sizes
    # aggregate, and both sides of the inverted-index self-join) — pin
    # the exploded+distinct frame once instead of re-running the shingle
    # explode per consumer (per-invocation materialization, never a
    # cross-run cache; mechanism per spark.feldera.materialize)
    from feldera_spark.materialize import materialize_shared

    postings = materialize_shared(postings)
    if max_doc_freq is not None:
        rare = (
            postings.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("shingle")
        )
        postings = postings.join(rare, on="shingle", how="left_semi")
    sizes = postings.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = postings.select(F.col("id").alias("id_a"), "shingle")
    b = postings.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    if candidates is not None:
        inter = inter.join(candidates, on=["id_a", "id_b"], how="left_semi")
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, on="id_a")
        .join(sz_b, on="id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def simhash(
    df: DataFrame, id_col: str, text: str, n_bits: int = 16
) -> DataFrame:
    """Per-doc SimHash fingerprint: majority vote over token-hash bits.

    Bit i of the fingerprint is 1 iff more token hashes have bit i set
    than not. Computed as ``n_bits`` parallel vote-sum aggregate columns
    over the token rows — ONE md5 per token, no bit-index explosion, one
    shuffle on the doc id (same single-pass shape as minhash)."""
    toks = df.select(id_col, F.explode(_tokens(F.col(text))).alias("tok")).withColumn(
        "h", md5_i64(F.col("tok"))
    )
    # vote_i = Σ_tokens (2*bit_i − 1); bit test via bitwiseAND (exact int64)
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(n_bits)
    ]
    wide = toks.groupBy(id_col).agg(*votes)
    fp = None
    for i in range(n_bits):
        term = F.when(F.col(f"v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    return wide.select(id_col, fp.alias("simhash"))


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    id_col: str,
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    ``edges`` has columns (id_a, id_b); ``vertices`` provides every node
    (isolated docs label themselves). Returns (id_col, cluster_id) with
    cluster_id = min node id in the component.

    Scale shape: each round is one equi-join + one min-aggregation on
    the node key — no driver-side graph. Rounds needed = component
    DIAMETER, and near-dup components are band-bucket quasi-cliques
    (diameter ≤ ~3), so the loop converges in a handful of rounds even
    at 100 TB. The convergence check is a single count per round on the
    (small) changed-label frame; state is truncated per round with an
    eager checkpoint so Catalyst never re-analyzes the whole loop
    history (the same recipe as ``operators/recursion.fixpoint``, which
    this mirrors — label(n) = min(n, min over neighbors) is a semi-naive
    datalog fixpoint specialized to the min lattice)."""
    # Both orientations via ONE explode (a narrow op), not a union of
    # two selects: the union form consumed the edges plan twice, so the
    # upstream pipeline (for LSH candidates: shingle → minhash → band →
    # pairs) executed once per direction inside the pin job below.
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("node"), F.col("id_b").alias("nbr")
                ),
                F.struct(
                    F.col("id_b").alias("node"), F.col("id_a").alias("nbr")
                ),
            )
        ).alias("e")
    ).select("e.node", "e.nbr").localCheckpoint(eager=True)
    # ^ pin the edge list ONCE: without this, every propagation round
    # re-executes the upstream plan that produced the edges (for LSH
    # candidates that is the whole shingle->minhash->band pipeline)
    labels = vertices.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "nbr"), on="nbr")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("__chg"),
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("__chg")).limit(1).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )


def neardup_clusters(
    df: DataFrame,
    id_col: str,
    text: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate clusters: LSH candidate pairs → connected
    components. Every document gets a cluster_id (= min doc id in its
    near-dup group; singletons label themselves) — the grouping step a
    dedup pipeline uses to pick one canonical doc per cluster."""
    pairs = lsh_candidate_pairs(
        df, id_col, text, num_hashes=num_hashes,
        rows_per_band=rows_per_band, shingle_n=shingle_n,
    )
    return connected_components(pairs, df.select(id_col), id_col)
