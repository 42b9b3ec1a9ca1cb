"""LLM training-data pipeline queries (dedup / similarity / text analysis /
multimodal) with DuckDB oracle twins.

The oracles reproduce the exact md5-derived signatures
(``('0x'||substr(md5(x),1,15))::BIGINT`` == Spark
``conv(substr(md5(x),1,15),16,10)``), so even MinHash/SimHash/LSH results
hash-match across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feldera_spark.datapipe.dedup import (
    MINHASH_COEFFS,
    MINHASH_P,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    neardup_clusters,
    ngram_jaccard_pairs,
    simhash,
)
from feldera_spark.datapipe.multimodal import documents_as_binary, extract_metadata
from feldera_spark.datapipe.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    hyperplane_lsh_buckets,
    ivf_topk,
)
from feldera_spark.datapipe.text import (
    contamination,
    fingerprint,
    language_id,
    pii_scrub,
    quality_score,
    repetition_signals,
    stratified_sample,
    token_stats,
)
from feldera_spark.queries._util import t

QUERIES = {}
ORACLES = {}


def q(name, oracle=None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# DuckDB fragments shared by several oracles
_MD5 = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"
_TOKS = "string_split(text, ' ')"
_SHINGLES = f"""
  toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
  sh AS (
    SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS shingle
    FROM toks, UNNEST(range(1, greatest(len(tk)-1, 1))) AS u(i)
  )
"""
_COEF_VALUES = ", ".join(
    f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_COEFFS)
)
_MINHASH = f"""
  coef AS (SELECT * FROM (VALUES {_COEF_VALUES}) AS c(j, a, b)),
  hh AS (
    SELECT doc_id, {_MD5.format(x="shingle")} % 4294967296 AS h FROM sh
  ),
  mh AS (
    SELECT doc_id, j, min((a * h + b) % {MINHASH_P}) AS minv
    FROM hh CROSS JOIN coef GROUP BY doc_id, j
  )
"""


@q(
    "d01_exact_dedup",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             {_MD5.format(x=f"array_to_string(({_TOKS})[1:2], ' ')")} AS content_hash
      FROM documents
    )
    SELECT content_hash, min(doc_id) AS canonical_id, count(*) AS n_copies
    FROM keyed GROUP BY content_hash
    """,
)
def d01_exact_dedup(spark, sf_dir):
    """Exact (hash-groupBy) dedup on a normalized content key (here: the
    2-token prefix, which actually collides in the synthetic corpus)."""
    d = t(spark, sf_dir, "documents")
    key = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 2), " ")
    return exact_dedup(d, key, "doc_id")


@q(
    "d02_minhash_signatures",
    oracle=f"""
    WITH {_SHINGLES}, {_MINHASH}
    SELECT doc_id, j, minv FROM mh WHERE doc_id < 50
    """,
)
def d02_minhash_signatures(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return minhash_signatures(d, "doc_id", "text", num_hashes=8, shingle_n=3)


@q(
    "d03_lsh_candidate_pairs",
    oracle=f"""
    WITH {_SHINGLES}, {_MINHASH},
    bb AS (
      SELECT doc_id, CAST(j // 2 AS BIGINT) AS band,
             string_agg(CAST(minv AS VARCHAR), ',' ORDER BY j) AS band_key
      FROM mh GROUP BY doc_id, j // 2
    ),
    buckets AS (
      SELECT doc_id, band,
             {_MD5.format(x="CAST(band AS VARCHAR) || ':' || band_key")} AS bucket
      FROM bb
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
    WHERE a.doc_id < b.doc_id
    """,
)
def d03_lsh_candidate_pairs(spark, sf_dir):
    """MinHash+LSH banding: near-dup candidates = docs sharing a band
    bucket. Equi-join on (band, bucket) — never a pairwise scan."""
    d = t(spark, sf_dir, "documents")
    return lsh_candidate_pairs(d, "doc_id", "text", num_hashes=8, rows_per_band=2)


@q(
    "d04_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES},
    raw AS (SELECT DISTINCT doc_id AS id, shingle FROM sh),
    rare AS (SELECT shingle FROM raw GROUP BY shingle HAVING count(*) <= 100),
    postings AS (SELECT raw.id, raw.shingle FROM raw
                 JOIN rare ON raw.shingle = rare.shingle),
    sizes AS (SELECT id, count(*) AS sz FROM postings GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
      FROM postings a JOIN postings b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b, n_common,
           CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) AS jaccard
    FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
    WHERE CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) >= 0.05
    """,
)
def d04_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dup pairs via inverted-index join, with the
    stop-shingle doc-frequency cap (shingles in > 100 docs are dropped
    from postings AND sizes — bounded per-bucket join fan-out, the 100 TB
    hot-key fix; the oracle mirrors the capped metric)."""
    d = t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.05, max_doc_freq=100
    )


@q(
    "d05_simhash",
    oracle=f"""
    WITH tk AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    h AS (SELECT doc_id, {_MD5.format(x="tok")} AS h FROM tk),
    bits AS (
      SELECT doc_id, i, CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END AS vote
      FROM h, UNNEST(range(0, 16)) AS r(i)
    ),
    v AS (SELECT doc_id, i, sum(vote) AS v FROM bits GROUP BY doc_id, i)
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
    FROM v GROUP BY doc_id
    """,
)
def d05_simhash(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text", n_bits=16)


@q(
    "d06_cosine_topk",
    oracle="""
    WITH iv AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
      FROM embeddings
    ),
    n AS (SELECT vec_id, v, sqrt(CAST(list_dot_product(v, v) AS DOUBLE)) AS nrm FROM iv),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(list_dot_product(q.v, c.v) AS DOUBLE) / (q.nrm * c.nrm) AS cosine
      FROM n q JOIN n c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM pairs
    ) WHERE rank <= 5
    """,
)
def d06_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-k (the ANN baseline/verifier).
    Integer-scaled dot products keep partial sums < 2^53 → bit-exact on
    any engine and any partitioning."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(queries, emb, id_col="vec_id", vec_col="embedding", k=5)


@q(
    "d07_ann_lsh_buckets",
    oracle="""
    WITH iv AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
      FROM embeddings
    ),
    planes AS (
      SELECT p, i,
             ((('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15))::BIGINT) % 2001 - 1000) AS w
      FROM UNNEST(range(0, 8)) AS pp(p), UNNEST(range(0, 64)) AS ii(i)
    ),
    dots AS (
      SELECT iv.vec_id, planes.p, sum(v[CAST(i AS INT) + 1] * w) AS d
      FROM iv CROSS JOIN planes GROUP BY iv.vec_id, planes.p
    )
    SELECT vec_id AS id,
           CAST(sum(CASE WHEN d > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
    FROM dots GROUP BY vec_id
    """,
)
def d07_ann_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH bucketing — the ANN scale path: candidate
    generation becomes an equi-join on bucket instead of a cross join."""
    emb = t(spark, sf_dir, "embeddings")
    return hyperplane_lsh_buckets(emb, id_col="vec_id", vec_col="embedding")


@q(
    "d08_language_id",
    oracle="""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    hits AS (
      SELECT doc_id,
             len(list_filter(tk, t -> list_contains(['the','a','of','to','and'], t))) AS en_hits,
             len(list_filter(tk, t -> list_contains(['der','die','das','und','ein'], t))) AS de_hits,
             len(list_filter(tk, t -> list_contains(['el','la','de','los','y'], t))) AS es_hits,
             len(list_filter(tk, t -> list_contains(['le','la','de','les','et'], t))) AS fr_hits
      FROM tk
    )
    SELECT doc_id, en_hits, de_hits, es_hits, fr_hits,
           CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
                WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
                WHEN es_hits >= fr_hits THEN 'es'
                ELSE 'fr' END AS predicted_lang
    FROM hits
    """,
)
def d08_language_id(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return language_id(d, "doc_id", "text")


@q(
    "d09_quality_score",
    oracle="""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    s AS (
      SELECT doc_id, len(tk) AS n_tokens,
             CAST(len(list_filter(tk, t -> list_contains(
               ['a','and','das','de','der','die','ein','el','et','la','le','les','los','of','the','to','und','y'], t)))
               AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS stopword_ratio,
             CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS type_token_ratio,
             CASE WHEN len(tk) >= 20 AND len(tk) <= 500 THEN 1.0 ELSE 0.5 END AS prior
      FROM tk
    )
    SELECT doc_id, n_tokens, stopword_ratio, type_token_ratio,
           stopword_ratio * 0.3 + type_token_ratio * 0.3 + prior * 0.4 AS quality
    FROM s
    """,
)
def d09_quality_score(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return quality_score(d, "doc_id", "text")


@q(
    "d10_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           length(text) AS n_chars_calc,
           CAST(ceil(length(text) / 4) AS BIGINT) AS est_bpe_tokens
    FROM documents
    """,
)
def d10_token_stats(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return token_stats(d, "doc_id", "text")


@q(
    "d11_fingerprint",
    oracle=f"""
    SELECT doc_id,
           {_MD5.format(x="text")} AS content_fp,
           {_MD5.format(x=f"array_to_string(list_sort(list_distinct({_TOKS})), ' ')")} AS bag_fp
    FROM documents
    """,
)
def d11_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return fingerprint(d, "doc_id", "text")


@q(
    "d13_embedding_neardup",
    oracle="""
    WITH iv AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
      FROM embeddings
    ),
    planes AS (
      SELECT p, i,
             ((('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15))::BIGINT) % 2001 - 1000) AS w
      FROM UNNEST(range(0, 8)) AS pp(p), UNNEST(range(0, 64)) AS ii(i)
    ),
    dots AS (
      SELECT iv.vec_id, planes.p, sum(v[CAST(i AS INT) + 1] * w) AS d
      FROM iv CROSS JOIN planes GROUP BY iv.vec_id, planes.p
    ),
    buckets AS (
      SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
      FROM dots GROUP BY vec_id
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM buckets a JOIN buckets b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    norms AS (
      SELECT vec_id, sqrt(CAST(sum(v[CAST(i AS INT) + 1] * v[CAST(i AS INT) + 1]) AS DOUBLE)) AS n
      FROM iv, UNNEST(range(0, 64)) AS ii(i) GROUP BY vec_id
    ),
    pairdot AS (
      SELECT c.id_a, c.id_b,
             CAST(sum(va.v[CAST(i AS INT) + 1] * vb.v[CAST(i AS INT) + 1]) AS DOUBLE) AS dab
      FROM cand c
      JOIN iv va ON va.vec_id = c.id_a
      JOIN iv vb ON vb.vec_id = c.id_b,
      UNNEST(range(0, 64)) AS ii(i)
      GROUP BY c.id_a, c.id_b
    )
    SELECT p.id_a, p.id_b, p.dab / (na.n * nb.n) AS cosine
    FROM pairdot p JOIN norms na ON na.vec_id = p.id_a
                   JOIN norms nb ON nb.vec_id = p.id_b
    WHERE p.dab / (na.n * nb.n) >= 0.3
    """,
)
def d13_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup dedup: LSH-signature candidates + exact
    integer-scaled cosine verification (the embedding analogue of
    MinHash-LSH banding; never a pairwise scan)."""
    emb = t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.3
    )


@q(
    "d14_ivf_topk",
    oracle="""
    WITH iv AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
      FROM embeddings
    ),
    ivn AS (SELECT vec_id, v, sqrt(CAST(list_dot_product(v, v) AS DOUBLE)) AS n FROM iv),
    params AS (
      SELECT GREATEST(16, CAST(floor(sqrt(count(*)) + 0.5) AS BIGINT)) AS n_cells,
             GREATEST(4, CAST(floor(sqrt(GREATEST(16, CAST(floor(sqrt(count(*)) + 0.5) AS BIGINT))) + 0.5) AS BIGINT)) AS n_probe
      FROM embeddings
    ),
    cent0 AS (
      SELECT cell, centv, centn FROM (
        SELECT vec_id AS cell, v AS centv, n AS centn,
               row_number() OVER (ORDER BY vec_id) AS rn
        FROM ivn), params WHERE rn <= n_cells
    ),
    samp AS (SELECT vec_id AS sid, v, n FROM ivn WHERE vec_id % 2 = 0),
    assign1 AS (
      SELECT sid, cell, v FROM (
        SELECT s.sid, c.cell, s.v,
               row_number() OVER (PARTITION BY s.sid
                                  ORDER BY CAST(list_dot_product(s.v, c.centv) AS DOUBLE) / (s.n * c.centn) DESC,
                                           c.cell ASC) AS rn
        FROM samp s CROSS JOIN cent0 c) WHERE rn = 1
    ),
    cent AS (
      SELECT cell, centv, sqrt(CAST(list_dot_product(centv, centv) AS DOUBLE)) AS centn FROM (
        SELECT cell, list(m ORDER BY i) AS centv FROM (
          SELECT a.cell, r.i, CAST(floor(CAST(sum(a.v[r.i]) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS m
          FROM assign1 a, range(1, 65) r(i) GROUP BY a.cell, r.i
        ) GROUP BY cell)
    ),
    assigned AS (
      SELECT vec_id AS neighbor_id, cell, v AS cv, n AS cn FROM (
        SELECT c.vec_id, cent.cell, c.v, c.n,
               row_number() OVER (PARTITION BY c.vec_id
                                  ORDER BY CAST(list_dot_product(c.v, cent.centv) AS DOUBLE) / (c.n * cent.centn) DESC,
                                           cent.cell ASC) AS arn
        FROM ivn c CROSS JOIN cent
      ) WHERE arn = 1
    ),
    probes AS (
      SELECT query_id, qv, qn, cell FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, q.n AS qn, cent.cell,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY CAST(list_dot_product(q.v, cent.centv) AS DOUBLE) / (q.n * cent.centn) DESC,
                                           cent.cell ASC) AS prn
        FROM ivn q CROSS JOIN cent WHERE q.vec_id < 10
      ), params WHERE prn <= n_probe
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT p.query_id, a.neighbor_id,
             CAST(list_dot_product(p.qv, a.cv) AS DOUBLE) / (p.qn * a.cn) AS cosine,
             row_number() OVER (PARTITION BY p.query_id
                                ORDER BY CAST(list_dot_product(p.qv, a.cv) AS DOUBLE) / (p.qn * a.cn) DESC,
                                         a.neighbor_id ASC) AS rank
      FROM probes p JOIN assigned a ON a.cell = p.cell
      WHERE a.neighbor_id <> p.query_id
    ) WHERE rank <= 5
    """,
)
def d14_ivf_topk(spark, sf_dir):
    """IVF approximate top-k: sqrt(N)-scaled cell count, centroids
    refined by one deterministic Lloyd round over a modulus sample, and
    sqrt(n_cells) probes per query — probed work grows ~N^(3/4), not
    O(N). The full index build (seeds -> sampled k-means -> assignment
    -> probing) is mirrored step-for-step in the DuckDB oracle, so the
    approximation itself is value-checked, not just the final join."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(queries, emb, id_col="vec_id", vec_col="embedding", k=5)


@q(
    "d12_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CASE WHEN length(text) = 0 THEN -1 ELSE ascii(substr(text, 1, 1)) END AS first_byte,
           CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
           CAST((CASE WHEN length(text) = 0 THEN -1 ELSE ascii(substr(text, 1, 1)) END) % 480 AS INT) AS fake_height
    FROM documents
    """,
)
def d12_multimodal_meta(spark, sf_dir):
    """Multimodal plumbing: binary payload column + Arrow-batched
    mapInPandas metadata extraction (deterministic fake decode)."""
    d = t(spark, sf_dir, "documents")
    return extract_metadata(documents_as_binary(d), "doc_id", "payload")


_LSH_CAND = f"""
  {_SHINGLES}, {_MINHASH},
  bb AS (
    SELECT doc_id, CAST(j // 2 AS BIGINT) AS band,
           string_agg(CAST(minv AS VARCHAR), ',' ORDER BY j) AS band_key
    FROM mh GROUP BY doc_id, j // 2
  ),
  buckets AS (
    SELECT doc_id, band,
           {_MD5.format(x="CAST(band AS VARCHAR) || ':' || band_key")} AS bucket
    FROM bb
  ),
  cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
    WHERE a.doc_id < b.doc_id
  )
"""


@q(
    "d15_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_LSH_CAND},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION ALL
      SELECT id_b, id_a FROM cand
    ),
    reach(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach GROUP BY node
    """,
)
def d15_neardup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: LSH candidate pairs → distributed connected
    components (min-label propagation; rounds = component diameter,
    quasi-clique dup groups converge in ~2). Every doc gets the min doc
    id of its component — the canonical-doc grouping a dedup pipeline
    keys on. The oracle computes the same components via a recursive
    reachability CTE."""
    d = t(spark, sf_dir, "documents")
    return neardup_clusters(d, "doc_id", "text", num_hashes=8, rows_per_band=2)


@q(
    "d16_contamination",
    oracle=f"""
    WITH {_SHINGLES},
    dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
    bench AS (SELECT DISTINCT shingle FROM dsh WHERE doc_id % 97 = 0),
    scored AS (SELECT * FROM dsh WHERE doc_id % 97 <> 0),
    sizes AS (SELECT doc_id, count(*) AS n_shingles FROM scored GROUP BY doc_id),
    hits AS (
      SELECT s.doc_id, count(*) AS n_cont
      FROM scored s JOIN bench b ON s.shingle = b.shingle
      GROUP BY s.doc_id
    )
    SELECT sizes.doc_id, n_shingles,
           coalesce(n_cont, 0) AS n_contaminated,
           CAST(coalesce(n_cont, 0) AS DOUBLE) / n_shingles AS contamination,
           CAST(CAST(coalesce(n_cont, 0) AS DOUBLE) / n_shingles >= 0.5 AS INT)
             AS flagged
    FROM sizes LEFT JOIN hits ON sizes.doc_id = hits.doc_id
    """,
)
def d16_contamination(spark, sf_dir):
    """Benchmark decontamination: per-doc fraction of distinct 3-token
    shingles that appear in the benchmark set (doc_id % 97 = 0 as the
    deterministic stand-in eval suite). Membership resolves per SHINGLE
    against a broadcast benchmark set — no doc×bench pairing."""
    d = t(spark, sf_dir, "documents")
    return contamination(
        d, "doc_id", "text", bench_pred=F.col("doc_id") % 97 == 0,
        shingle_n=3, threshold=0.5,
    )


@q(
    "d17_repetition_signals",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    tok AS (SELECT doc_id, tk[i] AS tok
            FROM toks, UNNEST(range(1, len(tk) + 1)) AS u(i)),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
    tstats AS (
      SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
             max(c) AS top_tok
      FROM tc GROUP BY doc_id
    ),
    sh2 AS (SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS shingle
            FROM toks, UNNEST(range(1, greatest(len(tk), 1))) AS u(i)),
    bc AS (SELECT doc_id, shingle, count(*) AS c FROM sh2 GROUP BY doc_id, shingle),
    bstats AS (
      SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bi
      FROM bc GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
           CAST(top_tok AS DOUBLE) / n_tokens AS top_token_ratio,
           CAST(top_bi AS DOUBLE) / n_bigrams AS top_bigram_ratio,
           CAST(CAST(top_bi AS DOUBLE) / n_bigrams >= 0.2 AS INT) AS repetitive
    FROM tstats t JOIN bstats b ON t.doc_id = b.doc_id
    WHERE t.n_tokens >= 2
    """,
)
def d17_repetition_signals(spark, sf_dir):
    """Gopher-style repetition quality signals: distinct-token ratio,
    top-token fraction, top-bigram fraction + repetitive flag. Two
    explode→groupBy chains keyed on doc_id, fully JVM-side."""
    d = t(spark, sf_dir, "documents")
    return repetition_signals(d, "doc_id", "text", bigram_threshold=0.2)


@q(
    "d18_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE (lang = 'en' AND {_MD5.format(x="CAST(doc_id AS VARCHAR)")} % 2 = 0)
       OR (lang = 'de' AND {_MD5.format(x="CAST(doc_id AS VARCHAR)")} % 5 = 0)
       OR (lang NOT IN ('en', 'de')
           AND {_MD5.format(x="CAST(doc_id AS VARCHAR)")} % 10 = 0)
    """,
)
def d18_stratified_sample(spark, sf_dir):
    """Stratified training-mix sampling: keep 1/2 of English, 1/5 of
    German, 1/10 of everything else — deterministic keyed-hash
    Bernoulli per stratum (portable md5, identical across engines and
    re-runs), evaluated as one pushed-down filter; the per-language mix
    control every pre-training corpus build needs."""
    d = t(spark, sf_dir, "documents")
    return stratified_sample(
        d, "doc_id", "lang", rates={"en": 2, "de": 5}, default_mod=10
    ).select("doc_id", "lang", "source")


@q(
    "d19_pii_scrub",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 11 = 0
                          THEN ' contact user' || CAST(doc_id AS VARCHAR)
                               || '@example.com or +1-555-123-4567 now'
                          ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}',
             '<PHONE>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}'))
             AS BIGINT) AS n_phones,
           CAST(doc_id % 11 = 0 AS INT) AS had_pii
    FROM seeded
    """,
)
def d19_pii_scrub(spark, sf_dir):
    """PII scrubbing (emails + phone-shaped tokens → typed
    placeholders, redaction counts per doc): pure codegen'd
    regexp_replace/regexp_count — no UDFs, no shuffle, a scan at any
    scale. PII is deterministically seeded into 1/11 of the docs so
    the redaction itself (not just a no-op pass) is value-checked."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or +1-555-123-4567 now"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_scrub(d, "doc_id", "text")


@q(
    "d20_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE {_LSH_CAND},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION ALL
      SELECT id_b, id_a FROM cand
    ),
    reach(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
    ),
    clusters AS (
      SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
    )
    SELECT d.source,
           count(*) AS n_docs,
           count(*) FILTER (WHERE c.cluster_id = d.doc_id) AS n_survivors,
           CAST(sum(CASE WHEN c.cluster_id = d.doc_id THEN d.n_chars
                         ELSE 0 END) AS BIGINT) AS surviving_chars
    FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
    GROUP BY d.source
    """,
)
def d20_dedup_survivors(spark, sf_dir):
    """The dedup pipeline END-TO-END: LSH candidates → connected
    components → keep one canonical doc per cluster (min doc_id) →
    per-source retention stats. The shape a corpus build actually
    runs — candidate generation, clustering, and the survivor filter
    composed, with the final aggregate showing what dedup kept."""
    d = t(spark, sf_dir, "documents")
    clusters = neardup_clusters(d, "doc_id", "text", num_hashes=8, rows_per_band=2)
    joined = d.join(clusters, on="doc_id")
    survivor = F.col("cluster_id") == F.col("doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(survivor, 1)).alias("n_survivors"),
            F.sum(F.when(survivor, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("surviving_chars"),
        )
    )


@q(
    "d21_sequence_packing",
    oracle="""
    SELECT lang, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST((sum(CAST(len(string_split(text, ' ')) AS BIGINT))
              OVER (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - CAST(len(string_split(text, ' ')) AS BIGINT)) // 2048
             AS BIGINT) AS seq_id,
           CAST((sum(CAST(len(string_split(text, ' ')) AS BIGINT))
              OVER (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - CAST(len(string_split(text, ' ')) AS BIGINT)) % 2048
             AS BIGINT) AS seq_offset
    FROM documents
    """,
)
def d21_sequence_packing(spark, sf_dir):
    """Concat-and-chunk sequence packing (GPT-style pretraining prep):
    per-language corpora are concatenated in doc_id order and split
    into 2048-token training sequences; each document gets the sequence
    id + offset its first token lands at. One window shuffle keyed by
    the packing partition; all-integer arithmetic, so the plan is
    bit-identical across engines at any corpus size."""
    from feldera_spark.datapipe.text import pack_sequences

    d = t(spark, sf_dir, "documents")
    return pack_sequences(d, "doc_id", "text", ctx_len=2048)
