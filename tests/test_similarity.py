"""IVF ANN quality: recall@k against the exact cosine oracle (d06's
brute-force path) and the scaling behavior of the index parameters."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from feldera_spark.datapipe.similarity import cosine_topk, ivf_topk
from feldera_spark.queries._util import t

from conftest import SF_DIR


def test_ivf_recall_vs_exact(spark):
    emb = t(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(q, emb, "vec_id", "embedding", 5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(q, emb, "vec_id", "embedding", 5).collect()
    }
    recall = len(exact & approx) / len(exact)
    # sqrt(N) cells, sqrt(n_cells) probes => ~quarter of the corpus
    # scored per query; 0.6 leaves slack for corpus growth while still
    # catching a broken index (random cells would score ~probe fraction)
    assert recall >= 0.6, f"IVF recall@5 collapsed: {recall}"


def test_ivf_parameters_scale_with_corpus(spark):
    emb = t(spark, SF_DIR, "embeddings")
    n = emb.count()
    expected_cells = max(16, int(math.floor(math.sqrt(n) + 0.5)))
    q = emb.filter(F.col("vec_id") < 2)
    out = ivf_topk(q, emb, "vec_id", "embedding", 3)
    assert out.count() > 0
    # structural: refined centroids remain <= n_cells and the result is
    # deterministic across evaluations (same plan, same rows)
    again = ivf_topk(q, emb, "vec_id", "embedding", 3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    assert expected_cells >= 16
