"""Deterministic clustered embedding corpus for ANN index evaluation.

The synthetic ``embeddings`` testdata table is near-orthogonal (random
vectors in 64-d: pairwise cos ≈ N(0, 1/64)), which is the documented WORST
CASE for any locality index — true neighbors at cos ≈ 0.3 are
fundamentally linear-scan-hard, so the published scanned fractions there
(≈0.96 LSH / ≈0.77 IVF) cannot demonstrate sub-linear candidate
generation at all. Real retrieval corpora are clustered; this module
generates the clustered complement so the eval publishes BOTH regimes:

* 64 well-separated unit cluster centers (random normal, normalized —
  pairwise |cos| ≈ 0.12 in 64-d);
* 64 points per center at angle θ with cos θ = 0.95 to the center
  (independent noise directions), giving intra-cluster pairwise
  cos ≈ cos²θ ≈ 0.90 — comfortably inside the cos ≥ 0.7 "clustered
  corpus" regime the LSH/IVF docstrings size their knobs for.

Expected index behavior (the numbers the eval artifact should confirm):
with per-plane agreement p = 1 − acos(0.90)/π ≈ 0.86 for cluster-mates, a
0-probe (n_flip=0) LSH hit rate is 1 − (1 − p^6)^8 ≈ 0.98 while random
inter-cluster vectors share a 6-bit bucket with probability ≈ 1/64 per
table (union ≈ 0.12 scanned fraction). IVF with 64 cells and 4 probes
scans ≈ 4/64 ≈ 0.06 of the corpus. Both therefore land at
recall ≥ 0.9 with scanned fraction ≤ 0.2 — the sub-linear pruning the
100 TB similarity-search story rests on.

Generation is driver-side numpy from a FIXED seed (reproducible bit-for-bit
across runs; a few thousand × 64 floats — far below the broadcast-side
budget), then parallelized. Cluster ids interleave with vec_id
(``cluster = vec_id % n_clusters``) so the IVF quantizer's deterministic
lowest-id init starts with one point per cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SEED = 20260814
N_CLUSTERS = 64
PER_CLUSTER = 64
DIM = 64
COS_TO_CENTER = 0.95


def clustered_embeddings(
    spark: SparkSession,
    n_clusters: int = N_CLUSTERS,
    per_cluster: int = PER_CLUSTER,
    dim: int = DIM,
    cos_to_center: float = COS_TO_CENTER,
) -> DataFrame:
    """(vec_id, embedding: array<float>, label) — same shape as the
    ``embeddings`` table; ``label`` is the true cluster id."""
    import math

    import numpy as np

    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    sin_t = math.sqrt(1.0 - cos_to_center * cos_to_center)

    n = n_clusters * per_cluster
    noise = rng.standard_normal((n, dim))
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        # orthogonalize the noise against the center, then mix at angle θ:
        # v = cosθ·c + sinθ·u gives cos(v, c) = cosθ exactly
        g = noise[i]
        g = g - (g @ c) * c
        u = g / np.linalg.norm(g)
        v = cos_to_center * c + sin_t * u
        rows.append((i, [float(x) for x in v.astype(np.float32)], i % n_clusters))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


#: Zipf exponent for the realistic-vocabulary document corpus
ZIPF_S = 1.1


def zipf_documents(
    spark: SparkSession,
    n_docs: int = 5000,
    vocab_size: int = 20000,
    doc_len: int = 40,
    s: float = ZIPF_S,
) -> DataFrame:
    """(doc_id, text) with tokens drawn from a Zipf(s) distribution over a
    ``vocab_size``-term vocabulary — the realistic-vocabulary complement
    to the testdata ``documents`` table, whose ~40-word uniform
    vocabulary is the designed WORST CASE for more-like-this retrieval
    (every term is maximally common, so the rarest-terms cap cannot bound
    the scoring join: each query term's postings list is ~the corpus).
    Real corpora are Zipfian: a document's rarest terms have tiny df, so
    Lucene-style term selection bounds the scoring fan-out at
    Σ df(rarest M) ≪ |Q|·N — this corpus lets SCALING.md measure that
    posture instead of asserting it.

    Deterministic: fixed seed, inverse-CDF draws (numpy, driver-side —
    n_docs·doc_len ints, well under the broadcast budget at the eval
    sizes), then parallelized."""
    return spark.createDataFrame(
        zipf_rows(n_docs, vocab_size, doc_len, s),
        "doc_id long, text string",
    )


def zipf_rows(
    n_docs: int = 5000,
    vocab_size: int = 20000,
    doc_len: int = 40,
    s: float = ZIPF_S,
) -> list[tuple[int, str]]:
    """The Zipf corpus as plain Python rows (no Spark) — shared by the
    Spark frame above AND the DuckDB oracle's embedded VALUES clause, so
    the registered Zipf retrieval row is hash-checkable: both engines
    score the byte-identical corpus."""
    import numpy as np

    rng = np.random.default_rng(SEED + 1)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    p = ranks ** (-s)
    p /= p.sum()
    draws = rng.choice(vocab_size, size=(n_docs, doc_len), p=p)
    return [
        (i, " ".join(f"t{r}" for r in draws[i])) for i in range(n_docs)
    ]
