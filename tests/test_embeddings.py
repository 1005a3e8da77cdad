"""Skip-gram embeddings (G9): community structure recovery + determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pybiodatafuse_spark.plans.embeddings import init_vectors, skipgram_embeddings
from pybiodatafuse_spark.plans.walks import random_walks


@pytest.fixture(scope="module")
def two_cliques(spark):
    """Two 6-cliques (0-5, 10-15) with no cross edges — walks can't cross."""
    rows = []
    for base in (0, 10):
        for a in range(base, base + 6):
            for b in range(base, base + 6):
                if a != b:
                    rows.append((a, b, 1.0, 1))
    return spark.createDataFrame(rows, "src long, dst long, weight double, etype int")


def test_embeddings_separate_communities(spark, two_cliques):
    starts = two_cliques.select(F.col("src").alias("id")).distinct()
    walks = random_walks(spark, two_cliques, starts, num_walks=4, walk_length=8)
    emb = skipgram_embeddings(
        spark, walks, dim=16, epochs=2, window=2, negatives=2, partitions=4
    )
    vecs = {r["id"]: np.array(r["vector"]) for r in emb.collect()}
    assert set(vecs) == set(range(0, 6)) | set(range(10, 16))

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    within, across = [], []
    ids_a, ids_b = list(range(0, 6)), list(range(10, 16))
    for i in ids_a:
        for j in ids_a:
            if i < j:
                within.append(cos(vecs[i], vecs[j]))
    for i in ids_b:
        for j in ids_b:
            if i < j:
                within.append(cos(vecs[i], vecs[j]))
    for i in ids_a:
        for j in ids_b:
            across.append(cos(vecs[i], vecs[j]))
    assert np.mean(within) > np.mean(across) + 0.05


def test_embeddings_deterministic(spark, two_cliques):
    starts = two_cliques.select(F.col("src").alias("id")).distinct()
    walks = random_walks(spark, two_cliques, starts, num_walks=2, walk_length=6)
    a = skipgram_embeddings(spark, walks, dim=8, epochs=1, partitions=4)
    b = skipgram_embeddings(spark, walks, dim=8, epochs=1, partitions=4)
    va = {r["id"]: r["vector"] for r in a.collect()}
    vb = {r["id"]: r["vector"] for r in b.collect()}
    assert va.keys() == vb.keys()
    for k in va:
        assert va[k] == vb[k]  # bitwise identical for fixed partitioning


def test_init_vectors_deterministic_and_scaled():
    ids = np.array([3, 7, 1_000_000_007], dtype=np.int64)
    a = init_vectors(ids, 16)
    b = init_vectors(ids, 16)
    assert (a == b).all()
    assert np.abs(a).max() <= 0.5 / 16


def test_embeddings_separate_four_communities_10x(spark):
    """q43 property at ~10x the two-clique fixture: four 8-cliques with no
    cross edges — for EVERY pair of cliques, mean within-clique cosine must
    exceed mean cross-pair cosine. Community recovery evidence that does not
    rest on the single 12-node fixture above."""
    bases = (0, 100, 200, 300)
    rows = []
    for base in bases:
        for a in range(base, base + 8):
            for b in range(base, base + 8):
                if a != b:
                    rows.append((a, b, 1.0, 1))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double, etype int")
    starts = edges.select(F.col("src").alias("id")).distinct()
    walks = random_walks(spark, edges, starts, num_walks=3, walk_length=6)
    emb = skipgram_embeddings(
        spark, walks, dim=16, epochs=2, window=2, negatives=2, partitions=4
    )
    vecs = {r["id"]: np.array(r["vector"]) for r in emb.collect()}
    assert set(vecs) == {b + i for b in bases for i in range(8)}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    def mean_within(base):
        ids = [base + i for i in range(8)]
        return np.mean([cos(vecs[i], vecs[j]) for i in ids for j in ids if i < j])

    def mean_across(b1, b2):
        ids1 = [b1 + i for i in range(8)]
        ids2 = [b2 + i for i in range(8)]
        return np.mean([cos(vecs[i], vecs[j]) for i in ids1 for j in ids2])

    for k, b1 in enumerate(bases):
        for b2 in bases[k + 1:]:
            assert mean_within(b1) > mean_across(b1, b2) + 0.05, (b1, b2)
            assert mean_within(b2) > mean_across(b1, b2) + 0.05, (b1, b2)
