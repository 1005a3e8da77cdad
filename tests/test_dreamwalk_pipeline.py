"""End-to-end DREAMwalk pipeline (SURVEY.md §3.3 entry point 3): EM-trained
edge-type transition matrix → biased walks → skip-gram embeddings →
link-prediction candidates. The reference runs this as four driver-side
stages (networkx walk loop, parmap workers, a C++ word2vec subprocess,
sklearn); here it is one Spark program."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def typed_graph(spark):
    """Two 8-node communities bridged by a single typed edge; edge type 0
    inside community A, type 1 inside community B, type 2 on the bridge."""
    rows = []
    for base, et in ((0, 0), (20, 1)):
        for a in range(base, base + 8):
            for b in range(base, base + 8):
                if a != b and (a + b) % 3 != 0:
                    rows.append((a, b, 1.0, et))
    rows.append((7, 20, 1.0, 2))
    rows.append((20, 7, 1.0, 2))
    return spark.createDataFrame(
        rows, "src long, dst long, weight double, etype int"
    ).persist()


def test_dreamwalk_end_to_end(spark, typed_graph):
    from pybiodatafuse_spark.operators.linkpred import find_candidates
    from pybiodatafuse_spark.plans.em import train_transition_matrix
    from pybiodatafuse_spark.plans.embeddings import skipgram_embeddings
    from pybiodatafuse_spark.plans.walks import biased_random_walks

    # 1. EM transition matrix over 3 edge types
    M, deltas = train_transition_matrix(
        spark, typed_graph, num_etypes=3, max_iter=4, tol=1e-3
    )
    M = [list(map(float, row)) for row in np.asarray(M)]
    assert len(M) == 3 and all(abs(sum(r) - 1.0) < 1e-9 for r in M if sum(r) > 0)

    # 2. biased walks under the trained matrix
    starts = typed_graph.select(F.col("src").alias("id")).distinct()
    walks = biased_random_walks(
        spark, typed_graph, starts, M, num_walks=2, walk_length=6
    )
    n_walks = walks.count()
    assert n_walks == starts.count() * 2

    # 3. embeddings over the walks
    emb = skipgram_embeddings(
        spark, walks, dim=16, epochs=2, window=2, negatives=2, partitions=4
    ).withColumnRenamed("vector", "embedding").withColumnRenamed("id", "vec_id")

    # communities must separate in embedding space
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    a_ids = [i for i in vecs if i < 8]
    b_ids = [i for i in vecs if i >= 20]
    within = [cos(vecs[i], vecs[j]) for i in a_ids for j in a_ids if i < j]
    across = [cos(vecs[i], vecs[j]) for i in a_ids for j in b_ids]
    assert np.mean(within) > np.mean(across)

    # 4. candidate scoring over the learned embeddings
    sources = spark.createDataFrame([(i,) for i in a_ids[:3]], "vec_id long")
    targets = spark.createDataFrame([(i,) for i in vecs], "vec_id long")
    known = typed_graph.select("src", "dst")
    cands = find_candidates(emb, sources, targets, known, k=3)
    rows = cands.collect()
    assert len(rows) == 9  # 3 sources × top-3
    # known edges never resurface as candidates
    known_set = {(r["src"], r["dst"]) for r in known.collect()}
    assert all((r["src"], r["dst"]) not in known_set for r in rows)
