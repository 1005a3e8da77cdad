"""Link-prediction candidate scoring (G10): numpy-oracle exactness, known-
pair exclusion, ranking determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pybiodatafuse_spark.operators.linkpred import find_candidates

DIM = 8
N = 40


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(N, DIM)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(N)],
        "vec_id long, embedding array<float>",
    ).cache()
    return df, base


def _oracle(base, S, T, known, k=5, n_models=3):
    x = base.astype(np.float64)
    norms = np.linalg.norm(x, axis=1)
    out = {}
    for s in S:
        rows = []
        for t in T:
            if t == s or (s, t) in known:
                continue
            cos = float(x[s] @ x[t] / (norms[s] * norms[t]))
            probs = [1.0 / (1.0 + np.exp(-(cos + 0.1 * m))) for m in range(n_models)]
            rows.append((t, round(sum(probs) / n_models, 6)))
        rows.sort(key=lambda r: (-r[1], r[0]))
        out[s] = rows[:k]
    return out


def test_candidates_match_numpy_oracle(spark, emb):
    df, base = emb
    S, T = [0, 1, 2], list(range(10, 30))
    known = {(s, t) for s in S for t in T if (s + t) % 5 == 0}
    sources = spark.createDataFrame([(s,) for s in S], "vec_id long")
    targets = spark.createDataFrame([(t,) for t in T], "vec_id long")
    known_df = spark.createDataFrame(list(known), "src long, dst long")
    got = {}
    for r in find_candidates(df, sources, targets, known_df, k=5).collect():
        got.setdefault(r["src"], []).append((r["rn"], r["dst"], r["avg_prob"]))
    want = _oracle(base, S, T, known)
    for s in S:
        got_sorted = [(d, p) for _, d, p in sorted(got[s])]
        assert [d for d, _ in got_sorted] == [d for d, _ in want[s]]
        assert all(abs(p - wp) < 1e-6 for (_, p), (_, wp) in zip(got_sorted, want[s]))


def test_known_pairs_never_returned(spark, emb):
    df, _ = emb
    sources = spark.createDataFrame([(0,)], "vec_id long")
    targets = spark.createDataFrame([(t,) for t in range(10, 20)], "vec_id long")
    known = spark.createDataFrame([(0, t) for t in range(10, 18)], "src long, dst long")
    res = find_candidates(df, sources, targets, known, k=10).collect()
    returned = {(r["src"], r["dst"]) for r in res}
    assert returned == {(0, 18), (0, 19)}  # only the two unknown targets


def test_evaluate_predictions_matches_numpy(spark):
    """G10 metrics (reference predict_associations.return_scores): ROC-AUC
    (Mann-Whitney), average precision, accuracy, F1 vs a numpy oracle on
    tie-free scores."""
    import numpy as np

    from pybiodatafuse_spark.operators.linkpred import evaluate_predictions

    rng = np.random.default_rng(11)
    n = 400
    y = (rng.random(n) < 0.3).astype(int)
    # informative but noisy scores, jittered to be tie-free
    s = 0.55 * y + 0.4 * rng.random(n) + 1e-9 * np.arange(n)
    df = spark.createDataFrame(
        [(float(si), int(yi)) for si, yi in zip(s, y)], "score double, label int"
    )
    got = evaluate_predictions(df)

    order = np.argsort(-s, kind="mergesort")
    ys = y[order]
    tp_cum = np.cumsum(ys)
    k = np.arange(1, n + 1)
    ap = float(np.sum((tp_cum / k) * ys) / ys.sum())
    ranks = np.empty(n)
    ranks[np.argsort(s, kind="mergesort")] = np.arange(1, n + 1)
    npos, nneg = ys.sum(), n - ys.sum()
    auc = float((ranks[y == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg))
    pred = (s >= 0.5).astype(int)
    tp = int(((pred == 1) & (y == 1)).sum())
    fp = int(((pred == 1) & (y == 0)).sum())
    fn = int(((pred == 0) & (y == 1)).sum())
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    want = {
        "accuracy": ((pred == y).sum()) / n,
        "roc_auc": auc,
        "avg_precision": ap,
        "f1": 2 * prec * rec / (prec + rec),
    }
    for m, v in want.items():
        assert abs(got[m] - v) < 1e-9, (m, got[m], v)
    assert got["roc_auc"] > 0.8  # the scores are informative


def test_evaluate_predictions_tied_scores_sklearn_steps(spark):
    """Tied scores across classes: AP must follow the tie-correct threshold-
    step definition (deterministic — independent of intra-tie row order),
    AUC the average-tied-rank statistic."""
    import numpy as np

    from pybiodatafuse_spark.operators.linkpred import evaluate_predictions

    #          score: 0.9  0.9  0.7  0.7  0.7  0.3  0.3
    #          label:  1    0    1    1    0    0    1
    rows = [(0.9, 1), (0.9, 0), (0.7, 1), (0.7, 1), (0.7, 0), (0.3, 0), (0.3, 1)]
    got = evaluate_predictions(
        spark.createDataFrame(rows, "score double, label int")
    )
    s = np.array([r[0] for r in rows])
    y = np.array([r[1] for r in rows])
    npos, nneg = y.sum(), (1 - y).sum()
    # AUC: per positive, negatives strictly below + half the tied negatives
    u = sum(((s < si) & (y == 0)).sum() + 0.5 * ((s == si) & (y == 0)).sum()
            for si, yi in rows if yi == 1)
    want_auc = u / (npos * nneg)
    # AP over distinct thresholds descending: sum dRecall * precision@thr
    want_ap = 0.0
    for thr in sorted(set(s), reverse=True):
        tp_ge = ((s >= thr) & (y == 1)).sum()
        n_ge = (s >= thr).sum()
        pos_at = ((s == thr) & (y == 1)).sum()
        want_ap += (pos_at / npos) * (tp_ge / n_ge)
    assert abs(got["roc_auc"] - want_auc) < 1e-12
    assert abs(got["avg_precision"] - want_ap) < 1e-12
    # shuffling the input rows changes nothing (tie-order independence)
    got2 = evaluate_predictions(
        spark.createDataFrame(rows[::-1], "score double, label int")
    )
    assert got2 == got
