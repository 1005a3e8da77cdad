"""Link-prediction candidate scoring (SURVEY.md §2.8 G10, re-expressed).

Reference pipeline (`algorithms/DREAMwalk/predict_associations.py:87-137` +
`calculate_drug_scores.py:47-122`): build (source × target) candidate pairs,
drop pairs already known (graph membership — `find_candidates`
`calculate_drug_scores.py:85-89`), score each pair with an ensemble of
models over embedding-pair features, average the probabilities
(`calculate_drug_scores.py:30-39`), and return the top-k candidates
(`:42`, `:119-120`).

Spark restatement, fully declarative: candidates = broadcast-able cross of
the two id sets MINUS the known-pair table (`left_anti` — U4); per-model
score = sigmoid(cosine + model offset) over the embedding columns (C6, all
JVM-side expressions); ensemble = arithmetic mean (A9); per-source top-k via
row_number window (W1). The XGBoost forests of the reference are an
exchangeable scoring function — the pipeline shape (candidate generation,
ensemble average, ranked cut) is what survives at 100 TB, and any learned
scorer slots into `score_exprs`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pybiodatafuse_spark.operators.similarity import cosine_expr


def default_ensemble(cos: Column, n_models: int = 3) -> list[Column]:
    """Deterministic stand-in ensemble: sigmoid(cos + 0.1*m) for model m.
    (The reference averages per-model XGBoost probabilities; the offsets give
    distinct, order-preserving deterministic 'models' the oracle can mirror.)"""
    return [
        F.lit(1.0) / (F.lit(1.0) + F.exp(-(cos + F.lit(0.1) * m)))
        for m in range(n_models)
    ]


def find_candidates(
    embeddings: DataFrame,
    sources: DataFrame,
    targets: DataFrame,
    known_pairs: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_models: int = 3,
) -> DataFrame:
    """(src, dst, avg_prob, rn): top-k NOT-yet-known targets per source by
    ensemble-averaged score.

    ``sources``/``targets``: 1-column (id) DataFrames; ``known_pairs``:
    (src, dst) existing associations (the reference's graph-membership test
    J10/U4 becomes a left_anti join). Embeddings join in by id; the cross of
    sources × targets is bounded by |S|×|T| — callers keep S small (it is
    the "query drugs" side in the reference) so the cross is broadcast-able.
    """
    emb_s = embeddings.select(
        F.col(id_col).alias("src"), F.col(vec_col).alias("ev_s")
    )
    emb_t = embeddings.select(
        F.col(id_col).alias("dst"), F.col(vec_col).alias("ev_t")
    )
    pairs = (
        sources.select(F.col(sources.columns[0]).alias("src"))
        .crossJoin(targets.select(F.col(targets.columns[0]).alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .join(known_pairs.select("src", "dst"), ["src", "dst"], "left_anti")
    )
    cos = cosine_expr(F.col("ev_s"), F.col("ev_t"))
    models = default_ensemble(cos, n_models)
    avg_prob = sum(models) / F.lit(float(len(models)))
    scored = (
        pairs.join(emb_s, "src")
        .join(emb_t, "dst")
        .select("src", "dst", F.round(avg_prob, 6).alias("avg_prob"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("avg_prob"), F.asc("dst"))
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def evaluate_predictions(
    scored: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    threshold: float = 0.5,
) -> dict[str, float]:
    """Classification metrics over (score, label∈{0,1}) — the reference's
    ``predict_associations.return_scores`` (``:72-85``: accuracy, ROC-AUC,
    average precision, F1), computed DISTRIBUTED:

    - ROC-AUC by the rank statistic (Mann–Whitney U): one global rank window
      over scores (average ranks for ties), one aggregate;
    - average precision (AP) from the score-descending precision/recall
      steps: window cumsums, one aggregate — no driver-side curve;
    - accuracy/F1 at ``threshold`` from fused conditional counts.

    Everything is two window passes + one agg — no collect of the score
    column. Returns {"accuracy", "roc_auc", "avg_precision", "f1"}.
    """
    s = scored.select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("double").alias("y"),
    )
    # average rank per tied score group: rank() gives the first index of the
    # tie group; avg rank = first + (n_ties - 1)/2
    w_asc = Window.orderBy("s")
    ties = Window.partitionBy("s")
    ranked = s.select(
        "s", "y",
        (
            F.rank().over(w_asc).cast("double")
            + (F.count(F.lit(1)).over(ties) - 1) / 2.0
        ).alias("r"),
    )
    w_desc = Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    curve = ranked.select(
        "s", "y", "r",
        F.sum("y").over(w_desc).alias("tp_at_k"),
        F.count(F.lit(1)).over(w_desc).cast("double").alias("k"),
    )
    row = curve.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("npos"),
        F.sum(F.when(F.col("y") == 1.0, F.col("r"))).alias("pos_rank_sum"),
        # AP = mean over positives of precision@their rank (ties broken by
        # the window's score-descending order, sklearn step definition)
        F.sum(
            F.when(F.col("y") == 1.0, F.col("tp_at_k") / F.col("k"))
        ).alias("ap_sum"),
        F.sum(
            F.when((F.col("s") >= threshold) & (F.col("y") == 1.0), 1).otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when((F.col("s") >= threshold) & (F.col("y") == 0.0), 1).otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when((F.col("s") < threshold) & (F.col("y") == 1.0), 1).otherwise(0)
        ).alias("fn"),
    ).first()
    n, npos = row["n"], float(row["npos"] or 0.0)
    nneg = n - npos
    tp, fp, fn = row["tp"], row["fp"], row["fn"]
    auc = (
        (float(row["pos_rank_sum"]) - npos * (npos + 1) / 2.0) / (npos * nneg)
        if npos > 0 and nneg > 0
        else float("nan")
    )
    ap = float(row["ap_sum"]) / npos if npos > 0 else float("nan")
    prec = tp / (tp + fp) if (tp + fp) else 0.0
    rec = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
    acc = (tp + (nneg - fp)) / n if n else float("nan")
    return {
        "accuracy": float(acc),
        "roc_auc": float(auc),
        "avg_precision": float(ap),
        "f1": float(f1),
    }
