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


def _score_curve(scored: DataFrame, score_col: str, label_col: str):
    """Per-distinct-score groups with DISTRIBUTED ordered prefix sums.

    Returns ``(curve, rb, n, npos)`` where curve has
    (s, pos_s, cnt_s, pos_below, cnt_below): pos/cnt strictly below each
    score. No global-sort window anywhere — the scan is range-partition by
    score → window WITHIN each partition → add per-partition offsets merged
    on the driver (≤ shuffle-partitions scalars), the classic two-pass
    parallel prefix scan. ``rb`` is the persisted intermediate for the
    caller to unpersist."""
    from pyspark import StorageLevel

    spark = scored.sparkSession
    s = scored.select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("double").alias("y"),
    )
    g = s.groupBy("s").agg(
        F.sum("y").alias("pos_s"),
        F.count(F.lit(1)).cast("double").alias("cnt_s"),
    )
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rb = (
        g.repartitionByRange(parts, F.asc("s"))
        .withColumn("pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pid_tot = sorted(
        (r["pid"], float(r["p"] or 0.0), float(r["c"]))
        for r in rb.groupBy("pid")
        .agg(F.sum("pos_s").alias("p"), F.sum("cnt_s").alias("c"))
        .collect()
    )
    offs, acc_p, acc_c = [], 0.0, 0.0
    for pid, p_tot, c_tot in pid_tot:
        offs.append((pid, acc_p, acc_c))
        acc_p += p_tot
        acc_c += c_tot
    off_df = F.broadcast(
        spark.createDataFrame(
            offs or [(0, 0.0, 0.0)], "pid int, pos_off double, cnt_off double"
        )
    )
    w_in = (
        Window.partitionBy("pid")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    curve = rb.join(off_df, "pid").select(
        "s",
        "pos_s",
        "cnt_s",
        (F.col("pos_off") + F.coalesce(F.sum("pos_s").over(w_in), F.lit(0.0))).alias(
            "pos_below"
        ),
        (F.col("cnt_off") + F.coalesce(F.sum("cnt_s").over(w_in), F.lit(0.0))).alias(
            "cnt_below"
        ),
    )
    return curve, rb, acc_c, acc_p


def evaluate_predictions(
    scored: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    threshold: float = 0.5,
) -> dict[str, float]:
    """Classification metrics over (score, label∈{0,1}) — the reference's
    ``predict_associations.return_scores`` (``:72-85``: accuracy, ROC-AUC,
    average precision, F1), computed with NO global-sort window (a
    ``Window.orderBy`` without partitioning coalesces the whole relation
    into one task — the single-node bottleneck this operator must avoid at
    candidate-scoring scale):

    1. collapse rows to per-distinct-score (pos, count) aggregates — both
       metrics are functions of these groups, which also makes ties exact
       (sklearn's threshold-step AP definition) and deterministic;
    2. ordered prefix sums via the two-pass parallel scan: range-partition
       by score, window WITHIN each partition, add per-partition offsets
       merged on the driver (≤ shuffle-partitions scalars);
    3. ROC-AUC = Mann–Whitney U from (negatives below + ½·tied negatives),
       AP = Σ_thresholds ΔRecall·Precision, accuracy/F1 from fused
       conditional counts — one final aggregate.

    The only driver-side data are the per-partition totals and the final
    scalar row. Returns {"accuracy", "roc_auc", "avg_precision", "f1"}.
    """
    curve, rb, n, npos = _score_curve(scored, score_col, label_col)
    nneg = n - npos
    neg_s = F.col("cnt_s") - F.col("pos_s")
    neg_below = F.col("cnt_below") - F.col("pos_below")
    row = curve.agg(
        # Mann–Whitney U: Σ over score groups of pos·(negs below + ½·tied
        # negs) — exactly the average-tied-rank statistic, no ranks needed
        F.sum(F.col("pos_s") * (neg_below + 0.5 * neg_s)).alias("u"),
        # sklearn AP: Σ over thresholds (distinct scores, descending) of
        # ΔRecall·Precision@threshold; ≥-s counts from the below-prefixes
        F.sum(
            F.col("pos_s")
            * (F.lit(npos) - F.col("pos_below"))
            / (F.lit(n) - F.col("cnt_below"))
        ).alias("ap_sum"),
        F.sum(F.when(F.col("s") >= threshold, F.col("pos_s"))).alias("tp"),
        F.sum(F.when(F.col("s") >= threshold, neg_s)).alias("fp"),
        F.sum(F.when(F.col("s") < threshold, F.col("pos_s"))).alias("fn"),
    ).first()
    rb.unpersist()
    tp, fp, fn = float(row["tp"] or 0.0), float(row["fp"] or 0.0), float(row["fn"] or 0.0)
    auc = (
        float(row["u"]) / (npos * nneg) if npos > 0 and nneg > 0 else float("nan")
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
