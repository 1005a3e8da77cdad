"""Information-content (Jiang–Conrath) similarity over a hierarchy
(SURVEY.md G11/J9; reference ``algorithms/DREAMwalk/generate_similarity_net.py:45-157``
computes IC with driver-side Counters and scores all pairs with
``combinations_with_replacement`` — quadratic and single-threaded).

Spark restatement:
- ``anc(node, anc)`` = transitive closure ∪ self-pairs (one table);
- ``IC(t) = -ln(|{n : t ∈ anc(n)}| / N)`` — one groupBy;
- for candidate pairs, MICA = common ancestor with max IC via
  anc ⋈ anc ⋈ IC + max-aggregation — pairs are only materialized where a
  common ancestor exists (the blocking that kills the quadratic scan);
- JC similarity = 1 / (1 + IC(a) + IC(b) − 2·IC(mica)).

Scale note (the root-ancestor trap): in any rooted hierarchy EVERY node
shares the root, so blocking on all ancestors yields N²/2 rows through the
root term alone. ``max_ancestor_df`` caps the document frequency of BLOCKING
ancestors (the same defense as ``dedup.ngram_jaccard_pairs(max_shingle_df)``).
The cap is EXACT for every emitted pair: IC is strictly decreasing in df
(IC = −ln(df/N)), so a capped ancestor (df > cap) always has lower IC than
any retained one (df ≤ cap) and can never be the MICA of a pair that shares
a retained ancestor. What the cap drops is pairs whose ONLY common ancestors
are high-df terms — exactly the least-similar pairs in the dataset (their
MICA IC is the lowest possible). With the default ``None`` the full (possibly
quadratic) semantics are kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pybiodatafuse_spark.operators.hierarchy import transitive_closure


def ancestors_with_self(hierarchy: DataFrame) -> DataFrame:
    closure = transitive_closure(hierarchy)
    nodes = (
        hierarchy.select(F.col("child").alias("node"))
        .unionByName(hierarchy.select(F.col("parent").alias("node")))
        .dropDuplicates(["node"])
    )
    return closure.unionByName(
        nodes.select("node", F.col("node").alias("ancestor"))
    ).dropDuplicates(["node", "ancestor"])


def information_content(anc: DataFrame) -> DataFrame:
    """(term, ic): ic = -ln(freq/N) where freq = #nodes having term as ancestor."""
    n_nodes = anc.select("node").distinct().count()
    return anc.groupBy(F.col("ancestor").alias("term")).agg(
        (-F.log(F.count(F.lit(1)) / F.lit(float(n_nodes)))).alias("ic")
    )


def candidate_mica(
    anc: DataFrame, ic: DataFrame, max_ancestor_df: int | None = None
) -> DataFrame:
    """(a, b, ic_mica) for pairs a<b sharing ≥1 (blocking-eligible) ancestor.

    With ``max_ancestor_df`` set, ancestors held by more than that many nodes
    are excluded from candidate generation — see the module docstring for the
    exactness argument (retained pairs keep their true MICA)."""
    blocking = anc
    if max_ancestor_df is not None:
        df_ok = (
            anc.groupBy("ancestor")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_ancestor_df)
            .select("ancestor")
        )
        blocking = anc.join(df_ok, "ancestor")
    a = blocking.select(F.col("node").alias("a"), F.col("ancestor").alias("term"))
    b = blocking.select(F.col("node").alias("b"), F.col("ancestor").alias("term"))
    return (
        a.join(b, "term")
        .where(F.col("a") < F.col("b"))
        .join(ic, "term")
        .groupBy("a", "b")
        .agg(F.max("ic").alias("ic_mica"))
    )


def jiang_conrath_similarity(
    hierarchy: DataFrame,
    threshold: float = 0.0,
    max_ancestor_df: int | None = None,
) -> DataFrame:
    """(a, b, sim) for all node pairs a<b sharing ≥1 ancestor.

    ``max_ancestor_df``: document-frequency cap on blocking ancestors — the
    scale path for rooted hierarchies (root df = N would otherwise produce
    N²/2 candidate rows). Emitted pairs are exact under the cap; pairs whose
    only shared ancestors exceed the cap are omitted."""
    anc = ancestors_with_self(hierarchy).persist()
    ic = information_content(anc)
    mica = candidate_mica(anc, ic, max_ancestor_df)
    ic_a = ic.select(F.col("term").alias("a"), F.col("ic").alias("ic_a"))
    ic_b = ic.select(F.col("term").alias("b"), F.col("ic").alias("ic_b"))
    out = (
        mica.join(ic_a, "a")
        .join(ic_b, "b")
        .select(
            "a",
            "b",
            (
                1.0
                / (1.0 + F.col("ic_a") + F.col("ic_b") - 2.0 * F.col("ic_mica"))
            ).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
    anc.unpersist()
    return out
