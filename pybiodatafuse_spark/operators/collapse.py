"""The reference's core relational operators, Spark-first.

- :func:`collapse_data_sources` — the universal annotator merge
  (`/root/reference/src/pyBiodatafuse/utils.py:81-118`): left-join an
  annotation table onto the xref table, then nest the annotation rows into
  ONE ArrayType(StructType) column per source via group-collect (J1 + A1).
  Unmatched keys keep a single null-struct entry, matching the reference's
  NaN-row semantics (tests/annotators/test_wikipathways.py:120).
- :func:`combine_sources` — the wide combined-DataFrame accumulation
  (`utils.py:121-156`, J2): full outer equi-join of annotator outputs on the
  xref key.
- :func:`get_identifier_of_interest` — namespace filter (`utils.py:17-40`, F1).
- :func:`combine_with_homologs` — explode → left-join → coalesce → re-nest
  (`utils.py:159-219`, J3).

Scale notes: group-collect is a single shuffle on the xref key; the collect
side is pre-projected so only annotation attrs move. Joins of small
annotation tables broadcast automatically under the session threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def get_identifier_of_interest(
    xref: DataFrame, db_source: str, keep: list[str] | None = None
) -> DataFrame:
    """Filter the xref table to rows whose target namespace is of interest
    (reference keeps `keep ∪ {db_source}`)."""
    sources = list(keep or []) + [db_source]
    return xref.where(F.col("target_source").isin(sources))


def collapse_data_sources(
    xref: DataFrame,
    annotations: DataFrame,
    *,
    source_name: str,
    on: list[str] | str = "target",
    attr_cols: list[str] | None = None,
    sort_keys: list[str] | None = None,
) -> DataFrame:
    """xref LEFT JOIN annotations on ``on``, annotation attrs nested into a
    single ``source_name`` array<struct> column, one row per xref row.

    ``sort_keys``: attr columns to sort each nested array by (deterministic
    output — the reference relies on pandas stable order; we make it explicit).
    """
    keys = [on] if isinstance(on, str) else list(on)
    attr_cols = attr_cols or [c for c in annotations.columns if c not in keys]
    ann = annotations.select(*keys, F.struct(*attr_cols).alias("_ann"))
    joined = xref.join(ann, keys, "left")
    collected = (
        joined.groupBy(*xref.columns)
        .agg(F.collect_list("_ann").alias("_anns"))
    )
    arr = F.col("_anns")
    if sort_keys:
        arr = F.array_sort(arr)
    # reference keeps one null-attr entry for unmatched keys
    struct_fields = ann.schema["_ann"].dataType.fields
    null_entry = F.array(
        F.struct(*[F.lit(None).cast(f.dataType).alias(f.name) for f in struct_fields])
    )
    return collected.select(
        *xref.columns,
        F.when(F.size(arr) > 0, arr).otherwise(null_entry).alias(source_name),
    )


def combine_sources(xref: DataFrame, annotated: list[DataFrame], on: list[str] | None = None) -> DataFrame:
    """Full-outer accumulate annotator outputs into one wide DataFrame keyed
    on the xref columns (reference iterated pandas outer merge)."""
    on = on or ["identifier", "identifier_source", "target", "target_source"]
    out = xref.select(*on).dropDuplicates(on)
    for ann in annotated:
        extra = [c for c in ann.columns if c not in on]
        out = out.join(ann.select(*on, *extra), on, "full_outer")
    return out


def combine_with_homologs(
    combined: DataFrame,
    homologs: DataFrame,
    annotation_cols: list[str],
    *,
    key: str = "target",
    homolog_key: str = "homolog",
) -> DataFrame:
    """Reference J3 (`utils.py:159-219`): rows whose nested annotation is
    missing/empty borrow the annotation of their homolog.

    explode homolog mapping → self-join the combined table on the homolog →
    per-row coalesce of each annotation column (own value wins when its
    array is non-empty) — the reference's `combine_first` restated as a
    single left join + coalesce, no row loop.
    """
    hom = homologs.select(
        F.col(key).alias("_k"), F.col(homolog_key).alias("_h")
    ).dropDuplicates(["_k"])
    donor = combined.select(
        F.col(key).alias("_h"),
        *[F.col(c).alias(f"_hom_{c}") for c in annotation_cols],
    )
    joined = (
        combined.join(hom, combined[key] == hom["_k"], "left")
        .join(donor, "_h", "left")
    )
    out_cols = []
    for c in combined.columns:
        if c in annotation_cols:
            # "present" = at least one entry with a non-null field (the
            # collapse null-entry placeholder serializes to '{}')
            own_ok = F.col(c).isNotNull() & F.exists(
                F.col(c), lambda e: F.to_json(e) != "{}"
            )
            out_cols.append(
                F.when(own_ok, F.col(c))
                .otherwise(F.coalesce(F.col(f"_hom_{c}"), F.col(c)))
                .alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols, F.col("_h").alias("homolog_of"))
