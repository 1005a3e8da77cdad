"""Reference relational-operator parity: collapse_data_sources nesting
semantics (incl. the null-entry row for unmatched keys), combine_sources
outer accumulation, namespace filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from pybiodatafuse_spark.operators.collapse import (
    collapse_data_sources,
    combine_sources,
    get_identifier_of_interest,
)


def _xref(spark):
    return spark.createDataFrame(
        [
            ("ALG14", "HGNC", "199857", "NCBI Gene"),
            ("CHRNA1", "HGNC", "1134", "NCBI Gene"),
            ("NOHIT", "HGNC", "0", "NCBI Gene"),
            ("ALG14", "HGNC", "Q3V5L5", "Uniprot"),
        ],
        "identifier string, identifier_source string, target string, target_source string",
    )


def test_namespace_filter(spark):
    out = get_identifier_of_interest(_xref(spark), "NCBI Gene")
    assert out.count() == 3
    assert {r["target_source"] for r in out.collect()} == {"NCBI Gene"}


def test_collapse_nests_and_keeps_null_entry(spark):
    xref = get_identifier_of_interest(_xref(spark), "NCBI Gene")
    ann = spark.createDataFrame(
        [
            ("199857", "WP1", "pathway one"),
            ("199857", "WP2", "pathway two"),
            ("1134", "WP3", "pathway three"),
        ],
        "target string, pathway_id string, pathway_label string",
    )
    out = collapse_data_sources(
        xref, ann, source_name="WikiPathways", sort_keys=["pathway_id"]
    ).collect()
    by_id = {r["identifier"]: r["WikiPathways"] for r in out}
    assert [e["pathway_id"] for e in by_id["ALG14"]] == ["WP1", "WP2"]
    assert [e["pathway_id"] for e in by_id["CHRNA1"]] == ["WP3"]
    # reference keeps one null-struct entry for unmatched keys
    # (/root/reference/tests/annotators/test_wikipathways.py:120 semantics)
    assert len(by_id["NOHIT"]) == 1 and by_id["NOHIT"][0]["pathway_id"] is None


def test_combine_sources_outer(spark):
    xref = _xref(spark)
    a = xref.limit(2).withColumn("colA", F.lit("a"))
    b = xref.limit(1).withColumn("colB", F.lit("b"))
    combined = combine_sources(xref, [a, b])
    rows = combined.collect()
    assert len(rows) == 4
    assert "colA" in combined.columns and "colB" in combined.columns
    with_b = [r for r in rows if r["colB"] is not None]
    assert len(with_b) == 1
