"""RDF / N-Triples sink (SURVEY.md K6) — full reference parity.

Reference emits triples row-by-row through rdflib:
- node + typed-literal triples per row (``graph/rdf/rdf.py:157-215``
  ``generate_rdf`` → ``process_row``);
- graph-level metadata/provenance (``graph/rdf/metadata.py:71-114``
  ``add_metadata``: dcterms created/title/description/creator;
  ``:278-292`` ``add_data_source_node``: void:Dataset + rdfs:label per
  datasource);
- SHACL prefix graph (``graph/rdf/rdf.py:1191-1210`` ``shacl_prefixes``).

Spark restatement: every O(N) triple family is a pure column projection
(JVM-side concat — distributed, no driver loop); only the O(1) graph-level
metadata rows are driver-built. Literals are N-Triples-escaped with built-in
regexp_replace (backslash first, then quote) — still whole-stage codegen.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BASE = "urn:bdf"

# reference rdf.py:144-155 binds these namespaces; mirrored for the
# shacl_prefixes export
NAMESPACES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "dcat": "http://www.w3.org/ns/dcat#",
    "dcterms": "http://purl.org/dc/terms/",
    "pav": "http://purl.org/pav/",
    "void": "http://rdfs.org/ns/void#",
    "schema": "https://schema.org/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "sh": "http://www.w3.org/ns/shacl#",
    "bdf": f"{BASE}:",
}

_SH = "http://www.w3.org/ns/shacl#"

_RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
_RDFS_LABEL = "<http://www.w3.org/2000/01/rdf-schema#label>"
_XSD = "http://www.w3.org/2001/XMLSchema#"


def _esc(c: Column) -> Column:
    """N-Triples literal escaping: backslash first, then double-quote.
    (Replacement strings are Java-regex replacements: a literal backslash in
    the OUTPUT needs ``\\\\`` there, hence the doubling below.)"""
    return F.regexp_replace(
        F.regexp_replace(c.cast("string"), r"\\", "\\\\\\\\"), '"', '\\\\"'
    )


def _node(c: Column) -> Column:
    return F.concat(F.lit(f"<{BASE}:node:"), c.cast("string"), F.lit(">"))


def node_triples(vertices: DataFrame) -> DataFrame:
    """<urn:bdf:node:ID> <...rdf#type> <urn:bdf:type:TYPE> . — the typed
    node statement the reference's process_row emits per entity row."""
    return vertices.select(
        F.concat(
            _node(F.col("id")),
            F.lit(f" {_RDF_TYPE} <{BASE}:type:"),
            F.col("type").cast("string"),
            F.lit("> ."),
        ).alias("triple")
    )


def node_attribute_triples(
    vertices: DataFrame, attrs: dict[str, str]
) -> DataFrame:
    """One typed-literal triple per (node, attribute): ``attrs`` maps column
    name → xsd type suffix (e.g. {"label": "string", "score": "double"}).
    Nulls are skipped (reference process_row behavior)."""
    outs = []
    for col, xsd in attrs.items():
        pred = f"<{BASE}:pred:{col}>" if col != "label" else _RDFS_LABEL
        outs.append(
            vertices.where(F.col(col).isNotNull()).select(
                F.concat(
                    _node(F.col("id")),
                    F.lit(f' {pred} "'),
                    _esc(F.col(col)),
                    F.lit(f'"^^<{_XSD}{xsd}> .'),
                ).alias("triple")
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def edge_triples(edges: DataFrame, predicate: str = "links_to") -> DataFrame:
    """<urn:bdf:node:SRC> <urn:bdf:pred:links_to> <urn:bdf:node:DST> ."""
    return edges.select(
        F.concat(
            F.lit(f"<{BASE}:node:"), F.col("src").cast("string"),
            F.lit(f"> <{BASE}:pred:{predicate}> <{BASE}:node:"),
            F.col("dst").cast("string"), F.lit("> ."),
        ).alias("triple")
    )


def metadata_triples(
    spark: SparkSession,
    *,
    graph_uri: str = f"{BASE}:graph",
    title: str | None = None,
    description: str | None = None,
    author: str | None = None,
    datasources: list[str] | None = None,
    created: str | None = None,
) -> DataFrame:
    """Graph-level provenance triples (reference metadata.add_metadata +
    add_data_source_node): dcterms created/title/description/creator, one
    void:Dataset + rdfs:label pair per datasource. O(1) rows — driver-built
    by design (the reference collects exactly this scalar metadata)."""
    dct = NAMESPACES["dcterms"]
    void = NAMESPACES["void"]
    g = f"<{graph_uri}>"
    created = created or datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    rows = [f'{g} <{dct}created> "{created}"^^<{_XSD}dateTime> .']
    if title:
        rows.append(f'{g} <{dct}title> "{title}"^^<{_XSD}string> .')
    if description:
        rows.append(f'{g} <{dct}description> "{description}"^^<{_XSD}string> .')
    if author:
        rows.append(f'{g} <{dct}creator> "{author}"^^<{_XSD}string> .')
    for ds in datasources or []:
        s = f"<{BASE}:source:{ds}>"
        rows.append(f"{s} {_RDF_TYPE} <{void}Dataset> .")
        rows.append(f'{s} {_RDFS_LABEL} "{ds}"^^<{_XSD}string> .')
        rows.append(f"{g} <{dct}source> {s} .")
    return spark.createDataFrame([(r,) for r in rows], "triple string")


def shacl_prefixes(namespaces: dict[str, str] | None = None) -> str:
    """TTL prefix block (reference rdf.py:1191-1210 shacl_prefixes)."""
    ns = dict(NAMESPACES)
    if namespaces:
        ns.update(namespaces)
    return "\n".join(
        f"@prefix {k}: <{v}> ." for k, v in sorted(ns.items())
    ) + "\n"


def _shape_stats(
    vertices: DataFrame,
    edges: DataFrame | None,
    attrs: dict[str, str],
) -> DataFrame:
    """Shared frequency-mining aggregate for SHACL and ShEx shape export:
    per node ``type`` the instance count ``_n``, each attribute's non-null
    count ``_c_<col>``, and (semi-join on the edge table) the has-out-edge
    count ``_c_out``. ONE groupBy; O(#types) rows."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for col in attrs:
        aggs.append(F.count(F.col(col)).alias(f"_c_{col}"))
    agg = vertices.groupBy("type").agg(*aggs)
    if edges is not None:
        has_out = (
            vertices.join(
                edges.select(F.col("src").alias("id")).dropDuplicates(["id"]),
                "id",
                "left_semi",
            )
            .groupBy("type")
            .agg(F.count(F.lit(1)).alias("_c_out"))
        )
        agg = agg.join(has_out, "type", "left").withColumn(
            "_c_out", F.coalesce(F.col("_c_out"), F.lit(0))
        )
    return agg


def shacl_shapes(
    vertices: DataFrame,
    edges: DataFrame | None = None,
    *,
    attrs: dict[str, str] | None = None,
    predicate: str = "links_to",
    threshold: float = 0.001,
) -> DataFrame:
    """Frequency-mined SHACL node shapes (K6 tail — the reference's
    ``Graph.shacl`` runs shexer's all-classes shape mining over the instance
    graph, ``graph/rdf/rdf.py:1164-1189`` → ``utils.py:88-165``).

    Spark restatement of the same mining, declarative end-to-end: ONE
    groupBy over the vertex table computes, per node ``type``, the instance
    count, each attribute's non-null count, and (via a semi-join on the
    edge table) the has-out-edge count. A property constraint is emitted
    when its observed frequency ≥ ``threshold`` (shexer's
    ``acceptance_threshold``), with ``sh:minCount 1`` exactly when the
    property is present on EVERY instance of the type. The aggregated
    relation is O(#types) rows; the triple assembly is a projection.

    Emits, per type T (subject ``<urn:bdf:shape:T>``):
      ``a sh:NodeShape`` / ``sh:targetClass <urn:bdf:type:T>``, and per
      accepted property P: ``sh:property <urn:bdf:shape:T:prop:P>`` with
      ``sh:path`` / ``sh:datatype`` (``sh:nodeKind sh:IRI`` for the edge
      predicate) / conditional ``sh:minCount 1``.
    """
    attrs = attrs or {}
    agg = _shape_stats(vertices, edges, attrs)

    shape = F.concat(F.lit(f"<{BASE}:shape:"), F.col("type").cast("string"))
    node_shape = agg.select(
        F.explode(
            F.array(
                F.concat(shape, F.lit(f"> {_RDF_TYPE} <{_SH}NodeShape> .")),
                F.concat(
                    shape,
                    F.lit(f"> <{_SH}targetClass> <{BASE}:type:"),
                    F.col("type").cast("string"),
                    F.lit("> ."),
                ),
            )
        ).alias("triple")
    )
    out = node_shape

    def prop_triples(col: str, path: str, dt_triple, cnt: Column) -> DataFrame:
        prop = F.concat(shape, F.lit(f":prop:{col}"))
        base_arr = F.array(
            F.concat(shape, F.lit(f"> <{_SH}property> "), prop, F.lit("> .")),
            F.concat(prop, F.lit(f"> <{_SH}path> {path} .")),
            dt_triple(prop),
        )
        with_min = F.concat(
            base_arr,
            F.when(
                cnt == F.col("_n"),
                F.array(F.concat(prop, F.lit(f"> <{_SH}minCount> 1 ."))),
            ).otherwise(F.array().cast("array<string>")),
        )
        return agg.where(cnt / F.col("_n") >= threshold).select(
            F.explode(with_min).alias("triple")
        )

    for col, xsd in attrs.items():
        path = _RDFS_LABEL if col == "label" else f"<{BASE}:pred:{col}>"
        out = out.unionByName(
            prop_triples(
                col,
                path,
                lambda prop, x=xsd: F.concat(
                    prop, F.lit(f"> <{_SH}datatype> <{_XSD}{x}> .")
                ),
                F.col(f"_c_{col}"),
            )
        )
    if edges is not None:
        out = out.unionByName(
            prop_triples(
                predicate,
                f"<{BASE}:pred:{predicate}>",
                lambda prop: F.concat(
                    prop, F.lit(f"> <{_SH}nodeKind> <{_SH}IRI> .")
                ),
                F.col("_c_out"),
            )
        )
    return out


def shex_prefixes(namespaces: dict[str, str] | None = None) -> str:
    """ShEx PREFIX block (ShExC syntax — ``PREFIX k: <v>``, no trailing
    dot, unlike Turtle's ``@prefix``)."""
    ns = dict(NAMESPACES)
    if namespaces:
        ns.update(namespaces)
    return "\n".join(f"PREFIX {k}: <{v}>" for k, v in sorted(ns.items())) + "\n"


def shex_shapes(
    vertices: DataFrame,
    edges: DataFrame | None = None,
    *,
    attrs: dict[str, str] | None = None,
    predicate: str = "links_to",
    threshold: float = 0.001,
) -> DataFrame:
    """ShEx shape expressions mined from the instance graph (the reference's
    ``Graph.shex`` runs shexer's all-classes extraction and serializes
    ShExC, ``graph/rdf/rdf.py:1135-1163``).

    Same frequency mining as :func:`shacl_shapes` (one groupBy, O(#types)
    rows), different serialization: per node type T one row
    ``(shape: string, shex: string)`` where ``shex`` is the complete ShExC
    shape declaration with deterministic constraint order (``attrs``
    insertion order, then the edge predicate):

        <urn:bdf:shape:T> {
          <pred-uri> <xsd-datatype-or-IRI> CARD ;
          ...
        }

    A constraint is emitted when its observed frequency ≥ ``threshold``
    (shexer's acceptance threshold); cardinality is ``+`` (one or more)
    exactly when the property is present on EVERY instance of the type —
    the same total-coverage rule that drives ``sh:minCount 1`` in the SHACL
    export — and ``*`` (zero or more) otherwise. The entire serialization
    is a JVM-side column projection (concat/when/array_join), no driver
    loop over shapes."""
    attrs = attrs or {}
    agg = _shape_stats(vertices, edges, attrs)

    def constraint(pred_uri: str, value_expr: str, cnt: Column) -> Column:
        card = F.when(cnt == F.col("_n"), F.lit("+")).otherwise(F.lit("*"))
        return F.when(
            cnt / F.col("_n") >= threshold,
            F.concat(F.lit(f"  <{pred_uri}> {value_expr} "), card),
        )

    lines = []
    for col, xsd in attrs.items():
        pred_uri = (
            "http://www.w3.org/2000/01/rdf-schema#label"
            if col == "label"
            else f"{BASE}:pred:{col}"
        )
        lines.append(constraint(pred_uri, f"<{_XSD}{xsd}>", F.col(f"_c_{col}")))
    if edges is not None:
        lines.append(constraint(f"{BASE}:pred:{predicate}", "IRI", F.col("_c_out")))

    shape_uri = F.concat(F.lit(f"{BASE}:shape:"), F.col("type").cast("string"))
    # array_join drops null entries (rejected constraints) by design
    body = F.array_join(F.array(*lines), " ;\n") if lines else F.lit("")
    return agg.select(
        shape_uri.alias("shape"),
        F.concat(
            F.lit("<"), shape_uri, F.lit("> {\n"), body, F.lit("\n}")
        ).alias("shex"),
    )


def write_shex(
    vertices: DataFrame,
    edges: DataFrame | None,
    path: str,
    *,
    attrs: dict[str, str] | None = None,
    predicate: str = "links_to",
    threshold: float = 0.001,
    namespaces: dict[str, str] | None = None,
    max_shapes: int = 10_000,
) -> int:
    """Write the complete ShExC schema (PREFIX block + every mined shape,
    sorted by shape URI) to a local file — the reference ``shex()`` file
    artifact. The shape set is O(#node-types), so the driver-side collect is
    bounded; ``max_shapes`` guards against a mistyped ``type`` column (e.g.
    a unique id) turning it into a full-table collect. Returns the number of
    shapes written."""
    rows = (
        shex_shapes(
            vertices, edges, attrs=attrs, predicate=predicate, threshold=threshold
        )
        .orderBy("shape")
        .limit(max_shapes + 1)
        .collect()
    )
    if len(rows) > max_shapes:
        raise ValueError(
            f"write_shex: more than {max_shapes} shapes — is the `type` "
            f"column actually a type (got ≥{len(rows)} distinct values)?"
        )
    with open(path, "w") as fh:
        fh.write(shex_prefixes(namespaces))
        for r in rows:
            fh.write("\n" + r["shex"] + "\n")
    return len(rows)


def generate_rdf(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    attrs: dict[str, str] | None = None,
    predicate: str = "links_to",
    **metadata,
) -> DataFrame:
    """Full graph → one `triple` column: typed nodes + attribute literals +
    edges + provenance (the reference generate_rdf pipeline, distributed)."""
    out = node_triples(vertices).unionByName(edge_triples(edges, predicate))
    if attrs:
        out = out.unionByName(node_attribute_triples(vertices, attrs))
    return out.unionByName(metadata_triples(spark, **metadata))


def write_ntriples(
    vertices: DataFrame,
    edges: DataFrame,
    path: str,
    *,
    attrs: dict[str, str] | None = None,
    prefixes_path: str | None = None,
    **metadata,
) -> None:
    spark = vertices.sparkSession
    generate_rdf(spark, vertices, edges, attrs=attrs, **metadata).write.mode(
        "overwrite"
    ).text(path)
    if prefixes_path:
        with open(prefixes_path, "w") as f:
            f.write(shacl_prefixes())
