"""Deterministic vertex identity.

The reference derives edge/node identity from Python's salted ``hash()``
(``/root/reference/src/pyBiodatafuse/graph/generator.py:104``) — a defect
(non-deterministic across processes) we explicitly do not replicate
(SURVEY.md §4 item 4). Vertex id = ``xxhash64(canonical_url)`` — stable,
JVM-side, collision-negligible at 10^12 urls (64-bit).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ID_SEED = 42


def vertex_id(url: Column) -> Column:
    """64-bit deterministic vertex id for a canonical url column."""
    return F.xxhash64(url, F.lit(ID_SEED))


def edge_hash(*cols: Column) -> Column:
    """Deterministic edge identity over attribute columns (reference
    ``edge_hash`` analogue, generator.py:104-117, made process-stable)."""
    return F.xxhash64(*cols, F.lit(ID_SEED))
