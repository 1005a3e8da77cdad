"""Input loaders (SURVEY.md §2.1 S1-S5, S13; §2.2 F4).

Reference analogues in ``/root/reference/src/pyBiodatafuse/data_loader.py``:
- ``create_df_from_text`` (:33-49)  → :func:`identifiers_from_text`
- ``create_df_from_file`` (:11-30)  → :func:`identifiers_from_file`
- ``create_df_from_dea``  (:52-87)  → :func:`dea_from_csv`
- ``filter_dea``          (:90-124) → :func:`filter_dea`
- datasources registry    (`id_mapper.py:26-34`) → :func:`registry`
- pickle resume           (`graph/generator.py:19-28`) → :func:`read_pages`
  (parquet/Iceberg snapshot read with hard schema enforcement)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pybiodatafuse_spark.schema import PAGES_SCHEMA, enforce


def identifiers_from_text(spark: SparkSession, text: str) -> DataFrame:
    """Split free text on commas/whitespace into a 1-column identifier DF
    (reference splits on ``[,\\n]+``; we accept any whitespace too)."""
    parts = [p.strip() for p in text.replace(",", "\n").split() if p.strip()]
    return spark.createDataFrame([(p,) for p in parts], "identifier string")


def identifiers_from_file(spark: SparkSession, path: str) -> DataFrame:
    """One identifier per comma/newline-separated token in a text file —
    distributed read (spark.read.text + split + explode)."""
    return (
        spark.read.text(path)
        .select(F.explode(F.split(F.col("value"), r"[,\s]+")).alias("identifier"))
        .where(F.col("identifier") != "")
    )


def dea_from_csv(spark: SparkSession, path: str, id_col: str | None = None) -> DataFrame:
    """Differential-expression-style table: csv with header; first (or named)
    column renamed to ``identifier``."""
    df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    first = id_col or df.columns[0]
    return df.withColumnRenamed(first, "identifier")


def _read_xlsx_rows(path: str) -> list[list]:
    """Minimal stdlib .xlsx reader (a .xlsx is a zip of XML): parses
    sharedStrings + the first worksheet's inline/shared values. Covers the
    flat header+data DEA sheets the reference reads — no openpyxl needed."""
    import os
    import re
    import xml.etree.ElementTree as ET
    import zipfile

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", ns):
                shared.append("".join(t.text or "" for t in si.iter(
                    "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"
                )))
        # numeric sort: lexicographic picks sheet10.xml over sheet2.xml
        sheet = min(
            (
                n for n in z.namelist()
                if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
            ),
            key=lambda n: int(re.search(r"\d+", os.path.basename(n)).group()),
        )
        root = ET.fromstring(z.read(sheet))
    rows: list[list] = []
    for row in root.iter("{http://schemas.openxmlformats.org/spreadsheetml/2006/main}row"):
        vals: dict[int, object] = {}
        for c in row.findall("m:c", ns):
            ref = c.get("r", "")
            col = 0
            for ch in ref:
                if ch.isalpha():
                    col = col * 26 + (ord(ch.upper()) - 64)
            v = c.find("m:v", ns)
            if v is None or v.text is None:
                continue
            if c.get("t") == "s":  # shared string
                vals[col - 1] = shared[int(v.text)]
            elif c.get("t") == "str":
                vals[col - 1] = v.text
            else:
                f = float(v.text)
                vals[col - 1] = int(f) if f.is_integer() else f
        if vals:
            width = max(vals) + 1
            rows.append([vals.get(i) for i in range(width)])
    return rows


def dea_from_excel(
    spark: SparkSession, path: str, id_col: str | None = None, engine: str = "auto"
) -> DataFrame:
    """DEA table from .xlsx/.xls (SURVEY S2/S4: ``data_loader.py:52-87``
    reads excel via pandas). Excel is driver-side small input in the
    reference too — read on the driver, then parallelize.

    ``engine="auto"`` (default): use pandas+openpyxl/xlrd when available,
    else fall back to the stdlib .xlsx parser (``_read_xlsx_rows``) — this
    container ships no excel engine, and the fallback keeps S4 fully
    functional for .xlsx. Legacy binary .xls still requires xlrd."""
    import pandas as pd

    if engine == "auto":
        try:
            import openpyxl  # noqa: F401

            engine = "openpyxl"
        except ImportError:
            engine = "stdlib"
    if engine == "stdlib":
        if not path.lower().endswith(".xlsx"):
            raise ImportError(
                "legacy .xls requires the xlrd engine (unavailable here); "
                "convert to .xlsx/.csv or install xlrd"
            )
        rows = _read_xlsx_rows(path)
        if not rows:
            raise ValueError(f"empty xlsx sheet: {path}")
        header = [str(h) for h in rows[0]]
        # pad/truncate ragged rows to the header width — a populated cell to
        # the right of the header (or a short row) must not crash the load
        w = len(header)
        data = [r[:w] + [None] * (w - len(r)) for r in rows[1:]]
        pdf = pd.DataFrame(data, columns=header)
    else:
        pdf = pd.read_excel(path, engine=engine)
    first = id_col or pdf.columns[0]
    pdf = pdf.rename(columns={first: "identifier"})
    return spark.createDataFrame(pdf)


def filter_dea(
    df: DataFrame,
    col: str,
    *,
    min_val: float | None = None,
    max_val: float | None = None,
    abs_min: float | None = None,
) -> DataFrame:
    """Range / abs-threshold row filter (reference filter_dea)."""
    out = df
    if min_val is not None:
        out = out.where(F.col(col) >= min_val)
    if max_val is not None:
        out = out.where(F.col(col) <= max_val)
    if abs_min is not None:
        out = out.where(F.abs(F.col(col)) >= abs_min)
    return out


def registry(spark: SparkSession, entries: list[tuple[str, str]]) -> DataFrame:
    """Small broadcast lookup table (reference datasources.csv): join with
    ``F.broadcast`` — the Spark form of the reference's Series.map(dict)."""
    return spark.createDataFrame(entries, "source string, target_type string")


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Pages snapshot scan with hard schema enforcement (Iceberg on a real
    cluster; parquet here — same contract)."""
    return enforce(spark.read.parquet(path), PAGES_SCHEMA, "pages")


def write_pages(df: DataFrame, path: str) -> None:
    enforce(df, PAGES_SCHEMA, "pages").write.mode("overwrite").parquet(path)
