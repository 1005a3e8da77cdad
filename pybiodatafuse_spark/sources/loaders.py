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


def dea_from_excel(
    spark: SparkSession, path: str, id_col: str | None = None, engine: str = "openpyxl"
) -> DataFrame:
    """DEA table from .xlsx/.xls (SURVEY S2/S4: ``data_loader.py:52-87``
    reads excel via pandas). Excel is driver-side small input in the
    reference too — read with pandas, then parallelize. Gated behind an
    import-try: this container ships no excel engine, so without
    openpyxl/xlrd this raises ImportError with a clear message rather than
    failing deep inside pandas."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path, engine=engine)
    except ImportError as ex:  # no openpyxl/xlrd in this environment
        raise ImportError(
            "dea_from_excel requires an excel engine (openpyxl/xlrd); "
            "install one or convert the sheet to csv and use dea_from_csv"
        ) from ex
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
