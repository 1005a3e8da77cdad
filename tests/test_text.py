"""Text-analysis functions: tokenization, shingles (incl. the short-doc
sequence guard), hash64 ⇄ DuckDB parity, simhash bounds, lang-id."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from pybiodatafuse_spark.functions.text import (
    fingerprint,
    hash64,
    predict_lang,
    quality_score,
    shingles,
    simhash16,
    token_count,
    tokens,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(col.alias("v")).first()["v"]


def test_tokens_and_count(spark):
    assert list(_one(spark, "a  b\tc\nd ", tokens(F.col("text")))) == ["a", "b", "c", "d"]
    assert _one(spark, "", token_count(F.col("text"))) == 0


def test_shingles_short_doc_guard(spark):
    assert list(_one(spark, "a b", shingles(F.col("text")))) == []
    assert list(_one(spark, "a b c d", shingles(F.col("text")))) == ["a b c", "b c d"]


def test_hash64_matches_duckdb(spark):
    samples = ["hello", "a b c", "", "ünïcode", "x" * 100]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["h"] for r in df.select(hash64(F.col("s")).alias("h")).collect()]
    duck = [
        duckdb.sql(
            "select list_reduce(list_transform(string_split_regex(substr(md5(?),1,15), ''),"
            " c -> strpos('0123456789abcdef', c)::BIGINT - 1), (a,b) -> a*16+b)",
            params=[s],
        ).fetchone()[0]
        for s in samples
    ]
    assert got == duck


def test_simhash_bounds_and_identity(spark):
    df = spark.createDataFrame(
        [("spark shuffle join",), ("spark shuffle join",), ("web graph rank",)],
        "text string",
    )
    vals = [r["v"] for r in df.select(simhash16(F.col("text")).alias("v")).collect()]
    assert vals[0] == vals[1]
    assert all(0 <= v < 2**16 for v in vals)


def test_fingerprint_order_invariant(spark):
    a = _one(spark, "alpha beta gamma", fingerprint(F.col("text")))
    b = _one(spark, "gamma alpha beta alpha", fingerprint(F.col("text")))
    assert a == b  # sorted distinct token set identical


def test_predict_lang(spark):
    assert _one(spark, "the cat is on the mat with a hat", predict_lang(F.col("text"))) == "en"
    assert _one(spark, "der hund ist mit der katze und", predict_lang(F.col("text"))) == "de"
    assert _one(spark, "zzz qqq xxx", predict_lang(F.col("text"))) == "und"


def test_quality_score_range(spark):
    vals = [
        _one(spark, t, quality_score(F.col("text")))
        for t in ["", "short", "the quick brown fox is on the hill " * 20]
    ]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals[2] > vals[1]
