"""Deterministic synthetic ``pages`` table generator (FIXTURES.md §1).

No external data: every byte is a pure function of (page_id, seed), so the
table is identical regardless of Spark partitioning or parallelism — required
for the two-parallelism scaling benchmark and for exact-match tests.

Randomness is splitmix64 hashing on (page_id, slot), fully vectorized in
numpy (no per-row RNG objects). Generation runs distributed via
``spark.range(n).mapInPandas`` so the bench-scale table (100k+ pages) never
materializes on the driver.

Graph guarantees (FIXTURES.md): two GIANT weakly-connected components (90/10
page split, links never cross between them; u³-skewed targeting means some
high-id dangling pages receive no links either and form additional singleton
components — e.g. 798 total at 1M pages), dangling pages
(page_id % 97 == 13), a hub (the first page of each component receives
power-law preferential mass), natural triangles from skewed targeting,
power-law domain sizes.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pybiodatafuse_spark.functions.extraction import extract_text
from pybiodatafuse_spark.schema import PAGES_SCHEMA

SEED = 42
_BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)

_VOCAB = (
    "link graph page crawl rank web node edge spark shuffle partition "
    "data query join scan batch the a and of to in for with fast slow"
).split()

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm)."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
        return z ^ (z >> np.uint64(31))


def _u01(ids: np.ndarray, slot: int, seed: int = SEED) -> np.ndarray:
    """Uniform [0,1) per (page_id, slot) — partition-independent."""
    with np.errstate(over="ignore"):
        mixed = _splitmix64(
            np.asarray(ids).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ np.uint64((slot * 0xC2B2AE3D27D4EB4F + seed) & 0xFFFFFFFFFFFFFFFF)
        )
    return (mixed >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _u01_pair(a: np.ndarray, b: np.ndarray, slot: int) -> np.ndarray:
    """Uniform [0,1) per ((a, b), slot) pair — partition-independent."""
    with np.errstate(over="ignore"):
        mixed = np.asarray(a).astype(np.uint64) * np.uint64(1_000_003) + np.asarray(
            b
        ).astype(np.uint64)
    return _u01(mixed.view(np.int64), slot)


def page_url(page_id: int, domain: int) -> str:
    return f"https://site{domain}.example/p{page_id}"


def _domains(ids: np.ndarray, n_pages: int) -> np.ndarray:
    n_domains = max(4, n_pages // 200)
    return (np.floor(n_domains * _u01(ids, 0) ** 2.5)).astype(np.int64)


def out_links(ids: np.ndarray, n_pages: int, max_out: int = 20) -> list[np.ndarray]:
    """Per-page link target page-ids (list aligned with ids).

    Two components: comp0 = [0, c0), comp1 = [c0, n). Targets drawn with
    u^3 skew toward each component's lowest ids (hub = first page).
    """
    c0 = max(2, int(n_pages * 0.9))
    deg = 1 + np.floor(max_out * _u01(ids, 1) ** 2).astype(np.int64)
    deg[ids % 97 == 13] = 0  # dangling pages
    out: list[np.ndarray] = []
    for i, k in zip(ids, deg):
        if k == 0:
            out.append(np.empty(0, dtype=np.int64))
            continue
        slots = np.arange(2, 2 + k, dtype=np.int64)
        u = _u01_pair(np.full(k, i, dtype=np.int64), slots, 7)
        if i < c0:
            t = np.floor(c0 * u**3).astype(np.int64)
        else:
            t = c0 + np.floor((n_pages - c0) * u**3).astype(np.int64)
        out.append(t[t != i])  # no self-loops
    return out


def generate_pages_pdf(ids: np.ndarray, n_pages: int) -> pd.DataFrame:
    """Pure-pandas page batch for the given page ids (shared by the Spark
    mapInPandas path and by driver-side test fixtures)."""
    ids = np.asarray(ids, dtype=np.int64)
    domains = _domains(ids, n_pages)
    links = out_links(ids, n_pages)
    lang_u = _u01(ids, 3)
    langs = np.where(lang_u < 0.8, "en", np.where(lang_u < 0.92, "de", "fr"))
    rows = []
    for idx, (i, d, targets) in enumerate(zip(ids, domains, links)):
        url = page_url(int(i), int(d))
        words_u = _u01(np.int64(i) * np.int64(31) + np.arange(12, dtype=np.int64), 5)
        words = " ".join(_VOCAB[int(w * len(_VOCAB))] for w in words_u)
        anchors = []
        ext_u = _u01_pair(
            np.full(len(targets), i, dtype=np.int64),
            np.arange(len(targets), dtype=np.int64),
            9,
        )
        target_domains = _domains(targets, n_pages)
        for j, t in enumerate(targets):
            if ext_u[j] < 0.05:
                href = f"https://external{int(t) % 7}.example/x{int(t)}"
            else:
                href = page_url(int(t), int(target_domains[j]))
            anchors.append(f'<a href="{href}">to {int(t)}</a>')
        html = (
            f"<html><head><title>Page {int(i)}</title>"
            f"<style>p {{color: black}}</style></head>"
            f"<body><h1>Page {int(i)}</h1><p>{words}</p>\n"
            + "\n".join(anchors)
            + "</body></html>"
        ).encode("utf-8")
        rows.append(
            {
                "url": url,
                "warc_ts": _BASE_TS + timedelta(seconds=int(i)),
                "html": html,
                "text": extract_text(html),
                "lang": str(langs[idx]),
            }
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def generate_pages(spark: SparkSession, n_pages: int, partitions: int = 32) -> DataFrame:
    """Distributed deterministic pages table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield generate_pages_pdf(pdf["id"].to_numpy(), n_pages)

    return (
        spark.range(0, n_pages, 1, partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def expected_edges_pdf(n_pages: int) -> pd.DataFrame:
    """Oracle edge list (src_page_id, dst_page_id) over in-corpus links —
    pure numpy, used by tests to cross-check the Spark extraction→edges path."""
    ids = np.arange(n_pages, dtype=np.int64)
    links = out_links(ids, n_pages)
    src, dst = [], []
    for i, targets in zip(ids, links):
        ext_u = _u01_pair(
            np.full(len(targets), i, dtype=np.int64),
            np.arange(len(targets), dtype=np.int64),
            9,
        )
        for j, t in enumerate(targets):
            if ext_u[j] >= 0.05:
                src.append(int(i))
                dst.append(int(t))
    return pd.DataFrame({"src_page": src, "dst_page": dst})
