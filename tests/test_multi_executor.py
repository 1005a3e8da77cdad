"""Multi-executor (local-cluster) validation: the engine's claims about
executor distribution are exercised with REAL executor boundaries — separate
JVMs, shipped py-files, per-executor Python workers — not local-mode threads.

Runs in a subprocess because a process can hold only one SparkContext and
the suite's session fixture owns this one.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
spark = (SparkSession.builder.master("local-cluster[2,2,1500]")
  .appName("mx-test")
  .config("spark.sql.shuffle.partitions","4")
  .config("spark.executor.memory","1200m")
  .config("spark.python.worker.reuse","true")
  .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.addPyFile({zip_path!r})
from pybiodatafuse_spark.datagen import generate_pages
from pybiodatafuse_spark.operators.edges import build_edges, build_vertices
pages = generate_pages(spark, 2500, partitions=4)
verts = build_vertices(pages).persist()
edges = build_edges(pages, verts).persist()
ne = edges.count()
from pybiodatafuse_spark.plans.pagerank import pagerank
from pybiodatafuse_spark.plans.csr import pagerank_csr
res = pagerank(spark, edges, verts, tol=None, max_iter=4)
s = res.state.agg(F.sum("rank")).first()[0]
res2 = pagerank_csr(spark, edges, verts, tol=None, max_iter=4, block_store="/tmp/mx_test_csr")
a = {{r["id"]: r["rank"] for r in res.state.collect()}}
b = {{r["id"]: r["rank"] for r in res2.state.collect()}}
mx = max(abs(a[k]-b[k]) for k in a)
print(f"RESULT ne={{ne}} ranksum={{s:.12f}} maxdiff={{mx:.3e}}")
spark.stop()
"""


@pytest.mark.slow_e2e
def test_pipeline_on_two_executor_jvms(tmp_path):
    zip_path = os.path.join(REPO, "dist", "pybiodatafuse_spark.zip")
    if not os.path.exists(zip_path):
        subprocess.run(["bash", os.path.join(REPO, "scripts", "package.sh")], check=True)
    script = _SCRIPT.format(repo=REPO, zip_path=zip_path)
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # NOT the repo: the zip must provide the package
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")][0]
    parts = dict(kv.split("=") for kv in line.split()[1:])
    assert int(parts["ne"]) > 0
    assert abs(float(parts["ranksum"]) - 1.0) < 1e-9  # mass conserved across executors
    assert float(parts["maxdiff"]) < 1e-12  # CSR ≡ DataFrame across JVM boundaries
