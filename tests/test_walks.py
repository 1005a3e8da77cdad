"""Random walks exactly reproduce the pure-Python hash-based oracle."""

from __future__ import annotations

import hashlib


def h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def oracle_walk(adj: dict, walk_id: int, start: int, length: int) -> list[int]:
    path, cur = [start], start
    for step in range(1, length + 1):
        nbrs = adj.get(cur)
        if not nbrs:
            break
        u = h64(f"{walk_id}#{step}") / float(1 << 60)
        cum, total = [], sum(w for _, w in nbrs)
        acc = 0.0
        for d, w in nbrs:
            acc += w
            cum.append(acc / total)
        idx = sum(1 for c in cum if c < u)
        cur = nbrs[idx][0]
        path.append(cur)
    return path


def test_walks_match_oracle(spark):
    from pybiodatafuse_spark.plans.walks import random_walks

    es = [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 3, 3.0), (3, 4, 1.0)]
    # vertex 4 is dangling
    edges = spark.createDataFrame(
        [(a, b, w, 1) for a, b, w in es], "src long, dst long, weight double, etype int"
    )
    starts = spark.createDataFrame([(i,) for i in range(5)], "id long")
    got = {
        r["walk_id"]: list(r["path"])
        for r in random_walks(spark, edges, starts, num_walks=3, walk_length=8).collect()
    }
    adj: dict = {}
    for a, b, w in es:
        adj.setdefault(a, []).append((b, w))
    for a in adj:
        adj[a].sort()  # Spark sorts neighbor structs by (dst, weight)
    assert len(got) == 15
    for start in range(5):
        for w in range(3):
            wid = start * 3 + w
            assert got[wid] == oracle_walk(adj, wid, start, 8), wid


def test_walks_deterministic_across_runs(spark):
    from pybiodatafuse_spark.plans.walks import random_walks

    es = [(i, (i + 1) % 10, 1.0, 1) for i in range(10)] + [(i, (i + 3) % 10, 2.0, 1) for i in range(10)]
    edges = spark.createDataFrame(es, "src long, dst long, weight double, etype int")
    starts = spark.createDataFrame([(i,) for i in range(10)], "id long")
    a = sorted(map(tuple, random_walks(spark, edges, starts, num_walks=2, walk_length=5)
                   .select("walk_id", "path").collect()))
    b = sorted(map(tuple, random_walks(spark, edges, starts, num_walks=2, walk_length=5)
                   .select("walk_id", "path").collect()))
    assert a == b
