"""Pure-Python (no Spark) oracle for the driver-gate queries whose semantics
are iterative SGD (q43): an independent sequential reimplementation of
walks → per-walk SGNS → sorted-walk_id delta accumulation, following the
documented algorithm spec in plans/embeddings.py and plans/walks.py. The
driver's DuckDB oracle inlines this module's output as literal VALUES, so the
standard rows+schema+hash compare applies.

Reads the parquet inputs with DuckDB (the driver gate runs at sf0.01).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np

_GRAPH_MOD = 211


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def derived_edges(sf_dir: str, lt: int | None = None) -> list[tuple[int, int]]:
    """The same deterministic edge derivation as __spark_entry__._derived_edges
    (orders keys mod 211), computed by DuckDB."""
    import duckdb

    where = f"AND (o_custkey % {_GRAPH_MOD}) < {lt} AND (o_orderkey % {_GRAPH_MOD}) < {lt}" if lt else ""
    rows = duckdb.sql(
        f"""SELECT DISTINCT (o_custkey % {_GRAPH_MOD})::BIGINT AS src,
                   (o_orderkey % {_GRAPH_MOD})::BIGINT AS dst
            FROM read_parquet('{sf_dir}/orders.parquet')
            WHERE (o_custkey % {_GRAPH_MOD}) <> (o_orderkey % {_GRAPH_MOD}) {where}"""
    ).fetchall()
    return [(int(a), int(b)) for a, b in rows]


def walk(adj: dict, walk_id: int, start: int, length: int) -> list[int]:
    """Hash-seeded weighted walk — matches plans/walks.py semantics (weights
    here are uniform 1.0; neighbor list sorted by dst; cdf = i/deg)."""
    path, cur = [start], start
    for step in range(1, length + 1):
        nbrs = adj.get(cur)
        if not nbrs:
            break
        u = _h64(f"{walk_id}#{step}") / float(1 << 60)
        deg = len(nbrs)
        acc = 0.0
        cum = []
        for _ in nbrs:
            acc += 1.0
            cum.append(acc)
        total = cum[-1]
        idx = sum(1 for c in cum if c / total < u)
        cur = nbrs[idx]
        path.append(cur)
    return path


# --- sequential SGNS (independent reimplementation of the spec) -----------

_M = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(x):
    with np.errstate(over="ignore"):
        z = (np.asarray(x, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & _M
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M
        return z ^ (z >> np.uint64(31))


def _u01(x, slot: int, seed: int):
    with np.errstate(over="ignore"):
        mixed = _mix(
            np.asarray(x, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ np.uint64((slot * 0xC2B2AE3D27D4EB4F + seed) & 0xFFFFFFFFFFFFFFFF)
        )
    return (mixed >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _sig(x: float) -> float:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30.0, 30.0)))


def sgns(
    walks: dict[int, list[int]],
    *,
    dim: int,
    epochs: int,
    window: int = 2,
    negatives: int = 3,
    lr: float = 0.025,
    seed: int = 42,
) -> dict[int, np.ndarray]:
    """walk_id → path ⇒ id → final emb vector. Per-walk independent training
    from epoch-start vectors; per-vertex deltas averaged in sorted walk_id
    order (left fold) — the documented deterministic semantics."""
    vocab = sorted({v for p in walks.values() for v in p})
    table = np.array(vocab, dtype=np.int64)
    T = len(table)
    emb: dict[int, np.ndarray] = {}
    ctx: dict[int, np.ndarray] = {}
    ids = np.array(vocab, dtype=np.int64)
    init = np.empty((len(ids), dim))
    for j in range(dim):
        init[:, j] = (_u01(ids, j, seed) - 0.5) / dim
    for i, v in enumerate(vocab):
        emb[v] = init[i].copy()
        ctx[v] = np.zeros(dim)
    for _ in range(epochs):
        per_id: dict[int, list] = defaultdict(list)
        for wid in sorted(walks):
            path = walks[wid]
            W = {v: emb[v].copy() for v in emb}
            C = {v: ctx[v].copy() for v in ctx}
            touched = set()
            for pos, center in enumerate(path):
                lo = max(0, pos - window)
                hi = min(len(path), pos + window + 1)
                for cpos in range(lo, hi):
                    if cpos == pos:
                        continue
                    target = path[cpos]
                    g = (1.0 - _sig(W[center] @ C[target])) * lr
                    C[target] += g * W[center]
                    W[center] += g * C[target]
                    touched |= {center, target}
                    key = np.int64(wid) * np.int64(1_000_003) + np.int64(
                        pos * (hi - lo) + cpos
                    )
                    for j in range(negatives):
                        u = _u01(np.array([key]), j, 7)[0]
                        neg = int(table[int(u * T)])
                        if neg == target:
                            continue
                        gn = -_sig(W[center] @ C[neg]) * lr
                        C[neg] += gn * W[center]
                        W[center] += gn * C[neg]
                        touched.add(neg)
            for v in touched:
                per_id[v].append((wid, W[v] - emb[v], C[v] - ctx[v]))
        for v, lst in per_id.items():
            lst.sort(key=lambda t: t[0])
            de = np.zeros(dim)
            dc = np.zeros(dim)
            for _, a, b in lst:
                de = de + a
                dc = dc + b
            emb[v] = emb[v] + de
            ctx[v] = ctx[v] + dc
    return emb


def q43_expected(sf_dir: str) -> list[tuple[int, float]]:
    """Expected (id, raw v0) for q43_skipgram_embeddings at ``sf_dir``."""
    edges = derived_edges(sf_dir, lt=40)
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    for a in adj:
        adj[a].sort()
    starts = sorted(adj.keys())
    walks = {}
    for s in starts:
        for w in range(2):
            wid = s * 2 + w
            walks[wid] = walk(adj, wid, s, 6)
    emb = sgns(walks, dim=8, epochs=1)
    return [(v, float(emb[v][0])) for v in sorted(emb)]


def q48_expected(sf_dir: str) -> list[tuple[int, int, int, int]]:
    """q48 oracle: the FULL DREAMwalk traversal — edge-type transition bias,
    node2vec p/q second-order weighting against the previous node's
    bidirectional neighbor set, weighted similarity-graph teleport with
    stale edge type (reference generate_embeddings.py:191-263 semantics;
    spec in plans/walks.biased_random_walks) — as an independent sequential
    loop. Returns (walk_id, start, path_len, last)."""
    S = float(1 << 60)
    es = derived_edges(sf_dir, lt=40)
    edges = [(a, b, 1.0 + ((a + b) % 3), int(b % 2)) for a, b in es]
    sim = [(a, b, 1.0 + (b % 2)) for a, b, _, _ in edges if (a + b) % 4 == 0]
    M = [[0.6, 0.4], [0.3, 0.7]]
    p_, q_, tp, length, num_walks = 0.25, 4.0, 0.2, 6, 2
    adj: dict = {}
    nbrsets: dict = {}
    sim_adj: dict = {}
    for a, b, w, t in edges:
        adj.setdefault(a, []).append((b, w, t))
        nbrsets.setdefault(a, set()).add(b)
        nbrsets.setdefault(b, set()).add(a)
    for a in adj:
        adj[a].sort()
    for a, b, w in sim:
        sim_adj.setdefault(a, []).append((b, w))
    for a in sim_adj:
        sim_adj[a].sort()

    def one_walk(wid: int, start: int) -> list[int]:
        path, cur, prev, pet = [start], start, -1, -1
        for step in range(1, length + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            u_tp = _h64(f"{wid}#{step}#tp") / S
            s_nbrs = sim_adj.get(cur)
            if step >= 2 and u_tp < tp and s_nbrs:
                u_sim = _h64(f"{wid}#{step}#sim") / S
                total = sum(w for _, w in s_nbrs)
                acc, cum = 0.0, []
                for _, w in s_nbrs:
                    acc += w
                    cum.append(acc / total)
                idx = sum(1 for c in cum if c < u_sim)
                prev, cur = cur, s_nbrs[idx][0]
                path.append(cur)
                continue
            if pet < 0:
                bw = [w for _, w, _ in nbrs]
            else:
                bw = []
                for d, w, t in nbrs:
                    if d in nbrsets.get(prev, set()):
                        f = 1.0
                    elif d == prev:
                        f = 1.0 / p_
                    else:
                        f = 1.0 / q_
                    bw.append(w * M[pet][t] * f)
            total = sum(bw)
            if total <= 0:
                break
            u = _h64(f"{wid}#{step}") / S
            acc, cum = 0.0, []
            for w in bw:
                acc += w
                cum.append(acc / total)
            idx = sum(1 for c in cum if c < u)
            prev, cur, pet = cur, nbrs[idx][0], nbrs[idx][2]
            path.append(cur)
        return path

    out = []
    for s in sorted({a for a, _, _, _ in edges}):
        for w in range(num_walks):
            wid = s * num_walks + w
            path = one_walk(wid, s)
            out.append((wid, s, len(path), path[-1]))
    return out
