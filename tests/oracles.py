"""Pure-Python differential oracles (SURVEY.md §5 strategy item 2).

Small-scale reference implementations of each graph algorithm, written
independently of the Spark plans (plain dict/numpy), mirroring the reference's
golden-frame test style (/root/reference/tests/graph/test_rdf.py:23-60)."""

from __future__ import annotations

from collections import Counter, defaultdict


def pagerank_oracle(
    edges: list[tuple[int, int, float]],
    vertices: set[int],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> dict[int, float]:
    """Weighted PageRank, uniform teleport, uniform dangling redistribution,
    L1 convergence — same semantics as plans/pagerank.py."""
    n = len(vertices)
    out_w: dict[int, float] = defaultdict(float)
    adj: dict[int, list[tuple[int, float]]] = defaultdict(list)
    for s, d, w in edges:
        out_w[s] += w
        adj[s].append((d, w))
    rank = {v: 1.0 / n for v in vertices}
    for _ in range(max_iter):
        dangling = sum(r for v, r in rank.items() if v not in out_w)
        contrib: dict[int, float] = defaultdict(float)
        for s, nbrs in adj.items():
            rs = rank[s] / out_w[s]
            for d, w in nbrs:
                contrib[d] += rs * w
        base = (1.0 - damping) / n + damping * dangling / n
        new = {v: base + damping * contrib.get(v, 0.0) for v in vertices}
        delta = sum(abs(new[v] - rank[v]) for v in vertices)
        rank = new
        if delta < tol:
            break
    return rank


def components_oracle(
    edges: list[tuple[int, int]], vertices: set[int]
) -> dict[int, int]:
    """Union-find; component id = min vertex id in component."""
    parent = {v: v for v in vertices}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots: dict[int, int] = {}
    comp_min: dict[int, int] = {}
    for v in vertices:
        r = find(v)
        roots[v] = r
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[roots[v]] for v in vertices}


def lpa_oracle(
    edges: list[tuple[int, int]], vertices: set[int], max_iter: int = 10
) -> dict[int, int]:
    """Synchronous label propagation over the undirected graph; label init =
    vertex id; new label = most frequent neighbor label, ties broken by min
    label; isolated vertices keep their own label; fixed iteration cap."""
    nbrs: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    label = {v: v for v in vertices}
    for _ in range(max_iter):
        counts = {}
        for v in vertices:
            if not nbrs[v]:
                continue
            c = Counter(label[u] for u in nbrs[v])
            best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            counts[v] = best
        changed = any(counts.get(v, label[v]) != label[v] for v in vertices)
        label = {v: counts.get(v, label[v]) for v in vertices}
        if not changed:
            break
    return label


def triangles_oracle(
    edges: list[tuple[int, int]], vertices: set[int]
) -> tuple[int, dict[int, int]]:
    """Exact triangle count over the undirected simple graph (total, per-vertex)."""
    nbrs: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    per = {v: 0 for v in vertices}
    total = 0
    seen = set()
    for v in vertices:
        for u in nbrs[v]:
            if u <= v:
                continue
            for w in nbrs[v] & nbrs[u]:
                if w > u:
                    tri = (v, u, w)
                    if tri not in seen:
                        seen.add(tri)
                        total += 1
                        per[v] += 1
                        per[u] += 1
                        per[w] += 1
    return total, per


def hits_oracle(
    edges: list[tuple[int, int]],
    vertices: set[int],
    max_iter: int = 20,
) -> dict[int, tuple[float, float]]:
    """HITS power iteration mirroring plans/hits.py exactly: semi-normalized
    updates (divide by the PREVIOUS iteration's L2 norms), final exact L2
    normalization. Returns {id: (auth, hub)}."""
    import math

    e = sorted(set((s, d) for s, d in edges))
    in_adj: dict[int, list[int]] = defaultdict(list)
    out_adj: dict[int, list[int]] = defaultdict(list)
    for s, d in e:
        in_adj[d].append(s)
        out_adj[s].append(d)
    a = {v: 1.0 for v in vertices}
    h = {v: 1.0 for v in vertices}
    a_norm = h_norm = math.sqrt(len(vertices))
    for _ in range(max_iter):
        a_new = {
            v: sum(h[u] / h_norm for u in in_adj.get(v, ())) / a_norm
            for v in vertices
        }
        h_new = {v: sum(a_new[d] for d in out_adj.get(v, ())) for v in vertices}
        a, h = a_new, h_new
        a_norm = math.sqrt(sum(x * x for x in a.values())) or 1.0
        h_norm = math.sqrt(sum(x * x for x in h.values())) or 1.0
    an = math.sqrt(sum(x * x for x in a.values())) or 1.0
    hn = math.sqrt(sum(x * x for x in h.values())) or 1.0
    return {v: (a[v] / an, h[v] / hn) for v in vertices}


def k_core_oracle(
    edges: list[tuple[int, int]], k: int
) -> dict[int, int]:
    """Iterative peeling on the undirected simple graph; returns
    {surviving id: degree within the k-core}."""
    nbrs: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    alive = set(nbrs)
    while True:
        doomed = {v for v in alive if len(nbrs[v] & alive) < k}
        if not doomed:
            break
        alive -= doomed
    return {v: len(nbrs[v] & alive) for v in alive}


def ppr_oracle(
    edges: list[tuple[int, int, float]],
    vertices: set[int],
    seeds: set[int],
    damping: float = 0.85,
    max_iter: int = 100,
    tol: float | None = None,
) -> dict[int, float]:
    """Personalized PageRank mirroring plans/pagerank.py reset= semantics:
    teleport AND dangling mass uniform over the seed set; rank0 = reset."""
    ns = len(seeds)
    out_w: dict[int, float] = defaultdict(float)
    adj: dict[int, list[tuple[int, float]]] = defaultdict(list)
    for s, d, w in edges:
        out_w[s] += w
        adj[s].append((d, w))
    rank = {v: (1.0 / ns if v in seeds else 0.0) for v in vertices}
    for _ in range(max_iter):
        dangling = sum(r for v, r in rank.items() if v not in out_w)
        contrib: dict[int, float] = defaultdict(float)
        for s, nbl in adj.items():
            rs = rank[s] / out_w[s]
            for d, w in nbl:
                contrib[d] += rs * w
        base = (1.0 - damping) / ns + damping * dangling / ns
        new = {
            v: (base if v in seeds else 0.0) + damping * contrib.get(v, 0.0)
            for v in vertices
        }
        delta = sum(abs(new[v] - rank[v]) for v in vertices)
        rank = new
        if tol is not None and delta < tol:
            break
    return rank


def scc_oracle(edges: list[tuple[int, int]], vertices: set[int]) -> dict[int, int]:
    """Iterative Tarjan SCC; returns vertex -> min id in its SCC."""
    adj: dict[int, list[int]] = defaultdict(list)
    for s, d in edges:
        if s != d:
            adj[s].append(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    comp: dict[int, int] = {}
    counter = [0]

    def strongconnect(root: int) -> None:
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])

    for v in sorted(vertices):
        if v not in index:
            strongconnect(v)
    return comp


def bfs_oracle(
    edges: list[tuple[int, int]], seeds: set[int], max_hops: int = 10**9
) -> dict[int, int]:
    """Multi-source BFS hop distance along edge direction; reached only."""
    adj: dict[int, list[int]] = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    dist = {v: 0 for v in seeds}
    frontier = set(seeds)
    h = 0
    while frontier and h < max_hops:
        h += 1
        nxt = set()
        for v in frontier:
            for w in adj.get(v, []):
                if w not in dist:
                    dist[w] = h
                    nxt.add(w)
        frontier = nxt
    return dist


def neighborhood_oracle(
    edges: list[tuple[int, int]], vertices: set[int], hops: int
) -> dict[int, int]:
    """Exact |{u : dist(v,u) <= hops}| (self included) per vertex."""
    return {
        v: len(bfs_oracle(edges, {v}, max_hops=hops)) for v in vertices
    }


def clustering_oracle(
    edges: list[tuple[int, int]], vertices: set[int]
) -> dict[int, tuple[int, int, float]]:
    """(deg, triangles, coeff) per vertex over the undirected simple graph."""
    nbrs: dict[int, set[int]] = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    out = {}
    for v in vertices:
        ns = nbrs.get(v, set())
        deg = len(ns)
        tri = 0
        for a in ns:
            tri += len(nbrs[a] & ns)
        tri //= 2
        coeff = 0.0 if deg < 2 else 2.0 * tri / (deg * (deg - 1))
        out[v] = (deg, tri, coeff)
    return out


def overlap_oracle(
    edges: list[tuple[int, int]]
) -> dict[tuple[int, int], tuple[int, float, float, float]]:
    """(common, jaccard, adamic_adar, resource_alloc) for unordered pairs
    with >=1 common undirected neighbor."""
    import math

    nbrs: dict[int, set[int]] = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    out: dict[tuple[int, int], tuple[int, float, float, float]] = {}
    verts = sorted(nbrs)
    for w in verts:
        ns = sorted(nbrs[w])
        degw = len(ns)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                a, b = ns[i], ns[j]
                key = (a, b)
                c, _, aa, ra = out.get(key, (0, 0.0, 0.0, 0.0))
                out[key] = (
                    c + 1,
                    0.0,
                    aa + 1.0 / math.log(degw),
                    ra + 1.0 / degw,
                )
    final = {}
    for (a, b), (c, _, aa, ra) in out.items():
        union = len(nbrs[a] | nbrs[b])
        final[(a, b)] = (c, c / union, aa, ra)
    return final


def bowtie_oracle(
    edges: list[tuple[int, int]], vertices: set[int]
) -> dict[int, str]:
    comp = scc_oracle(edges, vertices)
    sizes: dict[int, int] = defaultdict(int)
    for v in vertices:
        sizes[comp.get(v, v)] += 1
    core_id = min(
        (s for s in sizes), key=lambda s: (-sizes[s], s)
    )
    core = {v for v in vertices if comp.get(v, v) == core_id}
    fwd = set(bfs_oracle([(s, d) for s, d in edges], core))
    bwd = set(bfs_oracle([(d, s) for s, d in edges], core))
    out = {}
    for v in vertices:
        if v in core:
            out[v] = "CORE"
        elif v in bwd:
            out[v] = "IN"
        elif v in fwd:
            out[v] = "OUT"
        else:
            out[v] = "OTHER"
    return out


def harmonic_oracle(
    edges: list[tuple[int, int]], sources: set[int]
) -> dict[int, float]:
    """h(v) = sum over sources s (s != v, s reaches v) of 1/dist(s, v)."""
    out: dict[int, float] = defaultdict(float)
    for s in sources:
        for v, d in bfs_oracle(edges, {s}).items():
            if d > 0:
                out[v] += 1.0 / d
    return dict(out)
