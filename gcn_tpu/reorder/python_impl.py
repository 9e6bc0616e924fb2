"""Pure numpy/scipy reordering passes.

Reference fallbacks for the native library in gcn_tpu/reorder/csrc. Same
contract everywhere: take a CSRGraph, return perm with perm[new] = old.

These re-derive the *objectives* of the reference's passes (SURVEY.md §2a)
from their published algorithms — DFS components (renumber.cu:23-155),
Reverse Cuthill-McKee (order_rcm.cu), Gorder sliding-window locality greedy
(order_gorder.cu, Wei et al. SIGMOD'16), and Rabbit community clustering by
greedy modularity merging (renumber.cu:319-522, Arai et al. IPDPS'16) — with
fresh, vectorized-where-possible implementations.
"""

from __future__ import annotations

import heapq
from collections import defaultdict

import numpy as np

from gcn_tpu.graph.csr import CSRGraph


def degree_order(g: CSRGraph) -> np.ndarray:
    """Sort vertices by degree ascending (order_deg.cu:19-45)."""
    deg = g.row_degrees()
    return np.argsort(deg, kind="stable").astype(np.int32)


def degree_out_order(g: CSRGraph) -> np.ndarray:
    """Sort by OUT-degree (CSR row lengths) ascending — the directed
    variant order_degOut (order_deg.cu:46-50). Identical to
    ``degree_order`` on the symmetric GCN adjacency; differs on directed
    graphs (e.g. after ``CSRGraph.to_dag``)."""
    return np.argsort(g.row_degrees(), kind="stable").astype(np.int32)


def degree_in_order(g: CSRGraph) -> np.ndarray:
    """Sort by IN-degree (column counts) ascending — order_degIn
    (order_deg.cu:52-56)."""
    return np.argsort(g.col_degrees(), kind="stable").astype(np.int32)


def dfs_order(g: CSRGraph) -> np.ndarray:
    """Iterative DFS visit order over every component (renumber.cu:23-155)."""
    n = g.shape[0]
    indptr, indices = g.indptr, g.indices
    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int32)
    pos = 0
    for start in range(n):
        if visited[start]:
            continue
        stack = [start]
        visited[start] = True
        while stack:
            u = stack.pop()
            order[pos] = u
            pos += 1
            # push neighbors in reverse so lower ids are visited first
            nbrs = indices[indptr[u]:indptr[u + 1]]
            for v in nbrs[::-1]:
                if not visited[v]:
                    visited[v] = True
                    stack.append(v)
    assert pos == n
    return order


def rcm_order(g: CSRGraph) -> np.ndarray:
    """Reverse Cuthill-McKee via scipy (order_rcm.cu:1-33)."""
    import scipy.sparse.csgraph as csgraph

    perm = csgraph.reverse_cuthill_mckee(g.to_scipy(), symmetric_mode=True)
    return perm.astype(np.int32)


def bfs_order(g: CSRGraph, start: int = 0) -> np.ndarray:
    """Multi-component BFS visit order (algo_bfs.cu:11-39)."""
    from collections import deque

    n = g.shape[0]
    indptr, indices = g.indptr, g.indices
    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int32)
    pos = 0
    seeds = [start] + [u for u in range(n) if u != start]
    for s in seeds:
        if visited[s]:
            continue
        visited[s] = True
        q = deque([s])
        while q:
            u = q.popleft()
            order[pos] = u
            pos += 1
            for v in indices[indptr[u]:indptr[u + 1]]:
                if not visited[v]:
                    visited[v] = True
                    q.append(v)
    assert pos == n
    return order


def gorder_order(g: CSRGraph, window: int = 5,
                 siblings: bool = False) -> np.ndarray:
    """Sliding-window greedy locality ordering (order_gorder.cu:13-143).

    Next vertex = argmax over unplaced v of the number of edges/shared
    neighbors linking v to the last ``window`` placed vertices. Implemented
    with a lazy max-heap; hub vertices (deg > sqrt(n)) are skipped during
    priority updates, as in the reference (order_gorder.cu via huge=sqrt(n),
    unitheap.cu:19), which bounds the cost at O(E * d_avg) amortized.

    ``siblings=True`` adds the reference's shared-in-neighbor term
    (order_gorder.cu:121-139): window vertices also bump their 2-hop
    neighborhood (the undirected collapse of parent/child/sibling).
    """
    n = g.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int32)
    indptr, indices = g.indptr, g.indices
    deg = g.row_degrees()
    huge = max(int(np.sqrt(n)), 2)
    # Seed with RCM for a good starting layout, as complete_gorder composes
    # RCM before Gorder (order_gorder.cu:13-31).
    try:
        seed_rank = np.empty(n, dtype=np.int64)
        seed_rank[rcm_order(g)] = np.arange(n)
    except Exception:
        seed_rank = np.arange(n)

    prio = np.zeros(n, dtype=np.int64)
    placed = np.zeros(n, dtype=bool)
    # heap of (-priority, seed_rank, vertex); lazy invalidation by re-check
    heap = [(0, int(seed_rank[v]), v) for v in range(n)]
    heapq.heapify(heap)
    win: list[int] = []
    order = np.empty(n, dtype=np.int32)

    def bump1(v: int, delta: int):
        if not placed[v]:
            prio[v] += delta
            if delta > 0:
                heapq.heappush(heap, (-int(prio[v]), int(seed_rank[v]), v))

    def bump(u: int, delta: int):
        if deg[u] > huge:
            return
        for v in indices[indptr[u]:indptr[u + 1]]:
            bump1(v, delta)
            if siblings and deg[v] <= huge:
                for s in indices[indptr[v]:indptr[v + 1]]:
                    if s != u:
                        bump1(s, delta)

    for pos in range(n):
        while True:
            negp, _, u = heapq.heappop(heap)
            if not placed[u] and -negp == prio[u]:
                break
        placed[u] = True
        order[pos] = u
        bump(u, +1)
        win.append(u)
        if len(win) > window:
            bump(win.pop(0), -1)
    return order


def gorder3_order(g: CSRGraph) -> np.ndarray:
    """The reference entry point's faithful configuration: window=3
    (renumber.cu:176) with the sibling term (order_gorder.cu:121-139)."""
    return gorder_order(g, window=3, siblings=True)


def rabbit_order(g: CSRGraph, max_rounds: int = 64,
                 return_communities: bool = False):
    """Community-clustering order by greedy modularity merging.

    Re-derivation of the Rabbit pass (renumber.cu:319-522; Arai et al.):
    repeatedly merge each vertex into the neighbor with the largest positive
    modularity gain dQ = w_uv/(2m) - (d_u * d_v)/(2m)^2, recording merges in a
    dendrogram; the final order lists dendrogram leaves community by
    community, so each community's vertices are contiguous.

    Implementation: union-find over "super-vertices" whose adjacency is a
    dict merged small-to-large; vertices are scanned in ascending degree per
    round (renumber.cu:408), rounds repeat until no merge happens
    (opt_iterative=true, renumber.cu:341-346).
    """
    n = g.shape[0]
    if n == 0:
        out = np.empty(0, dtype=np.int32)
        return (out, out.copy()) if return_communities else out
    rows, cols, vals = g.to_coo()
    two_m = float(vals.sum())
    if two_m <= 0:
        out = np.arange(n, dtype=np.int32)
        return (out, np.zeros(n, np.int32)) if return_communities else out

    # Super-vertex state. parent: union-find; adj: dict neighbor->weight;
    # wdeg: weighted degree; children: dendrogram forest.
    parent = np.arange(n, dtype=np.int64)

    def find(u: int) -> int:
        root = u
        while parent[root] != root:
            root = parent[root]
        while parent[u] != root:
            parent[u], u = root, parent[u]
        return root

    adj: list[dict] = [defaultdict(float) for _ in range(n)]
    for r, c, v in zip(rows.tolist(), cols.tolist(), vals.tolist()):
        if r != c:
            adj[r][c] += v
    wdeg = np.zeros(n, dtype=np.float64)
    np.add.at(wdeg, rows, vals.astype(np.float64))
    children: list[list[int]] = [[] for _ in range(n)]
    base_deg = g.row_degrees()

    active = list(np.argsort(base_deg, kind="stable"))
    for _ in range(max_rounds):
        merged_any = False
        next_active = []
        for u in active:
            u = find(int(u))
            if not adj[u]:
                continue
            # find argmax dQ neighbor among current super-vertices
            best_v, best_gain = -1, 0.0
            # consolidate stale entries while scanning
            items = list(adj[u].items())
            adj[u].clear()
            for v0, w in items:
                v = find(v0)
                if v != u:
                    adj[u][v] += w
            for v, w in adj[u].items():
                gain = w / two_m - (wdeg[u] * wdeg[v]) / (two_m * two_m)
                if gain > best_gain:
                    best_gain, best_v = gain, v
            if best_v >= 0:
                u2, v2 = u, best_v
                # merge smaller adjacency into larger
                if len(adj[u2]) > len(adj[v2]):
                    u2, v2 = v2, u2
                # v2 absorbs u2
                for t0, w in adj[u2].items():
                    t = find(t0)
                    if t != v2:
                        adj[v2][t] += w
                adj[v2].pop(u2, None)
                adj[u2].clear()
                wdeg[v2] += wdeg[u2]
                parent[u2] = v2
                children[v2].append(u2)
                merged_any = True
                next_active.append(v2)
            else:
                next_active.append(u)
        if not merged_any:
            break
        # dedupe next round's worklist, keep ascending-degree-ish order
        seen = set()
        active = []
        for u in next_active:
            u = find(int(u))
            if u not in seen:
                seen.add(u)
                active.append(u)

    # Emit dendrogram leaves: DFS from each root; every tree node is itself a
    # real vertex, so emit the node before its children.
    order = np.empty(n, dtype=np.int32)
    communities = np.empty(n, dtype=np.int32)
    pos = 0
    roots = [u for u in range(n) if parent[u] == u]
    for ci, root in enumerate(roots):
        stack = [root]
        while stack:
            u = stack.pop()
            order[pos] = u
            communities[u] = ci
            pos += 1
            stack.extend(children[u])
    assert pos == n
    if return_communities:
        return order, communities
    return order


def modularity(g: CSRGraph, communities: np.ndarray) -> float:
    """Newman modularity Q of a community assignment (renumber.cu:477-489)."""
    rows, cols, vals = g.to_coo()
    two_m = float(vals.sum())
    if two_m == 0:
        return 0.0
    wdeg = np.zeros(g.shape[0], dtype=np.float64)
    np.add.at(wdeg, rows, vals.astype(np.float64))
    in_w = vals[communities[rows] == communities[cols]].sum()
    comm_deg = np.zeros(int(communities.max()) + 1, dtype=np.float64)
    np.add.at(comm_deg, communities, wdeg)
    return float(in_w / two_m - np.sum((comm_deg / two_m) ** 2))
