"""Coverage-preserving simplification — the JTS/GEOS
CoverageSimplifier (GEOSCoverageSimplifyVW, what
`gdal vector simplify-coverage` delegates to,
apps/gdalalg_vector_simplify_coverage.cpp):

  1. decompose the polygonal coverage's boundaries into EDGE CHAINS
     between nodes (a vertex is a node when its undirected neighbor
     set over all boundaries has size != 2 — junctions where 3+
     polygons meet, or ring self-touches);
  2. simplify each UNIQUE chain once with Visvalingam-Whyatt
     (smallest-effective-area vertex removed while its triangle area
     < tolerance^2, endpoints pinned) — both polygons sharing a chain
     receive the identical simplified vertices, so the coverage stays
     gap- and overlap-free by construction;
  3. preserve_boundary=True leaves unshared (outer) chains untouched
     (the reference's --preserve-boundary);
  4. rebuild every ring by splicing its simplified chains back in
     original order and direction.

Own-written; the published algorithm, not a port. Deviation: JTS
additionally index-checks each removal against ALL edges to block
new crossings at extreme tolerances; here only the chain's own
neighbors are checked (coverage tests pin the behavior at sane
tolerances).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def _tri_area(a, b, c) -> float:
    return abs((b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])) / 2.0


def vw_simplify_chain(chain: np.ndarray, tolerance: float) -> np.ndarray:
    """Visvalingam-Whyatt with endpoints pinned: repeatedly drop the
    interior vertex with the smallest effective triangle area while
    that area < tolerance^2."""
    pts = [tuple(p) for p in np.asarray(chain, dtype=np.float64)]
    if len(pts) <= 2:
        return np.asarray(pts)
    thresh = float(tolerance) * float(tolerance)
    alive = list(range(len(pts)))
    while len(alive) > 2:
        best_i = None
        best_a = None
        for k in range(1, len(alive) - 1):
            a = _tri_area(pts[alive[k - 1]], pts[alive[k]], pts[alive[k + 1]])
            if best_a is None or a < best_a:
                best_a, best_i = a, k
        if best_a is None or best_a >= thresh:
            break
        alive.pop(best_i)
    return np.asarray([pts[i] for i in alive])


def _ring_key(ring: np.ndarray):
    return [tuple(p) for p in np.asarray(ring, dtype=np.float64)]


def coverage_simplify(
    polys: list[list[np.ndarray]], tolerance: float, preserve_boundary: bool = False
) -> list[list[np.ndarray]]:
    """polys: per polygon, list of closed rings (shell first). Returns
    the same structure with every ring rebuilt from the shared
    simplified chains."""
    # ring vertex sequences (without the duplicated closing vertex)
    ring_seqs: list[tuple[int, int, list[tuple[float, float]]]] = []
    for pi, rings in enumerate(polys):
        for ri, ring in enumerate(rings):
            seq = _ring_key(ring)
            if len(seq) > 1 and seq[0] == seq[-1]:
                seq = seq[:-1]
            ring_seqs.append((pi, ri, seq))

    # undirected neighbor sets and edge->owner counts
    neighbors: dict[tuple[float, float], set[tuple[float, float]]] = defaultdict(set)
    seg_count: dict[frozenset, int] = defaultdict(int)
    for _, _, seq in ring_seqs:
        n = len(seq)
        for i in range(n):
            a, b = seq[i], seq[(i + 1) % n]
            neighbors[a].add(b)
            neighbors[b].add(a)
            seg_count[frozenset((a, b))] += 1

    nodes = {v for v, nb in neighbors.items() if len(nb) != 2}

    # decompose each ring into chains between nodes; simplify each
    # unique chain ONCE (canonical orientation), share the result
    chain_cache: dict[tuple, np.ndarray] = {}

    def simplified(chain: list[tuple[float, float]]) -> list[tuple[float, float]]:
        fwd = tuple(chain)
        rev = tuple(reversed(chain))
        key, flip = (fwd, False) if fwd <= rev else (rev, True)
        if key not in chain_cache:
            shared = all(seg_count[frozenset((key[i], key[i + 1]))] >= 2 for i in range(len(key) - 1))
            if preserve_boundary and not shared:
                out = np.asarray(key)
            else:
                out = vw_simplify_chain(np.asarray(key), tolerance)
            chain_cache[key] = out
        res = [tuple(p) for p in chain_cache[key]]
        return list(reversed(res)) if flip else res

    out_polys: list[list[np.ndarray]] = [[] for _ in polys]
    for pi, ri, seq in ring_seqs:
        n = len(seq)
        node_idx = [i for i in range(n) if seq[i] in nodes]
        new_seq: list[tuple[float, float]] = []
        if not node_idx:
            # closed chain with no nodes: pin the lexicographically
            # smallest vertex as a stable pseudo-node so both users of
            # a duplicated ring simplify identically
            start = min(range(n), key=lambda i: seq[i])
            rot = seq[start:] + seq[:start] + [seq[start]]
            new_seq = simplified(rot)[:-1]
        else:
            for j, i0 in enumerate(node_idx):
                i1 = node_idx[(j + 1) % len(node_idx)]
                if i1 > i0:
                    chain = seq[i0 : i1 + 1]
                else:
                    chain = seq[i0:] + seq[: i1 + 1]
                new_seq.extend(simplified(chain)[:-1])
        if len(new_seq) >= 3:
            closed = np.asarray(new_seq + [new_seq[0]])
        else:
            closed = np.asarray(_ring_key(polys[pi][ri]))  # degenerate: keep original
        out_polys[pi].append(closed)
    return out_polys
