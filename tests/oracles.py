"""Pure-Python / NetworkX oracles for the graph engine tests.

- CC / PageRank / triangles: NetworkX (the reference's own substrate,
  services/wallet_clustering.py:15).
- LPA: NetworkX's LPA is randomized, so the spec here is deterministic
  synchronous min-label LPA implemented in plain Python (same spec as
  cryptowalletcommunitydetection_spark/graph/lpa.py).
- co-occurrence edges: recomputed from raw file contents with re+itertools.
- bipartite rollup: re-implementation of the reference's
  ``get_group_full`` semantics (services/wallet_clustering.py:31-59)
  with sorted arrays and min-member component ids.
"""

from __future__ import annotations

import itertools
import re
from collections import Counter, defaultdict

import networkx as nx


def nx_components(pairs) -> dict:
    """{vertex: min-member component id}."""
    g = nx.Graph()
    g.add_edges_from(pairs)
    out = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for v in comp:
            out[v] = m
    return out


def nx_pagerank(
    pairs, alpha=0.85, weighted=False, directed=False, personalization=None
) -> dict:
    """NetworkX-semantics PageRank in pure numpy (nx's own pagerank needs
    scipy, absent here): right-stochastic transition from out-weight
    sums, dangling mass redistributed uniformly, power iteration to
    L1 < 1e-12. Undirected graphs are symmetrized like nx.Graph.
    ``personalization``: {vertex: weight} — teleport AND dangling
    redistribution follow the normalized weights (nx defaults)."""
    import numpy as np

    w = defaultdict(float)
    nodes = set()
    for p in pairs:
        s, d = p[0], p[1]
        wt = float(p[2]) if (weighted and len(p) > 2) else 1.0
        nodes.update((s, d))
        if s == d:
            continue
        if directed:
            w[(s, d)] = (w[(s, d)] + wt) if weighted else 1.0
        else:
            # nx.Graph: parallel edges collapse (weights accumulate when
            # built via incremental add_edge in the weighted tests)
            w[(s, d)] = (w[(s, d)] + wt) if weighted else 1.0
            w[(d, s)] = w[(s, d)]
    order = sorted(nodes)
    idx = {v: i for i, v in enumerate(order)}
    n = len(order)
    m = np.zeros((n, n))
    for (s, d), wt in w.items():
        m[idx[s], idx[d]] = wt
    out = m.sum(axis=1)
    dangling = out == 0
    p = np.divide(m, np.where(dangling, 1.0, out)[:, None])
    s = None
    if personalization is not None:
        s = np.zeros(n)
        for v, wt in personalization.items():
            if v in idx and wt > 0:
                s[idx[v]] += float(wt)
        s /= s.sum()
    x = np.full(n, 1.0 / n)
    for _ in range(10000):
        dmass = x[dangling].sum()
        if s is None:
            xn = (1 - alpha) / n + alpha * (x @ p + dmass / n)
        else:
            xn = (1 - alpha) * s + alpha * (x @ p + dmass * s)
        if np.abs(xn - x).sum() < 1e-12:
            x = xn
            break
        x = xn
    return {v: x[idx[v]] for v in order}


def nx_triangles(pairs) -> dict:
    g = nx.Graph()
    g.add_edges_from(pairs)
    return nx.triangles(g)


def sync_min_lpa(pairs, max_iter=20) -> dict:
    """Deterministic synchronous LPA: most-frequent neighbor label,
    ties -> min label; isolated keep own; stop on fixpoint or max_iter."""
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    labels = {v: v for v in adj}
    for _ in range(max_iter):
        new = {}
        for v, nbrs in adj.items():
            counts = Counter(labels[u] for u in nbrs)
            top = max(counts.values())
            new[v] = min(l for l, c in counts.items() if c == top)
        if new == labels:
            break
        labels = new
    return labels


ENTITY_RE = re.compile(
    r"(?m)^\s*(?:import|from|require|include|use)\s+([A-Za-z_][A-Za-z0-9_\.]*)"
)


def expected_cooccurrence(files_pdf, max_entities_per_group=1000) -> dict:
    """{(src, dst): weight} with src < dst, recomputed from raw content."""
    groups = defaultdict(set)
    for _, r in files_pdf.iterrows():
        ents = set(ENTITY_RE.findall(r["content"]))
        groups[(r["repo"], r["commit"])].update(ents)
    weights = Counter()
    for ents in groups.values():
        if len(ents) > max_entities_per_group:
            continue
        for a, b in itertools.combinations(sorted(ents), 2):
            weights[(a, b)] += 1
    return dict(weights)


def expected_rollup(pairs_pdf) -> list[dict]:
    """get_group_full semantics: per component, sorted user/deposit
    wallet arrays + counts. pairs_pdf: columns from_address, to_address."""
    pairs = list(
        pairs_pdf[["from_address", "to_address"]].itertuples(index=False, name=None)
    )
    comp = nx_components(pairs)
    senders = set(p[0] for p in pairs)
    groups = defaultdict(lambda: {"user": set(), "depo": set(), "edges": set()})
    for v, c in comp.items():
        (groups[c]["user"] if v in senders else groups[c]["depo"]).add(v)
    for s, d in pairs:
        groups[comp[s]]["edges"].add((s, d))
    out = []
    for c in sorted(groups):
        g = groups[c]
        out.append(
            {
                "component": c,
                "user_wallets": sorted(g["user"]),
                "deposit_wallets": sorted(g["depo"]),
                "edges": sorted(g["edges"]),
                "num_user": len(g["user"]),
                "num_depo": len(g["depo"]),
            }
        )
    return out
