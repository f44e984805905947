"""NumPy oracles: independent single-machine transliterations of the
reference semantics, used to verify the Spark engine on small graphs.

Each function cites the reference lines whose behavior it reproduces
(/root/reference). These are *re-derivations from the observed semantics*,
not code copies — dense NumPy instead of Giraph messages/aggregators.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# graph helpers — edges is a list of (src, dst, weight); ids dense [0, n)
# ---------------------------------------------------------------------------


def adj_matrix(edges, n):
    W = np.zeros((n, n))
    for s, d, w in edges:
        W[s, d] = w
    return W


def weighted_in_degrees(edges, n):
    """DMID superstep 1 (DMIDComputation.java:177-206)."""
    w_in = np.zeros(n)
    for _, d, w in edges:
        w_in[d] += w
    return w_in


def out_degrees(edges, n):
    od = np.zeros(n, dtype=np.int64)
    for s, _, _ in edges:
        od[s] += 1
    return od


# ---------------------------------------------------------------------------
# DMID phase 1: disassortativity matrix + random walk + leadership
# ---------------------------------------------------------------------------


def dis_matrix(edges, n, norm_axis="dst", weighted=True):
    """T[u, v] = normalized |w_in(v) − w_in(u)| for each edge u→v.

    norm_axis='dst': Giraph semantics — each column v (in-edges of v) is
    L1-normalized (DMIDComputation.java:214-264); zero column sum stays zero.
    norm_axis='src': RAWLPA semantics — normalize over each source's
    out-edges (RandomWalkLabelPropagationAlgorithm.java:94-124, which also
    uses *unweighted* in-degree per its TODO at :107 — pass weighted=False).
    """
    deg = weighted_in_degrees(edges, n) if weighted else in_degrees_unweighted(edges, n)
    T = np.zeros((n, n))
    for s, d, _ in edges:
        T[s, d] = abs(deg[d] - deg[s])
    axis = 0 if norm_axis == "dst" else 1
    sums = T.sum(axis=axis, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        Tn = np.where(sums != 0, T / np.where(sums == 0, 1.0, sums), 0.0)
    return Tn


def in_degrees_unweighted(edges, n):
    d = np.zeros(n)
    for _, t, _ in edges:
        d[t] += 1
    return d


def random_walk(T, tol=1e-6, max_iter=1000):
    """DA ← DA·T from uniform start until L1 delta < tol
    (DMIDComputation.java:270-292 with the BASELINE.json convergence rule
    replacing the fixed RW_ITERATIONBOUND)."""
    n = T.shape[0]
    x = np.full(n, 1.0 / n)
    for i in range(1, max_iter + 1):
        x_new = x @ T
        delta = np.abs(x_new - x).sum()
        x = x_new
        if delta < tol:
            return x, i, True
    return x, max_iter, False


def random_walk_fixed(T, iters):
    """Reference fixed-bound walk (Giraph runs supersteps 3..13 = 11 steps)."""
    n = T.shape[0]
    x = np.full(n, 1.0 / n)
    for _ in range(iters):
        x = x @ T
    return x


def leadership(edges, n, da, weighted=True):
    """LS_v = w_in(v) · DA_v (DMIDComputation.java:298-311)."""
    deg = weighted_in_degrees(edges, n) if weighted else in_degrees_unweighted(edges, n)
    return deg * da


# ---------------------------------------------------------------------------
# DMID phase 2: influence → follower degrees → global leaders
# ---------------------------------------------------------------------------


def influences(edges, n, ls):
    """Pairwise influence filter (DMIDComputation.java:321-371).

    For each edge u→v, candidate v exerts influence w(u,v)·LS_v on follower
    u; the message survives unless the reverse edge v→u exists AND
    w(u,v)·LS_v <= w(v,u)·LS_u. Returns rows (follower, candidate, inf).
    """
    W = adj_matrix(edges, n)
    out = []
    for u, v, w in edges:
        inf = w * ls[v]
        if W[v, u] != 0 and not (inf > W[v, u] * ls[u]):
            continue
        out.append((u, v, inf))
    return out


def follower_degrees(inf_rows, n):
    """Local-leader argmax with ties kept; each of the k argmax leaders gets
    FD += 1/k (DMIDComputation.java:379-417). maxInfValue starts at 0 and
    the >= / > logic keeps exact float ties."""
    by_follower: dict[int, list[tuple[int, float]]] = {}
    for u, v, inf in inf_rows:
        by_follower.setdefault(u, []).append((v, inf))
    fd = np.zeros(n)
    for _, cands in by_follower.items():
        mx = 0.0
        leader_set: list[int] = []
        for v, inf in cands:
            if inf >= mx:
                if inf > mx:
                    leader_set = []
                    mx = inf
                leader_set.append(v)
        k = len(leader_set)
        for v in leader_set:
            fd[v] += 1.0 / k
    return fd


def global_leaders(fd, strict=True):
    """GL = {i : FD_i > avg} with avg = ΣFD / #nonzero
    (DMIDMasterCompute.java:166-205). RAWLPA uses >= (strict=False,
    RandomWalkLabelPropagationAlgorithm.java:277)."""
    nonzero = np.count_nonzero(fd)
    if nonzero == 0:
        return set()
    avg = fd.sum() / nonzero
    if strict:
        return {int(i) for i in np.nonzero(fd > avg)[0]}
    return {int(i) for i in np.nonzero((fd >= avg) & (fd != 0))[0]}


# ---------------------------------------------------------------------------
# DMID phase 3: cascading behavior (Basic + Leadership variants)
# ---------------------------------------------------------------------------


def cascade(
    edges,
    n,
    leaders,
    variant="basic",
    ls=None,
    delta=0.3,
    max_rounds=10_000,
):
    """The 3-superstep cascade game with master restart logic.

    Transliterates the interleave of DMIDMasterCompute.java:64-130 with
    BasicDMIDComputation.java:20-86 / LeadershipDMIDComputation.java:26-88:

    - PROFITABILITY starts 0.5, RESTART_COUNTER starts 1; at cascade start
      the master's restart check fires immediately (flags were just set to
      notAllAssigned=true/newMember=false at RW+8), so the first effective
      threshold is 1 − 0.3·2 = 0.4 and restart_count becomes 2.
    - On each stalled round start: threshold = 1 − Δ·(restart+1), restart++,
      iteration counter resets, and every vertex re-initializes memDeg
      (DMIDComputation.java:437-445, initilaizeMemDeg :524-559) — wiping
      prior joins.
    - Joiners in round r (since last restart) get memDeg 1/r²
      (BasicDMIDComputation.java:56-65: 1/(it/3)² with integer division).
    - basic: global threshold; leadership: per-vertex LS_v − restart·Δ
      (LeadershipDMIDComputation.java:56-66).
    - Engine guard (the reference would superstep forever): if a restart is
      due but the threshold is already < 0, stop — a full cascade at
      negative threshold already assigned everything assignable.

    Returns (memdeg: dict[node][leader] -> degree>0, unassigned: set).
    """
    leaders = set(int(x) for x in leaders)
    out_nbrs: dict[int, list[int]] = {}
    for s, d, _ in edges:
        out_nbrs.setdefault(s, []).append(d)
    od = out_degrees(edges, n)
    non_leaders = [v for v in range(n) if v not in leaders]

    threshold = 0.5
    restart_count = 1
    new_member = False
    not_all_assigned = True
    it = 0
    memdeg: dict[int, dict[int, float]] = {}

    def init_memdeg():
        md: dict[int, dict[int, float]] = {}
        for v in range(n):
            md[v] = {L: (1.0 if v == L else 0.0) for L in leaders}
        return md

    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        # --- phase-1 master: restart / termination checks ---
        if not_all_assigned and not new_member:
            if threshold < 0:
                break  # engine guard, see docstring
            threshold = 1 - delta * (restart_count + 1)
            restart_count += 1
            it = 0
            memdeg = init_memdeg()
        if not not_all_assigned:
            break
        it += 3
        r = it // 3
        # --- phases 1-3: request / echo / adopt (synchronous) ---
        joins = []
        for v in non_leaders:
            if od[v] == 0:
                continue
            cands = [L for L in leaders if memdeg[v][L] == 0.0]
            if not cands:
                continue
            counts: dict[int, int] = {}
            for s in out_nbrs.get(v, []):
                for L in cands:
                    if memdeg[s].get(L, 0.0) != 0.0:
                        counts[L] = counts.get(L, 0) + 1
            th = threshold if variant == "basic" else ls[v] - restart_count * delta
            for L, c in counts.items():
                if c / od[v] > th:
                    joins.append((v, L, 1.0 / r**2))
        for v, L, val in joins:
            memdeg[v][L] = val
        new_member = len(joins) > 0
        not_all_assigned = any(
            all(d == 0.0 for d in memdeg[v].values()) for v in non_leaders
        )

    cover = {
        v: {L: d for L, d in md.items() if d != 0.0} for v, md in memdeg.items()
    }
    cover = {v: md for v, md in cover.items() if md}
    unassigned = {v for v in range(n) if v not in cover}
    return cover, unassigned


def dmid_from_ls(edges, n, ls, variant="basic", strict_gl=True):
    """Phases 2+3 from a given leadership vector. Used to verify the engine's
    tie/threshold semantics exactly on its own numerics — influence ties use
    exact float equality (reference semantics), so last-bit differences
    between Spark and NumPy summation order legitimately flip them."""
    inf = influences(edges, n, ls)
    fd = follower_degrees(inf, n)
    gl = global_leaders(fd, strict=strict_gl)
    cover, unassigned = cascade(edges, n, gl, variant=variant, ls=ls)
    return {"fd": fd, "leaders": gl, "cover": cover, "unassigned": unassigned}


def dmid(edges, n, variant="basic", tol=1e-6, max_iter=1000, strict_gl=True):
    """Full DMID: phase 1 (RW) → phase 2 (leaders) → phase 3 (cascade)."""
    T = dis_matrix(edges, n, norm_axis="dst", weighted=True)
    da, iters, converged = random_walk(T, tol=tol, max_iter=max_iter)
    ls = leadership(edges, n, da)
    inf = influences(edges, n, ls)
    fd = follower_degrees(inf, n)
    gl = global_leaders(fd, strict=strict_gl)
    cover, unassigned = cascade(edges, n, gl, variant=variant, ls=ls)
    return {
        "da": da,
        "ls": ls,
        "fd": fd,
        "leaders": gl,
        "cover": cover,
        "unassigned": unassigned,
        "rw_iterations": iters,
        "rw_converged": converged,
    }


def rawlpa_cascade(edges, n, leaders, delta=0.1):
    """RAWLPA label-propagation phase, transliterated from
    RandomWalkLabelPropagationAlgorithm.java:294-416 + :465-486.

    Returns cover dict {(node, community): degree}. Outer do-while wipes
    memberships and retries at threshold 1 − k·delta (one final round at a
    threshold ≤ 0 executes, matching the do-while); a candidate's
    profitability counts out-neighbors that are the leader or joined in a
    strictly earlier inner round; allAssigned inspects only the membership
    maps (leaders' implicit self-membership does NOT count)."""
    out = {u: [] for u in range(n)}
    preds = {u: set() for u in range(n)}
    for s, d, _w in edges:
        out[s].append(d)
        preds[d].add(s)
    leaders = sorted(leaders)
    communities = {}
    k = 0
    while True:
        k += 1
        threshold = 1 - k * delta
        communities = {}
        for L in leaders:
            mem = {}
            it = 0
            while True:
                it += 1
                prev = len(mem)
                cands = {u for u in preds[L] if u not in mem}
                for mnode in list(mem):
                    for u in preds[mnode]:
                        if u != L and u not in mem:
                            cands.add(u)
                for u in cands:
                    deg = len(out[u])
                    if deg == 0:
                        continue  # Java: 0/0 = NaN, NaN > t is false
                    prof = 0
                    for v in out[u]:
                        ji = mem.get(v)
                        if v == L or (ji is not None and ji < it):
                            prof += 1
                    if prof / deg > threshold:
                        mem[u] = it
                if len(mem) == prev:
                    break
            communities[L] = mem
        all_assigned = all(
            any(v in m for m in communities.values()) for v in range(n)
        )
        if not (threshold > 0 and not all_assigned):
            break
    cover = {}
    for L in leaders:
        cover[(L, L)] = 1.0
        for node, it in communities[L].items():
            cover[(node, L)] = 1.0 / it**2
    return cover


def rawlpa_full(edges, n, tol=1e-6, fixed_iters=None, max_iter=1000):
    """Full sequential RAWLPA (Metrics mode 6): unweighted degrees, per-src
    normalization, ≥ global leaders, Δ=0.1 wipe-and-retry cascade."""
    T = dis_matrix(edges, n, norm_axis="src", weighted=False)
    if fixed_iters:
        da = random_walk_fixed(T, fixed_iters)
        iters, converged = fixed_iters, False
    else:
        da, iters, converged = random_walk(T, tol=tol, max_iter=max_iter)
    ls = leadership(edges, n, da, weighted=False)
    inf = influences(edges, n, ls)
    fd = follower_degrees(inf, n)
    gl = global_leaders(fd, strict=False)
    cover = rawlpa_cascade(edges, n, gl, delta=0.1)
    return {
        "da": da, "ls": ls, "fd": fd, "leaders": gl, "cover": cover,
        "rw_iterations": iters, "rw_converged": converged,
    }


# ---------------------------------------------------------------------------
# standard algorithms (BASELINE.json §2.6)
# ---------------------------------------------------------------------------


def pagerank(edges, n, d=0.85, tol=1e-6, max_iter=1000, weighted=False):
    """pr' = (1−d)/N + d·(Σ_{u→v} pr_u·P(u,v) + dangling_mass/N), iterated
    to L1 delta < tol. P = 1/outdeg (unweighted) or weight/Σ out-weights."""
    P = np.zeros((n, n))
    outw = np.zeros(n)
    for s, t, w in edges:
        outw[s] += w if weighted else 1.0
    for s, t, w in edges:
        P[s, t] = (w if weighted else 1.0) / outw[s]
    dangling = outw == 0
    pr = np.full(n, 1.0 / n)
    for i in range(1, max_iter + 1):
        dm = pr[dangling].sum()
        new = (1 - d) / n + d * (pr @ P + dm / n)
        delta = np.abs(new - pr).sum()
        pr = new
        if delta < tol:
            return pr, i, True
    return pr, max_iter, False


def connected_components(edges, n):
    """Undirected CC, min-id labeling (union-find oracle)."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, t, _ in edges:
        rs, rt = find(s), find(t)
        if rs != rt:
            parent[max(rs, rt)] = min(rs, rt)
    # compress to component-minimum labels
    comp_min: dict[int, int] = {}
    for v in range(n):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return np.array([comp_min[find(v)] for v in range(n)], dtype=np.int64)


def lpa(edges, n, iters=10):
    """Synchronous LPA over in-neighbors: label ← mode of neighbor labels,
    min-label tiebreak; vertices with no in-neighbors keep their label."""
    in_nbrs: dict[int, list[int]] = {}
    for s, t, _ in edges:
        in_nbrs.setdefault(t, []).append(s)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        new = labels.copy()
        for v in range(n):
            nbrs = in_nbrs.get(v)
            if not nbrs:
                continue
            counts: dict[int, int] = {}
            for u in nbrs:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        if (new == labels).all():
            labels = new
            break
        labels = new
    return labels


# ---------------------------------------------------------------------------
# cover-quality metrics — brute-force transliterations of the reference's
# O(N²·C) loops, used to validate the engine's factorized versions
# ---------------------------------------------------------------------------


def extended_modularity_bruteforce(edges, n, cover):
    """Pair loop of ExtendedModularityMetric.java:25-108. cover: dict
    node -> {community: b}. Degrees are unweighted edge counts."""
    W = adj_matrix(edges, n)
    adj = W != 0
    m = len(edges)
    if m == 0:
        return 0.0
    od = adj.sum(axis=1)
    idg = adj.sum(axis=0)
    comms = sorted({c for mem in cover.values() for c in mem})
    b = np.zeros((n, len(comms)))
    for v, mem in cover.items():
        for ci, c in enumerate(comms):
            b[v, ci] = mem.get(c, 0.0)
    colnorm = np.abs(b).sum(axis=0)
    q = 0.0
    for a in range(n):
        for bb in range(a + 1):
            for ci in range(len(comms)):
                cov = 0.0
                if adj[a, bb]:
                    cov += b[a, ci] * b[bb, ci]
                if adj[bb, a]:
                    cov += b[bb, ci] * b[a, ci]
                coeff = b[a, ci] * b[bb, ci]
                if a != bb:
                    coeff *= od[a] * idg[bb] + idg[a] * od[bb]
                else:
                    coeff *= od[a] * idg[a]
                if coeff != 0:
                    coeff /= n**2
                    coeff /= m
                    coeff *= colnorm[ci] ** 2
                q += cov - coeff
    return q / m


def extended_modularity_npnb08_bruteforce(edges, n, cover):
    """All-ordered-pairs loop of ExtendedModularityMetricNPNB08.java:21-69."""
    W = adj_matrix(edges, n)
    adj = (W != 0).astype(float)
    m = len(edges)
    if m == 0:
        return 0.0
    idg = adj.sum(axis=0)
    q = 0.0
    for a in range(n):
        for bb in range(n):
            com = 0.0
            for c, val in cover.get(a, {}).items():
                if c in cover.get(bb, {}):
                    com += val * cover[bb][c]
            q += (adj[a, bb] - idg[a] * idg[bb] / (2 * m)) * com
    return q / (2 * m)


def overlapping_nmi_bruteforce(cover1, cover2, n):
    """Transliteration of ExtendedNormalizedMutualInformationMetric.java."""

    def columns(cover):
        cols = {}
        for v, mem in cover.items():
            for c, val in mem.items():
                if val != 0:
                    cols.setdefault(c, set()).add(v)
        return cols

    def cond_entropy(cols1, cols2):
        total = 0.0
        for c1, mem1 in sorted(cols1.items()):
            best = np.inf
            s1 = len(mem1)
            for c2, mem2 in sorted(cols2.items()):
                s2 = len(mem2)
                shared = len(mem1 & mem2)
                joined = len(mem1 | mem2)
                p_y0 = (n - s2) / n
                p_y1 = s2 / n
                ps = {}
                ps["x0y0"] = (n - joined) / n / p_y0 if p_y0 else 0.0
                ps["x1y0"] = (s1 - shared) / n / p_y0 if p_y0 else 0.0
                ps["x0y1"] = (s2 - shared) / n / p_y1 if p_y1 else 0.0
                ps["x1y1"] = shared / n / p_y1 if p_y1 else 0.0
                h = {k: (-p * np.log2(p) if p > 0 else 0.0) for k, p in ps.items()}
                if h["x0y0"] + h["x1y1"] >= h["x1y0"] + h["x0y1"]:
                    ent = (h["x0y0"] + h["x1y0"]) * p_y0 + (h["x0y1"] + h["x1y1"]) * p_y1
                    best = min(best, ent)
            if best == np.inf:
                best = 1.0
            else:
                p0, p1 = (n - s1) / n, s1 / n
                ce = sum(-p * np.log2(p) for p in (p0, p1) if p > 0)
                best = best / ce if ce > 0 else 1.0
            total += best
        return total / len(cols1) if cols1 else 1.0

    c1, c2 = columns(cover1), columns(cover2)
    return 1.0 - 0.5 * cond_entropy(c1, c2) - 0.5 * cond_entropy(c2, c1)


def triangle_counts(edges, n):
    """Per-vertex triangle counts on the undirected simple graph."""
    nbrs = [set() for _ in range(n)]
    for s, t, _ in edges:
        if s != t:
            nbrs[s].add(t)
            nbrs[t].add(s)
    counts = np.zeros(n, dtype=np.int64)
    for v in range(n):
        for u in nbrs[v]:
            if u > v:
                common = nbrs[v] & nbrs[u]
                for w in common:
                    if w > u:
                        counts[v] += 1
                        counts[u] += 1
                        counts[w] += 1
    return counts


def conductance_bruteforce(edges, cover):
    """Per-community (n_nodes, internal, cut, volume, phi) on the weighted
    undirected multigraph where each (s, d, w) row is ONE edge. Self-loops
    add 2w to volume and never to the cut. Communities whose members touch
    zero edges are omitted (matches the metric's inner join). cover: dict
    node -> {community: degree}; zero degrees are non-membership."""
    comms = sorted({c for mem in cover.values() for c, d in mem.items() if d != 0})
    total_vol = 2.0 * sum(w for _, _, w in edges)
    out = {}
    for c in comms:
        members = {v for v, mem in cover.items() if mem.get(c, 0) != 0}
        internal = sum(w for s, d, w in edges if s in members and d in members)
        cut = sum(
            w for s, d, w in edges if (s in members) != (d in members)
        )
        if internal == 0 and cut == 0:
            continue
        vol = 2.0 * internal + cut
        denom = min(vol, total_vol - vol)
        phi = cut / denom if denom > 0 else None
        out[c] = (len(members), internal, cut, vol, phi)
    return out


def best_match_f1_bruteforce(cover_a, cover_b):
    """Per-community-of-A (size, best_f1, best_match) with F1(a,b) =
    2|a∩b| / (|a|+|b|), ties to the smallest counterpart id. cover: dict
    node -> {community: degree}; zero degrees are non-membership."""
    mem_a, mem_b = {}, {}
    for mem, out in ((cover_a, mem_a), (cover_b, mem_b)):
        for v, ms in mem.items():
            for c, d in ms.items():
                if d != 0:
                    out.setdefault(c, set()).add(v)
    res = {}
    for ca, sa in mem_a.items():
        best, match = 0.0, None
        for cb, sb in sorted(mem_b.items()):
            i = len(sa & sb)
            if i == 0:
                continue
            f1 = 2.0 * i / (len(sa) + len(sb))
            if f1 > best:
                best, match = f1, cb
        res[ca] = (len(sa), best, match)
    return res


def omega_bruteforce(cover_a, cover_b, nodes):
    """(n_pairs, agree_pairs, omega_u, omega_e, omega) by enumerating every
    unordered node pair. cover: dict node -> {community: degree}; zero
    degrees are non-membership. omega is None when P < 1 or the correction
    denominator vanishes."""
    from itertools import combinations

    def mem(cover, v):
        return {c for c, d in cover.get(v, {}).items() if d != 0}

    nodes = sorted(set(nodes))
    pairs = list(combinations(nodes, 2))
    p = len(pairs)
    if p == 0:
        return (0, None, None, None, None)
    agree = 0
    hist_a, hist_b = {}, {}
    for u, v in pairs:
        ja = len(mem(cover_a, u) & mem(cover_a, v))
        jb = len(mem(cover_b, u) & mem(cover_b, v))
        if ja == jb:
            agree += 1
        hist_a[ja] = hist_a.get(ja, 0) + 1
        hist_b[jb] = hist_b.get(jb, 0) + 1
    s = sum(a * hist_b.get(j, 0) for j, a in hist_a.items())
    omega_u = agree / p
    omega_e = s / (p * p)
    omega = None if p * p == s else (agree * p - s) / (p * p - s)
    return (p, agree, omega_u, omega_e, omega)


def goodness_bruteforce(edges, cover, n_total):
    """Per-community (n_nodes, internal_w, cut_w, internal_density,
    cut_ratio, avg_odf, flake_odf) treating each (s, d, w) row as ONE
    undirected edge (parallel rows are parallel edges). Self-loops add 2w
    to degree, nothing to internal/cut. avg_odf floor-quantizes each
    per-node fraction to 1e-12ths (the metric's documented definition)."""
    import math

    deg = {}
    for s, d, w in edges:
        deg[s] = deg.get(s, 0.0) + w
        deg[d] = deg.get(d, 0.0) + w
    comms = sorted({c for mem in cover.values() for c, d in mem.items() if d != 0})
    out = {}
    q = 10**12
    for c in comms:
        members = {v for v, mem in cover.items() if mem.get(c, 0) != 0}
        n = len(members)
        internal = sum(
            w for s, d, w in edges if s != d and s in members and d in members
        )
        cut = sum(w for s, d, w in edges if (s in members) != (d in members))
        odf_q = 0
        flakes = 0
        for u in members:
            du = deg.get(u, 0.0)
            ou = sum(
                w
                for s, d, w in edges
                if s != d
                and ((s == u and d not in members) or (d == u and s not in members))
            )
            if du > 0:
                odf_q += math.floor(ou / du * q)
            if 2 * ou > du:
                flakes += 1
        density = internal / (n * (n - 1) / 2) if n >= 2 else None
        cut_ratio = cut / (n * (n_total - n)) if 0 < n < n_total else None
        out[c] = (
            n,
            internal,
            cut,
            density,
            cut_ratio,
            odf_q / q / n,
            flakes / n,
        )
    return out
