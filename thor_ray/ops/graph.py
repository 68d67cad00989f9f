"""Iterative graph computation over edge Datasets.

Fixed-point integer PageRank: each Lloyd-style iteration is one
distributed hash join (edges ⋈ ranks on src) + one grouped integer sum
(contributions by dst) — ranks and edges stay distributed Datasets
throughout, nothing graph-sized touches the driver. Integer arithmetic
end-to-end makes every grouped sum order-independent, so results are
bit-identical across engines, shuffle orders, and cluster sizes (and
therefore SQL-twinnable — float PageRank would hash-drift on summation
order)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum


def pagerank_int(edges: Dataset, nodes: Dataset, iters: int = 5,
                 scale: int = 10 ** 12, damp_num: int = 85) -> Dataset:
    """Integer fixed-point PageRank.

    ``edges``: columns (src, dst, outdeg) — outdeg is the src's total
    out-degree (replicated per edge so no extra degree join is needed).
    ``nodes``: column (node), one row per vertex; must be materializable
    per-iteration output-size (one int64 per vertex).

    Iteration (all int64): r0 = scale // n;
    r_{t+1} = (scale - damp) // n + damp_num * Σ_in (r_t // outdeg) // 100
    where damp = damp_num * scale // 100. Dangling mass is dropped (the
    standard simplification); floor divisions make the fold exact.

    Exchange shape: two salted cogroup shuffles per iteration (the
    connected_components pattern — union + a CPU-bounded salt key, exact
    keys resolved with C-level pandas merges/np.add.at inside each salt
    group). No per-iteration join-aggregator actor pools: those both
    starve each other on small clusters (observed hang at 8 CPUs) and
    carry the Ray 2.49 empty-block finalize flake."""
    nodes = nodes.materialize()   # bounded: one int64 per vertex; reused
    n = nodes.count()
    base = (scale - damp_num * scale // 100) // n
    fanout = 64

    def as_edge_rows(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks()
        return pa.table({
            "key": src, "dst": t["dst"],
            "outdeg": pc.cast(t["outdeg"], pa.int64()),
            "r": pa.nulls(len(t), pa.int64()),
            "kind": pa.array(["E"] * len(t)),
            "ksalt": pc.cast(pc.bit_wise_and(src, fanout - 1), pa.int32()),
        })

    def as_rank_rows(t: pa.Table) -> pa.Table:
        node = t["node"].combine_chunks()
        return pa.table({
            "key": node, "dst": pa.nulls(len(t), pa.int64()),
            "outdeg": pa.nulls(len(t), pa.int64()),
            "r": t["r"],
            "kind": pa.array(["L"] * len(t)),
            "ksalt": pc.cast(pc.bit_wise_and(node, fanout - 1),
                             pa.int32()),
        })

    def deliver(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.loc[g["kind"] == "L", ["key", "r"]]
        ed = g.loc[g["kind"] == "E", ["key", "dst", "outdeg"]]
        m = ed.merge(lab, on="key")
        if not len(m):
            return pd.DataFrame({"node": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="int64")})
        # null-padded union floats the int columns; values are exact
        # (ids and ranks < 2^53) so the int64 round-trip is lossless
        c = (m["r"].astype("int64") // m["outdeg"].astype("int64")) \
            .to_numpy()
        d = m["dst"].astype("int64").to_numpy()
        ud, inv = np.unique(d, return_inverse=True)
        s = np.zeros(len(ud), dtype=np.int64)
        np.add.at(s, inv, c)                 # exact int64 accumulate
        return pd.DataFrame({"node": ud, "s": s})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("node", as_index=False)["s"].sum()
        rr = base + (damp_num * r["s"].astype("int64")) // 100
        return pd.DataFrame({"node": r["node"].astype("int64"),
                             "r": rr.astype("int64")})

    def salt_node(t: pa.Table) -> pa.Table:
        return t.append_column(
            "nsalt", pc.cast(pc.bit_wise_and(t["node"], fanout - 1),
                             pa.int32()))

    edge_rows = edges.map_batches(as_edge_rows,
                                  batch_format="pyarrow").materialize()
    ranks = nodes.map_batches(
        lambda t: t.append_column("r", pa.array(
            np.full(len(t), scale // n, dtype=np.int64))),
        batch_format="pyarrow").materialize()
    # zero contribution for EVERY vertex, unioned into the grouped sum,
    # keeps no-inbound vertices present in each fold
    zeros = nodes.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "s": np.zeros(len(t), dtype=np.int64)}),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        msgs = (ranks.map_batches(as_rank_rows, batch_format="pyarrow")
                .union(edge_rows)
                .groupby("ksalt").map_groups(deliver,
                                             batch_format="pandas"))
        # materialize each iteration: ranks are one int64 per vertex
        # (bounded); without this the lazy plan grows into an iters-deep
        # chain that re-executes upstream stages
        ranks = (msgs.union(zeros)
                 .map_batches(salt_node, batch_format="pyarrow")
                 .groupby("nsalt").map_groups(fold, batch_format="pandas")
                 .materialize())
    return ranks


def bfs_hops(edges: Dataset, src: str, dst: str, seeds: list[int],
             max_hops: int = 8):
    """Multi-source BFS min-hop labels via broadcast frontiers.

    Each hop is ONE map-only pass over the DISTRIBUTED edge set: the
    current frontier ids are broadcast once (``ray.put``), every edge
    batch filters src∈frontier with a vectorized ``is_in`` and emits its
    (already per-batch deduped) reached dst ids — so per-hop shipped
    data is frontier-sized, never graph-sized, and there is no join or
    shuffle in the loop (the join+groupby-per-iteration shape starves
    aggregator pools on small clusters — see pagerank_int). The visited
    table is one (node, hop) pair per REACHED vertex on the driver;
    for frontiers/components beyond driver memory switch to the
    distributed min-label iteration (pagerank_int's shape). Edges are
    materialized once and re-scanned per hop (≤ max_hops passes).

    Returns a pandas DataFrame (node, hop) sorted by node."""
    import pandas as pd
    import ray as _ray

    edges = edges.materialize()
    frontier = np.unique(np.asarray(sorted(set(seeds)), dtype=np.int64))
    vis_nodes = frontier.copy()           # sorted invariant
    vis_hops = np.zeros(len(frontier), dtype=np.int64)
    for hop in range(1, max_hops + 1):
        if frontier.size == 0:
            break
        fref = _ray.put(pa.array(frontier))

        def step(t: pa.Table, _f=fref) -> pa.Table:
            m = pc.is_in(t[src], value_set=_ray.get(_f))
            d = t[dst].filter(m).to_numpy(zero_copy_only=False)
            return pa.table({"node": pa.array(np.unique(d), pa.int64())})

        reached = edges.map_batches(step, batch_format="pyarrow") \
            .to_pandas()
        # Ray 2.49 wart: to_pandas() on a 0-row dataset drops columns
        if len(reached) == 0 or "node" not in reached.columns:
            break
        nxt = np.unique(reached["node"].to_numpy().astype(np.int64))
        new = nxt[~np.isin(nxt, vis_nodes)]
        if new.size == 0:
            break
        order = np.argsort(np.concatenate([vis_nodes, new]),
                           kind="stable")
        vis_nodes = np.concatenate([vis_nodes, new])[order]
        vis_hops = np.concatenate(
            [vis_hops, np.full(new.size, hop, dtype=np.int64)])[order]
        frontier = new
    return pd.DataFrame({"node": vis_nodes, "hop": vis_hops})


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def triangle_count(edges: Dataset, a: str = "s1", b: str = "s2") -> int:
    """Exact triangle count over an undirected graph given as DISTINCT
    canonical edges (a < b per row).

    Bit-matrix tier: the greater-neighbor adjacency is packed into a
    |V| x ceil(|V|/64) uint64 bitset, broadcast once (ray.put), and each
    edge batch counts its triangles with one vectorized AND + byte-table
    popcount — triangle (x<y<z) is found exactly once, at its smallest
    edge (x,y), as z in N+(x) & N+(y). The wide work (the per-edge
    intersection) is map-only over the DISTRIBUTED edge set; only the
    bitset is centralized. Memory bound: |V|^2/8 bytes broadcast — fine
    to ~30k vertices (~112 MB); past that, switch to the partitioned
    wedge-join formulation (edges self-joined on the shared endpoint,
    then hash-join the closing edge) — documented, not needed for the
    supplier-scale graphs here."""
    import ray as _ray
    import ray.data as _rd

    from thor_ray.ops.util import nonempty_blocks

    # empty shuffle partitions yield schema-less blocks (Ray 2.49) —
    # the shared guard concats only the populated ones (ops/util.py)
    blocks = nonempty_blocks(edges)
    if not blocks:
        return 0
    et = pa.concat_tables(blocks)
    ea = et[a].to_numpy(zero_copy_only=False).astype(np.int64)
    eb = et[b].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = np.unique(np.concatenate([ea, eb]))
    n = len(ids)
    if n == 0:
        return 0
    words = (n + 63) // 64
    bits = np.zeros((n, words), dtype=np.uint64)
    ia = np.searchsorted(ids, ea)
    ib = np.searchsorted(ids, eb)
    # set bit ib in row ia: greater-neighbor direction only (a < b)
    np.bitwise_or.at(bits, (ia, ib // 64),
                     np.uint64(1) << (ib % 64).astype(np.uint64))
    bits_ref = _ray.put(bits)
    ids_ref = _ray.put(ids)

    def count(t: pa.Table) -> pa.Table:
        bm = _ray.get(bits_ref)
        idv = _ray.get(ids_ref)
        xa = np.searchsorted(idv, t[a].to_numpy(zero_copy_only=False))
        xb = np.searchsorted(idv, t[b].to_numpy(zero_copy_only=False))
        inter = (bm[xa] & bm[xb]).view(np.uint8)
        tri = _POP8[inter].sum() if inter.size else 0
        return pa.table({"tri": pa.array([int(tri)], type=pa.int64())})

    out = _rd.from_arrow(blocks) \
        .map_batches(count, batch_format="pyarrow").sum("tri")
    return int(out or 0)


def random_walks(edges: Dataset, src: str, dst: str, starts: list[int],
                 n_steps: int = 5, seed: int = 42):
    """Deterministic hash-seeded random walks (node2vec-style sampling,
    p=q=1): one walk per start node, each step choosing the
    h(walk, step, seed)-th out-edge of the walker's current node among
    its dst-sorted neighbors — fully reproducible across runs, shuffle
    orders and cluster sizes (no RNG state).

    Scale shape: per step, ONE map-only pass over the distributed edge
    set gathers the out-neighbors of the current positions (broadcast
    is_in filter — frontier-sized, never graph-sized); the walker table
    itself is user-chosen-K-sized and driver-resident. Walks stop early
    at dead ends. Returns pandas (walk_id, step, node) incl. step 0."""
    import hashlib

    import pandas as pd
    import ray as _ray

    edges = edges.materialize()
    pos = {int(s): int(s) for s in starts}       # walk_id -> current node
    out = [{"walk_id": w, "step": 0, "node": n} for w, n in
           sorted(pos.items())]
    for t in range(1, n_steps + 1):
        if not pos:
            break
        nodes = np.unique(np.fromiter(pos.values(), dtype=np.int64))
        fref = _ray.put(pa.array(nodes))

        def gather(tb: pa.Table, _f=fref) -> pa.Table:
            m = pc.is_in(tb[src], value_set=_ray.get(_f))
            f = tb.filter(m)
            return pa.table({"s": f[src], "d": f[dst]})

        nb = edges.map_batches(gather, batch_format="pyarrow").to_pandas()
        if len(nb) == 0 or "s" not in nb.columns:   # Ray 2.49 0-row wart
            break
        nb = nb.drop_duplicates().sort_values(["s", "d"], kind="stable")
        neigh = {s: g["d"].to_numpy() for s, g in nb.groupby("s")}
        nxt: dict[int, int] = {}
        for w, v in pos.items():
            ns = neigh.get(v)
            if ns is None or len(ns) == 0:
                continue                              # dead end: stop
            h = int.from_bytes(hashlib.md5(
                f"{w}:{t}:{seed}".encode()).digest()[:8], "big")
            node = int(ns[h % len(ns)])
            nxt[w] = node
            out.append({"walk_id": w, "step": t, "node": node})
        pos = nxt
    return pd.DataFrame(out, columns=["walk_id", "step", "node"]) \
        .astype({"walk_id": "int64", "step": "int64", "node": "int64"})


def connected_components(edges: Dataset, nodes: Dataset,
                         max_iters: int = 30,
                         driver_max_nodes: int = 2_000_000) -> Dataset:
    """Connected components as min-label per component.

    ``edges``: columns (src, dst), DIRECTED rows — pass both directions
    for an undirected graph (the caller unions (a,b) with (b,a)).
    ``nodes``: column (node), one row per vertex (isolated vertices
    become singleton components).

    Two tiers. The HEAVY distributed work is always the caller's edge
    construction (a corpus/lineitem-scale scan reduced to a distinct
    pair list); the propagation itself runs over that output-sized
    graph:

    * ``|nodes| <= driver_max_nodes`` (default 2M — int64 ids, tens of
      MB): gather the pair list and run union-find with path halving on
      the driver. One pass, deterministic, min-root labels — identical
      output to label propagation, none of the per-round shuffle
      overhead (measured: the iterative tier's per-round groupby pair
      costs seconds at 32 CPUs, and graph diameter multiplies it).
    * larger graphs: distributed min-label propagation, two salted
      cogroup shuffles per round (the pattern of
    ops/dedup.py::near_dup_clusters_distributed — union + ONE group key
    of CPU-proportional cardinality, exact keys resolved by C-level
    pandas merges/groupbys inside each salt group; no per-round
    join-aggregator actor pools, which both stall on small clusters and
    carry the Ray 2.49 empty-block finalize flake): (1) deliver
    label(src) to dst along every edge, (2) fold each node's incoming
    labels with its own by grouped min. Labels are int64 node ids, so
    every grouped min is exact and order-free (bit-identical across
    shuffle orders ⇒ SQL-twinnable). Converges in O(diameter) rounds;
    Σ labels is monotone non-increasing and equality between rounds is
    a fixpoint, so the loop early-exits. Per-round state is one int64
    per vertex (bounded materialize, same rationale as pagerank_int)."""
    import ray.data as _rd

    from ray.data.aggregate import Count
    from thor_ray.ops.util import nonempty_blocks

    n_nodes = nodes.aggregate(Count(alias_name="n"))["n"] or 0
    if n_nodes <= driver_max_nodes:
        nb = nonempty_blocks(nodes)
        node_ids = pa.concat_tables(nb)["node"].to_numpy() if nb \
            else np.empty(0, np.int64)
        eb = nonempty_blocks(edges)
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for t in eb:
            for a, b in zip(t["src"].to_numpy(zero_copy_only=False),
                            t["dst"].to_numpy(zero_copy_only=False)):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)  # min root wins
        lbls = np.fromiter((find(int(n)) for n in node_ids),
                           dtype=np.int64, count=len(node_ids))
        return _rd.from_arrow(pa.table({
            "node": pa.array(node_ids, pa.int64()),
            "lbl": pa.array(lbls, pa.int64())}))

    fanout = 64

    def as_edge_rows(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks()
        return pa.table({
            "key": src, "dst": t["dst"],
            "lbl": pa.nulls(len(t), pa.int64()),
            "kind": pa.array(["E"] * len(t)),
            "ksalt": pc.cast(pc.bit_wise_and(src, fanout - 1), pa.int32()),
        })

    def as_label_rows(t: pa.Table) -> pa.Table:
        node = t["node"].combine_chunks()
        return pa.table({
            "key": node, "dst": pa.nulls(len(t), pa.int64()),
            "lbl": t["lbl"],
            "kind": pa.array(["L"] * len(t)),
            "ksalt": pc.cast(pc.bit_wise_and(node, fanout - 1),
                             pa.int32()),
        })

    def deliver(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.loc[g["kind"] == "L", ["key", "lbl"]]
        ed = g.loc[g["kind"] == "E", ["key", "dst"]]
        m = ed.merge(lab, on="key")
        return pd.DataFrame({"node": m["dst"].astype("int64"),
                             "lbl": m["lbl"].astype("int64")})

    def fold_min(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("node", as_index=False)["lbl"].min()
        return pd.DataFrame({"node": r["node"].astype("int64"),
                             "lbl": r["lbl"].astype("int64")})

    def salt_node(t: pa.Table) -> pa.Table:
        return t.append_column(
            "nsalt", pc.cast(pc.bit_wise_and(t["node"], fanout - 1),
                             pa.int32()))

    labels = (nodes.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "lbl": pc.cast(t["node"], pa.int64())}),
        batch_format="pyarrow")
        .map_batches(salt_node, batch_format="pyarrow")
        .groupby("nsalt").map_groups(fold_min, batch_format="pandas")
        .materialize())
    edge_rows = edges.map_batches(as_edge_rows,
                                  batch_format="pyarrow").materialize()
    prev_sum: "int | None" = None
    for _ in range(max_iters):
        msgs = (labels.map_batches(as_label_rows, batch_format="pyarrow")
                .union(edge_rows)
                .groupby("ksalt").map_groups(deliver,
                                             batch_format="pandas"))
        labels = (msgs.union(labels)
                  .map_batches(salt_node, batch_format="pyarrow")
                  .groupby("nsalt").map_groups(fold_min,
                                               batch_format="pandas")
                  .materialize())
        cur = labels.aggregate(Sum("lbl", alias_name="s"))["s"]
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur
    return labels


def kcore(edges: Dataset, k: int, max_iters: int = 50) -> Dataset:
    """Distributed k-core decomposition (iterative peel): repeatedly drop
    vertices with degree < k until a fixpoint. Returns the surviving
    vertex set with each survivor's within-core degree
    (columns: node, degree).

    ``edges``: (src, dst) with BOTH directions present (undirected
    convention shared with connected_components). Each round is one
    map-only degree pass over the DISTRIBUTED edge set (per-batch
    combiner partials — unique src + counts, vertex-sized each) folded
    on the driver, then one broadcast ``is_in`` filter map of the edges
    (survivor ids are vertex-sized; ``ray.put`` once per round). No
    joins or shuffle aggregators in the loop — the join-per-round shape
    both starves actor pools on small clusters and carries the Ray 2.49
    empty-block finalize flake (see pagerank_int). Driver state is one
    (node, degree) vector — the bfs_hops bound; for graphs whose VERTEX
    set exceeds driver memory, switch the degree fold to the salted
    cogroup tier (connected_components' distributed shape). Survivor
    count is monotone non-increasing, so equality between rounds is a
    fixpoint and the loop early-exits; rounds are bounded by max_iters
    (the peel depth, not the graph size)."""
    import ray as _ray
    import ray.data as _rd

    from thor_ray.ops.util import nonempty_blocks

    def deg_partial(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        ud, cnt = np.unique(s, return_counts=True)
        return pa.table({"node": pa.array(ud.astype(np.int64)),
                         "c": pa.array(cnt.astype(np.int64))})

    def degrees(e: Dataset) -> tuple[np.ndarray, np.ndarray]:
        blocks = nonempty_blocks(
            e.map_batches(deg_partial, batch_format="pyarrow"))
        if not blocks:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        part = pa.concat_tables(blocks)
        node = part["node"].to_numpy(zero_copy_only=False)
        c = part["c"].to_numpy(zero_copy_only=False)
        ud, inv = np.unique(node, return_inverse=True)
        tot = np.zeros(len(ud), dtype=np.int64)
        np.add.at(tot, inv, c)
        return ud, tot

    edges = edges.materialize()
    prev: "int | None" = None
    node, deg = degrees(edges)
    for _ in range(max_iters):
        keep_ids = node[deg >= k]
        n = len(keep_ids)
        if prev is not None and n == prev:
            break
        prev = n
        if n == 0:
            break
        ref = _ray.put(pa.array(keep_ids))

        def surv(t: pa.Table, ref=ref) -> pa.Table:
            ks = _ray.get(ref)
            m = pc.and_(pc.is_in(t["src"], value_set=ks),
                        pc.is_in(t["dst"], value_set=ks))
            return t.filter(m)

        edges = edges.map_batches(surv,
                                  batch_format="pyarrow").materialize()
        node, deg = degrees(edges)
    m = deg >= k
    return _rd.from_arrow(pa.table({
        "node": pa.array(node[m], pa.int64()),
        "degree": pa.array(deg[m], pa.int64())}))
