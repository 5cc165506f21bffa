"""Distributed connected components over duplicate-pair relations.

The missing last step of every near-dup pipeline: LSH/verify emits *pairs*
(``ngram_jaccard_dups``, ``simhash_dups``, ``embedding_dups``), but a corpus
curation run needs *clusters* — one canonical document per connected group of
duplicates (the pair relation is not transitive-closed: A~B and B~C at
tau=0.8 does not imply A~C clears tau, yet all three are one dup group).

:func:`connected_components` is iterative min-label propagation expressed as
hash exchanges (``stages/exchange.py``) — the standard MapReduce CC shape
(Rastogi et al., "Finding Connected Components in Map-Reduce", ICDE'13):

1. init: one exchange over the (both-direction) edge relation keyed on
   ``node % P`` — each node's label starts at ``min(node, min(neighbors))``;
2. iterate until fixed point, two exchanges per round:
   a. *propose* (keyed on node): join the partition's labels to its edges
      and emit ``(neighbor, label(node))`` plus the node's own label row;
   b. *combine* (keyed on node): new label = min over proposals + own,
      with a per-node ``changed`` flag summed by the driver (a scalar
      aggregate — the only thing that ever leaves the cluster).

Labels converge to the component minimum in ``diameter(component)`` rounds;
near-dup clusters are shallow (stars/short chains around a template doc), so
3-4 rounds is typical. Everything is O(E) per round, hash-partitioned, and
vectorized (searchsorted label lookup, lexsort + minimum.reduceat combine) —
no driver-side pair materialization at any point.

The ``dedup_clusters`` driver entry runs it over the exact 3-gram-Jaccard
pair relation; the DuckDB twin computes the same closure with a recursive
CTE. Chain/star/cycle topologies and the empty relation are pinned in
``tests/test_graph.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from web_search_engine_ray.stages.exchange import cluster_parts, exchange_map

# Row kinds for the union relation flowing through the exchanges.
_K_EDGE = 0  # (node, val=neighbor)
_K_SELF = 1  # (node, val=node's current label)
_K_PROP = 2  # (node, val=label proposed by a neighbor)

_SCHEMA = pa.schema(
    [("node", pa.int64()), ("val", pa.int64()), ("kind", pa.int8())]
)


def _rows(node: np.ndarray, val: np.ndarray, kind: int) -> pa.Table:
    return pa.table(
        {
            "node": pa.array(node, pa.int64()),
            "val": pa.array(val, pa.int64()),
            "kind": pa.array(np.full(node.size, kind, np.int8), pa.int8()),
        },
        schema=_SCHEMA,
    )


def _col(t: pa.Table, name: str, dtype=np.int64) -> np.ndarray:
    return (
        t[name].combine_chunks().to_numpy(zero_copy_only=False).astype(dtype, copy=False)
    )


def _norm(t: pa.Table) -> pa.Table:
    """Empty partitions of an empty relation can carry the pre-UDF pair
    schema (Ray Data skips map UDFs on empty blocks) — normalize to the
    union-relation schema so the partition fns stay column-safe."""
    return t if "node" in t.column_names else _SCHEMA.empty_table()


def _min_per_node(node: np.ndarray, val: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(unique nodes asc, min val per node) via one lexsort + reduceat."""
    if node.size == 0:
        return node, val
    order = np.lexsort((val, node))
    n_s, v_s = node[order], val[order]
    starts = np.flatnonzero(np.r_[True, n_s[1:] != n_s[:-1]])
    return n_s[starts], np.minimum.reduceat(v_s, starts)


def connected_components(
    pairs_ds,
    col_a: str = "docid_a",
    col_b: str = "docid_b",
    n_parts: int | None = None,
    max_iters: int = 64,
):
    """Dataset (docid, cluster_id) for every node of the pair relation;
    ``cluster_id`` = the smallest docid reachable through pairs. Nodes not
    appearing in any pair are absent (singletons are their own cluster by
    definition — emitting them would mean scanning the corpus again)."""
    np_ = n_parts or cluster_parts(64)

    def to_edges(t: pa.Table) -> pa.Table:
        a, b = _col(t, col_a), _col(t, col_b)
        return _rows(np.concatenate([a, b]), np.concatenate([b, a]), _K_EDGE)

    def route(t: pa.Table) -> np.ndarray:
        return _col(t, "node") % np_

    def init_labels(t: pa.Table) -> pa.Table:
        """label(u) = min(u, min neighbors) — iteration 0 fused with init."""
        t = _norm(t)
        node, val = _col(t, "node"), _col(t, "val")
        u, m = _min_per_node(node, np.minimum(node, val))
        return _rows(u, m, _K_SELF)

    def propose(t: pa.Table) -> pa.Table:
        """One node partition: join labels to edges, emit proposals."""
        t = _norm(t)
        kind = _col(t, "kind", np.int8)
        is_e = kind == _K_EDGE
        en, ev = _col(t, "node")[is_e], _col(t, "val")[is_e]
        is_l = kind == _K_SELF
        ln, lv = _col(t, "node")[is_l], _col(t, "val")[is_l]
        order = np.argsort(ln)
        ln, lv = ln[order], lv[order]
        # every edge endpoint routed here has a label row here (same key)
        lab = lv[np.searchsorted(ln, en)]
        return pa.concat_tables([_rows(ev, lab, _K_PROP), _rows(ln, lv, _K_SELF)])

    def combine(t: pa.Table) -> pa.Table:
        """New label = min(proposals, own); emit (node, label, changed)."""
        t = _norm(t)
        node, val = _col(t, "node"), _col(t, "val")
        kind = _col(t, "kind", np.int8)
        u, new = _min_per_node(node, val)
        is_s = kind == _K_SELF
        sn, sv = node[is_s], val[is_s]
        order = np.argsort(sn)
        old = sv[order][np.searchsorted(sn[order], u)]
        out = _rows(u, new, _K_SELF)
        return out.append_column(
            "changed", pa.array((new != old).astype(np.int64), pa.int64())
        )

    def drop_changed(t: pa.Table) -> pa.Table:
        return t.drop_columns(["changed"]) if "changed" in t.column_names else t

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow")
    labels = exchange_map(edges, route, np_, init_labels, auto_shrink=True)

    for _ in range(max_iters):
        rel = edges.union(labels.map_batches(drop_changed, batch_format="pyarrow"))
        labels = exchange_map(
            exchange_map(rel, route, np_, propose, auto_shrink=True),
            route,
            np_,
            combine,
            auto_shrink=True,
        )
        changed = labels.sum("changed")
        if not changed:
            break
    else:  # pragma: no cover - 64 rounds >> any real dup-cluster diameter
        raise RuntimeError(f"connected_components: no fixed point in {max_iters} rounds")

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {"docid": t["node"], "cluster_id": t["val"]},
            schema=pa.schema([("docid", pa.int64()), ("cluster_id", pa.int64())]),
        )

    return labels.map_batches(project, batch_format="pyarrow")


def dedup_clusters_ds(sf_dir: str, tau: float = 0.8):
    """(docid, cluster_id) over the exact 3-gram-Jaccard dup pairs: the
    transitive closure of ``ngram_jaccard_dups`` — what a curation pipeline
    keys "keep one per cluster" on. Driver-gated against a recursive-CTE
    DuckDB twin."""
    from web_search_engine_ray.pipelines.dedup import ngram_jaccard_dups

    return connected_components(ngram_jaccard_dups(sf_dir, tau=tau))
