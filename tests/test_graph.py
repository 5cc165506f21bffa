"""Connected components over dup-pair relations (pipelines/graph.py)."""

import numpy as np
import pyarrow as pa
import pytest

from web_search_engine_ray.pipelines.graph import connected_components


def _pairs_ds(pairs):
    import ray.data

    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    return ray.data.from_arrow(
        pa.table(
            {
                "docid_a": pa.array(a, pa.int64()),
                "docid_b": pa.array(b, pa.int64()),
            }
        )
    )


def _labels(pairs, **kw):
    ds = connected_components(_pairs_ds(pairs), **kw)
    rows = ds.take_all()
    return {r["docid"]: r["cluster_id"] for r in rows}


def _oracle(pairs):
    """Driver-side union-find, the ground truth."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_chain(ray_session):
    # long chain: worst-case diameter for the propagation
    pairs = [(i, i + 1) for i in range(10, 25)]
    assert _labels(pairs) == _oracle(pairs)
    assert set(_labels(pairs).values()) == {10}


def test_star_and_cycle(ray_session):
    pairs = [(100, x) for x in (101, 102, 103, 104)] + [(7, 8), (8, 9), (9, 7)]
    got = _labels(pairs)
    assert got == _oracle(pairs)
    assert got[104] == 100 and got[9] == 7


def test_two_components_and_dup_edges(ray_session):
    pairs = [(1, 2), (2, 3), (2, 3), (3, 1), (50, 60)]
    got = _labels(pairs)
    assert got == _oracle(pairs)
    assert got[3] == 1 and got[60] == 50 and got[50] == 50


def test_empty_relation(ray_session):
    assert _labels([]) == {}


def test_randomized_vs_union_find(ray_session):
    rng = np.random.Generator(np.random.Philox(key=42))
    nodes = rng.integers(0, 200, size=(150, 2))
    pairs = [(int(a), int(b)) for a, b in nodes if a != b]
    assert _labels(pairs) == _oracle(pairs)


@pytest.mark.parametrize("n_parts", [4, 64])
def test_partition_count_invariance(ray_session, n_parts):
    pairs = [(i, i + 3) for i in range(0, 30)]
    assert _labels(pairs, n_parts=n_parts) == _oracle(pairs)


def test_dedup_clusters_vs_duckdb(ray_session):
    """dedup_clusters over sf0.001 == DuckDB recursive-CTE closure."""
    import duckdb

    from web_search_engine_ray.pipelines.graph import dedup_clusters_ds

    sf = "/root/testdata/sf0.001"
    got = {
        r["docid"]: r["cluster_id"] for r in dedup_clusters_ds(sf, tau=0.8).take_all()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    tok = "regexp_extract_all(lower(text), '[a-z0-9]+(?:[.-][a-z0-9]+)*')"
    want = dict(
        con.execute(
            f"""
WITH RECURSIVE t AS (SELECT doc_id, {tok} AS ws FROM documents),
 sh AS (SELECT doc_id, list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                      for i in range(1, len(ws)-1)]) AS s
        FROM t WHERE len(ws) >= 3),
 pairs AS (SELECT a.doc_id AS docid_a, b.doc_id AS docid_b
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.s, b.s))::DOUBLE
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
 edges AS (SELECT docid_a AS u, docid_b AS v FROM pairs
           UNION SELECT docid_b, docid_a FROM pairs),
 reach(u, v) AS (SELECT u, v FROM edges
                 UNION SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v)
SELECT u, least(u, min(v)) FROM reach GROUP BY u
"""
        ).fetchall()
    )
    assert got == want and len(got) > 0
