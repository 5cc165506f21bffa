"""Faceted search — BM25 top-k per (query, source) and boolean facet counts
vs their DuckDB SQL twins, plus shape/determinism contracts.

The facet pair is a serving capability the reference's Flask app lacks
(`HW2/app.py:56-116` returns a flat result list); the engine side reuses the
oracle-matched TAAT scorer (`serving.bm25_taat_table`'s path) and adds only
a candidate-only attribute gather + per-facet cut (no new score math).
"""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from web_search_engine_ray.pipelines import serving

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def test_bm25_facet_topk_matches_oracle(ray_session, con):
    got = serving.bm25_facet_topk_table(SF).to_pandas()
    exp = con.sql(entrymod.oracle_sql()["bm25_facet_topk"]).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
    # per-facet cut holds: never more than FACET_TOPK rows per (query, source)
    assert got.groupby(["query_id", "source"]).size().max() <= serving.FACET_TOPK
    # more than one facet is actually exercised
    assert got["source"].nunique() > 1


def test_facet_counts_match_oracle(ray_session, con):
    got = serving.facet_counts_table(SF).to_pandas()
    exp = con.sql(entrymod.oracle_sql()["facet_counts"]).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
    # facet counts decompose the boolean-OR result sets exactly
    or_counts = (
        serving.boolean_table(SF, mode="OR")
        .to_pandas()
        .groupby("query_id")
        .size()
        .to_dict()
    )
    per_q = got.groupby("query_id")["n_docs"].sum().to_dict()
    assert per_q == or_counts


def test_facet_tables_deterministic(ray_session):
    a = serving.bm25_facet_topk_table(SF)
    b = serving.bm25_facet_topk_table(SF)
    assert a.equals(b)
    c = serving.facet_counts_table(SF)
    d = serving.facet_counts_table(SF)
    assert c.equals(d)
