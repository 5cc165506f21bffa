"""RM3 pseudo-relevance feedback: the expansion must actually change
rankings (not a no-op), be deterministic, and respect the feedback knobs."""

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_rm3_changes_ranking_and_is_deterministic(ray_session):
    from web_search_engine_ray.pipelines.serving import (
        bm25_topk_table,
        rm3_expanded_table,
    )

    base = bm25_topk_table(SF, mode="OR").to_pandas()
    rm3_a = rm3_expanded_table(SF).to_pandas()
    rm3_b = rm3_expanded_table(SF).to_pandas()
    pd.testing.assert_frame_equal(rm3_a, rm3_b)
    # same shape contract as the base table
    assert list(rm3_a.columns) == ["query_id", "docid", "score"]
    assert set(rm3_a["query_id"]) == set(base["query_id"])
    # expansion must perturb at least one query's ranked list
    diff = False
    for qid in base["query_id"].unique():
        b = base[base["query_id"] == qid]["docid"].tolist()
        r = rm3_a[rm3_a["query_id"] == qid]["docid"].tolist()
        if b != r:
            diff = True
            break
    assert diff, "RM3 expansion changed no ranking at all"


def test_rm3_zero_expansion_equals_plain(ray_session):
    from web_search_engine_ray.pipelines.serving import (
        bm25_topk_table,
        rm3_expanded_table,
    )

    base = bm25_topk_table(SF, mode="OR").to_pandas()
    rm3 = rm3_expanded_table(SF, fb_terms=0).to_pandas()
    pd.testing.assert_frame_equal(base, rm3)
