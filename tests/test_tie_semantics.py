"""Boundary-tie semantics: many docs with IDENTICAL BM25 scores straddling the
top-k cut. The vectorized scorer must keep exactly the docids the reference's
min-heap keeps (it evicts smallest-docid ties first — a plain (-score, docid)
sort gets this wrong; regression for a bug found on the 1M-turn index)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from web_search_engine_ray.pipelines.build import build_index
from web_search_engine_ray.pipelines.query import Searcher


@pytest.fixture(scope="module")
def tie_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("tie_corpus")
    rows = []
    # 40 identical docs (same text -> identical tf/dl -> identical scores),
    # plus distinct higher/lower scoring docs around them
    for i in range(40):
        rows.append((f"conv{i:08d}", 0, "user", "data point common filler words here", "", i))
    rows.append(("conv00000100", 0, "user", "data data data data", "", 100))  # high tf
    rows.append(("conv00000101", 0, "user", "data " + "pad " * 60, "", 101))  # long dl
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows]),
            "text": pa.array([r[3] for r in rows]),
            "tool": pa.array([r[4] for r in rows]),
            "ts": pa.array([r[5] * 1000000 for r in rows], pa.timestamp("us")),
        }
    ).sort_by("conv_id")
    pq.write_table(tbl, str(d / "transcripts_00000.parquet"))
    out = str(tmp_path_factory.mktemp("tie_idx"))
    build_index(str(d), out, partition_rows=20, num_shards=2, n_salts=2, block_size=8)
    return out


def test_vectorized_tie_set_matches_heap(tie_index):
    s = Searcher(tie_index)
    for q in ["data", "data data", "data common"]:
        for topk in (5, 10, 39, 41):
            fast = s.bm25_topk(q, topk=topk, mode="OR")
            slow = sorted(
                s.search_topk_daat(q, topk=topk, mode="OR"), key=lambda x: (-x[1], x[0])
            )
            assert [d for d, _ in fast] == [d for d, _ in slow], (q, topk)
            assert [x for _, x in fast] == [x for _, x in slow], (q, topk)


def test_wand_tie_set_matches_heap(tie_index):
    s = Searcher(tie_index)
    for q in ["data", "data common"]:
        for topk in (5, 10, 39):
            wand = s.search_topk_wand(q, topk=topk)
            slow = sorted(
                s.search_topk_daat(q, topk=topk, mode="OR"), key=lambda x: (-x[1], x[0])
            )
            assert wand == slow, (q, topk)
