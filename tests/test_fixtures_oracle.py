"""Fixture generator determinism + oracle self-consistency checks."""

import glob

import pyarrow.parquet as pq

from web_search_engine_ray.fixtures.transcripts import conv_batch_rows, write_corpus
from web_search_engine_ray.oracle import OracleIndex


def test_generator_deterministic():
    a = conv_batch_rows(0, 10, 8)
    b = conv_batch_rows(0, 10, 8)
    assert a.equals(b)
    # slicing by conv range is consistent with generating the full range
    c = conv_batch_rows(3, 7, 8)
    full = a.to_pylist()
    sub = [r for r in full if 3 <= int(r["conv_id"][4:]) < 7]
    assert c.to_pylist() == sub


def test_corpus_sorted_and_schema(tiny_corpus_dir):
    files = sorted(glob.glob(tiny_corpus_dir + "/*.parquet"))
    assert files
    import pyarrow as pa

    t = pq.read_table(files[0])
    assert t.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert t.schema.field("turn_idx").type == pa.int32()
    assert t.schema.field("ts").type == pa.timestamp("us")
    rows = []
    for f in files:
        rows.extend(pq.read_table(f, columns=["conv_id", "turn_idx"]).to_pylist())
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    assert keys == sorted(keys)


def test_corpus_exercises_edge_cases(small_corpus_dir):
    texts = []
    for f in sorted(glob.glob(small_corpus_dir + "/*.parquet")):
        texts.extend(pq.read_table(f, columns=["text"])["text"].to_pylist())
    from web_search_engine_ray.functions.tokenize import tokenize

    toks = [tokenize(t) for t in texts]
    assert any(len(t) == 0 for t in toks), "need dl=0 turns"
    flat = [w for t in toks for w in t]
    assert "the" in flat
    assert any("." in w or "-" in w for w in flat), "need dotted/hyphen tokens"
    assert any(w.startswith("uq") for w in flat), "need df=1 markers"


def test_oracle_bm25_sanity():
    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog ate the cat"),
        (2, "birds fly high"),
        (3, ""),
    ]
    oi = OracleIndex.build(docs)
    assert oi.N == 4  # empty doc counts
    assert oi.doc_lengths[3] == 0
    assert oi.df("the") == 2
    res = oi.bm25_taat("cat")
    assert {d for d, _ in res} == {0, 1}
    daat = oi.ranked_daat("cat dog", topk=10, mode="OR")
    assert daat[0][0] == 1  # doc 1 has both terms
    and_res = oi.ranked_daat("cat dog", topk=10, mode="AND")
    assert [d for d, _ in and_res] == [1]
    assert oi.boolean("cat dog", "AND") == {1}
    assert oi.boolean("cat dog", "OR") == {0, 1}
    # unknown terms silently dropped, even in AND
    assert oi.boolean("cat zzz", "AND") == {0, 1}
    assert oi.ranked_daat("zzz", 10) == []
    # TAAT with mode filter
    assert [d for d, _ in oi.search("cat dog", "AND")] == [1]


def test_oracle_duplicate_query_term_double_contribution():
    docs = [(0, "x y"), (1, "x x y")]
    oi = OracleIndex.build(docs)
    s1 = dict(oi.bm25_taat("x"))
    s2 = dict(oi.bm25_taat("x x"))
    assert abs(s2[0] - 2 * s1[0]) < 1e-12


def test_write_corpus_cache(tmp_path):
    p1 = write_corpus(str(tmp_path), n_convs=5, max_turns=4, rows_per_file=7)
    t1 = [pq.read_table(p) for p in p1]
    p2 = write_corpus(str(tmp_path), n_convs=5, max_turns=4, rows_per_file=7)
    assert p1 == p2
    for a, p in zip(t1, p2):
        assert a.equals(pq.read_table(p))
