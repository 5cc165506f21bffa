"""Tokenizer parity tests: scalar vs vectorized (polars) vs the reference
regex semantics (``HW2/engine/parser.py:69-78``), incl. dotted/hyphenated
tokens, entities, case, and the query-side asymmetry."""

import html
import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from web_search_engine_ray.functions import tokenize as tk


def ref_tokenize(text: str) -> list[str]:
    # Reference contract: unescape (+ftfy if present) -> lower -> findall
    t = html.unescape(text)
    if tk.HAVE_FTFY:
        from ftfy import fix_text

        t = fix_text(t)
    return re.findall(r"[a-z0-9]+(?:[.-][a-z0-9]+)*", t.lower())


CASES = [
    "The U.S. economy grew 3.14 percent",
    "v1.2-beta e-mail  weird--double",
    "&amp;quot; escaped &lt;tags&gt; &amp; more",
    "MiXeD CaSe, punct! and... trailing-",
    "",
    "    ",
    "...",
    "a.b.c-d.e 0.0.1",
    "ends-with-dot. .starts",
    "tab\tseparated\nnewline",
]


def test_scalar_matches_reference_cases():
    for c in CASES:
        assert tk.tokenize(c) == ref_tokenize(c), c


def test_dotted_tokens_kept_whole():
    assert tk.tokenize("U.S. policy") == ["u.s", "policy"]
    assert tk.tokenize("pi is 3.14") == ["pi", "is", "3.14"]


def test_vectorized_matches_scalar_cases():
    arr = pa.array(CASES, type=pa.string())
    lists = tk.token_lists(arr)
    for c, got in zip(CASES, lists.to_list()):
        assert (got or []) == tk.tokenize(c), c


@given(st.lists(st.text(max_size=60), min_size=1, max_size=20))
@settings(max_examples=150, deadline=None)
def test_vectorized_matches_scalar_property(texts):
    arr = pa.array(texts, type=pa.string())
    lists = tk.token_lists(arr).to_list()
    for t, got in zip(texts, lists):
        assert (got or []) == tk.tokenize(t)


def test_query_terms_asymmetry():
    # Query path is lower().split() — punctuation is NOT stripped
    assert tk.query_terms("Machine LEARNING") == ["machine", "learning"]
    assert tk.query_terms("U.S. policy,") == ["u.s.", "policy,"]
    assert tk.query_terms("") == []


def test_batch_postings_tf_and_dl():
    texts = pa.array(["the cat the hat", "", "dog dog dog", "   "], type=pa.string())
    docids = np.array([10, 11, 12, 13], dtype=np.uint64)
    postings, dl = tk.batch_postings(docids, texts)
    assert dl.tolist() == [4, 0, 3, 0]
    rows = sorted(
        zip(
            postings["term"].to_pylist(),
            postings["docid"].to_pylist(),
            postings["tf"].to_pylist(),
        )
    )
    assert rows == [
        ("cat", 10, 1),
        ("dog", 12, 3),
        ("hat", 10, 1),
        ("the", 10, 2),
    ]
    # sorted by (term, docid)
    terms = postings["term"].to_pylist()
    ds = postings["docid"].to_pylist()
    assert sorted(zip(terms, ds)) == list(zip(terms, ds))
