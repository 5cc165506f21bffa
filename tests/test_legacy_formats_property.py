"""Property tests for the legacy run formats: arbitrary sorted posting
tables round-trip byte-exactly through TSV and RUN1, and autodetection
never misclassifies."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def posting_tables(draw):
    n_terms = draw(st.integers(0, 12))
    terms = sorted(
        draw(
            st.sets(
                st.text(
                    alphabet="abcdefghijklmnopqrstuvwxyz0123456789.-",
                    min_size=1,
                    max_size=12,
                ).filter(
                    # the reference TSV format cannot represent tab/newline
                    # and its tokenizer never emits leading/trailing dots
                    lambda s: not s.startswith(".") and not s.endswith(".")
                ),
                min_size=n_terms,
                max_size=n_terms,
            )
        )
    )
    t_l, d_l, f_l = [], [], []
    for t in terms:
        n = draw(st.integers(1, 20))
        docids = sorted(
            draw(
                st.sets(
                    st.integers(0, 2**31 - 1), min_size=n, max_size=n
                )
            )
        )
        for d in docids:
            t_l.append(t)
            d_l.append(d)
            f_l.append(draw(st.integers(1, 1000)))
    return pa.table(
        {
            "term": pa.array(t_l, pa.string()),
            "docid": pa.array(d_l, pa.uint64()),
            "tf": pa.array(f_l, pa.uint32()),
        }
    )


@settings(max_examples=30, deadline=None)
@given(posting_tables())
def test_run_formats_roundtrip(tmp_path_factory, t):
    from web_search_engine_ray.sources.legacy_runs import (
        detect_run_format,
        read_legacy_run,
        write_run1,
        write_tsv_run,
    )

    d = tmp_path_factory.mktemp("prop_runs")
    p_tsv = str(d / "a.tsv")
    p_run = str(d / "a.run")
    write_tsv_run(t, p_tsv)
    write_run1(t, p_run)
    assert detect_run_format(p_run) == "run1"
    assert detect_run_format(p_tsv) == "tsv"
    for p in (p_tsv, p_run):
        got = read_legacy_run(p)
        assert got.num_rows == t.num_rows, p
        if t.num_rows:
            assert got["term"].to_pylist() == t["term"].to_pylist(), p
            assert np.array_equal(
                got["docid"].to_numpy(zero_copy_only=False),
                t["docid"].to_numpy(zero_copy_only=False),
            ), p
            assert np.array_equal(
                got["tf"].to_numpy(zero_copy_only=False),
                t["tf"].to_numpy(zero_copy_only=False),
            ), p


def test_run1_rejects_oversized_values(tmp_path):
    import pytest as _pytest

    from web_search_engine_ray.sources.legacy_runs import write_run1

    t = pa.table(
        {
            "term": pa.array(["x"], pa.string()),
            "docid": pa.array([1 << 33], pa.uint64()),
            "tf": pa.array([1], pa.uint32()),
        }
    )
    with _pytest.raises(ValueError, match="u32"):
        write_run1(t, str(tmp_path / "bad.run"))


def test_run1_rejects_corrupt_trailing_bytes(tmp_path):
    import pytest as _pytest

    from web_search_engine_ray.sources.legacy_runs import (
        read_run1,
        write_run1,
    )

    t = pa.table(
        {
            "term": pa.array(["x"], pa.string()),
            "docid": pa.array([5], pa.uint64()),
            "tf": pa.array([1], pa.uint32()),
        }
    )
    p = str(tmp_path / "a.run")
    write_run1(t, p)
    with open(p, "ab") as f:
        f.write(b"\x01\x02")
    with _pytest.raises((ValueError, EOFError, IndexError)):
        read_run1(p)
