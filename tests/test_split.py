"""Train/val/test split contracts: content-addressed stability (duplicate
texts share a split), parameter validation, and rough proportionality.
Value-level oracle check runs in the driver gate (train_val_test_split)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from web_search_engine_ray.pipelines.split import split_docs_ds


def _write(tmp_path, texts):
    d = str(tmp_path / "docs")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_duplicates_share_split(ray_session, tmp_path):
    texts = [f"doc {i}" for i in range(50)] + [f"doc {i}" for i in range(50)]
    d = _write(tmp_path, texts)
    got = split_docs_ds(d, val_pct=30, test_pct=30).to_pandas()
    by_text = {}
    for _, r in got.iterrows():
        by_text.setdefault(texts[r["docid"]], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_text.values())
    # with 50 distinct texts and 60% non-train buckets, all three appear
    assert set(got["split"]) == {"train", "val", "test"}


def test_split_is_bucket_function(ray_session):
    got = split_docs_ds("/root/testdata/sf0.001", val_pct=10, test_pct=10).to_pandas()
    assert ((got["bucket"] < 10) == (got["split"] == "val")).all()
    assert (
        ((got["bucket"] >= 10) & (got["bucket"] < 20)) == (got["split"] == "test")
    ).all()
    # rough proportionality on 500 docs: train is the large majority
    frac = (got["split"] == "train").mean()
    assert 0.7 < frac < 0.9


def test_bad_pcts_raise(ray_session):
    with pytest.raises(ValueError, match="val_pct"):
        split_docs_ds("/root/testdata/sf0.001", val_pct=60, test_pct=60)
