"""PII redaction: production path (plant=False) over a fixture corpus that
actually contains PII, cross-checked value-for-value against DuckDB running
the same patterns (Rust regex vs RE2 — the dialect-compatibility contract
the oracle entry relies on)."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from web_search_engine_ray.pipelines.redact import PII_PATTERNS, pii_redact_ds

DOCS = [
    "reach me at jane.doe+spam@mail.example.org or j@x.io today",
    "ssn 123-45-6789 phone +1 (555) 010-1234 done",
    "server at 192.168.0.1 and 10.0.255.254; port list 1.2.3.4",
    "no pii here at all, just words",
    "call 555-010-9999 or 5550109999 mixed with ip 8.8.8.8",
    "",  # empty
    None,  # null text
    "edge: a@b.co x 999-99-9999 y 001.002.003.004",
]


def _fixture(tmp_path):
    d = str(tmp_path / "pii")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), pa.int64()),
                "text": pa.array(DOCS, pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_plant_false_matches_duckdb(ray_session, tmp_path):
    d = _fixture(tmp_path)
    got = (
        pii_redact_ds(d, plant=False)
        .to_pandas()
        .sort_values("docid")
        .reset_index(drop=True)
    )

    red = "coalesce(text, '')"
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            f"len(regexp_extract_all(coalesce(text, ''), '{pat}'))::BIGINT"
            f" AS n_{name}"
        )
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT doc_id AS docid, {red} AS redacted, {", ".join(counts)}
        FROM read_parquet('{os.path.join(d, "documents.parquet")}')
        ORDER BY doc_id
        """
    ).fetchdf()

    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert got[c].tolist() == want[c].tolist(), c

    # and the redaction did real work where expected
    assert got.loc[0, "n_email"] == 2
    assert "<EMAIL>" in got.loc[0, "redacted"]
    assert "jane" not in got.loc[0, "redacted"]
    assert got.loc[1, "n_ssn"] == 1 and got.loc[1, "n_phone"] >= 1
    assert got.loc[2, "n_ipv4"] == 3
    assert got.loc[3, "redacted"] == DOCS[3]  # clean doc untouched
    assert got.loc[6, "redacted"] == ""  # null -> empty, zero counts
    assert got.loc[6, ["n_email", "n_ssn", "n_phone", "n_ipv4"]].sum() == 0


def test_placeholders_not_rematched(ray_session, tmp_path):
    """A doc that is ONLY an email must come out as exactly '<EMAIL>' and
    count 0 for every later pattern (chained replace, counts on source)."""
    d = str(tmp_path / "one")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["bob@corp.net"], pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = pii_redact_ds(d, plant=False).to_pandas()
    assert got.loc[0, "redacted"] == "<EMAIL>"
    assert got.loc[0, "n_email"] == 1
    assert got.loc[0, ["n_ssn", "n_phone", "n_ipv4"]].sum() == 0
