"""Adversarial gate corpus: the generator the driver's tables are too
polite to be.

Clones /root/testdata/sf0.001 into /tmp/wse_adversarial_sf, then replaces
``events.parquet`` and ``embeddings.parquet`` with handcrafted pathological
data and runs the FULL engine-vs-SQL gate (tools/check_driver.py) over the
clone. The driver's generators assign event_id in timestamp order and draw
continuous values, so an engine/twin pair that secretly disagrees on tie
ordering still hashes green — exactly the latent-divergence class the
round-4 review flagged on events_funnel. This corpus plants every such
tie on purpose:

events (same schema, ~230 rows, event_id deliberately NOT in ts order):
- funnel trios inside ONE second with microsecond order REVERSED vs the
  semantic stage order, straddling session breaks;
- whole user histories at a single identical microsecond (ordering falls
  entirely to event_id);
- session gaps at exactly gap_s seconds, gap_s +/- 1, and a sub-second
  straddle where second-resolution and microsecond-resolution deltas
  disagree about the break;
- hour- and midnight-aligned timestamps (window/hopping/daily/retention
  bin edges), value ties and bin-edge values, single-event users,
  purchase-before-signup in time but after in event_id.

embeddings (same schema, 120 rows): duplicate vectors (exact cosine
ties -> the (cos desc, vec_id) contract decides), a zero vector, negated
pairs, and axis-aligned one-hots; labels cycle 0..3.

documents (same schema, 500 rows): empty/whitespace docs, exact-duplicate
groups, near-dups (one-word edit / reorder / containment), repeated-token
and all-stopword docs, ``[.-]``-chained token shapes, unicode, HTML
entities from the bounded set the twins' UNESC chain mirrors, identical
token-multiset tie blocks, a 1500-token doc, PII shapes, deterministic
small-vocab filler.

Usage: python tools/adversarial_gate.py [entry ...]
(no args = full gate; exit code is check_driver's)
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"
DST = "/tmp/wse_adversarial_sf"

US = 1_000_000
BASE = 1_704_067_200 * US  # 2024-01-01T00:00:00Z in epoch-us


def _ts(day: int, h: int, m: int, s: int, us: int = 0) -> int:
    return BASE + ((day * 24 + h) * 3600 + m * 60 + s) * US + us


def build_events() -> pa.Table:
    rows: list[tuple[int, int, str, float, int]] = []  # (epus, user, type, value, k)

    def add(epus, user, etype, value, k):
        rows.append((int(epus), user, etype, float(value), k))

    # user 0: funnel trio inside one second, microseconds REVERSED vs the
    # semantic order; a second trio exactly 1801 s later (clear new session)
    add(_ts(0, 10, 0, 0, 900_000), 0, "signup", 10.0, 1)
    add(_ts(0, 10, 0, 0, 500_000), 0, "view", 20.0, 2)
    add(_ts(0, 10, 0, 0, 100_000), 0, "purchase", 30.0, 3)
    t2 = _ts(0, 10, 0, 0, 900_000) + 1801 * US
    add(t2 + 900_000 - 900_000, 0, "signup", 11.0, 4)
    add(t2 + 400_000, 0, "view", 21.0, 5)
    add(t2 + 200_000, 0, "purchase", 31.0, 6)

    # user 1: six events at ONE identical microsecond — ordering falls
    # entirely to event_id (assigned scrambled below)
    one = _ts(0, 12, 0, 0)
    for i, et in enumerate(["signup", "view", "purchase", "view", "click", "error"]):
        add(one, 1, et, 50.0, i)

    # user 2: gap-resolution plants. gap_s=1800 in the engine.
    g0 = _ts(1, 13, 0, 0, 500_000)
    add(g0, 2, "signup", 1.0, 1)
    add(g0 + 1800 * US, 2, "view", 2.0, 2)          # delta == gap_s: same session (> rule)
    add(g0 + 1800 * US + 1801 * US, 2, "view", 3.0, 3)  # 1801 s: break
    # sub-second straddle: second-resolution delta 1800, us delta 1799.9 s
    h0 = _ts(1, 18, 0, 0, 900_000)
    add(h0, 2, "purchase", 4.0, 4)
    add(h0 + 1800 * US - 800_000, 2, "view", 5.0, 5)
    # and second-resolution delta 1801, us delta 1800.2 s
    add(h0 + (1800 * US - 800_000) + 1801 * US + 200_000, 2, "click", 6.0, 6)

    # user 3: single event, value at a bin edge
    add(_ts(2, 0, 0, 0), 3, "purchase", 100.0, 0)

    # user 4: hour/midnight boundary hits across three days (retention
    # offsets 0, 1, 7 days), values tied across users
    add(_ts(0, 0, 0, 0), 4, "signup", 50.0, 1)
    add(_ts(0, 23, 0, 0), 4, "view", 50.0, 2)
    add(_ts(1, 0, 0, 0), 4, "view", 50.0, 3)
    add(_ts(7, 0, 0, 0), 4, "purchase", 50.0, 4)

    # user 5: value pathology — ties, zero, negative, huge, bin edges
    v0 = _ts(3, 9, 30, 0)
    for i, v in enumerate([50.0, 50.0, 50.0, 50.0, 50.0, 0.0, -10.5, 1e6, 100.0, 99.99]):
        add(v0 + i * 60 * US, 5, "purchase" if i % 2 else "view", v, i)

    # user 6: purchase BEFORE signup in time but AFTER in event_id (the
    # scramble below preserves insertion blocks, so keep them adjacent);
    # plus a zero-lag signup->purchase pair at one microsecond
    c0 = _ts(4, 8, 0, 0)
    add(c0 + 5 * US, 6, "purchase", 9.0, 1)
    add(c0, 6, "signup", 8.0, 2)
    add(c0 + 600 * US, 6, "signup", 7.0, 3)
    add(c0 + 600 * US, 6, "purchase", 6.0, 4)

    # user 7: 40-event single-session run, each adjacent pair sharing a
    # second with reversed microseconds (stress for running sums / windows
    # / top-n tie orders); values cycle through a small tied set
    r0 = _ts(5, 14, 0, 0)
    for i in range(20):
        sec = r0 + i * 120 * US
        add(sec + 700_000, 7, ["view", "click", "purchase", "signup"][i % 4], [5.0, 5.0, 7.5][i % 3], i)
        add(sec + 100_000, 7, ["click", "view", "error", "view"][i % 4], [5.0, 7.5, 5.0][i % 3], i + 100)

    # users 8, 9: deterministic filler over three days so windowed ops have
    # ordinary mass too (arithmetic, no RNG)
    for u in (8, 9):
        f0 = _ts(0, 6 + u, 7, 11)
        for i in range(60):
            et = ["view", "click", "signup", "view", "purchase"][(i + u) % 5]
            add(f0 + (i * 997 + u * 131) * US * 7, u, et, ((i * 37 + u * 11) % 200) / 2.0, (i * 13 + u) % 100)

    # event_id assignment: reverse within blocks of 7 over the ts-sorted
    # sequence — ids are a deterministic scramble of time order, so any
    # engine/twin pair that breaks ties differently diverges
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    n = len(rows)
    ids = np.arange(n, dtype=np.int64)
    for b in range(0, n, 7):
        ids[b : b + 7] = ids[b : b + 7][::-1]
    order = np.argsort(ids, kind="stable")
    rows = [rows[i] for i in order]  # table rows in event_id order

    # props pathology on every 17th row: floats, strings, malformed JSON,
    # wrong-case keys, nested values — the engine's strict polars parse
    # (json_path_match + Int64 cast) and the twin's guarded
    # json_valid/regexp/TRY_CAST chain must drop them IDENTICALLY
    props = ['{"k": %d}' % r[4] for r in rows]
    patho = [
        '{"k": 5.7}', '{"k": "  7 "}', 'not json', '{"k": 5', '',
        '{"K": 9}', '{"k": true}', '{"k": [1]}', '{"k": "5e2"}',
        '{"k": "+5"}', '{"k": null}', 'null',
    ]
    for j, i in enumerate(range(0, n, 17)):
        props[i] = patho[j % len(patho)]
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )


def build_embeddings(dim: int = 64, n: int = 120) -> pa.Table:
    V = np.zeros((n, dim), dtype=np.float32)
    for i in range(n):
        kind = i % 6
        if kind == 0:  # axis one-hot (exact ties between repeats)
            V[i, (i // 6) % dim] = 1.0
        elif kind == 1:  # duplicate of the previous one-hot
            V[i, (i // 6) % dim] = 1.0
        elif kind == 2:  # negation (cosine -1 vs the pair)
            V[i, (i // 6) % dim] = -1.0
        elif kind == 3:  # zero vector
            pass
        elif kind == 4:  # two-hot with tied magnitude
            V[i, (i // 6) % dim] = 1.0
            V[i, ((i // 6) + 1) % dim] = 1.0
        else:  # deterministic dense ramp
            V[i] = np.arange(dim, dtype=np.float32) * ((i % 7) - 3)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in V], pa.list_(pa.float32())),
            "label": pa.array((np.arange(n) % 4).astype(np.int32), pa.int32()),
        }
    )


VOCAB = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark dup group query row data slow filter customer line "
    "value agg column big vector a to in is of and"
).split()


def build_documents() -> pa.Table:
    """~500 docs of planted text pathology: empty/whitespace docs, exact-dup
    groups, near-dups (edit / reorder / containment), token-shape stress
    (``[.-]`` runs, digits), unicode, HTML entities from the bounded set the
    SQL twins' UNESC chain mirrors, identical-score tie blocks, a long doc
    for chunking, PII shapes, and deterministic small-vocab filler."""
    texts: list[str] = []

    def add(t: str) -> None:
        texts.append(t)

    # A: empty / degenerate (empty-doc rule: docid kept, dl=0, counts in N)
    for t in ["", " ", "\n\t  ", "the", "z", "0"]:
        add(t)
    # B: exact-duplicate groups (identical text across sources/langs) plus a
    # case variant — NOT an exact dup, but token-identical (near-dup bait)
    dup1 = "spark join merge sort the data table scan window filter"
    dup2 = "query row batch stream value agg column hash part key"
    dup3 = "big vector small line customer group dup slow fast order"
    for _ in range(5):
        add(dup1)
    for _ in range(3):
        add(dup2)
    for _ in range(2):
        add(dup3)
    add(dup1.upper())
    add(" " + dup1)  # leading-space variant: same tokens, different text
    # C: near-dups of a 30-word base — one-word edit, bag-preserving
    # reorder, 10-word prefix/suffix containment, concatenation
    base = " ".join(VOCAB[i % len(VOCAB)] for i in range(30))
    words = base.split()
    edit = words.copy()
    edit[7] = "zebra"
    add(base)
    add(" ".join(edit))
    add(" ".join(words[::-1]))
    add(" ".join(words[:10]))
    add(" ".join(words[-10:]))
    add(base + " " + dup1)
    # D: repetition / skew (burstiness, zipf, lm_score, repetition_stats)
    add(("spark " * 300).strip())
    add(("data base " * 50).strip())
    add(" ".join(["a"] * 100 + ["b"] * 50 + ["c"] * 25 + ["d"] * 12))
    add(("the a of to in is and " * 6).strip())  # all stopwords
    # E: token-shape pathologies for [a-z0-9]+(?:[.-][a-z0-9]+)*
    add("state-of-the-art 3.14 a-1.b-2 a. .b -- .. -a a- 1-2-3.4-5 x")
    add("A.B.C a.b.c FOO-BAR foo--bar foo..bar")
    add("0001 007 42 9.9.9 v1.2.3-rc4 2024-01-01")
    add("x" + "-y" * 40)  # one long chained token
    # F: unicode (non-ASCII never enters [a-z0-9] tokens; lower() parity)
    add("café résumé naïve data")
    add("CAFÉ DATA Straße GROSS")
    add("中文数据 spark 引擎 merge")
    add("🚀 rocket 🚀 launch pad")
    add("data中心spark edge")
    add("ｆｕｌｌｗｉｄｔｈ latin test")
    # G: HTML entities — strictly from the UNESC-mirrored set
    add("&amp; spark &lt;join&gt; done")
    add('a&quot;b&quot;c term')
    add("&#39;quoted&#39; value here")
    add("&amp;lt; tricky double escape")
    add("r&amp;d data pipeline")
    add("&nbsp;gap&nbsp;words here")
    add("plain & ampersand && run")
    # H: tie blocks — 12 docs, identical token multiset, different order
    # (BM25/TAAT score ties -> docid tie-break contracts); 8 docs with
    # identical dl but disjoint-ish tokens (dl-quantile tie runs)
    tie = ["merge", "sort", "spark", "table", "scan", "row"]
    for i in range(12):
        r = tie[i % 6 :] + tie[: i % 6]
        add(" ".join(r if i < 6 else r[::-1]))
    for i in range(8):
        add(" ".join(VOCAB[(i * 5 + j) % len(VOCAB)] for j in range(15)))
    # I: long doc (chunk boundaries) + one exactly-64-token doc
    add(" ".join(VOCAB[(i * 7) % len(VOCAB)] for i in range(1500)))
    add(" ".join(VOCAB[i % len(VOCAB)] for i in range(64)))
    # J: PII shapes (also `-`-chained tokens: 555-123-4567 is ONE token)
    add("contact bob@example.com or alice.smith@test.org now")
    add("call 555-123-4567 or 555.987.6543 today")
    add("ssn 123-45-6789 leaked in the data dump")
    add("server 192.168.1.1 and 10.0.0.255 down")
    add("see https://x.example/path?a=1&amp;b=2 for details")
    # filler to ~500: deterministic small-vocab sentences, varying length
    while len(texts) < 500:
        i = len(texts)
        L = 5 + (i * 13) % 76
        add(" ".join(VOCAB[(i * 11 + j * (1 + i % 5)) % len(VOCAB)] for j in range(L)))

    n = len(texts)
    langs = ["en", "es", "zh", "de", "fr"]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([langs[(i * 3) % 5] for i in range(n)], pa.string()),
            # src_rare appears exactly once (per-source sampling edge)
            "source": pa.array(
                ["src_rare" if i == 119 else f"src{i % 7}" for i in range(n)],
                pa.string(),
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def build_corpus() -> str:
    os.makedirs(DST, exist_ok=True)
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), os.path.join(DST, f))
    pq.write_table(build_events(), os.path.join(DST, "events.parquet"))
    pq.write_table(build_embeddings(), os.path.join(DST, "embeddings.parquet"))
    pq.write_table(build_documents(), os.path.join(DST, "documents.parquet"))
    return DST


# -- seeded fuzz mode ---------------------------------------------------------

FUZZ_VOCAB = (
    "spark merge sort join data table scan row window the a of".split()
)


def build_fuzz_corpus(seed: int) -> str:
    """Randomized tie-forcing corpus: same schemas, but every distribution
    is chosen to COLLIDE — second-granular timestamps with only {0, .5s}
    microsecond offsets, fully scrambled event_ids, a 6-value `value` set,
    a 12-word vocabulary, 10% empty / 10% cloned docs, and small-integer
    embeddings ({-1,0,1,2} entries -> duplicate/zero/tied vectors by
    chance). Each seed is a fresh draw over the tie classes the planted
    corpus encodes by hand, and the events user-cardinality SHAPE cycles
    with the seed (12 / 2 / 300 users) to hit degenerate-partition regimes
    as well."""
    rng = np.random.default_rng(seed)
    dst = f"/tmp/wse_fuzz_sf_{seed}"
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), os.path.join(dst, f))

    # events: 400 rows; the USER-CARDINALITY SHAPE cycles with the seed —
    # 12 users (ordinary), 2 users (deep per-user histories, the empty-
    # hash-partition regime that crashed sessionize), or 300 users (mostly
    # single-event users; retention/funnel/session edges everywhere)
    n = 400
    n_users = [12, 2, 300][seed % 3]
    ts = (
        BASE
        + rng.integers(0, 3 * 86400, n) * US
        + rng.integers(0, 2, n) * 500_000
    )
    ev = pa.table(
        {
            "event_id": pa.array(rng.permutation(n).astype(np.int64)),
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, n).astype(np.int64)),
            "event_type": pa.array(
                [["view", "click", "signup", "purchase", "error"][i]
                 for i in rng.integers(0, 5, n)],
                pa.string(),
            ),
            "value": pa.array(
                np.array([0.0, 5.0, 5.0, 7.5, 50.0, 100.0])[rng.integers(0, 6, n)]
            ),
            "props": pa.array(
                [
                    # ~15% pathological props (floats / malformed / padded
                    # strings); the rest plain integer k
                    ['{"k": 5.7}', 'not json', '{"k": "  7 "}', '{"k": 5',
                     '{"k": true}', '{"k": "+%d"}' % k][k % 6]
                    if rng.random() < 0.15
                    else '{"k": %d}' % k
                    for k in rng.integers(0, 8, n)
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(ev, os.path.join(dst, "events.parquet"))

    # embeddings: small-integer vectors -> exact dups / zeros / ties
    ne, dim = 100, 32
    V = rng.integers(-1, 3, (ne, dim)).astype(np.float32)
    V[rng.integers(0, ne, 5)] = 0.0  # a few guaranteed zero vectors
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(ne, dtype=np.int64)),
            "embedding": pa.array(
                [list(map(float, v)) for v in V], pa.list_(pa.float32())
            ),
            "label": pa.array(
                rng.integers(0, 4, ne).astype(np.int32), pa.int32()
            ),
        }
    )
    pq.write_table(emb, os.path.join(dst, "embeddings.parquet"))

    # documents: tiny vocab -> massive tf/score collisions
    nd = 300
    texts = []
    for i in range(nd):
        r = rng.random()
        if r < 0.10:
            texts.append("")
        elif r < 0.20 and texts:
            texts.append(texts[int(rng.integers(0, len(texts)))])  # clone
        else:
            L = int(rng.integers(1, 40))
            words = [FUZZ_VOCAB[j] for j in rng.integers(0, len(FUZZ_VOCAB), L)]
            if rng.random() < 0.05:
                words.insert(
                    int(rng.integers(0, len(words) + 1)), "&amp;"
                )  # safe entity
            texts.append(" ".join(words))
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(nd, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [["en", "es", "zh", "de", "fr"][i] for i in rng.integers(0, 5, nd)],
                pa.string(),
            ),
            "source": pa.array(
                [f"src{i}" for i in rng.integers(0, 7, nd)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(dst, "documents.parquet"))
    return dst


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--fuzz":
        seed = int(args[1])
        dst = build_fuzz_corpus(seed)
        rest = args[2:]
        print(f"fuzz corpus (seed {seed}) at {dst}")
    else:
        dst = build_corpus()
        rest = args
        print(f"adversarial corpus at {dst}")
    rc = subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(__file__), "check_driver.py"), dst]
        + rest
    )
    sys.exit(rc)


if __name__ == "__main__":
    main()
