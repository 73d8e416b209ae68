"""Prefix-filter set-similarity join (operators/setsim).

The contract under test is EXACT RECALL: unlike MinHash-LSH, the
prefix-filter candidate stage must lose no pair whose true Jaccard
meets the threshold — verified here against a brute-force all-pairs
computation on corpora with engineered boundary cases (pairs exactly
AT the threshold, just under it, identical sets, disjoint sets).
"""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from lakeflow.operators.setsim import (
    _distinct_elements,
    prefix_filter_candidates,
    setsim_join,
)

DOCS = [
    # identical pair (J = 1.0)
    (1, "a b c d e f g h"),
    (2, "a b c d e f g h"),
    # J exactly at 0.5: |A∩B|=4, |A∪B|=8 (6 tokens each, 4 shared)
    (3, "a b c d x1 x2"),
    (4, "a b c d y1 y2"),
    # just under 0.5: 3 shared of 6+6 -> 3/9
    (5, "a b c u1 u2 u3"),
    (6, "a b c v1 v2 v3"),
    # disjoint
    (7, "p q r s t"),
    # subset (J = 5/8)
    (8, "a b c d e f g h p q r s t w1 w2 w3"),
]


def brute_jaccard(rows: list[tuple[int, str]]) -> dict[tuple[int, int], float]:
    sets = {i: set(t.split()) for i, t in rows}
    out = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union:
            out[(a, b)] = inter / union
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


@pytest.mark.parametrize("t_micros", [300_000, 500_000, 625_000, 1_000_000])
def test_exact_recall_vs_brute_force(spark, docs, t_micros):
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in setsim_join(
            docs, "doc_id", "text", t_micros, shingle_n=1
        ).collect()
    }
    want = {
        p
        for p, j in brute_jaccard(DOCS).items()
        if j * 1_000_000 >= t_micros
    }
    assert got == want


def test_threshold_boundary_is_inclusive(spark, docs):
    # (3,4) sits exactly at J = 0.5: must be returned at t=0.5 and
    # dropped at the next micro step
    at = setsim_join(docs, "doc_id", "text", 500_000, shingle_n=1)
    assert (3, 4) in {(r.doc_id_a, r.doc_id_b) for r in at.collect()}
    above = setsim_join(docs, "doc_id", "text", 500_001, shingle_n=1)
    assert (3, 4) not in {(r.doc_id_a, r.doc_id_b) for r in above.collect()}


def test_jaccard_micros_values(spark, docs):
    rows = {
        (r.doc_id_a, r.doc_id_b): r.jaccard_micros
        for r in setsim_join(docs, "doc_id", "text", 300_000, shingle_n=1).collect()
    }
    assert rows[(1, 2)] == 1_000_000
    assert rows[(3, 4)] == 500_000
    assert rows[(1, 8)] == 500_000  # 8 shared / 16 union


def test_prefix_prunes_candidates(spark):
    # 40 docs sharing one universal stop token; only two real near-dups.
    # The shared-element join would pair everything (40*39/2); the
    # rarest-first prefix at t=0.6 must keep the candidate count small.
    rows = [(i, f"stop u{i}a u{i}b u{i}c u{i}d") for i in range(40)]
    rows += [(100, "m1 m2 m3 m4 m5"), (101, "m1 m2 m3 m4 m6")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    el = _distinct_elements(df, "doc_id", "text", 1)
    cand = prefix_filter_candidates(el, "doc_id", 600_000)
    n = cand.count()
    assert n < 40  # vs 861 all-pairs sharing "stop"
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in setsim_join(df, "doc_id", "text", 600_000, shingle_n=1).collect()
    }
    assert got == {(100, 101)}


def test_no_cartesian_in_plan(spark, docs):
    import contextlib
    import io

    df = setsim_join(docs, "doc_id", "text", 300_000)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_matches_batch_recompute(spark):
    from lakeflow.operators.setsim import (
        element_index,
        incremental_setsim_pairs,
        setsim_join,
    )

    old = [
        (1, "a b c d e f g h"),
        (3, "a b c d x1 x2"),
        (7, "p q r s t"),
    ]
    new = [
        (2, "a b c d e f g h"),      # exact dup of stored 1
        (4, "a b c d y1 y2"),        # near-dup of stored 3
        (9, "m1 m2 m3 m4"),          # matches nothing stored
        (10, "m1 m2 m3 m4"),         # new x new exact dup of 9
    ]
    od = spark.createDataFrame(old, ["doc_id", "text"])
    nd = spark.createDataFrame(new, ["doc_id", "text"])
    idx = element_index(od, "doc_id", "text", shingle_n=1)
    got = {
        (r.doc_id_a, r.doc_id_b): r.jaccard_micros
        for r in incremental_setsim_pairs(
            nd, idx, "doc_id", "text", 400_000, shingle_n=1
        ).collect()
    }
    # ground truth: batch join over old+new, pairs touching a new id
    new_ids = {i for i, _ in new}
    want = {
        (r.doc_id_a, r.doc_id_b): r.jaccard_micros
        for r in setsim_join(
            od.unionByName(nd), "doc_id", "text", 400_000, shingle_n=1
        ).collect()
        if r.doc_id_a in new_ids or r.doc_id_b in new_ids
    }
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 1_000_000
    assert (9, 10) in got and got[(9, 10)] == 1_000_000
    assert (3, 4) in got


def test_incremental_replay_emits_no_self_pairs(spark):
    from lakeflow.operators.setsim import element_index, incremental_setsim_pairs

    docs = [(1, "a b c d"), (2, "a b c e")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    # replay scenario: the batch's ids ALREADY reached the stored index
    idx = element_index(df, "doc_id", "text", shingle_n=1)
    out = incremental_setsim_pairs(
        df, idx, "doc_id", "text", 400_000, shingle_n=1
    )
    rows = out.collect()
    assert all(r.doc_id_a != r.doc_id_b for r in rows)
    # the true (1,2) pair survives, exactly once
    assert [(r.doc_id_a, r.doc_id_b) for r in rows] == [(1, 2)]


def test_incremental_verification_is_duplicate_insensitive(spark):
    # a crash between the pairs append and the checkpoint commit can
    # leave the stored index with every row appended TWICE; the
    # countDistinct verification must report the same jaccard values
    from lakeflow.operators.setsim import element_index, incremental_setsim_pairs

    old = [(1, "a b c d e f g h i j")]
    new = [(2, "a b c d e z1 z2 z3 z4 z5")]  # 5/15 shared -> J=0.333
    od = spark.createDataFrame(old, ["doc_id", "text"])
    nd = spark.createDataFrame(new, ["doc_id", "text"])
    idx = element_index(od, "doc_id", "text", shingle_n=1)
    dup_idx = idx.unionByName(idx)  # replayed append
    want = {
        (r.doc_id_a, r.doc_id_b): r.jaccard_micros
        for r in incremental_setsim_pairs(
            nd, idx, "doc_id", "text", 300_000, shingle_n=1
        ).collect()
    }
    got = {
        (r.doc_id_a, r.doc_id_b): r.jaccard_micros
        for r in incremental_setsim_pairs(
            nd, dup_idx, "doc_id", "text", 300_000, shingle_n=1
        ).collect()
    }
    assert want == {(1, 2): 333_333}
    assert got == want, "duplicated index rows must not inflate overlap"


def test_containment_join_brute_parity(spark):
    # exact recall for the asymmetric containment join: every
    # (needle, doc) with |N∩D|/|N| >= t must surface, including
    # needles fully embedded in much larger docs (the Jaccard-blind
    # decontamination case) and boundary containments exactly at t
    from lakeflow.operators.setsim import containment_join

    needles = [
        (1, "a b c d e"),            # 3 shingles: abc bcd cde
        (2, "p q r s"),              # 2 shingles
        (3, "zz1 zz2 zz3 zz4 zz5"),  # absent from every doc
    ]
    haystack = [
        # needle 1 verbatim inside a much larger doc (containment 1.0)
        (10, "x1 x2 a b c d e x3 x4 x5 x6 x7 x8 x9 y1 y2 y3 y4"),
        # partial overlap with needle 1: shares shingles abc bcd only
        # (containment 2/3)
        (11, "a b c d q9 q8 q7"),
        # needle 2 verbatim (containment 1.0)
        (12, "m1 m2 p q r s m3"),
        # nothing in common
        (13, "k1 k2 k3 k4 k5 k6"),
    ]
    ndf = spark.createDataFrame(needles, "doc_id long, text string")
    hdf = spark.createDataFrame(haystack, "doc_id long, text string")

    def sh(text, n=3):
        t = text.split()
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    def brute(threshold):
        out = set()
        for nid, ntxt in needles:
            ns = sh(ntxt)
            for hid, htxt in haystack:
                inter = len(ns & sh(htxt))
                if inter * 1_000_000 >= threshold * len(ns):
                    out.add((nid, hid, round(inter / len(ns) * 1e6)))
        return out

    for t in (1_000_000, 800_000, 666_667, 500_000):
        got = {
            (r["needle_doc_id"], r["doc_doc_id"], r["containment_micros"])
            for r in containment_join(ndf, hdf, "doc_id", "text", t).collect()
        }
        assert got == brute(t), f"threshold {t}"
    # the fully-embedded needle is found even though its Jaccard vs the
    # big doc is far below any usable threshold
    full = containment_join(ndf, hdf, "doc_id", "text", 1_000_000).collect()
    assert (1, 10) in {(r["needle_doc_id"], r["doc_doc_id"]) for r in full}


# ------------------------------------------------- weighted cosine APSS


def _apss_mirror(texts, t_micros):
    """Pure-Python mirror of operators/apss.apss_join's exact contract."""
    import math
    from collections import Counter

    tf = {i: Counter(s.split()) for i, s in enumerate(texts)}
    for c in tf.values():
        c.pop("", None)
    df = Counter(t for c in tf.values() for t in c)
    w = {}
    for i, c in tf.items():
        u = {t: (n * 1_000_000) // df[t] for t, n in c.items()}
        n2u = sum(x * x for x in u.values())
        wi = {
            t: math.floor(x * 1_000_000 / math.sqrt(n2u) + 0.5)
            for t, x in u.items()
        }
        w[i] = {t: x for t, x in wi.items() if x > 0}
    n2 = {i: sum(x * x for x in wi.values()) for i, wi in w.items()}
    out = {}
    for a in w:
        for b in w:
            if a >= b:
                continue
            dot = sum(w[a][t] * w[b].get(t, 0) for t in w[a])
            if dot == 0:
                continue
            cos = math.floor(
                dot / (math.sqrt(n2[a]) * math.sqrt(n2[b])) * 1_000_000 + 0.5
            )
            if cos >= t_micros:
                out[(a, b)] = cos
    return out


def _apss_corpus():
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    texts = [base]
    texts.append(base + " today")                      # near-dup of 0
    texts.append("quick brown fox leaps over lazy dog by the river")
    texts.append("entirely different words about spark plans and shuffles")
    texts.append("spark plans and shuffles dominate distributed querying")
    texts.append("the the the the the the the the")     # stopword spam
    texts.append(base)                                  # exact dup of 0
    for i in range(12):
        texts.append(f"filler document number {i} with unique token u{i}")
    return texts


def test_apss_join_matches_brute_force(spark):
    from lakeflow.operators.apss import apss_join

    texts = _apss_corpus()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    for t in [400_000, 600_000, 800_000]:
        want = _apss_mirror(texts, t)
        got = {
            (r["doc_id_a"], r["doc_id_b"]): r["cos_micros"]
            for r in apss_join(df, "doc_id", "text", t).collect()
        }
        assert got == want, (t, got, want)
    # sanity on the structure: the exact dup pair is ~1e6 at every t
    assert _apss_mirror(texts, 400_000)[(0, 6)] >= 999_999


def test_apss_weighting_downweights_stopwords(spark):
    # two docs sharing ONLY ubiquitous terms score far below two docs
    # sharing one rare term with the same unweighted overlap
    from lakeflow.operators.apss import apss_join

    texts = (
        ["common word " + f"u{i}" for i in range(8)]  # 'common word' in all
        + ["common word rareterm", "common word rareterm"]
    )
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["cos_micros"]
        for r in apss_join(df, "doc_id", "text", 500_000).collect()
    }
    assert (8, 9) in got and got[(8, 9)] >= 999_000
    # the stopword-only pairs don't reach 0.5
    assert all(p == (8, 9) for p in got)


def test_apss_prefix_filter_is_lossless_on_random_docs(spark):
    # randomized corpora: the prefix-filtered join equals brute force
    import random

    from lakeflow.operators.apss import apss_join

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(60)]
    texts = [
        " ".join(rng.choices(vocab, k=rng.randint(5, 30))) for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    want = _apss_mirror(texts, 300_000)
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["cos_micros"]
        for r in apss_join(df, "doc_id", "text", 300_000).collect()
    }
    assert got == want


def _apss_incr_mirror(stored, new, t_micros):
    """Pure-Python mirror of incremental_apss_pairs' exact contract:
    df snapshot over STORED docs only, unseen terms df=1, output pairs
    touching at least one new doc. ``stored``/``new`` are id->text."""
    import math
    from collections import Counter

    tf = {i: Counter(s.split()) for i, s in {**stored, **new}.items()}
    for c in tf.values():
        c.pop("", None)
    df = Counter(t for i in stored for t in tf[i])
    w = {}
    for i, c in tf.items():
        u = {t: (n * 1_000_000) // df.get(t, 1) for t, n in c.items()}
        n2u = sum(x * x for x in u.values())
        if n2u == 0:
            w[i] = {}
            continue
        wi = {
            t: math.floor(x * 1_000_000 / math.sqrt(n2u) + 0.5)
            for t, x in u.items()
        }
        w[i] = {t: x for t, x in wi.items() if x > 0}
    n2 = {i: sum(x * x for x in wi.values()) for i, wi in w.items()}
    out = {}
    for a in w:
        for b in w:
            if a >= b or (a in stored and b in stored):
                continue
            dot = sum(w[a][t] * w[b].get(t, 0) for t in w[a])
            if dot == 0:
                continue
            cos = math.floor(
                dot / (math.sqrt(n2[a]) * math.sqrt(n2[b])) * 1_000_000 + 0.5
            )
            if cos >= t_micros:
                out[(a, b)] = cos
    return out


def test_incremental_apss_matches_snapshot_brute_force(spark):
    # raw-text path: the batch is weighted against the stored df
    # snapshot (unseen terms df=1); every pair touching a new doc and
    # nothing else, exactly the mirror's answer
    from lakeflow.operators.apss import (
        apss_prefix_index,
        incremental_apss_pairs,
        weighted_terms,
    )

    texts = _apss_corpus()
    stored = {i: s for i, s in enumerate(texts) if i % 2 == 0}
    new = {i: s for i, s in enumerate(texts) if i % 2 == 1}
    sdf = spark.createDataFrame(list(stored.items()), "doc_id long, text string")
    ndf = spark.createDataFrame(list(new.items()), "doc_id long, text string")
    for t in [400_000, 800_000]:
        sw = weighted_terms(sdf, "doc_id", "text")
        pre = apss_prefix_index(sw, "doc_id", t)
        got = {
            (r["doc_id_a"], r["doc_id_b"]): r["cos_micros"]
            for r in incremental_apss_pairs(
                ndf, sw, pre, "doc_id", "text", t
            ).collect()
        }
        want = _apss_incr_mirror(stored, new, t)
        assert got == want, (t, got, want)


def test_incremental_apss_random_corpus_is_lossless(spark):
    import random

    from lakeflow.operators.apss import (
        apss_prefix_index,
        incremental_apss_pairs,
        weighted_terms,
    )

    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choices(vocab, k=rng.randint(5, 25))) for _ in range(40)
    ]
    stored = {i: s for i, s in enumerate(texts) if i % 3 != 0}
    new = {i: s for i, s in enumerate(texts) if i % 3 == 0}
    sdf = spark.createDataFrame(list(stored.items()), "doc_id long, text string")
    ndf = spark.createDataFrame(list(new.items()), "doc_id long, text string")
    sw = weighted_terms(sdf, "doc_id", "text")
    pre = apss_prefix_index(sw, "doc_id", 300_000)
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["cos_micros"]
        for r in incremental_apss_pairs(
            ndf, sw, pre, "doc_id", "text", 300_000
        ).collect()
    }
    assert got == _apss_incr_mirror(stored, new, 300_000)


def test_incremental_apss_equals_batch_on_shared_snapshot(spark):
    # incremental == batch when both see the SAME weight snapshot: pass
    # the full-corpus weight rows for the batch (new_weights=...) and
    # the incremental tier must reproduce apss_join(full corpus) minus
    # the stored x stored pairs, cosines included
    from pyspark.sql import functions as F

    from lakeflow.operators.apss import (
        apss_join,
        apss_prefix_index,
        incremental_apss_pairs,
        weighted_terms,
    )

    texts = _apss_corpus()
    full = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    for t in [400_000, 800_000]:
        w_full = weighted_terms(full, "doc_id", "text")
        stored_w = w_full.filter(F.col("doc_id") % 2 == 0)
        new_w = w_full.filter(F.col("doc_id") % 2 == 1)
        pre = apss_prefix_index(stored_w, "doc_id", t)
        got = {
            (r["doc_id_a"], r["doc_id_b"]): r["cos_micros"]
            for r in incremental_apss_pairs(
                full.filter(F.col("doc_id") % 2 == 1),
                stored_w,
                pre,
                "doc_id",
                "text",
                t,
                new_weights=new_w,
            ).collect()
        }
        want = {
            (r["doc_id_a"], r["doc_id_b"]): r["cos_micros"]
            for r in apss_join(full, "doc_id", "text", t).collect()
            if r["doc_id_a"] % 2 == 1 or r["doc_id_b"] % 2 == 1
        }
        assert got == want, (t, got, want)


def test_incremental_apss_survives_replay_duplicated_index(spark):
    # ADVICE r9 (medium): a crashed-and-replayed ingest batch appends
    # its (id, term) weight + prefix rows TWICE (the stream's appends
    # are not token-fenced). The stored-side verification map build
    # must dedup on read — without it map_from_entries raises
    # DUPLICATE_MAP_KEY and the stream bricks — and the answer must
    # equal the clean-index answer exactly.
    from lakeflow.operators.apss import (
        apss_prefix_index,
        incremental_apss_pairs,
        weighted_terms,
    )

    texts = _apss_corpus()
    stored = {i: s for i, s in enumerate(texts) if i % 2 == 0}
    new = {i: s for i, s in enumerate(texts) if i % 2 == 1}
    sdf = spark.createDataFrame(list(stored.items()), "doc_id long, text string")
    ndf = spark.createDataFrame(list(new.items()), "doc_id long, text string")
    sw = weighted_terms(sdf, "doc_id", "text")
    pre = apss_prefix_index(sw, "doc_id", 400_000)
    # replay: every index row present twice
    sw2 = sw.unionByName(sw)
    pre2 = pre.unionByName(pre)
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["cos_micros"]
        for r in incremental_apss_pairs(
            ndf, sw2, pre2, "doc_id", "text", 400_000
        ).collect()
    }
    assert got == _apss_incr_mirror(stored, new, 400_000)


def test_incremental_apss_replayed_batch_emits_no_self_pairs(spark):
    # ADVICE r9 (low): replayed batch whose rows ALREADY reached the
    # index + in-batch exact duplicates — a non-representative batch
    # member can equal a stored id, and representative expansion must
    # not emit a self-pair (id_a == id_b) for it.
    from lakeflow.operators.apss import (
        apss_prefix_index,
        incremental_apss_pairs,
        weighted_terms,
    )

    # docs 5 and 7 are exact duplicates; the whole batch {5, 7} was
    # already appended to the index by the crashed first attempt
    stored = {0: "alpha beta gamma", 5: "x y z", 7: "x y z"}
    batch = {5: "x y z", 7: "x y z"}
    sdf = spark.createDataFrame(list(stored.items()), "doc_id long, text string")
    ndf = spark.createDataFrame(list(batch.items()), "doc_id long, text string")
    sw = weighted_terms(sdf, "doc_id", "text")
    pre = apss_prefix_index(sw, "doc_id", 600_000)
    rows = incremental_apss_pairs(
        ndf, sw, pre, "doc_id", "text", 600_000
    ).collect()
    assert all(r["doc_id_a"] < r["doc_id_b"] for r in rows), rows
    got = {(r["doc_id_a"], r["doc_id_b"]): r["cos_micros"] for r in rows}
    # the one real pair, exactly once, cos == 1.0
    assert got == {(5, 7): 1_000_000}


def test_snapshot_staleness_trips_on_drift_not_on_stable(spark):
    # VERDICT r9 task #4: the frozen-snapshot drift monitor. A batch
    # drawn from the SNAPSHOT's own distribution must not trip the
    # rebuild trigger; a batch of brand-new vocabulary must (unseen
    # rate) — and a redistribution batch (old vocab, inverted rarity)
    # must move chi2 even with zero new vocabulary.
    from lakeflow.operators.apss import snapshot_staleness, weighted_terms

    stored = {
        i: ("common " * 8 + f"rare{i}") for i in range(30)
    }  # 'common' df=30, each rare{i} df=1
    sdf = spark.createDataFrame(list(stored.items()), "doc_id long, text string")
    sw = weighted_terms(sdf, "doc_id", "text").persist()

    # stable: same shape (ubiquitous term + one already-seen rare term)
    stable = {100 + i: ("common " * 8 + f"rare{i}") for i in range(10)}
    bdf = spark.createDataFrame(list(stable.items()), "doc_id long, text string")
    row = snapshot_staleness(bdf, sw, "doc_id", "text").collect()[0]
    assert row["rebuild"] == 0, row
    assert row["unseen_ppm"] == 0

    # drifted: brand-new vocabulary everywhere -> unseen rate fires
    drifted = {200 + i: f"nova{i} flux{i} quark{i}" for i in range(10)}
    ddf = spark.createDataFrame(list(drifted.items()), "doc_id long, text string")
    row = snapshot_staleness(ddf, sw, "doc_id", "text").collect()[0]
    assert row["rebuild"] == 1, row
    assert row["unseen_ppm"] > 500_000

    # redistribution: only old vocab, but all mass on the rare terms
    # (df=1 bucket) vs the snapshot's common-heavy occupancy -> chi2
    # fires with ZERO unseen terms
    redis = {300 + i: f"rare{i % 30} rare{(i + 1) % 30} rare{(i + 2) % 30}"
             for i in range(10)}
    rdf = spark.createDataFrame(list(redis.items()), "doc_id long, text string")
    row = snapshot_staleness(rdf, sw, "doc_id", "text").collect()[0]
    assert row["unseen_ppm"] == 0, row
    assert row["chi2_micros"] > 100_000 and row["rebuild"] == 1, row
    sw.unpersist()
