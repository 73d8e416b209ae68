"""Property-based tests (SURVEY §5.4, hypothesis): dedup idempotence,
sanitize idempotence, union/filter commutation, drift-union null-fill."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from lakeflow.operators.dedup import latest_wins
from lakeflow.operators.flatten import sanitize_name
from lakeflow.operators.union import union_drifting

slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

records = st.lists(
    st.tuples(
        st.integers(0, 3),  # key
        st.integers(0, 5),  # ts
        st.integers(0, 1000),  # uid / payload
    ),
    min_size=1,
    max_size=25,
)


@slow
@given(records)
def test_latest_wins_idempotent_and_deterministic(spark, recs):
    df = spark.createDataFrame(
        [Row(k=k, ts=ts, uid=i * 10_000 + uid) for i, (k, ts, uid) in enumerate(recs)]
    )
    once = latest_wins(df, ["k"], "ts", ["uid"])
    twice = latest_wins(once, ["k"], "ts", ["uid"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b  # idempotent
    # deterministic winner: max (ts, uid) per key, computed independently
    expect = {}
    for i, (k, ts, uid) in enumerate(recs):
        u = i * 10_000 + uid
        if k not in expect or (ts, u) > (expect[k][1], expect[k][2]):
            expect[k] = (k, ts, u)
    assert a == sorted(expect.values())


@given(st.text(min_size=0, max_size=40))
@settings(max_examples=200, deadline=None)
def test_sanitize_idempotent(name):
    assert sanitize_name(sanitize_name(name)) == sanitize_name(name)


@slow
@given(records, st.integers(0, 5))
def test_filter_union_commutes(spark, recs, cutoff):
    half = len(recs) // 2 or 1
    d1 = spark.createDataFrame([Row(k=k, ts=ts, uid=u) for k, ts, u in recs[:half]])
    d2 = spark.createDataFrame(
        [Row(k=k, ts=ts, uid=u) for k, ts, u in recs[half:]] or
        [Row(k=0, ts=0, uid=0)]
    )
    pred = F.col("ts") >= cutoff
    a = sorted(map(tuple, d1.unionByName(d2).filter(pred).collect()))
    b = sorted(map(tuple, d1.filter(pred).unionByName(d2.filter(pred)).collect()))
    assert a == b


def test_union_drifting_nullfills(spark):
    d1 = spark.createDataFrame([Row(a=1, b="x")])
    d2 = spark.createDataFrame([Row(a=2, c=3.5)])
    out = union_drifting([d1, d2]).orderBy("a").collect()
    assert out[0]["b"] == "x" and out[0]["c"] is None
    assert out[1]["b"] is None and out[1]["c"] == 3.5
    with pytest.raises(ValueError):
        union_drifting([])


@slow
@given(
    st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1,
        max_size=30,
    )
)
def test_morton_key_matches_reference_interleave(spark, pts):
    from lakeflow.sinks.layout import morton_key

    def py_morton(x, y):
        m = 0
        for i in range(16):
            m |= ((x >> i) & 1) << (2 * i)
            m |= ((y >> i) & 1) << (2 * i + 1)
        return m

    df = spark.createDataFrame([Row(i=i, x=x, y=y) for i, (x, y) in enumerate(pts)])
    got = {
        r["i"]: r["m"]
        for r in df.select("i", morton_key("x", "y").alias("m")).collect()
    }
    for i, (x, y) in enumerate(pts):
        assert got[i] == py_morton(x, y), (x, y)


@slow
@given(
    st.integers(0, 1_000_000),
    st.integers(0, 1_000_000),
    st.integers(0, 40),
)
def test_hash_sample_nested_and_rate_zero_one(spark, r1, r2, n):
    from lakeflow.operators.sampling import hash_sample

    lo, hi = min(r1, r2), max(r1, r2)
    df = spark.createDataFrame([Row(k=i) for i in range(n)] or [Row(k=0)])
    small = {r["k"] for r in hash_sample(df, "k", lo).collect()}
    big = {r["k"] for r in hash_sample(df, "k", hi).collect()}
    assert small <= big  # nested samples
    assert {r["k"] for r in hash_sample(df, "k", 0).collect()} == set()
    assert len({r["k"] for r in hash_sample(df, "k", 1_000_000).collect()}) == df.count()


@slow
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 300)),  # (shard, tokens)
        min_size=1,
        max_size=25,
    ),
    st.integers(16, 256),
)
def test_pack_sequences_invariants(spark, docs, budget):
    from lakeflow.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [Row(doc_id=i, shard=f"s{s}", n_tokens=t) for i, (s, t) in enumerate(docs)]
    )
    rows = pack_sequences(df, "doc_id", "n_tokens", "shard", budget).collect()
    by_shard: dict = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        run = by_shard.get(r["shard"], 0)
        assert r["start_token"] == run  # running sum of preceding docs
        assert 0 <= r["offset_in_seq"] < budget
        assert r["seq_id"] * budget + r["offset_in_seq"] == r["start_token"]
        by_shard[r["shard"]] = run + r["n_tokens"]


pairs_vals = st.lists(
    st.tuples(
        st.integers(0, 2),  # key / group
        st.integers(0, 40),  # order value (ties likely)
        st.integers(1, 9),  # weight / payload
    ),
    min_size=1,
    max_size=30,
)


@slow
@given(pairs_vals, st.integers(1, 5))
def test_topk_per_key_equals_window(spark, rows, k):
    from pyspark.sql import Window

    from lakeflow.operators.topk import topk_per_key

    df = spark.createDataFrame(
        [Row(q=q, i=i, v=v) for i, (q, v, _w) in enumerate(rows)]
    ).repartition(5)
    w = Window.partitionBy("q").orderBy(F.asc("v"), F.asc("i"))
    truth = {
        tuple(r)
        for r in df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q", "i", "v", "rnk")
        .collect()
    }
    got = {tuple(r) for r in topk_per_key(df, "q", "v", "i", k).collect()}
    assert got == truth


@slow
@given(pairs_vals, st.integers(2, 6))
def test_bucketed_running_sum_equals_window(spark, rows, nb):
    from pyspark.sql import Window

    from lakeflow.operators.prefix import bucketed_running_sum

    df = spark.createDataFrame(
        [Row(g=g, i=i, v=w) for i, (g, _o, w) in enumerate(rows)]
    ).repartition(4)
    w = (
        Window.partitionBy("g")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    truth = {
        (r["g"], r["i"], r["run"])
        for r in df.withColumn("run", F.sum("v").over(w)).collect()
    }
    got = {
        (r["g"], r["i"], r["run"])
        for r in bucketed_running_sum(df, "g", "i", (), "v", n_buckets=nb).collect()
    }
    assert got == truth


@slow
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
    st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
)
def test_bloom_membership_properties(spark, members, probes):
    # no false negatives ever; semi join through the filter == plain semi
    from lakeflow.operators.bloom import (
        bloom_bits_for,
        bloom_build,
        bloom_might_contain,
    )

    dim = spark.createDataFrame([Row(k=m) for m in members])
    n_bits = bloom_bits_for(len(members))
    words = bloom_build(dim, "k", n_bits)
    fact = spark.createDataFrame([Row(k=p) for p in probes])
    passed = {
        r["k"] for r in fact.where(bloom_might_contain("k", words, n_bits)).collect()
    }
    assert set(members) & set(probes) <= passed  # every true member passes


@slow
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 5)),
        min_size=0, max_size=40,
    ),
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 5)),
        min_size=0, max_size=40,
    ),
)
def test_snapshot_diff_roundtrip_property(spark, old_rows, new_rows):
    # old + feed == new for ARBITRARY keyed states (last dup wins)
    from lakeflow.operators.diff import snapshot_diff

    old_map = {k: v for k, v in old_rows}
    new_map = {k: v for k, v in new_rows}
    schema = "k long, v long"
    old = spark.createDataFrame(list(old_map.items()) or [], schema)
    new = spark.createDataFrame(list(new_map.items()) or [], schema)
    feed = {r["k"]: (r["op"], r["v"]) for r in snapshot_diff(old, new, ["k"]).collect()}
    rebuilt = dict(old_map)
    for k, (op, v) in feed.items():
        if op == "D":
            rebuilt.pop(k, None)
        else:
            rebuilt[k] = v
    assert rebuilt == new_map


# --- exact set-similarity join: random corpora vs brute force ---

corpora = st.lists(
    st.lists(st.integers(0, 12), min_size=1, max_size=8),  # token ids per doc
    min_size=2,
    max_size=10,
)
thresholds = st.sampled_from([250_000, 400_000, 500_000, 750_000, 1_000_000])


@slow
@given(docs=corpora, t=thresholds)
def test_setsim_join_equals_brute_force(spark, docs, t):
    from itertools import combinations

    from lakeflow.operators.setsim import setsim_join

    rows = [(i, " ".join(f"w{x}" for x in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in setsim_join(df, "doc_id", "text", t, shingle_n=1).collect()
    }
    sets = {i: {f"w{x}" for x in toks} for i, toks in enumerate(docs)}
    want = {
        (a, b)
        for a, b in combinations(sorted(sets), 2)
        if len(sets[a] & sets[b]) * 1_000_000 >= t * len(sets[a] | sets[b])
    }
    assert got == want


# --- PPS sample: random positive weights vs driver-side mirror ---

weight_rows = st.lists(
    st.tuples(st.integers(0, 99), st.integers(1, 50)),
    min_size=1,
    max_size=30,
    unique_by=lambda r: r[0],
)


@slow
@given(rows=weight_rows, k=st.integers(1, 8))
def test_pps_sample_equals_reference(spark, rows, k):
    import hashlib

    from lakeflow.operators.sampling import pps_systematic_sample

    def h(key):
        return int(hashlib.md5(f"pps|{key}".encode()).hexdigest()[:15], 16)

    ordered = sorted((h(i), i, w) for i, w in rows)
    total = sum(w for _, _, w in ordered)
    want, cum = set(), 0
    for _, i, w in ordered:
        prev = cum
        cum += w
        if (cum * k) // total > (prev * k) // total:
            want.add(i)
    df = spark.createDataFrame(list(rows), ["id", "w"])
    got = {r.id for r in pps_systematic_sample(df, "id", "w", k).collect()}
    assert got == want


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


@slow
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcXYZ 0#", max_size=12),
            st.text(alphabet="abcXYZ 0#", max_size=12),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_edit_similarity_matches_python_reference(spark, pairs):
    from lakeflow.operators.linkage import MICRO, edit_similarity_micros

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], ["i", "a", "b"]
    )
    got = {
        r.i: r.sim
        for r in df.select(
            "i", edit_similarity_micros(F.col("a"), F.col("b")).alias("sim")
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        ml = max(len(a), len(b))
        want = MICRO if ml == 0 else (ml - _py_levenshtein(a, b)) * MICRO // ml
        assert got[i] == want, (a, b)


@slow
@given(
    st.lists(
        st.tuples(st.integers(0, 1_000_000), st.integers(0, 1_000_000)),
        min_size=2,
        max_size=30,
    ),
    st.integers(1, 8),
)
def test_fs_em_fit_is_partitioning_invariant(spark, sims, nparts):
    # the EM sums are integer-quantized, so the fitted parameters must
    # be EXACTLY equal no matter how the candidates are partitioned
    from lakeflow.operators.linkage import fit_fs_em

    rows = [(i, 1000 + i, s0, s1) for i, (s0, s1) in enumerate(sims)]
    base = spark.createDataFrame(
        rows, "lid long, rid long, sim_0 long, sim_1 long"
    )
    p1 = fit_fs_em(base.coalesce(1), 2)
    p2 = fit_fs_em(base.repartition(nparts, "lid"), 2)
    assert p1 == p2


# incremental linkage: random micro-corpora of short names in a few
# blocks; property = incremental (new vs stored) pair set AND the
# star-edge entity refresh both equal the batch recompute, for every
# random split
_link_rows = st.lists(
    st.tuples(
        st.integers(0, 40),  # rec id (dedup below)
        st.sampled_from(["ann", "anne", "bob", "rob", "carl", "karl", "zz"]),
        st.sampled_from(["b1", "b2"]),  # block key
    ),
    min_size=2,
    max_size=16,
    unique_by=lambda t: t[0],
)


@slow
@given(_link_rows, st.integers(0, 4))
def test_incremental_linkage_equals_batch_property(spark, rows, mod):
    from lakeflow.operators.linkage import (
        incremental_linkage_pairs,
        incremental_resolve_entities,
        resolve_entities,
    )

    recs = spark.createDataFrame(rows, "rid long, name string, blk string")
    new = recs.filter(F.col("rid") % 5 == mod)
    stored = recs.filter(F.col("rid") % 5 != mod)
    kw = dict(
        fields=[("name", 1)],
        block_keys=[F.col("blk")],
        threshold_micros=700_000,
    )
    full = incremental_linkage_pairs(recs, recs.limit(0), "rid", **kw)
    want_pairs = {
        (r["rid_a"], r["rid_b"], r["score_micros"], r["match"])
        for r in full.collect()
        if r["rid_a"] % 5 == mod or r["rid_b"] % 5 == mod
    }
    got_pairs = {
        (r["rid_a"], r["rid_b"], r["score_micros"], r["match"])
        for r in incremental_linkage_pairs(new, stored, "rid", **kw).collect()
    }
    assert got_pairs == want_pairs

    stored_asgn = resolve_entities(
        incremental_linkage_pairs(stored, stored.limit(0), "rid", **kw)
        .filter("match"),
        stored.select("rid"),
        "rid",
        left_id="rid_a",
        right_id="rid_b",
    )
    got_ents = {
        (r["rid"], r["entity_id"])
        for r in incremental_resolve_entities(
            incremental_linkage_pairs(new, stored, "rid", **kw).filter("match"),
            stored_asgn.select("rid", "entity_id"),
            new.select("rid"),
            "rid",
        ).collect()
    }
    want_ents = {
        (r["rid"], r["entity_id"])
        for r in resolve_entities(
            full.filter("match"),
            recs.select("rid"),
            "rid",
            left_id="rid_a",
            right_id="rid_b",
        ).collect()
    }
    assert got_ents == want_ents


# incremental semantic dedup: random integer micro-corpora of 3-d
# vectors; property = incremental (new batch vs stored index) pair set
# equals the batch recompute restricted to new-touching pairs, for
# every random split — centroids fixed from the stored fit, as in
# production
_sem_rows = st.lists(
    st.tuples(
        st.integers(0, 30),  # vec id (dedup below)
        st.lists(st.integers(-3, 3), min_size=3, max_size=3),
    ),
    min_size=5,
    max_size=14,
    unique_by=lambda t: t[0],
)


@slow
@given(_sem_rows, st.integers(0, 3))
def test_incremental_semantic_equals_batch_property(spark, rows, mod):
    from hypothesis import assume

    from lakeflow.operators.kmeans import (
        incremental_semantic_pairs,
        kmeans_centroids,
        semantic_index,
        semantic_pairs_from_index,
    )

    # zero vectors have undefined cosine; keep the corpus nonzero
    rows = [(i, v) for i, v in rows if any(x != 0 for x in v)]
    stored_ids = [i for i, _ in rows if i % 4 != mod]
    assume(len(stored_ids) >= 2 and len(rows) > len(stored_ids))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    new = df.filter(F.col("vec_id") % 4 == mod)
    stored = df.filter(F.col("vec_id") % 4 != mod)
    cents = kmeans_centroids(stored, k=2, n_iter=1)
    got = {
        tuple(r)
        for r in incremental_semantic_pairs(
            new, semantic_index(stored, cents), cents, min_cos_micros=100_000
        ).collect()
    }
    want = {
        tuple(r)
        for r in semantic_pairs_from_index(
            semantic_index(df, cents), min_cos_micros=100_000
        ).collect()
        if r["vec_id_a"] % 4 == mod or r["vec_id_b"] % 4 == mod
    }
    assert got == want


@slow
@given(
    st.lists(st.integers(-20, 20), min_size=1, max_size=30),
    st.lists(st.integers(-20, 20), min_size=1, max_size=30),
)
def test_ks_statistic_matches_brute_force(spark, a_vals, b_vals):
    # VERDICT r7 task #10: the exact two-sample KS statistic equals its
    # definition computed by brute pure-Python — D quantized to micros
    # via the same integer cross-multiply floor, so equality is exact
    from lakeflow.operators.profile import ks_statistic

    rows = [(v, "a") for v in a_vals] + [(v, "b") for v in b_vals]
    df = spark.createDataFrame(rows, "v long, side string")
    got = ks_statistic(df, "v", F.col("side") == "a").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_a"], r["n_b"]) == (len(a_vals), len(b_vals))
    # brute: sup over observed step points of |cum_a*n_b - cum_b*n_a|
    n_a, n_b = len(a_vals), len(b_vals)
    sa, sb = sorted(a_vals), sorted(b_vals)
    best = 0
    for x in sorted(set(a_vals) | set(b_vals)):
        cum_a = sum(1 for v in sa if v <= x)
        cum_b = sum(1 for v in sb if v <= x)
        best = max(best, abs(cum_a * n_b - cum_b * n_a))
    assert r["ks_micros"] == best * 1_000_000 // (n_a * n_b)


@slow
@given(
    st.lists(st.integers(0, 8), min_size=1, max_size=30),
    st.lists(st.integers(0, 8), min_size=1, max_size=30),
)
def test_chi2_distance_matches_brute_force(spark, a_vals, b_vals):
    # r8: the chi-squared distance equals its definition computed by
    # brute pure-Python — micro proportions and per-bin terms use the
    # same integer floors, so equality is exact
    from lakeflow.operators.profile import chi2_distance

    rows = [(v, "a") for v in a_vals] + [(v, "b") for v in b_vals]
    df = spark.createDataFrame(rows, "bin long, side string")
    got = chi2_distance(df, "bin", F.col("side") == "a").collect()
    assert len(got) == 1
    r = got[0]
    n_a, n_b = len(a_vals), len(b_vals)
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    total = 0
    for x in set(a_vals) | set(b_vals):
        p = sum(1 for v in a_vals if v == x) * 1_000_000 // n_a
        q = sum(1 for v in b_vals if v == x) * 1_000_000 // n_b
        if p + q > 0:
            total += (p - q) * (p - q) // (p + q)
    assert r["chi2_micros"] == total


@slow
@given(
    needles=st.lists(
        st.lists(st.integers(0, 12), min_size=1, max_size=6),
        min_size=1,
        max_size=4,
    ),
    docs=corpora,
    t=thresholds,
)
def test_containment_join_equals_brute_force(spark, needles, docs, t):
    # r8: the guarded-hash containment pipeline (hashed superset +
    # exact string re-verify) against the brute pure-Python definition
    # |N ∩ D| / |N| >= t on random corpora
    from lakeflow.operators.setsim import containment_join

    nd = spark.createDataFrame(
        [(i, " ".join(f"w{x}" for x in toks)) for i, toks in enumerate(needles)],
        ["doc_id", "text"],
    )
    hd = spark.createDataFrame(
        [(100 + i, " ".join(f"w{x}" for x in toks)) for i, toks in enumerate(docs)],
        ["doc_id", "text"],
    )
    got = {
        (r["needle_doc_id"], r["doc_doc_id"], r["containment_micros"])
        for r in containment_join(nd, hd, "doc_id", "text", t, shingle_n=1).collect()
    }
    nsets = {i: {f"w{x}" for x in toks} for i, toks in enumerate(needles)}
    hsets = {100 + i: {f"w{x}" for x in toks} for i, toks in enumerate(docs)}
    import math

    want = {
        (n, h, math.floor(len(ns & hs) / len(ns) * 1_000_000 + 0.5))
        for n, ns in nsets.items()
        for h, hs in hsets.items()
        if len(ns & hs) * 1_000_000 >= t * len(ns)
    }
    assert got == want


@slow
@given(
    docs=st.lists(
        st.lists(st.integers(0, 6), min_size=1, max_size=10),
        min_size=1,
        max_size=6,
    ),
    q=st.lists(st.integers(0, 6), min_size=1, max_size=3, unique=True),
    slop=st.integers(0, 6),
)
def test_slop_search_equals_brute_force(spark, docs, q, slop):
    # r8: slop_search vs the brute definition — min over
    # one-position-per-term tuples of (max(p) - min(p)), kept iff <= slop
    from itertools import product as _prod

    from lakeflow.operators.index import build_positional_index, slop_search

    rows = [(i, " ".join(f"w{x}" for x in toks)) for i, toks in enumerate(docs)]
    idx = build_positional_index(spark.createDataFrame(rows, ["doc_id", "text"]))
    terms = [f"w{x}" for x in q]
    got = {
        (r["doc_id"], r["min_span"])
        for r in slop_search(idx, terms, slop).collect()
    }
    want = set()
    for i, toks in enumerate(docs):
        pos = {t: [p for p, w in enumerate(toks) if f"w{w}" == t] for t in terms}
        if any(not v for v in pos.values()):
            continue
        best = min(
            max(c) - min(c) for c in _prod(*[pos[t] for t in terms])
        )
        if best <= slop:
            want.add((i, best))
    assert got == want


# --------------------------------------------- r8 continuation-2 ops


@slow
@given(
    st.lists(
        st.tuples(st.integers(-50, 50), st.integers(1, 5)),
        min_size=1,
        max_size=20,
    ),
    st.lists(
        st.floats(0.01, 1.0, allow_nan=False), min_size=1, max_size=4
    ),
)
def test_quantiles_from_counts_match_ceil_rank_definition(spark, vc, probs):
    # percentile_disc: smallest v with cumulative count >= ceil(p * N),
    # against a brute expansion of the counts multiset
    import math

    from lakeflow.operators.profile import quantiles_from_value_counts

    counts = {}
    for v, n in vc:
        counts[v] = counts.get(v, 0) + n
    df = spark.createDataFrame(list(counts.items()), "v long, n long")
    expanded = sorted(v for v, n in counts.items() for _ in range(n))
    got = {
        r["p_micros"]: (r["value"], r["n_total"])
        for r in quantiles_from_value_counts(df, "v", "n", probs).collect()
    }
    for p in probs:
        pm = int(p * 1_000_000 + 0.5)
        # mirror the operator's exact integer threshold (cum*1e6 >= pm*N),
        # which equals ceil-rank for pm derived from p the same way
        n_tot = len(expanded)
        rank = next(
            i + 1
            for i in range(n_tot)
            if (i + 1) * 1_000_000 >= pm * n_tot
        )
        assert got[pm] == (expanded[rank - 1], n_tot)


@slow
@given(
    st.lists(st.text("ab", min_size=1, max_size=4), min_size=1, max_size=60)
)
def test_cms_never_underestimates(spark, vals):
    from collections import Counter

    from lakeflow.operators.sketches import cms_lookup, cms_sketch

    df = spark.createDataFrame([(v,) for v in vals], "u string")
    probes = spark.createDataFrame(
        [(v,) for v in sorted(set(vals))], "u string"
    )
    got = {
        r["probe"]: r["est_n"]
        for r in cms_lookup(cms_sketch(df, "u"), probes, "u").collect()
    }
    true = Counter(vals)
    assert all(got[v] >= n for v, n in true.items())
    # and the total overage is bounded by collisions, never negative
    assert sum(got.values()) >= sum(true.values())


@slow
@given(
    st.lists(st.text("xyz", min_size=1, max_size=5), min_size=1, max_size=80),
    st.integers(1, 79),
)
def test_hll_split_merge_equals_whole(spark, vals, cut):
    # registers of (head) MAX-merged with registers of (tail) == the
    # whole corpus's registers, for ANY split point — the streaming
    # maintainer's algebra, property-formed
    from lakeflow.operators.sketches import hll_registers

    cut = min(cut, len(vals))
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, u string"
    )
    whole = sorted(
        map(tuple, hll_registers(df, "u").collect())
    )
    a = hll_registers(df.filter(F.col("i") < cut), "u")
    b = hll_registers(df.filter(F.col("i") >= cut), "u")
    merged = sorted(
        map(
            tuple,
            a.unionByName(b)
            .groupBy("bucket")
            .agg(F.max("rho").alias("rho"))
            .collect(),
        )
    )
    assert merged == whole


@st.composite
def _trunc_div_args(draw):
    """Inputs honoring trunc_div's documented contract: the QUOTIENT
    must fit BIGINT. Draw the divisor first, then a numerator bounded
    by b * (2^63 - 1) — the round-8 unconstrained strategy drew
    a=2^63, b=1 and (correctly) hit the loud ANSI overflow, which is
    asserted by its own test below, not by this one."""
    b = draw(st.integers(1, 10**9))
    bound = b * (2**63 - 1)
    a = draw(st.integers(-bound, bound))
    return a, b


@slow
@given(_trunc_div_args())
def test_trunc_div_truncates_toward_zero_on_decimals(spark, ab):
    a, b = ab
    from lakeflow.functions.exact import trunc_div

    df = spark.createDataFrame([(str(a), b)], "a string, b long")
    got = df.select(
        trunc_div(
            F.col("a").cast("decimal(38,0)"), F.col("b")
        ).alias("q")
    ).collect()[0]["q"]
    want = abs(a) // b
    want = -want if a < 0 else want
    assert got == want


@slow
@given(
    st.integers(-(2**63) + 1, 2**63 - 1),
    st.integers(1, 10**9),
)
def test_trunc_div_exact_on_longs(spark, a, b):
    """LONG numerators must take the exact decimal path: Spark promotes
    long/long division to DOUBLE, so above 2^53 a naive quotient can
    round to q±1 (review round-8 finding — pca_project feeds sums up
    to ~1.3e17). |a| <= 2^63-1 keeps the quotient BIGINT-bounded for
    every b >= 1."""
    from lakeflow.functions.exact import trunc_div

    df = spark.createDataFrame([(a, b)], "a long, b long")
    got = df.select(trunc_div(F.col("a"), F.col("b")).alias("q")).collect()[0]["q"]
    want = abs(a) // b
    want = -want if a < 0 else want
    assert got == want


def test_trunc_div_exact_on_longs_above_2p53(spark):
    """Pinned regression for the double-rounding defect: 2^53+1 is the
    first long a DOUBLE cannot represent; the pre-fix long/long path
    rounded it to 2^53 and returned q-1 for b=1."""
    from lakeflow.functions.exact import trunc_div

    cases = [
        (2**53 + 1, 1),
        (-(2**53) - 1, 1),
        (2**63 - 1, 1),
        (2**63 - 1, 10),
        (134_217_728_000_000_017, 3),  # ~1.3e17, the pca_project magnitude
    ]
    df = spark.createDataFrame(cases, "a long, b long")
    got = df.select(
        "a", "b", trunc_div(F.col("a"), F.col("b")).alias("q")
    ).collect()
    for row in got:
        a, b = row["a"], row["b"]
        want = abs(a) // b
        want = -want if a < 0 else want
        assert row["q"] == want, (a, b)


def test_trunc_div_overflowing_quotient_raises_loudly(spark):
    """Outside the BIGINT-quotient contract the final cast must raise
    a LOUD ANSI overflow — never wrap silently. a=2^63, b=1 is the
    falsifying example hypothesis found in round 8."""
    from pyspark.errors import ArithmeticException

    from lakeflow.functions.exact import trunc_div

    df = spark.createDataFrame([(str(2**63), 1)], "a string, b long")
    with pytest.raises(ArithmeticException):
        df.select(
            trunc_div(F.col("a").cast("decimal(38,0)"), F.col("b")).alias("q")
        ).collect()


def _loghist_mirror_key(v: int, s: int = 4096) -> int:
    if v == 0:
        return 0
    m = abs(v)
    b = m.bit_length()
    lo = 1 << (b - 1)
    return (1 if v > 0 else -1) * (b * s + ((m - lo) * s) // lo)


def _loghist_mirror_decode(k: int, s: int = 4096) -> int:
    if k == 0:
        return 0
    a = abs(k)
    b, sub = a // s, a % s
    lo = 1 << (b - 1)
    return (1 if k > 0 else -1) * (lo + (sub * lo) // s)


@slow
@given(st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=12))
def test_loghist_key_mirror_monotone_and_error_bound(spark, vals):
    # r9 quantile sketch: Spark's key/decode match the pure-Python
    # mirror bit-for-bit, keys are monotone in the value, and the
    # decoded representative is within relative error 1/sub_bins
    from lakeflow.operators.sketches import loghist_decode, loghist_key

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = df.select(
        "v",
        loghist_key(F.col("v")).alias("k"),
        loghist_decode(loghist_key(F.col("v"))).alias("d"),
    ).collect()
    S = 4096
    for r in rows:
        assert r["k"] == _loghist_mirror_key(r["v"])
        assert r["d"] == _loghist_mirror_decode(r["k"])
        # |decoded| <= |v| and the gap is <= |v| / S
        assert abs(r["d"]) <= abs(r["v"])
        assert (abs(r["v"]) - abs(r["d"])) * S <= abs(r["v"])
    ordered = sorted(vals)
    keys = [_loghist_mirror_key(v) for v in ordered]
    assert keys == sorted(keys)  # monotone


@slow
@given(
    st.lists(st.integers(-(10**9), 10**9), min_size=3, max_size=40),
    st.integers(1, 5),
)
def test_loghist_quantiles_track_exact_percentile_disc(spark, vals, cut):
    # the sketch's quantile is within relative error 1/sub_bins of the
    # exact percentile_disc answer, and the counts table is MERGEABLE:
    # summing two halves' sketches answers identically to one pass
    import math

    from lakeflow.operators.sketches import loghist_counts, loghist_quantiles

    S = 4096
    probs = [0.5, 0.9]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    whole = {
        r["p_micros"]: r["approx_micros"]
        for r in loghist_quantiles(loghist_counts(df, "v"), probs).collect()
    }
    n = len(vals)
    ordered = sorted(vals)
    for p in probs:
        exact = ordered[math.ceil(p * n) - 1]
        a = whole[int(p * 1e6)]
        assert abs(a) <= abs(exact) + 1
        assert (abs(exact) - abs(a)) * S <= abs(exact) + S, (p, a, exact)
    cut = cut % len(vals)
    half1 = spark.createDataFrame([(v,) for v in vals[:cut]] or [(0,)], "v long")
    half2 = spark.createDataFrame([(v,) for v in vals[cut:]] or [(0,)], "v long")
    if cut and cut < len(vals):
        merged = (
            loghist_counts(half1, "v")
            .unionByName(loghist_counts(half2, "v"))
            .groupBy("key")
            .agg(F.sum("n").alias("n"))
        )
        got = {
            r["p_micros"]: r["approx_micros"]
            for r in loghist_quantiles(merged, probs).collect()
        }
        assert got == whole
