"""Record linkage / entity resolution (operators/linkage.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lakeflow.operators.linkage import (
    edit_similarity_micros,
    record_linkage,
    resolve_entities,
    sql_edit_similarity,
)


def test_edit_similarity_matches_sql_mirror(spark):
    cases = [
        ("kitten", "sitting"),
        ("", ""),
        ("abc", ""),
        (None, "xy"),
        ("same", "same"),
        ("Customer#000000001", "Customer#OOOOOOOO1"),
    ]
    df = spark.createDataFrame(cases, ["a", "b"])
    got = {
        (r.a, r.b): r.sim
        for r in df.select(
            "a", "b", edit_similarity_micros(F.col("a"), F.col("b")).alias("sim")
        ).collect()
    }
    con = duckdb.connect()
    for a, b in cases:
        (want,) = con.execute(
            f"SELECT {sql_edit_similarity('a', 'b')} "
            "FROM (SELECT ?::VARCHAR AS a, ?::VARCHAR AS b) t",
            [a, b],
        ).fetchone()
        assert got[(a, b)] == want, (a, b)
    # anchors: identical -> 1e6, both empty -> 1e6, one empty -> 0
    assert got[("same", "same")] == 1_000_000
    assert got[("", "")] == 1_000_000
    assert got[("abc", "")] == 0


def _toy_frames(spark):
    left = spark.createDataFrame(
        [
            (1, "alice smith", "12 oak st", "555-0101"),
            (2, "bob jones", "99 elm av", "555-0202"),
            (3, "carol wu", "7 pine rd", "555-0303"),
        ],
        ["lid", "name", "addr", "phone"],
    )
    right = spark.createDataFrame(
        [
            (11, "alice smyth", "12 oak st", "555-0101"),  # typo'd alice
            (12, "bob jones", "99 elm ave", "555-0202"),  # addr variant
            (13, "dan brown", "1 main st", "555-0909"),  # no counterpart
        ],
        ["rid", "name", "addr", "phone"],
    )
    return left, right


def test_record_linkage_blocks_scores_classifies(spark):
    left, right = _toy_frames(spark)
    out = record_linkage(
        left,
        right,
        "lid",
        "rid",
        fields=[("name", "name", 2), ("addr", "addr", 1)],
        block_keys=[
            (F.substring("phone", 1, 8), F.substring("phone", 1, 8)),
            (F.substring("name", 1, 3), F.substring("name", 1, 3)),
        ],
        threshold_micros=800_000,
    ).collect()
    got = {(r.lid, r.rid): (r.score_micros, r.match) for r in out}
    # dan shares no block with anyone -> never a candidate
    assert all(rid != 13 for _, rid in got)
    assert got[(1, 11)][1] is True  # one-letter name typo still matches
    assert got[(2, 12)][1] is True
    # exact name pair scores above the typo'd pair
    assert got[(2, 12)][0] > got[(1, 11)][0]


def test_record_linkage_multi_pass_blocking_unions(spark):
    left, right = _toy_frames(spark)
    # phone-only blocking finds alice; name-prefix-only also finds her;
    # the union must not double-count the candidate
    out = record_linkage(
        left,
        right,
        "lid",
        "rid",
        fields=[("name", "name", 1)],
        block_keys=[
            (F.substring("phone", 1, 8), F.substring("phone", 1, 8)),
            (F.substring("name", 1, 3), F.substring("name", 1, 3)),
        ],
        threshold_micros=500_000,
    )
    pairs = [(r.lid, r.rid) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    assert (1, 11) in pairs


def test_record_linkage_hot_block_cap(spark):
    # a degenerate blocking key shared by everything gets dropped; the
    # discriminating key still produces the true pair
    left = spark.createDataFrame(
        [(i, f"user {i}", "SAME") for i in range(1, 41)],
        ["lid", "name", "blk"],
    )
    right = spark.createDataFrame(
        [(100 + i, f"user {i}", "SAME") for i in range(1, 41)],
        ["rid", "name", "blk"],
    )
    capped = record_linkage(
        left,
        right,
        "lid",
        "rid",
        fields=[("name", "name", 1)],
        block_keys=[(F.col("blk"), F.col("blk"))],
        threshold_micros=900_000,
        max_block_size=10,
    )
    assert capped.count() == 0  # the only block is degenerate -> dropped
    two_pass = record_linkage(
        left,
        right,
        "lid",
        "rid",
        fields=[("name", "name", 1)],
        block_keys=[
            (F.col("blk"), F.col("blk")),
            (F.col("name"), F.col("name")),  # exact-name pass survives
        ],
        threshold_micros=900_000,
        max_block_size=10,
    )
    assert two_pass.count() == 40  # each record finds exactly its twin


def test_resolve_entities_assigns_min_reachable_and_singletons(spark):
    pairs = spark.createDataFrame(
        [(1, 11), (11, 21), (2, 12)], ["id_a", "id_b"]
    )
    records = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 11, 12, 21)], ["rec_id"]
    )
    out = resolve_entities(pairs, records, "rec_id")
    got = {r.rec_id: r.entity_id for r in out.collect()}
    # chain 1-11-21 collapses to min id 1; pair 2-12 to 2; 3 stays itself
    assert got == {1: 1, 11: 1, 21: 1, 2: 2, 12: 2, 3: 3}


def test_fit_fs_em_separates_planted_populations(spark):
    from lakeflow.operators.linkage import fit_fs_em, fs_posteriors

    # planted: 20 true matches (both fields agree), 80 non-matches
    # (fields agree only by chance ~10%)
    rows = []
    for i in range(20):
        rows.append((i, 1000 + i, 950_000, 980_000))
    for i in range(80):
        a0 = 900_000 if i % 10 == 0 else 100_000
        a1 = 900_000 if i % 9 == 0 else 50_000
        rows.append((100 + i, 2000 + i, a0, a1))
    scored = spark.createDataFrame(
        rows, "lid long, rid long, sim_0 long, sim_1 long"
    )
    lam, ms, us = fit_fs_em(scored, 2, agree_threshold_micros=800_000)
    # the match prior lands near the planted 20%
    assert 0.1 < lam < 0.35, lam
    # agreement is far likelier under match than non-match, per field
    # (2 rounds is not full convergence; the SEPARATION is the contract)
    assert ms[0] > 0.8 and ms[1] > 0.8
    assert us[0] < 0.35 and us[1] < 0.35
    assert ms[0] - us[0] > 0.4 and ms[1] - us[1] > 0.4
    out = fs_posteriors(
        scored, (lam, ms, us), agree_threshold_micros=800_000
    ).collect()
    post = {(r.lid): (r.posterior_micros, r.match) for r in out}
    # every planted match scores near 1, chance-agreement rows near 0
    assert all(post[i][1] for i in range(20))
    assert not post[101][0] > 500_000  # disagree/disagree row
    assert min(post[i][0] for i in range(20)) > max(
        post[100 + i][0] for i in range(80) if i % 10 and i % 9
    )


def test_fit_fs_em_degenerate_guards(spark):
    from lakeflow.operators.linkage import fit_fs_em

    # all candidates identical agree/agree: the non-match mass can hit
    # zero; the M-step must hold parameters instead of dividing by zero
    rows = [(i, 100 + i, 1_000_000, 1_000_000) for i in range(5)]
    scored = spark.createDataFrame(
        rows, "lid long, rid long, sim_0 long, sim_1 long"
    )
    lam, ms, us = fit_fs_em(scored, 2, agree_threshold_micros=800_000)
    assert all(0.0 <= x <= 1.0 for x in [lam, *ms, *us])


def test_fit_fs_em_empty_candidates_returns_priors(spark):
    # SUM over zero rows is null — the fit must hold the priors, not
    # crash on int(None) (ADVICE r5)
    from lakeflow.operators.linkage import fit_fs_em

    scored = spark.createDataFrame(
        [], "lid long, rid long, sim_0 long, sim_1 long"
    )
    lam, ms, us = fit_fs_em(scored, 2, lam=0.5, m0=0.9, u0=0.1)
    assert lam == 0.5 and ms == [0.9, 0.9] and us == [0.1, 0.1]


def test_scored_candidates_rejects_shared_id_name(spark):
    # left_id == right_id would make the pair columns ambiguous to
    # every downstream select — require distinct names (ADVICE r5)
    from lakeflow.operators.linkage import scored_candidates

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with pytest.raises(ValueError, match="rename one side"):
        scored_candidates(
            df,
            df,
            "id",
            "id",
            fields=[("name", "name", 1)],
            block_keys=[(F.col("name"), F.col("name"))],
        )


def test_self_linkage_via_renamed_side(spark):
    # the documented self-linkage recipe: rename one side's id, then
    # drop mirrored pairs with left < right
    rows = [(1, "alpha"), (2, "alpha"), (3, "gamma")]
    df = spark.createDataFrame(rows, "id long, name string")
    out = record_linkage(
        df,
        df.withColumnRenamed("id", "id_b"),
        "id",
        "id_b",
        fields=[("name", "name", 1)],
        block_keys=[(F.substring("name", 1, 1), F.substring("name", 1, 1))],
        threshold_micros=900_000,
    ).filter(F.col("id") < F.col("id_b"))
    pairs = {(r.id, r.id_b): r.match for r in out.collect()}
    assert pairs == {(1, 2): True}


def _incr_records(spark):
    # three potential entities in one city block plus singletons; the
    # NEW slice includes a BRIDGE record (13) that matches two stored
    # records (1, 2) which do NOT match each other — the nontrivial
    # incremental-components case (two old entities merge)
    rows = [
        # stored
        (1, "team-000011", "nyc"),
        (2, "team-001111", "nyc"),
        (4, "acme corp ltd", "sf"),
        (5, "acme corp ltd", "sf"),
        (7, "solo record here", "la"),
        # new (ids % 3 == 0)
        (3, "team-000011", "nyc"),
        (6, "unmatched new rec", "sf"),
        (13 * 3, "team-000111", "nyc"),  # 39: bridges 1 <-> 2
    ]
    return spark.createDataFrame(rows, "rec_id long, name string, city string")


def test_incremental_linkage_matches_batch(spark):
    from lakeflow.operators.linkage import incremental_linkage_pairs

    recs = _incr_records(spark)
    new = recs.filter(F.col("rec_id") % 3 == 0)
    stored = recs.filter(F.col("rec_id") % 3 != 0)
    kw = dict(
        fields=[("name", 1)],
        block_keys=[F.col("city")],
        threshold_micros=850_000,
    )
    # ground truth: the full batch run (stored side empty -> new x new
    # covers ALL pairs), restricted to pairs touching a new record
    full = incremental_linkage_pairs(
        recs, recs.limit(0), "rec_id", **kw
    ).collect()
    want = {
        (r["rec_id_a"], r["rec_id_b"], r["score_micros"], r["match"])
        for r in full
        if r["rec_id_a"] % 3 == 0 or r["rec_id_b"] % 3 == 0
    }
    got = {
        (r["rec_id_a"], r["rec_id_b"], r["score_micros"], r["match"])
        for r in incremental_linkage_pairs(new, stored, "rec_id", **kw).collect()
    }
    assert got == want and len(got) > 0
    # the bridge pair scores: 39 matches both 1 and 2; 1-2 is old x old
    matches = {(a, b) for a, b, _s, m in got if m}
    assert (1, 39) in matches and (2, 39) in matches
    assert (1, 2) not in {(a, b) for a, b, _s, _m in got}
    # replay safety: stored already containing the batch degrades to
    # the same pair set (same-id dropped, normalized + distinct)
    replay = {
        (r["rec_id_a"], r["rec_id_b"], r["score_micros"], r["match"])
        for r in incremental_linkage_pairs(new, recs, "rec_id", **kw).collect()
    }
    assert replay == want


def test_incremental_linkage_combined_block_cap(spark):
    # the cap is evaluated on new+stored counts: a block whose COMBINED
    # size exceeds the cap is dropped even when each side alone is under
    from lakeflow.operators.linkage import incremental_linkage_pairs

    rows = [(i, f"name-{i:03d}", "hot") for i in range(10)] + [
        (100, "cold-rec-aa", "cold"),
        (101, "cold-rec-ab", "cold"),
    ]
    recs = spark.createDataFrame(rows, "rec_id long, name string, city string")
    new = recs.filter(F.col("rec_id").isin(0, 3, 6, 9, 100))
    stored = recs.subtract(new)
    out = incremental_linkage_pairs(
        new,
        stored,
        "rec_id",
        fields=[("name", 1)],
        block_keys=[F.col("city")],
        threshold_micros=800_000,
        max_block_size=8,  # hot block is 10 combined (5 new + 5 stored)
    ).collect()
    assert {(r["rec_id_a"], r["rec_id_b"]) for r in out} == {(100, 101)}


def test_incremental_resolve_entities_matches_batch(spark):
    from lakeflow.operators.linkage import (
        incremental_linkage_pairs,
        incremental_resolve_entities,
    )

    recs = _incr_records(spark)
    new = recs.filter(F.col("rec_id") % 3 == 0)
    stored = recs.filter(F.col("rec_id") % 3 != 0)
    kw = dict(
        fields=[("name", 1)],
        block_keys=[F.col("city")],
        threshold_micros=850_000,
    )
    stored_pairs = incremental_linkage_pairs(
        stored, stored.limit(0), "rec_id", **kw
    ).filter("match")
    stored_asgn = resolve_entities(
        stored_pairs,
        stored.select("rec_id"),
        "rec_id",
        left_id="rec_id_a",
        right_id="rec_id_b",
    )
    new_pairs = incremental_linkage_pairs(new, stored, "rec_id", **kw).filter(
        "match"
    )
    got = {
        (r["rec_id"], r["entity_id"])
        for r in incremental_resolve_entities(
            new_pairs,
            stored_asgn.select("rec_id", "entity_id"),
            new.select("rec_id"),
            "rec_id",
        ).collect()
    }
    # batch ground truth: components over ALL pairs of the full corpus
    all_pairs = incremental_linkage_pairs(
        recs, recs.limit(0), "rec_id", **kw
    ).filter("match")
    want = {
        (r["rec_id"], r["entity_id"])
        for r in resolve_entities(
            all_pairs,
            recs.select("rec_id"),
            "rec_id",
            left_id="rec_id_a",
            right_id="rec_id_b",
        ).collect()
    }
    assert got == want
    # the bridge merged 1, 2, 3, 39 into entity 1 (min member id) even
    # though stored-era entities were {1,3?}... stored had 1 and 2 apart
    ent = dict(got)
    assert ent[1] == ent[2] == ent[3] == ent[39] == 1
    assert ent[6] == 6 and ent[7] == 7  # singletons keep their own id
