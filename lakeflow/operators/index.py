"""Inverted index over a document corpus: posting lists as a relation,
conjunctive keyword search as semi-join algebra.

Corpus curation constantly needs "every document mentioning X (and Y)"
— to slice eval sets, hunt contamination, audit PII findings, build
domain subcorpora. Grepping 100 TB per question is a full scan each
time; an inverted index pays one tokenize+shuffle ONCE and answers
every subsequent query by touching only the queried terms' postings.

Spark-first layout:

- The index IS a DataFrame ``(token, doc_id, tf)`` — build it with
  explode + hash aggregate, persist it partitioned/bucketed BY TOKEN
  (``sinks.tables.save_bucketed_table``) so a term lookup is a
  partition-pruned scan and term-term intersections co-locate without
  a shuffle.
- A conjunctive query filters the index to its terms (predicate pushed
  to the parquet scan), then one hash aggregate keeps doc_ids whose
  distinct-term count equals the term count — intersection without
  self-joins, cost ∝ the queried postings, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_inverted_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Tokenize (lowercase, whitespace split) and emit one posting row
    per (token, doc) with its term frequency. One explode + one hash
    aggregate; map-side combine collapses repeated tokens before the
    shuffle."""
    tok = F.explode(
        F.split(F.lower(F.col(text_col)), r"\s+")
    ).alias("token")
    return (
        docs.select(F.col(id_col).alias("doc_id"), tok)
        .where(F.col("token") != "")
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def keyword_search_all(index: DataFrame, terms: list[str]) -> DataFrame:
    """Doc ids containing ALL ``terms`` (conjunctive / AND query).

    The term filter is an IN-list the parquet scan can push down; the
    intersection is one aggregate over the surviving postings —
    ``count(distinct token) == len(terms)`` — so cost is the size of
    the queried posting lists. Returns (doc_id, total_tf) where
    total_tf sums the matched terms' frequencies (a simple relevance
    proxy)."""
    # dedupe after lowercasing: count_distinct(token) compares against
    # the UNIQUE term count, so caller duplicates (or case variants of
    # one token) must collapse or the AND query is silently empty
    terms = sorted({t.lower() for t in terms})
    hits = index.where(F.col("token").isin(terms))
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count_distinct(F.col("token")).alias("__nt"),
            F.sum("tf").alias("total_tf"),
        )
        .where(F.col("__nt") == len(terms))
        .select("doc_id", "total_tf")
    )


def keyword_search_any(
    index: DataFrame, terms: list[str], min_terms: int = 1
) -> DataFrame:
    """Disjunctive variant: docs matching at least ``min_terms`` of
    ``terms``, with the matched-term count for ranking. Same
    pushed-filter + single-aggregate shape."""
    terms = sorted({t.lower() for t in terms})
    hits = index.where(F.col("token").isin(terms))
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count_distinct(F.col("token")).alias("n_terms"),
            F.sum("tf").alias("total_tf"),
        )
        .where(F.col("n_terms") >= min_terms)
    )
