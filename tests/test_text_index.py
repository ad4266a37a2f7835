"""Posting-list text index (doris_spark/operators/text_index.py) — the
inverted-index analog (be/src/storage/index/inverted/;
PushDownMatchProjectionAsVirtualColumn.java).

Pins: (1) index-probed match_any/match_all equal the scan-based
predicates on the same corpus; (2) the probe plan is the SCALE plan —
the postings scan carries tbkt partition filters (static pruning) and
the corpus side is a semi-join that never re-tokenizes text.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doris_spark.operators import textops as T
from doris_spark.operators.text_index import TextIndex, build_text_index

DOCS = [
    (1, "Spark join strategies and shuffle tuning"),
    (2, "a quiet walk in the park"),
    (3, "broadcast JOIN beats shuffle join for small dims"),
    (4, "spark streaming watermarks"),
    (5, "nothing relevant here"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id INT, text STRING")


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("txtidx") / "postings.parquet")
    build_text_index(corpus, "text", "doc_id", path)
    return TextIndex(spark, path)


def _ids(df):
    return sorted(r[0] for r in df.select("doc_id").collect())


def test_match_any_equals_scan(spark, corpus, index):
    terms = ["spark", "join"]
    scan = corpus.filter(T.match_any("text", terms))
    probed = index.match_any(corpus, "doc_id", terms)
    assert _ids(probed) == _ids(scan) == [1, 3, 4]


def test_match_all_equals_scan(spark, corpus, index):
    terms = ["spark", "join"]
    scan = corpus.filter(T.match_all("text", terms))
    probed = index.match_all(corpus, "doc_id", terms)
    assert _ids(probed) == _ids(scan) == [1]


def test_no_match_and_case_insensitive(spark, corpus, index):
    assert _ids(index.match_any(corpus, "doc_id", ["JOIN"])) == [1, 3]
    assert _ids(index.match_any(corpus, "doc_id", ["zebra"])) == []


def test_probe_plan_prunes_and_never_tokenizes_corpus(spark, corpus, index):
    plan = index.match_any(corpus, "doc_id", ["spark", "join"])._jdf \
        .queryExecution().executedPlan().toString()
    # semi-join on ids, not a corpus predicate
    assert "LeftSemi" in plan
    # postings scan is partition-pruned on the token hash bucket
    assert "tbkt" in plan and "PartitionFilters" in plan
    # the corpus text column is never re-tokenized in the probe plan
    assert "regexp_replace" not in plan and "split(" not in plan.replace(
        "string_split", ""
    )


def test_python_xxhash64_matches_spark(spark):
    from pyspark.sql import functions as F

    from doris_spark.operators.text_index import xxhash64_str

    samples = [
        "", "a", "spark", "join", "vector", "tok123", "ünïcode✓",
        "eight888", "nine99999", "twelve-chars", "exactly-16-bytes",
        "a string longer than thirty-two bytes to hit the stripe loop",
        "TOKEN", " space padded ",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "token STRING")
    got = {r["token"]: r["h"] for r in df.select(
        "token", F.xxhash64("token").alias("h")).collect()}
    for s in samples:
        assert xxhash64_str(s) == got[s], s


def test_term_doc_counts_matches_doc_ids(spark, corpus, index):
    terms = ["spark", "join"]
    counts = {r["doc_id"]: r["n_terms"]
              for r in index.term_doc_counts(terms).collect()}
    any_ids = {r["doc_id"] for r in index.doc_ids(terms, "any").collect()}
    all_ids = {r["doc_id"] for r in index.doc_ids(terms, "all").collect()}
    assert set(counts) == any_ids
    assert {d for d, n in counts.items() if n == len(terms)} == all_ids
