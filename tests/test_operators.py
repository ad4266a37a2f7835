"""Direct unit tests for custom operators (paths the oracle queries don't
cover: forward ASOF, left-join ASOF, delete rows, REPLACE aggregation,
non-distinct recursive union, exact_dedup row filtering)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from doris_spark.operators.asof import asof_join
from doris_spark.operators.dedup import exact_dedup
from doris_spark.operators.table_models import agg_key_view, unique_key_view
from doris_spark.plans.recursive_cte import recursive_union


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_forward_and_left(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "a"), (1, _ts("2024-01-01T23:00:00"), "b")],
        "k INT, lts TIMESTAMP, lv STRING",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), 100.0)],
        "k INT, rts TIMESTAMP, rv DOUBLE",
    )
    fwd = asof_join(left, right, ["k"], "lts", "rts", direction="forward", how="left")
    rows = {r["lv"]: r["r_rv"] for r in fwd.collect()}
    assert rows == {"a": 100.0, "b": None}

    bwd = asof_join(left, right, ["k"], "lts", "rts", direction="backward", how="inner")
    rows = {r["lv"]: r["r_rv"] for r in bwd.collect()}
    assert rows == {"b": 100.0}


def test_asof_exact_match_toggle(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01T12:00:00"), "x")], "k INT, lts TIMESTAMP, lv STRING")
    right = spark.createDataFrame([(1, _ts("2024-01-01T12:00:00"), 5.0)], "k INT, rts TIMESTAMP, rv DOUBLE")
    with_exact = asof_join(left, right, ["k"], "lts", "rts", allow_exact_matches=True, how="left")
    without = asof_join(left, right, ["k"], "lts", "rts", allow_exact_matches=False, how="left")
    assert with_exact.collect()[0]["r_rv"] == 5.0
    assert without.collect()[0]["r_rv"] is None


def test_unique_key_view_with_deletes(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "v1", False),
            (1, 2, "v2", False),
            (2, 1, "x1", False),
            (2, 2, "x2", True),  # tombstone wins (latest seq) → key 2 dropped
        ],
        "pk INT, seq INT, v STRING, deleted BOOLEAN",
    )
    out = unique_key_view(df, keys=["pk"], sequence_col="seq", delete_col="deleted")
    assert {(r["pk"], r["v"]) for r in out.collect()} == {(1, "v2")}


def test_agg_key_view_replace(spark):
    df = spark.createDataFrame(
        [(1, 1, 10, "a"), (1, 2, 5, "b"), (2, 1, 7, "c")],
        "k INT, seq INT, amount INT, tag STRING",
    )
    out = agg_key_view(
        df, keys=["k"], agg_spec={"amount": "SUM", "tag": "REPLACE"}, sequence_col="seq"
    )
    rows = {r["k"]: (r["amount"], r["tag"]) for r in out.collect()}
    assert rows == {1: (15, "b"), 2: (7, "c")}


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        "doc_id INT, text STRING",
    )
    out = exact_dedup(df, "text", "doc_id")
    assert {r["doc_id"] for r in out.collect()} == {1, 3}


def test_recursive_union_all_mode(spark):
    anchor = spark.createDataFrame([(1,)], "n INT")

    def step(fr):
        return fr.filter(F.col("n") < 5).select((F.col("n") + 1).alias("n"))

    out = recursive_union(anchor, step, distinct=False, max_iterations=10)
    assert sorted(r["n"] for r in out.collect()) == [1, 2, 3, 4, 5]


def test_assert_num_rows_scalar_subquery(spark, sf_dir):
    """Doris AssertNumRows (be/src/exec/operator/assert_num_rows_operator.h:36):
    a scalar subquery returning more than one row must raise, not silently
    pick a row. Spark enforces the same guard at runtime."""
    import pytest

    from doris_spark.session import register_views

    register_views(spark, sf_dir)
    ok = spark.sql("SELECT (SELECT max(n_nationkey) FROM nation) AS v").collect()
    assert ok[0]["v"] == 24
    with pytest.raises(Exception, match="TOO_MANY_ROWS|[Mm]ore than one row"):
        spark.sql("SELECT (SELECT n_nationkey FROM nation) AS v").collect()


def test_window_funnel_dedup_mode(spark):
    from doris_spark.operators.funnel import window_funnel

    # user 1: s@10, v@11, p@12 — clean chain, level 3 in every mode.
    # user 2: s@10, s@10:30, v@11, p@12 — repeat signup between t1 and the
    #   view match: dedup stops at level 1; increase still reaches 3.
    # user 3: s@10, v@11, v@11:30, p@12 — repeat view between view match
    #   and purchase match: dedup stops at level 2.
    rows = [
        (1, _ts("2024-01-01T10:00:00"), "s"), (1, _ts("2024-01-01T11:00:00"), "v"),
        (1, _ts("2024-01-01T12:00:00"), "p"),
        (2, _ts("2024-01-01T10:00:00"), "s"), (2, _ts("2024-01-01T10:30:00"), "s"),
        (2, _ts("2024-01-01T11:00:00"), "v"), (2, _ts("2024-01-01T12:00:00"), "p"),
        (3, _ts("2024-01-01T10:00:00"), "s"), (3, _ts("2024-01-01T11:00:00"), "v"),
        (3, _ts("2024-01-01T11:30:00"), "v"), (3, _ts("2024-01-01T12:00:00"), "p"),
    ]
    ev = spark.createDataFrame(rows, "u INT, ts TIMESTAMP, et STRING")
    args = (ev, "u", "ts", "et")
    steps = ["s", "v", "p"]
    dedup = {
        r["user"]: r["level"]
        for r in window_funnel(*args, steps=steps, window_seconds=86400, mode="deduplication").collect()
    }
    assert dedup == {1: 3, 2: 1, 3: 2}
    inc = {
        r["user"]: r["level"]
        for r in window_funnel(*args, steps=steps, window_seconds=86400, mode="increase").collect()
    }
    assert inc == {1: 3, 2: 3, 3: 3}


def test_sequence_count_greedy(spark):
    from pyspark.sql import functions as F

    from doris_spark.operators.funnel import sequence_count

    # user 1: s, p          → 1 chain
    # user 2: s, s, p, p    → greedy left-to-right = 1 (after the first
    #   chain completes at the first p, no later s remains); the maximum
    #   non-overlapping matching (2) is NOT sequence_count semantics.
    # user 3: s, p, s, p    → 2 chains
    # user 4: p, s          → 0 chains (order matters); still emitted.
    # user 5: x only        → no condition-matching events, not emitted.
    rows = [
        (1, _ts("2024-01-01T10:00:00"), "s"), (1, _ts("2024-01-01T11:00:00"), "p"),
        (2, _ts("2024-01-01T10:00:00"), "s"), (2, _ts("2024-01-01T10:30:00"), "s"),
        (2, _ts("2024-01-01T11:00:00"), "p"), (2, _ts("2024-01-01T11:30:00"), "p"),
        (3, _ts("2024-01-01T10:00:00"), "s"), (3, _ts("2024-01-01T10:30:00"), "p"),
        (3, _ts("2024-01-01T11:00:00"), "s"), (3, _ts("2024-01-01T11:30:00"), "p"),
        (4, _ts("2024-01-01T10:00:00"), "p"), (4, _ts("2024-01-01T11:00:00"), "s"),
        (5, _ts("2024-01-01T10:00:00"), "x"),
    ]
    ev = spark.createDataFrame(rows, "u INT, ts TIMESTAMP, et STRING")
    got = {
        r["user"]: r["n_matches"]
        for r in sequence_count(
            ev, "u", "ts", [F.col("et") == "s", F.col("et") == "p"]
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 0}


def test_sequence_match_chain(spark):
    from doris_spark.operators.funnel import sequence_match

    # user 1: s, p, e        → matched (strict order)
    # user 2: p, s, e        → no p after s → not matched, user absent
    # user 3: s, e, p, e     → s < p < later e → matched
    # user 4: s@t, p@t       → p not STRICTLY after s → absent
    # user 5: x only         → no matching events → absent
    rows = [
        (1, _ts("2024-01-01T10:00:00"), "s"), (1, _ts("2024-01-01T11:00:00"), "p"),
        (1, _ts("2024-01-01T12:00:00"), "e"),
        (2, _ts("2024-01-01T10:00:00"), "p"), (2, _ts("2024-01-01T11:00:00"), "s"),
        (2, _ts("2024-01-01T12:00:00"), "e"),
        (3, _ts("2024-01-01T10:00:00"), "s"), (3, _ts("2024-01-01T10:30:00"), "e"),
        (3, _ts("2024-01-01T11:00:00"), "p"), (3, _ts("2024-01-01T11:30:00"), "e"),
        (4, _ts("2024-01-01T10:00:00"), "s"), (4, _ts("2024-01-01T10:00:00"), "p"),
        (5, _ts("2024-01-01T10:00:00"), "x"),
    ]
    ev = spark.createDataFrame(rows, "u INT, ts TIMESTAMP, et STRING")
    conds = [F.col("et") == "s", F.col("et") == "p", F.col("et") == "e"]
    got = sorted(r["user"] for r in sequence_match(ev, "u", "ts", conds).collect())
    assert got == [1, 3]
    # two-step prefix: user 4's same-timestamp p must still not count
    got2 = sorted(r["user"] for r in sequence_match(ev, "u", "ts", conds[:2]).collect())
    assert got2 == [1, 3]
    # overlapping conditions: one event may satisfy several bitmask slots
    overlap = [F.col("et").isin("s", "p"), F.col("et") == "p"]
    got3 = sorted(r["user"] for r in sequence_match(ev, "u", "ts", overlap).collect())
    # needs an s-or-p event with a p STRICTLY later: users 1 (s→p), 2 (p→…?
    # p@10 then s@11, no later p → no), 3 (s→p), 4 (s@t,p@t equal → no)
    assert got3 == [1, 3]


def test_window_funnel_fixed_mode(spark):
    from doris_spark.operators.funnel import window_funnel

    # user 1: s@10, p@10:30, v@11, p@12 — an out-of-sequence purchase
    #   between signup and the view match: fixed stops at level 1, but
    #   dedup allows it (purchase is not yet matched) → level 3.
    # user 2: s@10, x@10:30, v@11, p@12 — a NON-step event interleaves:
    #   both modes still reach level 3.
    rows = [
        (1, _ts("2024-01-01T10:00:00"), "s"), (1, _ts("2024-01-01T10:30:00"), "p"),
        (1, _ts("2024-01-01T11:00:00"), "v"), (1, _ts("2024-01-01T12:00:00"), "p"),
        (2, _ts("2024-01-01T10:00:00"), "s"), (2, _ts("2024-01-01T10:30:00"), "x"),
        (2, _ts("2024-01-01T11:00:00"), "v"), (2, _ts("2024-01-01T12:00:00"), "p"),
    ]
    ev = spark.createDataFrame(rows, "u INT, ts TIMESTAMP, et STRING")
    args = (ev, "u", "ts", "et")
    steps = ["s", "v", "p"]
    fixed = {
        r["user"]: r["level"]
        for r in window_funnel(*args, steps=steps, window_seconds=86400, mode="fixed").collect()
    }
    assert fixed == {1: 1, 2: 3}
    dedup = {
        r["user"]: r["level"]
        for r in window_funnel(*args, steps=steps, window_seconds=86400, mode="deduplication").collect()
    }
    assert dedup == {1: 3, 2: 3}


def test_match_phrase_token_boundaries(spark):
    from doris_spark.operators import textops as T

    df = spark.createDataFrame(
        [("bobcat dog",), ("cat dog here",), ("spark journal",), ("spark ajo",)],
        "txt STRING",
    )
    got = {
        r["txt"]: (r["p"], r["pp"])
        for r in df.select(
            "txt",
            T.match_phrase("txt", "cat dog").alias("p"),
            T.match_phrase_prefix("txt", "spark jo").alias("pp"),
        ).collect()
    }
    assert got == {
        "bobcat dog": (False, False),   # boundary: 'bobcat' != 'cat'
        "cat dog here": (True, False),
        "spark journal": (False, True), # last term matches as prefix
        "spark ajo": (False, False),    # 'ajo' does not start with 'jo'
    }


def test_search_dsl(spark):
    from doris_spark.operators.search_dsl import search

    df = spark.createDataFrame(
        [
            (1, "spark hash join internals"),
            (2, "merge join strategies"),
            (3, "spark streaming watermark"),
            (4, "broken spark join"),
            (5, "sparkle joint"),
        ],
        "id INT, body STRING",
    )

    def ids(q):
        return sorted(
            r["id"] for r in df.filter(search(q, "body")).collect()
        )

    assert ids("spark AND join") == [1, 4]
    assert ids("spark join") == [1, 4]            # adjacency = AND
    assert ids("spark OR merge") == [1, 2, 3, 4]
    assert ids('"hash join"') == [1]
    assert ids('"hash join" OR "merge join"') == [1, 2]
    assert ids("spark AND NOT broken") == [1, 3]
    assert ids("(spark OR merge) AND join") == [1, 2, 4]
    assert ids("joi*") == [1, 2, 4, 5]            # prefix matches joint too
    assert ids('"spark jo"*') == [4]              # phrase-prefix (contiguous)

    # field-qualified clause with a field map
    df2 = spark.createDataFrame(
        [(1, "intro to spark", "covers joins"), (2, "duck talk", "spark unrelated")],
        "id INT, title STRING, body STRING",
    )
    got = sorted(
        r["id"]
        for r in df2.filter(
            search("title:spark AND body:joins", "body", {"title": "title", "body": "body"})
        ).collect()
    )
    assert got == [1]

    import pytest

    with pytest.raises(ValueError, match="unknown field"):
        search("nope:x", "body", {"body": "body"})
    with pytest.raises(ValueError, match="unbalanced|trailing|clause"):
        search("(spark AND", "body")


def test_sequence_match_gaps(spark):
    from pyspark.sql import functions as F

    from doris_spark.operators.funnel import sequence_match_gaps

    # user 1: s@0s, p@60s            -> gap 60
    # user 2: s@0s, s@50s, p@60s     -> gaps 60 (from s@0) or 10 (from s@50)
    # user 3: s@0s, p@5s             -> gap 5
    base = _ts("2024-01-01T00:00:00")
    import datetime as dtm

    def at(sec):
        return base + dtm.timedelta(seconds=sec)

    rows = [
        (1, at(0), "s"), (1, at(60), "p"),
        (2, at(0), "s"), (2, at(50), "s"), (2, at(60), "p"),
        (3, at(0), "s"), (3, at(5), "p"),
    ]
    ev = spark.createDataFrame(rows, "u INT, ts TIMESTAMP, et STRING")
    conds = [F.col("et") == "s", F.col("et") == "p"]

    def users(gap):
        return sorted(
            r["user"]
            for r in sequence_match_gaps(ev, "u", "ts", conds, [gap]).collect()
        )

    assert users(None) == [1, 2, 3]
    assert users((">=", 30)) == [1, 2]       # vs earliest s
    # upper bound: user 2 matches ONLY via the later s@50 — the case where
    # greedy earliest-match gives a false negative.
    assert users(("<=", 30)) == [2, 3]
    assert users(("<", 5)) == []
    assert users((">", 59)) == [1, 2]


def test_ann_index_partition_pruned_probe(spark, tmp_path):
    # persisted ANN layout: probe must carry a static PartitionFilter on
    # sig (reads one bucket), and match the unindexed bucket scan
    from pyspark.sql import functions as F

    from doris_spark.operators.vector import (
        ann_index_probe,
        build_ann_index,
        python_rhp_signature,
        rhp_signature,
    )

    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    path = str(tmp_path / "ann.parquet")
    build_ann_index(df, path, "embedding", dim=8, n_planes=4, seed=42)

    qvec = rows[3][1]
    probe = ann_index_probe(
        spark, path, qvec, dim=8, k=5, n_planes=4, seed=42,
        id_col="vec_id", vec_col="embedding",
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(sig" in plan or "PartitionFilters: [(sig" in plan or "sig#" in plan.split("PartitionFilters")[1][:120]
    got = [r.vec_id for r in probe.collect()]

    # signature agreement: driver-side python == Spark expression
    qsig = python_rhp_signature(qvec, 8, 4, 42)
    spark_sig = (
        df.filter(F.col("vec_id") == 3)
        .select(rhp_signature("embedding", 8, 4, 42).alias("s"))
        .collect()[0].s
    )
    assert qsig == spark_sig
    assert got[0] == 3  # the query vector itself tops its own bucket


def test_ivf_knn_matches_bruteforce_within_probed_lists(spark):
    """IVF with nprobe == n_centroids degenerates to exact search: the
    probe covers every inverted list, so the result must equal the exact
    brute-force top-k."""
    from doris_spark.operators import vector as V
    from doris_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    corpus = emb.filter(F.col("vec_id") != 0)
    query = emb.filter(F.col("vec_id") == 0)
    exact = V.knn(corpus, query, "embedding", "vec_id", k=5, metric="l2").collect()
    full_probe = V.ivf_knn(corpus, query, "embedding", "vec_id",
                           k=5, n_centroids=8, nprobe=8).collect()
    assert [r["vec_id"] for r in full_probe] == [r["vec_id"] for r in exact]

    # narrow probe returns a subset drawn only from probed lists, still
    # ordered by distance
    narrow = V.ivf_knn(corpus, query, "embedding", "vec_id",
                       k=5, n_centroids=8, nprobe=2).collect()
    scores = [r["score"] for r in narrow]
    assert scores == sorted(scores)
    assert set(r["vec_id"] for r in narrow) <= set(
        r["vec_id"] for r in V.ivf_knn(corpus, query, "embedding", "vec_id",
                                       k=500, n_centroids=8, nprobe=2).collect())


def test_ivf_index_probe_zero_training_jobs_and_pruned(spark, tmp_path):
    """Persisted IVF index (build_ivf_index / ivf_index_probe): the
    probe must (a) launch ZERO Spark jobs before the result is consumed
    — the codebook comes from the sidecar and list selection is
    driver-side python, so there is no training/assignment work per
    query; (b) carry a static PartitionFilter on __cid, scanning only
    the nprobe probed lists; (c) agree with the in-query ivf_knn on the
    same corpus/params (the index changes the access path, not the
    result)."""
    from doris_spark.operators import vector as V
    from doris_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    corpus = emb.filter(F.col("vec_id") != 0)
    query = emb.filter(F.col("vec_id") == 0)
    path = str(tmp_path / "ivf_idx")
    V.build_ivf_index(corpus, path, "embedding", "vec_id",
                      n_centroids=8, train_iters=2)
    qvec = [float(x) for x in query.select("embedding").first()[0]]

    store = spark._jsc.sc().statusStore()

    def jobs() -> int:
        spark._jsc.sc().listenerBus().waitUntilEmpty(10000)
        return store.jobsList(None).size()

    before = jobs()
    probe = V.ivf_index_probe(spark, path, qvec, k=5, nprobe=2,
                              id_col="vec_id", vec_col="embedding")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    after = jobs()
    # planning reads parquet FOOTER metadata, not data, and runs no
    # training: job count must not move until the probe is collected
    assert after == before, f"probe planning ran {after - before} jobs"
    assert "PartitionFilters" in plan and "__cid" in plan.split("PartitionFilters")[1][:160]

    got = probe.collect()
    expect = V.ivf_knn(corpus, query, "embedding", "vec_id",
                       k=5, n_centroids=8, nprobe=2).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in expect]


def test_connected_components_known_graph(spark):
    from doris_spark.operators.dedup import connected_components, dedup_clusters

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 9)], ["doc_a", "doc_b"]
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges).collect()
    }
    # {1,2,3} -> 1, {5,6} -> 5, {9} self-loop -> 9
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9}

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(1, 10)], ["doc_id", "text"])
    clusters = dedup_clusters(docs, edges, "doc_id").collect()
    keep = {r["doc_id"]: r["keep"] for r in clusters}
    assert keep == {1: 1, 2: 0, 3: 0, 5: 1, 6: 0, 9: 1}


def test_connected_components_long_chain(spark):
    """A 12-node path needs multiple propagation rounds — exercises the
    convergence loop, not just one step."""
    from doris_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["doc_a", "doc_b"]
    )
    got = connected_components(edges).collect()
    assert all(r["component"] == 0 for r in got)
    assert len(got) == 13


def test_lsh_multiprobe_superset_and_chunking_edges(spark):
    from doris_spark.operators import vector as V
    from doris_spark.operators.textops import chunk_documents
    from doris_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    corpus = emb.filter(F.col("vec_id") != 0)
    query = emb.filter(F.col("vec_id") == 0)
    exact_bucket = {r["vec_id"] for r in V.lsh_bucketed_knn(
        corpus, query, "embedding", "vec_id", dim=64, k=500).collect()}
    probe1 = {r["vec_id"] for r in V.lsh_bucketed_knn(
        corpus, query, "embedding", "vec_id", dim=64, k=500, probe_bits=1).collect()}
    # multi-probe candidates strictly contain the exact-bucket candidates
    assert exact_bucket <= probe1

    # chunking edge cases: short doc -> one chunk; coverage is complete
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, " ".join(f"t{i}" for i in range(33)))],
        ["doc_id", "text"],
    )
    out = chunk_documents(docs, "text", "doc_id", chunk_tokens=32, overlap=8)
    rows = {(r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"]) for r in out.collect()}
    assert rows[(1, 0)] == (3, "a b c")
    assert rows[(2, 0)][0] == 32
    # chunk 1 starts at token 25 (stride 24) and covers the 33-token tail
    assert rows[(2, 1)][0] == 9
    assert rows[(2, 1)][1].startswith("t24")


def test_adhoc_ivf_codebook_cache(spark):
    """VERDICT r7 ask #8: repeated ad-hoc ivf_knn probes over the same
    parquet-backed corpus reuse the content-keyed codebook instead of
    retraining Lloyd per call."""
    from doris_spark.operators import vector as V

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = corpus.limit(1)
    V._CODEBOOK_CACHE.clear()
    r1 = V.ivf_knn(corpus, q, "embedding", "vec_id", k=5).collect()
    assert len(V._CODEBOOK_CACHE) == 1
    cached = next(iter(V._CODEBOOK_CACHE.values()))
    r2 = V.ivf_knn(corpus, q, "embedding", "vec_id", k=5).collect()
    assert r2 == r1
    # cache hit: the codebook object is REUSED, not retrained
    assert next(iter(V._CODEBOOK_CACHE.values())) is cached
    assert len(V._CODEBOOK_CACHE) == 1
