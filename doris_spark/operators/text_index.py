"""Posting-list text index — the Spark-native analog of the reference's
inverted-index storage.

Reference: be/src/storage/index/inverted/ (posting lists per token) and
the FE rewrite that turns match_* predicates into index probes
(PushDownMatchProjectionAsVirtualColumn.java). Doris stores per-segment
token -> row-id bitmaps; the lake-storage equivalent is a persisted
postings TABLE `(token, doc_id)` partitioned by a hash bucket of the
token:

- Build: tokenize -> explode -> distinct postings, ONE shuffle on the
  bucket key, sorted by token inside each partition (parquet min/max
  row-group skipping within a bucket).
- Probe: the query terms' buckets are computed up front, so the scan
  carries `tbkt IN (...)` — static partition pruning reads |distinct
  term buckets| / n_buckets of the index regardless of corpus size —
  plus a `token IN (...)` pushed filter.
- match_any = distinct doc ids of the probed postings; match_all =
  doc ids whose probed postings cover every term (group-count).
- The corpus is then SEMI-JOINED on doc id: the text column is never
  re-tokenized, so search cost is O(postings of the query terms), not
  O(corpus) — at 100 TB this is the difference the reference's
  "hybrid search" headline feature makes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doris_spark.operators.textops import tokenize

N_BUCKETS = 64

# ----------------------------------------------------------------- xxh64
# Pure-python XXH64 (Yann Collet's published algorithm), matching Spark's
# `xxhash64(string_col)` = XXH64(utf8 bytes, seed=42) exactly (verified
# in tests/test_text_index.py against F.xxhash64). Lets the probe side
# compute a query term's hash bucket on the DRIVER with zero Spark jobs —
# previously each probe paid a createDataFrame+collect round trip.

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64

        def _rnd(v: int, off: int) -> int:
            lane = int.from_bytes(data[off:off + 8], "little")
            return (_rotl((v + lane * _P2) & _M64, 31) * _P1) & _M64

        while i + 32 <= n:
            v1 = _rnd(v1, i)
            v2 = _rnd(v2, i + 8)
            v3 = _rnd(v3, i + 16)
            v4 = _rnd(v4, i + 24)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        lane = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((lane * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        h ^= (lane * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxhash64_str(s: str) -> int:
    """Signed-64 value identical to Spark's F.xxhash64(string column)."""
    v = _xxh64(s.encode("utf-8"), 42)
    return v - (1 << 64) if v >= (1 << 63) else v


def build_text_index(
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Write the postings table: distinct (token, doc_id), partitioned
    by token hash bucket, token-sorted within files."""
    postings = (
        corpus.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokenize(text_col)).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
        .withColumn("tbkt", F.pmod(F.xxhash64("token"), F.lit(n_buckets)))
    )
    (
        postings.repartition("tbkt")
        .sortWithinPartitions("token")
        .write.mode("overwrite")
        .partitionBy("tbkt")
        .parquet(path)
    )


class TextIndex:
    """A probe handle over a built postings table."""

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = N_BUCKETS):
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets

    def _term_buckets(self, terms: Sequence[str]) -> list[int]:
        """Hash buckets of the query terms — computed driver-side with the
        pure-python xxhash64 (no Spark job; was a createDataFrame+collect
        round trip per probe)."""
        return sorted({xxhash64_str(t) % self.n_buckets for t in terms})

    def postings(self, terms: Sequence[str]) -> DataFrame:
        """Partition-pruned scan of the query terms' postings."""
        terms_l = sorted({t.lower() for t in terms})
        bkts = self._term_buckets(terms_l)
        return (
            self.spark.read.parquet(self.path)
            .filter(F.col("tbkt").isin(bkts))
            .filter(F.col("token").isin(terms_l))
        )

    def doc_ids(self, terms: Sequence[str], mode: str = "any") -> DataFrame:
        """doc_id DataFrame of the matching documents."""
        terms_l = sorted({t.lower() for t in terms})
        p = self.postings(terms_l)
        if mode == "any":
            return p.select("doc_id").distinct()
        if mode == "all":
            return (
                p.groupBy("doc_id")
                .agg(F.countDistinct("token").alias("__nt"))
                .filter(F.col("__nt") == len(terms_l))
                .select("doc_id")
            )
        raise ValueError(f"mode must be any|all, got {mode!r}")

    def term_doc_counts(self, terms: Sequence[str]) -> DataFrame:
        """(doc_id, n_terms): how many DISTINCT query terms each matching
        document contains — ONE partition-pruned index scan answering
        match_any (n_terms >= 1) and match_all (n_terms = |terms|)
        together. Callers needing both predicates previously paid two
        scans + two joins; this is the shared probe."""
        terms_l = sorted({t.lower() for t in terms})
        return (
            self.postings(terms_l)
            .groupBy("doc_id")
            .agg(F.countDistinct("token").alias("n_terms"))
        )

    def match_any(
        self, corpus: DataFrame, id_col: str, terms: Sequence[str]
    ) -> DataFrame:
        """Index-probed match_any: semi-join on doc ids — the corpus text
        column is never tokenized. Join strategy is left to AQE: a rare
        term's id set broadcasts at runtime; a stop-word-sized posting
        list falls back to a shuffled semi-join instead of blowing the
        driver (the same skew the reference's high-frequency tokens
        hit)."""
        ids = self.doc_ids(terms, "any")
        return corpus.join(ids, corpus[id_col] == ids["doc_id"], "left_semi")

    def match_all(
        self, corpus: DataFrame, id_col: str, terms: Sequence[str]
    ) -> DataFrame:
        ids = self.doc_ids(terms, "all")
        return corpus.join(ids, corpus[id_col] == ids["doc_id"], "left_semi")
