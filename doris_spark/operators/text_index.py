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
        """Hash buckets of the query terms — |terms| literals computed in
        one tiny local job (bounded by the query, never the data)."""
        df = self.spark.createDataFrame([(t,) for t in terms], "token STRING")
        rows = df.select(
            F.pmod(F.xxhash64("token"), F.lit(self.n_buckets)).alias("b")
        ).collect()
        return sorted({int(r[0]) for r in rows})

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
