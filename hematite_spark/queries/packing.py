"""Sequence packing — the pre-tokenization batching step of an LLM
training pipeline: concatenate documents into fixed-token-budget
training sequences with minimal padding waste. Packing is inherently
sequential (each placement depends on the running fill), so the
distributed design shards the corpus into independent hash buckets
and packs greedily WITHIN each bucket — buckets pack in parallel
across executors, and no global order is needed (training sequences
have no cross-sequence order anyway).

Scale: one narrow shuffle on the bucket key (8 buckets here; at
100 TB the bucket count is sized to executor count so each pandas
group holds ~one task's worth of (doc_id, n_tokens) pairs — 16 bytes
per doc, NOT the text, so a billion-doc bucket is ~16 GB and the
usual sizing is thousands of buckets). The greedy first-fit-in-order
rule is deterministic given the bucket's doc_id order, which is what
makes the recursive-CTE oracle able to replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hematite_spark.functions import norm_text as _norm_text
from hematite_spark.io import load_table
from hematite_spark.queries.sampling import _DUCK_HASH_PCT, _hash_pct

TOKEN_BUDGET = 256
N_BUCKETS = 8


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy in-order packing: within each of 8 doc_id-hash buckets,
    walk docs in doc_id order keeping a running token fill; a doc
    that would overflow the 256-token budget starts a new sequence
    (oversized docs get a sequence of their own). Emits per-sequence
    document count and token total — the padding-efficiency report a
    data-loader would consume.

    applyInPandas carries only (bucket, doc_id, n_tokens) — the
    text column is projected away before the shuffle, so the Python
    boundary moves integers, not the corpus."""
    import pandas as pd

    from pyspark.sql import types as T

    docs = load_table(spark, "documents", sf_dir)
    sized = docs.select(
        (_hash_pct(F.col("doc_id")) % N_BUCKETS).alias("bucket"),
        "doc_id",
        F.size(F.split(_norm_text(), " ")).cast("bigint").alias("n_tokens"),
    )

    out_schema = T.StructType(
        [
            T.StructField("bucket", T.LongType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("seq_id", T.LongType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids = []
        fill, seq = 0, 0
        for tok in pdf["n_tokens"]:
            if seq_ids and fill + tok > TOKEN_BUDGET:
                seq += 1
                fill = 0
            fill += tok
            seq_ids.append(seq)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        return pdf

    packed = sized.groupBy("bucket").applyInPandas(pack, schema=out_schema)
    return (
        packed.groupBy("bucket", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("bucket", "seq_id")
    )


# The oracle replays the same greedy walk with a recursive CTE: the
# working set holds every bucket's frontier row, so recursion depth =
# the largest bucket's row count (same technique as the
# dedup_connected_components oracle).
PACK_SEQUENCES_SQL = rf"""
WITH RECURSIVE sized AS (
  SELECT ({_DUCK_HASH_PCT.format(k="doc_id::VARCHAR")}) % {N_BUCKETS} AS bucket,
         doc_id,
         CAST(len(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ')) AS BIGINT)
           AS n_tokens,
         row_number() OVER (
           PARTITION BY ({_DUCK_HASH_PCT.format(k="doc_id::VARCHAR")}) % {N_BUCKETS}
           ORDER BY doc_id) AS rn
  FROM documents
), packed AS (
  SELECT bucket, doc_id, n_tokens, rn,
         n_tokens AS fill, CAST(0 AS BIGINT) AS seq_id
  FROM sized WHERE rn = 1
  UNION ALL
  SELECT s.bucket, s.doc_id, s.n_tokens, s.rn,
         CASE WHEN p.fill + s.n_tokens > {TOKEN_BUDGET} THEN s.n_tokens
              ELSE p.fill + s.n_tokens END,
         CASE WHEN p.fill + s.n_tokens > {TOKEN_BUDGET} THEN p.seq_id + 1
              ELSE p.seq_id END
  FROM packed p JOIN sized s ON s.bucket = p.bucket AND s.rn = p.rn + 1
)
SELECT bucket, seq_id, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM packed
GROUP BY bucket, seq_id
ORDER BY bucket, seq_id
"""


def length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit — the inference/eval-side
    counterpart of pack_sequences: group docs into power-of-2 token-
    length buckets (8, 16, 32, ...) and report, per bucket, the
    padding waste of batching within the bucket (pad to the bucket's
    observed max length)
    vs batching naively (pad every doc to the global max). The
    savings column is the reason serving stacks length-bucket.

    Scale: token counts come from size(split) — no explode; the
    per-bucket aggregate is O(buckets) after a map-side combine; the
    global max is a 1-row broadcast. One corpus scan total."""
    docs = load_table(spark, "documents", sf_dir)
    per_doc = docs.select(
        F.size(F.split(_norm_text(), " ")).cast("bigint").alias("n_tokens")
    )
    bucketed = per_doc.select(
        "n_tokens",
        F.pow(F.lit(2.0), F.ceil(F.log2(F.greatest(F.col("n_tokens"), F.lit(1)))))
        .cast("bigint")
        .alias("bucket_cap"),
    )
    gmax = per_doc.agg(F.max("n_tokens").alias("global_max"))
    return (
        bucketed.groupBy("bucket_cap")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("n_tokens").alias("bucket_max"),
        )
        .withColumn(
            "bucket_pad", F.col("n_docs") * F.col("bucket_max") - F.col("total_tokens")
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "bucket_cap",
            "n_docs",
            "total_tokens",
            "bucket_pad",
            (F.col("n_docs") * F.col("global_max") - F.col("total_tokens")).alias("naive_pad"),
            F.round(
                1.0
                - F.col("bucket_pad")
                / (F.col("n_docs") * F.col("global_max") - F.col("total_tokens")),
                6,
            ).alias("pad_savings"),
        )
        .orderBy("bucket_cap")
    )


LENGTH_BUCKET_SQL = """
WITH per_doc AS (
  SELECT len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '))::BIGINT AS n_tokens
  FROM documents),
bucketed AS (
  SELECT n_tokens,
         CAST(pow(2.0, ceil(log2(greatest(n_tokens, 1)))) AS BIGINT) AS bucket_cap
  FROM per_doc),
gmax AS (SELECT max(n_tokens) AS global_max FROM per_doc)
SELECT bucket_cap, n_docs, total_tokens, bucket_pad,
       (n_docs * global_max - total_tokens)::BIGINT AS naive_pad,
       round(1.0 - bucket_pad / CAST(n_docs * global_max - total_tokens AS DOUBLE), 6) AS pad_savings
FROM (
  SELECT bucket_cap, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,
         (count(*) * max(n_tokens) - sum(n_tokens))::BIGINT AS bucket_pad
  FROM bucketed GROUP BY bucket_cap), gmax
ORDER BY bucket_cap
"""
