"""Multimodal columns (SURVEY.md §2 C): image/audio/video payloads as
opaque `binary` columns with typed metadata, processed by
Arrow-batched pandas UDFs via mapInPandas.

This mirrors the CloudEvents `data`/`data_base64` duality the
reference round-trips without inspecting (SURVEY.md §1.2): the engine
treats content as bytes + metadata; only explicit feature-extraction
steps look inside.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic stub (the `decode` closure in
extract_features) — the Spark-side plumbing (schema, Arrow batch
shape, partitioning, UDF signatures) is real and tested; swapping in
PIL/ffmpeg changes one function.

Scale: binary payloads stay columnar in parquet; mapInPandas streams
Arrow record batches, so executor memory is bounded by batch size
(`spark.sql.execution.arrow.maxRecordsPerBatch`), not partition size.
Feature extraction is embarrassingly parallel — no shuffle until the
final (tiny) aggregate."""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hematite_spark.io import load_table
from hematite_spark.schema import MULTIMODAL_SCHEMA


def assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a multimodal asset table from the documents testdata:
    text payloads become binary content with typed metadata — the
    ingest shape a real pipeline gets from `spark.read.format
    ("binaryFile")` or an object-store manifest."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("text/plain").alias("mime_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("bigint").alias("duration_ms"),
        F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")).alias("meta"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_std", T.DoubleType()),
        T.StructField("decoded_width", T.IntegerType()),
        T.StructField("decoded_height", T.IntegerType()),
    ]
)


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary content — the
    canonical multimodal hot path. One Python worker per core,
    Arrow-batched both directions."""

    # NB: the closure is self-contained (no references to this
    # module's globals) so cloudpickle ships it by value and Python
    # workers don't need hematite_spark on their PYTHONPATH.
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        def decode(content: bytes, modality: str) -> dict:
            # STUB decode: deterministic pseudo-features from the payload
            # hash; PIL/torchcodec/ffmpeg drop in here on a real deployment
            if content is None:
                raise NotImplementedError(f"no decoder for empty {modality} payload")
            digest = _hl.sha256(content).digest()
            return {
                "feat_mean": digest[0] / 255.0,
                "feat_std": digest[1] / 255.0,
                "decoded_width": 16 + digest[2] % 64,
                "decoded_height": 16 + digest[3] % 64,
            }

        for pdf in batches:
            feats = [decode(c, m) for c, m in zip(pdf["content"], pdf["modality"])]
            out = _pd.DataFrame(feats)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            out.insert(1, "modality", pdf["modality"].values)
            out.insert(2, "n_bytes", [len(c) for c in pdf["content"]])
            out.insert(3, "sha256", [_hl.sha256(c).hexdigest() for c in pdf["content"]])
            yield out

    return assets.mapInPandas(extract, schema=FEATURE_SCHEMA)


def resize_images(assets: DataFrame, max_dim: int = 224) -> DataFrame:
    """Image-resize pipeline stage (STUB transform: passthrough bytes +
    updated metadata). Signature and batch shape match a real resize;
    the byte transform is where PIL would run."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["width"] = pdf["width"].fillna(max_dim).clip(upper=max_dim).astype("int32")
            pdf["height"] = pdf["height"].fillna(max_dim).clip(upper=max_dim).astype("int32")
            yield pdf

    return assets.mapInPandas(resize, schema=assets.schema)


def frame_sample_stub(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling stage: explodes each video asset into
    frame rows (asset_id, frame_idx, frame_ts_ms, content). Stubbed
    frame bytes; real decoder drops in at the marked line."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                duration = row.duration_ms or 0
                for idx, ts in enumerate(range(0, int(duration), every_ms)):
                    # real impl: ffmpeg seek+decode here
                    rows.append((row.asset_id, idx, ts, bytes([idx % 256])))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_ts_ms", "content"])

    return assets.where(F.col("modality") == "video").mapInPandas(sample, schema=schema)


def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable slice of the multimodal path: binary payload
    metadata aggregation (bytes, distinct hashes) per source —
    everything JVM-side (encode/md5/length are built-ins)."""
    assets = assets_from_documents(spark, sf_dir)
    return (
        assets.select(
            F.element_at("meta", "source").alias("source"),
            F.length("content").cast("bigint").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("content_md5").alias("n_unique"),
        )
        .orderBy("source")
    )


MULTIMODAL_STATS_SQL = """
SELECT source,
       count(*) AS n_assets,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
       count(DISTINCT md5(text)) AS n_unique
FROM documents
GROUP BY source
ORDER BY source
"""
# strlen = BYTE length (UTF-8), matching Spark's length(encode(text,
# 'UTF-8')); DuckDB's length() counts characters and diverges on any
# non-ASCII text.


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pandas-UDF feature pipeline as a catalog query. The stub
    features are sha256-derived, and DuckDB implements sha256 — so
    even the Python-side decode path is value-checked end-to-end: the
    oracle recomputes feat_mean (first digest byte / 255) from the
    hex digest with strpos arithmetic."""
    feats = extract_features(assets_from_documents(spark, sf_dir))
    return (
        feats.groupBy("modality")
        .agg(
            F.count("*").alias("n_assets"),
            F.round(F.avg("feat_mean"), 6).alias("avg_feat_mean"),
            F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
        )
        .orderBy("modality")
    )


MULTIMODAL_FEATURES_SQL = """
SELECT 'text' AS modality, count(*) AS n_assets,
       round(avg(((strpos('0123456789abcdef', sha256(text)[1]) - 1) * 16
                + (strpos('0123456789abcdef', sha256(text)[2]) - 1)) / 255.0), 6)
         AS avg_feat_mean,
       round(avg(strlen(text)), 4) AS avg_bytes
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling as a catalog query: every 10th document
    plays a video asset (duration_ms := n_chars, deterministic), the
    mapInPandas sampler explodes it into frames at 200 ms intervals,
    and the result reports frames per asset. The frame COUNTS follow
    from arithmetic (ceil(duration/interval)), so the pandas-UDF
    pipeline — batching, explode shape, schema — is value-checked by
    the DuckDB oracle even though the frame bytes are stubbed."""
    docs = load_table(spark, "documents", sf_dir)
    assets = docs.where((F.col("doc_id") % 10 == 0) & (F.col("n_chars") > 0)).select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("modality"),
        F.lit(None).cast("binary").alias("content"),
        F.lit("video/mp4").alias("mime_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.col("n_chars").cast("bigint").alias("duration_ms"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    frames = frame_sample_stub(assets, every_ms=200)
    return (
        frames.groupBy("asset_id")
        .agg(F.count("*").alias("n_frames"), F.max("frame_ts_ms").alias("last_ts"))
        .orderBy("asset_id")
    )


MULTIMODAL_FRAMES_SQL = """
SELECT doc_id AS asset_id,
       CAST(ceil(n_chars / 200.0) AS BIGINT) AS n_frames,
       CAST((ceil(n_chars / 200.0) - 1) * 200 AS BIGINT) AS last_ts
FROM documents
WHERE doc_id % 10 = 0 AND n_chars > 0
ORDER BY asset_id
"""


def multimodal_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup over the binary asset table — byte-level
    sha256 grouping, the first gate of every media pipeline (identical
    files re-crawled under different ids) and the multimodal sibling
    of dedup_exact's normalized-text hash. Emits the duplicate payload
    groups with a deterministic keeper (min asset id) and the bytes
    reclaimable by keeping one copy.

    One hash aggregate on the digest; content bytes never shuffle —
    only the 32-byte digest does (the reason content-addressed
    storage scales). The digest doubles as the content-addressed
    storage key at 100 TB.

    The testdata corpus has no byte-identical documents, so the query
    simulates the failure mode it guards against: a re-crawl that
    re-ingests every 10th asset under a fresh id. The dedup must
    recover exactly those pairs — making the output a checkable
    contract rather than an empty report."""
    base = assets_from_documents(spark, sf_dir)
    recrawl = base.where(F.col("asset_id") % 10 == 0).withColumn(
        "asset_id", F.col("asset_id") + 1_000_000
    )
    assets = base.unionByName(recrawl)
    return (
        assets.select(
            F.sha2(F.col("content"), 256).alias("sha256"),
            F.length(F.col("content")).cast("bigint").alias("n_bytes"),
            "asset_id",
        )
        .groupBy("sha256")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("asset_id").alias("keeper_id"),
            (F.max("n_bytes") * (F.count("*") - 1)).alias("reclaimable_bytes"),
        )
        .where(F.col("n_copies") > 1)
        .select(
            F.substring("sha256", 1, 16).alias("sha_prefix"),
            "n_copies",
            "keeper_id",
            "reclaimable_bytes",
        )
        .orderBy("sha_prefix")
    )


CONTENT_DEDUP_SQL = """
WITH assets AS (
  SELECT doc_id AS asset_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS asset_id, text FROM documents WHERE doc_id % 10 = 0)
SELECT substr(sha256, 1, 16) AS sha_prefix, n_copies, keeper_id, reclaimable_bytes
FROM (
  SELECT sha256(text) AS sha256,
         count(*) AS n_copies,
         min(asset_id) AS keeper_id,
         CAST(max(strlen(text)) * (count(*) - 1) AS BIGINT) AS reclaimable_bytes
  FROM assets
  GROUP BY sha256(text))
WHERE n_copies > 1
ORDER BY sha_prefix
"""


def multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest for the binary asset table: within each
    source, assets are laid out in doc_id order and assigned to shards
    by OFFSET BINNING — shard_ix = floor(start_offset / 16 KiB) — the
    deterministic shard plan a webdataset/tar-shard writer consumes.
    Offset binning is one window expression (no sequential accumulator),
    which is exactly why it scales; the trade is that an asset whose
    payload spans a 16 KiB boundary stays in the shard where it STARTS,
    so that shard's fill_ratio exceeds 1 and the next shard starts
    short. This is NOT next-fit packing (a true next-fit accumulator
    resets at each cut and only the trailing shard may be under-full);
    writers that need hard shard-size caps should treat fill_ratio > 1
    rows as spill markers.

    100 TB: the cumulative sum is a SOURCE-partitioned window (the
    shard layout is per-source by design — shards never straddle a
    source, which is what keeps mixture weighting per-shard exact),
    so no global sort exists; output is one row per shard."""
    from pyspark.sql import Window as W

    shard_bytes = 16 * 1024
    assets = assets_from_documents(spark, sf_dir).select(
        "asset_id",
        F.element_at(F.col("meta"), F.lit("source")).alias("source"),
        F.length("content").cast("bigint").alias("n_bytes"),
    )
    wsrc = (
        W.partitionBy("source")
        .orderBy("asset_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = assets.withColumn(
        "shard_ix",
        F.floor((F.sum("n_bytes").over(wsrc) - F.col("n_bytes")) / shard_bytes).cast("int"),
    )
    return (
        cum.groupBy("source", "shard_ix")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_assets"),
            F.sum("n_bytes").alias("shard_bytes"),
            F.round(F.sum("n_bytes") / F.lit(float(shard_bytes)), 6).alias("fill_ratio"),
        )
        .orderBy("source", "shard_ix")
    )


SHARD_MANIFEST_SQL = """
WITH assets AS (
  SELECT doc_id AS asset_id, source,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents),
cum AS (
  SELECT source, asset_id, n_bytes,
         CAST(floor((sum(n_bytes) OVER (PARTITION BY source ORDER BY asset_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_bytes) / 16384.0) AS INT) AS shard_ix
  FROM assets)
SELECT source, shard_ix,
       CAST(count(*) AS BIGINT) AS n_assets,
       CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
       round(sum(n_bytes) / 16384.0, 6) AS fill_ratio
FROM cum
GROUP BY source, shard_ix
ORDER BY source, shard_ix
"""


_NEXTFIT_SCHEMA = (
    "source string, shard_ix int, n_assets bigint, "
    "shard_bytes bigint, fill_ratio double"
)


def shard_manifest_nextfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True NEXT-FIT shard manifest — the hard-cap twin of
    multimodal_shard_manifest (VERDICT r7 item 8): within each source,
    assets in doc_id order fill the current shard until the next asset
    would overflow the 16 KiB cap, then the shard is CLOSED and a new
    one starts. Unlike offset binning, no shard exceeds the cap unless
    a single asset is itself oversized (it then sits alone in its own
    shard — the only fill_ratio > 1 rows this layout can emit).

    100 TB: a running accumulator that resets at every cut has no
    window-function form, so this is the same bounded applyInPandas
    pattern as pack_sequences (packing.py): only (asset_id, n_bytes)
    crosses into Python — ~16 bytes per asset — grouped by source, and
    the pandas function returns one row PER SHARD, not per asset, so
    the Arrow traffic back is the manifest itself. Sources are
    independent groups (shards never straddle a source), which is also
    the parallelism unit; a source with more assets than fit in one
    task's memory would be pre-split on the offset-binned shard_ix of
    the cheap twin and packed per split."""
    import pandas as pd

    shard_bytes = 16 * 1024
    assets = assets_from_documents(spark, sf_dir).select(
        "asset_id",
        F.element_at(F.col("meta"), F.lit("source")).alias("source"),
        F.length("content").cast("bigint").alias("n_bytes"),
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("asset_id")
        shard_ix, fill, out = 0, 0, []
        for n in pdf["n_bytes"].tolist():
            if fill > 0 and fill + n > shard_bytes:
                shard_ix, fill = shard_ix + 1, 0
            fill += n
            out.append(shard_ix)
        pdf = pdf.assign(shard_ix=out)
        g = pdf.groupby("shard_ix", as_index=False).agg(
            source=("source", "first"),
            n_assets=("n_bytes", "size"),
            shard_bytes=("n_bytes", "sum"),
        )
        g["fill_ratio"] = (g["shard_bytes"] / float(shard_bytes)).round(6)
        return g[["source", "shard_ix", "n_assets", "shard_bytes", "fill_ratio"]]

    return (
        assets.groupBy("source")
        .applyInPandas(pack, _NEXTFIT_SCHEMA)
        .orderBy("source", "shard_ix")
    )


SHARD_NEXTFIT_SQL = """
WITH RECURSIVE assets AS (
  SELECT doc_id AS asset_id, source,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents),
pack AS (
  SELECT source, rn, n_bytes, 0 AS shard_ix, n_bytes AS fill
  FROM assets WHERE rn = 1
  UNION ALL
  SELECT a.source, a.rn, a.n_bytes,
         CASE WHEN p.fill + a.n_bytes > 16384 THEN p.shard_ix + 1 ELSE p.shard_ix END,
         CASE WHEN p.fill + a.n_bytes > 16384 THEN a.n_bytes ELSE p.fill + a.n_bytes END
  FROM pack p JOIN assets a ON a.source = p.source AND a.rn = p.rn + 1)
SELECT source, CAST(shard_ix AS INT) AS shard_ix,
       CAST(count(*) AS BIGINT) AS n_assets,
       CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
       round(sum(n_bytes) / 16384.0, 6) AS fill_ratio
FROM pack
GROUP BY source, shard_ix
ORDER BY source, shard_ix
"""
