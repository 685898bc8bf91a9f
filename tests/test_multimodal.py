"""Multimodal pipeline tests: binary columns, Arrow-batched feature
extraction, resize/frame-sample stage plumbing."""

import hashlib

from pyspark.sql import functions as F

from hematite_spark.queries.multimodal import (
    assets_from_documents,
    extract_features,
    frame_sample_stub,
    resize_images,
)
from hematite_spark.schema import MULTIMODAL_SCHEMA
from tests.conftest import SF_DIR


def test_assets_schema_and_content(spark):
    assets = assets_from_documents(spark, SF_DIR)
    assert [f.name for f in assets.schema.fields] == [f.name for f in MULTIMODAL_SCHEMA.fields]
    row = assets.orderBy("asset_id").first()
    assert isinstance(row.content, (bytes, bytearray))
    assert row.modality == "text"
    assert row.meta["lang"] in ("en", "es", "de", "fr", "zh")


def test_extract_features_deterministic(spark):
    assets = assets_from_documents(spark, SF_DIR)
    feats = extract_features(assets).orderBy("asset_id")
    first = feats.first()
    # recompute the stub feature driver-side: must match exactly
    content = assets.orderBy("asset_id").first().content
    digest = hashlib.sha256(bytes(content)).digest()
    assert first.sha256 == hashlib.sha256(bytes(content)).hexdigest()
    assert abs(first.feat_mean - digest[0] / 255.0) < 1e-12
    assert first.n_bytes == len(content)
    assert feats.count() == assets.count()


def test_resize_stage_passthrough(spark):
    assets = assets_from_documents(spark, SF_DIR)
    resized = resize_images(assets, max_dim=224)
    assert resized.schema == assets.schema
    dims = resized.select("width", "height").distinct().collect()
    assert all(r.width <= 224 and r.height <= 224 for r in dims)


def test_read_binary_assets_source(spark, tmp_path):
    """binaryFile-source ingest: real files land in the multimodal
    asset shape with extension-typed modality/mime, byte-exact
    content, provenance meta, and glob pruning — then flow through
    the pandas-UDF feature extractor unchanged."""
    from hematite_spark.io import read_binary_assets

    (tmp_path / "a.png").write_bytes(b"\x89PNG fake")
    (tmp_path / "b.mp4").write_bytes(b"\x00\x00ftypmp42")
    (tmp_path / "notes.txt").write_text("hello")
    (tmp_path / "blob.bin").write_bytes(b"\x01\x02")

    assets = read_binary_assets(spark, str(tmp_path))
    assert [f.name for f in assets.schema.fields] == [f.name for f in MULTIMODAL_SCHEMA.fields]
    by_path = {r.meta["path"].rsplit("/", 1)[-1]: r for r in assets.collect()}
    assert by_path["a.png"].modality == "image" and by_path["a.png"].mime_type == "image/png"
    assert by_path["b.mp4"].modality == "video"
    assert by_path["notes.txt"].modality == "text"
    assert by_path["blob.bin"].modality == "binary"
    assert bytes(by_path["a.png"].content) == b"\x89PNG fake"
    assert by_path["notes.txt"].meta["size"] == "5"
    # stable ids, no collisions
    assert assets.select("asset_id").distinct().count() == 4
    # glob pruning happens at listing time
    assert read_binary_assets(spark, str(tmp_path), glob="*.png").count() == 1
    # downstream pandas-UDF stage accepts the ingested shape
    feats = {r.sha256 for r in extract_features(assets).collect()}
    assert hashlib.sha256(b"hello").hexdigest() in feats


def test_frame_sampling(spark):
    videos = spark.createDataFrame(
        [(1, "video", b"\x00fake", "video/mp4", None, None, 3500, None)],
        schema=MULTIMODAL_SCHEMA,
    )
    frames = frame_sample_stub(videos, every_ms=1000).collect()
    assert [(f.frame_idx, f.frame_ts_ms) for f in frames] == [(0, 0), (1, 1000), (2, 2000), (3, 3000)]
    # non-video assets produce no frames
    texts = spark.createDataFrame(
        [(2, "text", b"abc", "text/plain", None, None, None, None)], schema=MULTIMODAL_SCHEMA
    )
    assert frame_sample_stub(texts).count() == 0


def test_shard_nextfit_hard_cap_and_oversize(spark, tmp_path):
    """Next-fit packing: multi-asset shards never exceed the 16 KiB
    cap; an oversized asset sits alone in its own shard (the only
    fill_ratio > 1 rows); shard indexes are dense per source. Parity
    with the recursive-CTE DuckDB twin on the same corpus."""
    import duckdb
    import pandas as pd

    from hematite_spark.queries.multimodal import (
        SHARD_NEXTFIT_SQL,
        shard_manifest_nextfit,
    )

    # doc sizes chosen to force cuts: 10k+10k -> cut, 40k oversized
    # alone, then 1k+1k together (ASCII text: 1 char = 1 byte)
    rows = [
        {"doc_id": i, "source": "s1", "lang": "en", "text": "x" * n}
        for i, n in enumerate([10_000, 10_000, 40_000, 1_000, 1_000])
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = shard_manifest_nextfit(spark, str(tmp_path)).collect()
    assert [(r.shard_ix, r.n_assets, r.shard_bytes) for r in out] == [
        (0, 1, 10_000),
        (1, 1, 10_000),
        (2, 1, 40_000),
        (3, 2, 2_000),
    ]
    oversized = [r for r in out if r.fill_ratio > 1.0]
    assert [(r.shard_ix, r.n_assets) for r in oversized] == [(2, 1)]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = con.execute(SHARD_NEXTFIT_SQL).fetchall()
    assert sorted(tuple(r) for r in out) == sorted(tuple(r) for r in oracle)
