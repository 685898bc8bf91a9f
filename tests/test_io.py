"""NDJSON wire-format parity: store → export → re-ingest round-trip
(the reference's events.ndjson encode/decode cycle, db.rs:205-210,
262-267, exercised through the distributed export path)."""

import json

from hematite_spark.io import events_to_ndjson_lines, read_cloudevents_ndjson, write_cloudevents_ndjson
from tests.conftest import minimal_event


def _full_event(i: int) -> dict:
    return {
        "specversion": "1.0",
        "id": f"ev-{i}",
        "source": "https://example.test/src",
        "type": "test.full",
        "subject": f"sub-{i}",
        "datacontenttype": "application/json",
        "time": "2024-06-01T12:00:00Z",
        "data": {"i": i, "nested": {"ok": True}, "arr": [1, 2, 3]},
        "traceid": f"trace-{i}",  # extension attribute
    }


def test_ndjson_lines_are_valid_cloudevents(store, spark):
    store.append("u1", "s1", [_full_event(i) for i in range(5)])
    lines = [r.line for r in events_to_ndjson_lines(store.read_df("u1", "s1")).collect()]
    assert len(lines) == 5
    parsed = sorted((json.loads(l) for l in lines), key=lambda e: e["id"])
    ev = parsed[3]
    assert ev["specversion"] == "1.0"
    assert ev["id"] == "ev-3"
    assert ev["data"] == {"i": 3, "nested": {"ok": True}, "arr": [1, 2, 3]}
    assert ev["traceid"] == "trace-3"  # extension hoisted to top level
    assert ev["time"].startswith("2024-06-01T12:00:00")
    # null optional attrs are absent, not null (wire form)
    store.append("u1", "s2", minimal_event("m-1"))
    (line,) = [r.line for r in events_to_ndjson_lines(store.read_df("u1", "s2")).collect()]
    minimal = json.loads(line)
    assert "subject" not in minimal and "data" not in minimal and "time" not in minimal


def test_ndjson_export_reingest_roundtrip(store, spark, tmp_path):
    store.append("u1", "s1", [_full_event(i) for i in range(10)])
    out = str(tmp_path / "export")
    write_cloudevents_ndjson(store.read_df("u1", "s1"), out)
    back = read_cloudevents_ndjson(spark, out)
    rows = {r.id: r for r in back.collect()}
    assert len(rows) == 10
    assert rows["ev-7"].source == "https://example.test/src"
    assert json.loads(rows["ev-7"].data) == {"i": 7, "nested": {"ok": True}, "arr": [1, 2, 3]}
    assert rows["ev-7"].subject == "sub-7"


def test_ndjson_reingest_preserves_extensions(store, spark, tmp_path):
    """Wire extensions are top-level attributes; re-ingest must fold
    them back into the extensions map, not drop them."""
    store.append("u1", "s1", [_full_event(i) for i in range(3)])
    out = str(tmp_path / "export")
    write_cloudevents_ndjson(store.read_df("u1", "s1"), out)
    back = {r.id: r for r in read_cloudevents_ndjson(spark, out).collect()}
    # extension values land in the STORE encoding (JSON literals), so
    # scalar types survive and a re-export splices them verbatim —
    # the same encoding EventStore.append writes (json.dumps per value)
    assert back["ev-1"].extensions["traceid"] == '"trace-1"'
    # microsecond time precision survives the wire
    assert back["ev-1"].time.isoformat().startswith("2024-06-01T12:00:00")
    # a re-ingested frame re-EXPORTS to byte-identical valid JSON —
    # the encoding-asymmetry regression (string extensions used to
    # splice unquoted, producing invalid lines)
    from hematite_spark.io import events_to_ndjson_lines

    first = sorted(r.line for r in events_to_ndjson_lines(store.read_df("u1", "s1")).collect())
    again = sorted(
        r.line for r in events_to_ndjson_lines(read_cloudevents_ndjson(spark, out)).collect()
    )
    for line in again:
        json.loads(line)  # every re-exported line is valid JSON
    assert [json.loads(l) for l in first] == [json.loads(l) for l in again]


def test_data_base64_roundtrip_and_export(store, spark, tmp_path):
    """Binary payloads keep their data_base64 identity through store,
    read, and wire export (regression: base64 used to be stored in
    `data` and crashed every read with a JSON decode error)."""
    ev = {"specversion": "1.0", "id": "bin-1", "source": "t", "type": "x",
          "data_base64": "AAECAwQ=", "datacontenttype": "application/octet-stream"}
    store.append("u1", "bin", ev)
    got = store.get_event("u1", "bin", 0)
    assert got["data_base64"] == "AAECAwQ=" and "data" not in got
    out = str(tmp_path / "export")
    write_cloudevents_ndjson(store.read_df("u1", "bin"), out)
    (line,) = [r.line for r in spark.read.text(out).where("length(value)>0").selectExpr("value AS line").collect()]
    parsed = json.loads(line)
    assert parsed["data_base64"] == "AAECAwQ=" and "data" not in parsed


def test_bucketed_tables_join_without_shuffle(spark):
    """write_bucketed_table is the 100 TB fact-fact join strategy:
    both sides bucketed on the key join with NO shuffle exchange —
    Catalyst reads the co-partitioning from the catalog."""
    import os as _os

    from hematite_spark.io import write_bucketed_table

    # per-process table names: the warehouse dir is host-shared, so
    # fixed names would let concurrent runs read/drop each other's
    # tables mid-test
    ta, tb = f"bt_a_{_os.getpid()}", f"bt_b_{_os.getpid()}"
    a = spark.range(1000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(1000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed_table(a, ta, "k", n_buckets=4, sort_col="k")
    write_bucketed_table(b, tb, "k", n_buckets=4, sort_col="k")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(ta).join(spark.table(tb), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(" not in plan  # no shuffle exchange
        rows = joined.selectExpr("sum(va + vb) AS s").collect()
        assert rows[0].s == sum(2 * i + 3 * i for i in range(1000))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_events_lake_layout_prunes_partitions(spark, tmp_path):
    """The 100 TB lake layout: date+bucket hive partitioning must
    (a) round-trip every row, (b) prune at the listing level for
    date+tenant predicates — the plan carries PartitionFilters and
    scans a subset of files."""
    from pyspark.sql import functions as F

    from hematite_spark.io import load_table, write_events_lake
    from tests.conftest import SF_DIR

    ev = load_table(spark, "events", SF_DIR)
    out = str(tmp_path / "lake")
    write_events_lake(ev, out, n_user_buckets=8)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()

    one_user = back.where(
        (F.col("user_id") == 7)
        & (F.col("user_bucket") == F.pmod(F.hash(F.lit(7).cast("bigint")), F.lit(8)))
    )
    plan_buf = one_user._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan_buf
    assert one_user.count() == ev.where(F.col("user_id") == 7).count()


def test_extension_scalar_types_roundtrip(store):
    """Integer/bool extension values keep their types through the
    store (JSON-literal encoding) instead of degrading to strings."""
    ev = {"specversion": "1.0", "id": "x-1", "source": "t", "type": "x",
          "count": 5, "flag": True, "label": "plain"}
    store.append("u1", "s", ev)
    got = store.get_event("u1", "s", 0)
    assert got["count"] == 5 and got["flag"] is True and got["label"] == "plain"


def test_write_training_shards_reproducible_and_ordered(spark, tmp_path):
    """The sharded-shuffle write path: same seed → identical shard
    membership and intra-shard order across runs; files are laid out
    one directory per shard; ranks ascend within each shard file."""
    from pyspark.sql import functions as F

    from hematite_spark.io import load_table, write_training_shards

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").select("doc_id", "n_chars")
    m1 = write_training_shards(docs, str(tmp_path / "s1"), n_shards=4).collect()
    m2 = write_training_shards(docs, str(tmp_path / "s2"), n_shards=4).collect()
    assert [r.asDict() for r in m1] == [r.asDict() for r in m2]  # seed-stable
    assert sum(r.n_rows for r in m1) == docs.count()  # every doc exactly once
    assert {r.shard for r in m1} == set(range(4))
    back = spark.read.parquet(str(tmp_path / "s1"))
    # intra-shard training order materialized: ranks ascend in file order
    for shard in range(4):
        ranks = [r.rank for r in back.where(F.col("shard") == shard).collect()]
        assert ranks == sorted(ranks)
    # a different seed is a genuinely different permutation
    m3 = write_training_shards(docs, str(tmp_path / "s3"), n_shards=4, seed="other").collect()
    assert [r.asDict() for r in m3] != [r.asDict() for r in m1]


def test_csv_roundtrip_typed(spark, tmp_path):
    """Events slice -> CSV with header -> typed re-ingest: values
    survive, no corrupt rows; a malformed row lands in _corrupt
    instead of failing the job."""
    from hematite_spark.io import load_table, read_csv_typed

    ev = (
        load_table(spark, "events", "/root/testdata/sf0.001")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(200)
    )
    dst = str(tmp_path / "ev_csv")
    ev.coalesce(1).write.option("header", "true").csv(dst)
    back = read_csv_typed(
        spark, dst, "event_id bigint, user_id bigint, event_type string, value double"
    )
    # Spark disallows queries that prune down to ONLY the corrupt
    # column on a raw CSV scan — materialize rows, then inspect
    back_rows = back.orderBy("event_id").collect()
    assert all(r._corrupt is None for r in back_rows)
    a = [tuple(r) for r in ev.collect()]
    b = [tuple(r)[:-1] for r in back_rows]
    assert a == b
    # malformed delivery: a row with a non-numeric id is rescued, not fatal
    bad = str(tmp_path / "bad_csv")
    import os
    os.makedirs(bad)
    with open(bad + "/d.csv", "w") as f:
        f.write("event_id,user_id,event_type,value\nnot_a_number,1,click,2.0\n7,2,view,1.5\n")
    rb = read_csv_typed(
        spark, bad, "event_id bigint, user_id bigint, event_type string, value double"
    )
    rows = {r.event_id: r for r in rb.collect()}
    assert rows[7]._corrupt is None and rows[7].event_type == "view"
    assert None in rows and rows[None]._corrupt is not None


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Files written before a column existed read as NULL for it under
    mergeSchema; the shared columns stay typed."""
    from hematite_spark.io import read_parquet_evolving

    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, name string").write.parquet(base + "/f1")
    spark.createDataFrame(
        [(2, "b", 0.9)], "id bigint, name string, quality double"
    ).write.parquet(base + "/f2")
    df = read_parquet_evolving(spark, base + "/f*")
    assert set(df.columns) == {"id", "name", "quality"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].quality is None and abs(rows[2].quality - 0.9) < 1e-12


def test_table_bytes_missing_path_raises(tmp_path):
    """ADVICE r8: a wrong sf_dir must fail loudly, not size shuffle
    widths from a silent 0-byte estimate."""
    import pytest

    from hematite_spark.io import table_bytes

    with pytest.raises(FileNotFoundError, match="lineitem"):
        table_bytes("lineitem", str(tmp_path / "no_such_sf_dir"))
    # real table still measures
    assert table_bytes("lineitem", "/root/testdata/sf0.001") > 0


def test_default_driver_memory_clamped():
    """ADVICE r8: the driver-heap default derives from host RAM with a
    [4g, 32g] clamp so smaller hosts still boot a JVM."""
    from hematite_spark.session import _default_driver_memory

    val = _default_driver_memory()
    assert val.endswith("g")
    assert 1 <= int(val[:-1]) <= 32


def test_default_driver_memory_half_ram_cap(monkeypatch):
    """ADVICE r9: the 4g floor must not exceed ~half of physical RAM —
    on a 5 GiB host the old hard floor could OOM the JVM at start."""
    import os as _os

    from hematite_spark import session

    def fake_sysconf(name, _gib={"SC_PAGE_SIZE": 4096}):
        if name == "SC_PAGE_SIZE":
            return 4096
        if name == "SC_PHYS_PAGES":
            return fake_sysconf.pages
        raise ValueError(name)

    monkeypatch.setattr(session.os, "sysconf", fake_sysconf)
    for total_gib, expected in [(5, "2g"), (3, "1g"), (16, "4g"), (128, "32g"), (64, "16g")]:
        fake_sysconf.pages = total_gib * (1 << 30) // 4096
        assert session._default_driver_memory() == expected, total_gib
