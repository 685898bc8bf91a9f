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
