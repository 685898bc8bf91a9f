"""Property-based store tests (hypothesis) — beyond the reference's
example-based suite (SURVEY.md §5): the append/read/OCC invariants
must hold for arbitrary payloads, stream names, and batch shapes.

These drive only the OLTP paths (pyarrow-backed), so no SparkSession
is needed — EventStore takes None and the Spark read paths are
covered by tests/test_store.py.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from hematite_spark.store import EventStore, ExpectedRevision, RevisionMismatch

# JSON-safe scalars/trees for the CloudEvents `data` payload
_json = st.recursive(
    st.none() | st.booleans() | st.integers(-(2**31), 2**31) | st.text(max_size=20),
    lambda children: st.lists(children, max_size=3)
    | st.dictionaries(st.text(min_size=1, max_size=8), children, max_size=3),
    max_leaves=8,
)

_ids = st.text(min_size=1, max_size=30).filter(lambda s: s.strip())


def _events(n: int, data_list):
    return [
        {
            "specversion": "1.0",
            "id": f"ev-{i}",
            "source": "prop://test",
            "type": "prop.event",
            "data": data_list[i % len(data_list)] if data_list else None,
        }
        for i in range(n)
    ]


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.lists(_json, min_size=1, max_size=4), n=st.integers(1, 20))
def test_roundtrip_arbitrary_payloads(tmp_path_factory, data, n):
    store = EventStore(None, str(tmp_path_factory.mktemp("prop")))
    store.append("u", "s", _events(n, data))
    back = store.query("u", "s", 0, 1000)
    assert len(back) == n
    for i, ev in enumerate(back):
        assert ev["_revision"] == i
        assert ev["id"] == f"ev-{i}"
        expected = data[i % len(data)]
        if expected is None:
            assert "data" not in ev
        else:
            # JSON round-trip fidelity (reference stores raw JSON lines)
            assert ev["data"] == json.loads(json.dumps(expected))


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(stream_id=_ids, user_id=_ids)
def test_any_stream_and_user_names(tmp_path_factory, stream_id, user_id):
    """Stream/user ids are free-form strings in the reference
    (base32-encoded on disk, server.rs:134-148); ours percent-encode.
    Unicode, slashes, dots, spaces must all round-trip."""
    store = EventStore(None, str(tmp_path_factory.mktemp("prop")))
    store.append(user_id, stream_id, _events(3, [None]))
    assert store.revision(user_id, stream_id) == 3
    assert [s["id"] for s in store.streams(user_id)] == [stream_id]
    assert store.get_event(user_id, stream_id, 2)["id"] == "ev-2"
    assert store.delete_stream(user_id, stream_id) is True


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batch_sizes=st.lists(st.integers(1, 7), min_size=1, max_size=6))
def test_revision_is_gapless_across_batches(tmp_path_factory, batch_sizes):
    """revision = total event count after any sequence of batch
    appends (db.rs:239), and the exact-revision OCC gate accepts the
    running count and rejects everything else."""
    store = EventStore(None, str(tmp_path_factory.mktemp("prop")))
    total = 0
    for k, size in enumerate(batch_sizes):
        batch = [
            {
                "specversion": "1.0",
                "id": f"b{k}-{i}",
                "source": "prop://occ",
                "type": "t",
            }
            for i in range(size)
        ]
        wrong = total + 1
        with pytest.raises(RevisionMismatch):
            store.append("u", "s", batch, ExpectedRevision.exact_at(wrong))
        assert store.append("u", "s", batch, ExpectedRevision.exact_at(total)) == total + size
        total += size
    assert store.revision("u", "s") == total
    revs = [e["_revision"] for e in store.query("u", "s", 0, 1000)]
    assert revs == list(range(total))
