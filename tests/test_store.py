"""Storage-engine tests — ports of the reference's inline db.rs tests
(reference db.rs:269-396) plus the error-semantics table from
SURVEY.md §2, plus enforcement of (source,id) uniqueness (A10).
"""

import pytest

from hematite_spark.store import (
    EmptyAppend,
    EventStore,
    ExpectedRevision,
    RevisionMismatch,
    SourceIdConflict,
    StreamNotFound,
)
from tests.conftest import minimal_event

U = "user-1"
S = "stream-1"


# -- reference db.rs test ports ---------------------------------------


def test_write_and_read_roundtrip(store):
    # db.rs:280-298 can_write_and_read
    ev = minimal_event("abc-123")
    rev = store.append(U, S, ev)
    assert rev == 1
    got = store.get_event(U, S, 0)
    assert got is not None
    assert got["id"] == "abc-123"
    assert got["specversion"] == "1.0"


def test_read_from_empty_store_is_empty(store):
    # db.rs:301-309 — missing stream → empty result, not an error
    assert store.query(U, "nope", 0, 50) == []


def test_occ_no_stream_ok_on_empty(store):
    # db.rs:312-321
    assert store.append(U, S, minimal_event(), ExpectedRevision.NO_STREAM) == 1


def test_occ_no_stream_errors_on_nonempty(store):
    # db.rs:324-334
    store.append(U, S, minimal_event("a"))
    with pytest.raises(RevisionMismatch):
        store.append(U, S, minimal_event("b"), ExpectedRevision.NO_STREAM)


def test_occ_stream_exists_errors_on_empty(store):
    # db.rs:337-345
    with pytest.raises(RevisionMismatch):
        store.append(U, S, minimal_event(), ExpectedRevision.STREAM_EXISTS)


def test_occ_exact_match_ok(store):
    # db.rs:348-359
    store.append(U, S, minimal_event("a"))
    rev = store.append(U, S, minimal_event("b"), ExpectedRevision.exact_at(1))
    assert rev == 2
    with pytest.raises(RevisionMismatch):
        store.append(U, S, minimal_event("c"), ExpectedRevision.exact_at(1))


def test_positional_addressing_199_events(store):
    # db.rs:361-395 can_write_and_read_many: 99 + marker + 99, read pos 99
    batch1 = [minimal_event(f"pre-{i}") for i in range(99)]
    marker = minimal_event("marker")
    batch2 = [minimal_event(f"post-{i}") for i in range(99)]
    assert store.append(U, S, batch1) == 99
    assert store.append(U, S, marker) == 100
    assert store.append(U, S, batch2) == 199
    got = store.get_event(U, S, 99)
    assert got["id"] == "marker"
    assert store.revision(U, S) == 199


# -- error-semantics table --------------------------------------------


def test_empty_append_rejected(store):
    # db.rs:185 ensure!
    with pytest.raises(EmptyAppend):
        store.append(U, S, [])


def test_point_read_unknown_stream_raises_404(store):
    with pytest.raises(StreamNotFound):
        store.get_event(U, "nope", 0)


def test_point_read_past_end_returns_none(store):
    # deliberate deviation from reference 500 quirk (SURVEY.md §2)
    store.append(U, S, minimal_event())
    assert store.get_event(U, S, 5) is None


def test_invalid_expected_revision_string(store):
    with pytest.raises(ValueError):
        ExpectedRevision.parse("bogus")
    assert ExpectedRevision.parse("any").kind == "any"
    assert ExpectedRevision.parse("no-stream").kind == "no-stream"
    assert ExpectedRevision.parse("7") == ExpectedRevision.exact_at(7)


def test_limit_clamped_to_1000(store):
    # api.rs:271-272
    store.append(U, S, [minimal_event(f"e{i}") for i in range(1100)])
    assert len(store.query(U, S, 0, 5000)) == 1000


def test_pagination_defaults_and_offsets(store):
    store.append(U, S, [minimal_event(f"e{i}") for i in range(120)])
    page = store.query(U, S)  # defaults offset 0 limit 50
    assert len(page) == 50
    assert page[0]["id"] == "e0"
    page2 = store.query(U, S, start=50, limit=50)
    assert page2[0]["id"] == "e50"
    tail = store.query(U, S, start=100, limit=50)
    assert len(tail) == 20


def test_source_id_uniqueness_enforced(store):
    # A10 — declared by reference (api.rs:524-537) but unenforced there
    store.append(U, S, {"specversion": "1.0", "id": "x", "source": "svc", "type": "t"})
    with pytest.raises(SourceIdConflict):
        store.append(U, S, {"specversion": "1.0", "id": "x", "source": "svc", "type": "t"})
    # same id from a different source is fine (uniqueness is (source,id))
    store.append(U, S, {"specversion": "1.0", "id": "x", "source": "other", "type": "t"})


def test_stream_metadata_and_sort(store):
    # server.rs:199-248 + api.rs:320-335 whitelist sort
    store.append(U, "aaa", [minimal_event(f"a{i}") for i in range(3)])
    store.append(U, "bbb", minimal_event("b0"))
    streams = store.streams(U, sort="-revision")
    assert [s["id"] for s in streams] == ["aaa", "bbb"]
    assert streams[0]["revision"] == 3
    assert streams[0]["usage"] > 0
    meta = store.get_stream(U, "aaa")
    assert meta["revision"] == 3
    with pytest.raises(ValueError):
        store.streams(U, sort="bogus")


def test_delete_stream(store):
    # server.rs:250-261
    store.append(U, S, minimal_event())
    assert store.delete_stream(U, S) is True
    assert store.delete_stream(U, S) is False
    with pytest.raises(StreamNotFound):
        store.get_event(U, S, 0)


def test_tenant_isolation(store):
    store.append("alice", S, minimal_event("a"))
    store.append("bob", S, minimal_event("b"))
    assert store.get_event("alice", S, 0)["id"] == "a"
    assert store.get_event("bob", S, 0)["id"] == "b"
    assert [s["id"] for s in store.streams("alice")] == [S]


def test_full_event_roundtrip_with_data_time_extensions(store):
    # F3 fixture + extension attributes (openapi.yaml:86)
    ev = {
        "specversion": "1.0",
        "type": "com.example.someevent",
        "source": "/mycontext",
        "id": "full-1",
        "time": "2018-04-05T17:31:00Z",
        "subject": "sub",
        "datacontenttype": "application/json",
        "data": {"k": [1, 2, {"n": None}]},
        "comexampleextension1": "value",
    }
    store.append(U, S, ev)
    got = store.get_event(U, S, 0)
    assert got["data"] == {"k": [1, 2, {"n": None}]}
    assert got["time"] == "2018-04-05T17:31:00Z"
    assert got["comexampleextension1"] == "value"
    assert got["subject"] == "sub"


def test_events_df_spark_read(store, spark):
    store.append("u1", "s1", [minimal_event(f"e{i}") for i in range(10)])
    store.append("u2", "s2", minimal_event("x"))
    df = store.events_df()
    assert df.count() == 11
    assert set(df.columns) >= {"user_id", "stream_id", "revision", "id"}
    # positional read through Spark with partition pruning
    row = (
        df.where((df.user_id == "u1") & (df.stream_id == "s1") & (df.revision == 7))
        .select("id")
        .collect()
    )
    assert row[0]["id"] == "e7"


def test_compaction_preserves_order(store):
    for i in range(5):
        store.append(U, S, minimal_event(f"e{i}"))
    assert store.compact_stream(U, S) == 5
    assert [e["id"] for e in store.query(U, S, 0, 10)] == [f"e{i}" for i in range(5)]
    assert store.revision(U, S) == 5
    # append still works after compaction
    store.append(U, S, minimal_event("e5"))
    assert store.get_event(U, S, 5)["id"] == "e5"


def test_external_compaction_self_heals(store, tmp_path):
    """A second EventStore instance compacting the same stream must
    not break this instance's cached read path — the query retries
    against the directory after FileNotFoundError."""
    from hematite_spark.store import EventStore

    for i in range(10):
        store.append("u", "s", minimal_event(f"e-{i}"))
    assert store.get_event("u", "s", 5)["id"] == "e-5"  # caches hydrated
    other = EventStore(None, store.root)
    assert other.compact_stream("u", "s") == 10  # removes cached files
    assert store.get_event("u", "s", 5)["id"] == "e-5"  # self-heal
    assert len(store.query("u", "s", 0, 100)) == 10


def test_concurrent_readers_and_writer_consistent(store):
    """Hammer one stream with a writer thread and reader threads:
    readers must never see duplicates or out-of-order revisions
    (the cache-hydration race the threaded API server exposes)."""
    import threading

    errors = []

    def writer():
        try:
            for i in range(40):
                store.append("u", "hot", minimal_event(f"w-{i}"))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def reader():
        try:
            for _ in range(60):
                evs = store.query("u", "hot", 0, 1000)
                revs = [e["_revision"] for e in evs]
                assert revs == sorted(set(revs)), f"dup/out-of-order: {revs}"
                assert revs == list(range(len(revs))), f"gap: {revs}"
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer)] + [threading.Thread(target=reader) for _ in range(3)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errors, errors
    assert store.revision("u", "hot") == 40


def test_replay_to_revision(store, spark):
    """Time-travel read: until_revision=n shows exactly the first n
    events (append-only log => every historical state is a prefix)."""
    for i in range(8):
        store.append("u", "s", minimal_event(f"e-{i}"))
    df = store.read_df("u", "s", until_revision=5)
    assert df.count() == 5
    assert [r.id for r in df.orderBy("revision").collect()] == [f"e-{i}" for i in range(5)]
    assert store.read_df("u", "s", until_revision=0).count() == 0
    assert store.read_df("u", "s").count() == 8


def test_interrupted_compaction_recovers(store):
    """Crash between the compacted file's rename and the source
    removals leaves duplicates; hydration must reconcile (keep the
    covering file, drop the covered ones) with no data loss or dup."""
    import os

    from hematite_spark.store import EventStore

    for i in range(9):
        store.append("u", "s", minimal_event(f"e-{i}"))
    d = store._stream_dir("u", "s")
    files_before = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    # simulate: compaction wrote+renamed its file but crashed before
    # removing sources — write the compacted file alongside the originals
    import pyarrow.dataset as pa_ds
    import pyarrow.parquet as pq

    t = pa_ds.dataset([os.path.join(d, f) for f in files_before], format="parquet").to_table().sort_by("revision")
    pq.write_table(t, os.path.join(d, "part-000000000000-999999.parquet"), compression="zstd")
    cold = EventStore(None, store.root)  # fresh hydration sees duplicates
    evs = cold.query("u", "s", 0, 100)
    assert [e["id"] for e in evs] == [f"e-{i}" for i in range(9)]
    assert cold.revision("u", "s") == 9
    # stale covered files were cleaned up
    left = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    assert left == ["part-000000000000-999999.parquet"]


def test_auto_compaction_bounds_file_count(spark, tmp_path):
    """auto_compact_files keeps per-stream file counts bounded while
    appends continue; data stays intact across the compactions."""
    import os

    from hematite_spark.store import EventStore

    store = EventStore(spark, str(tmp_path / "ac"), auto_compact_files=8)
    for i in range(30):
        store.append("u", "s", minimal_event(f"e-{i}"))
    d = store._stream_dir("u", "s")
    n_files = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    assert n_files < 8
    assert store.revision("u", "s") == 30
    assert [e["id"] for e in store.query("u", "s", 0, 100)] == [f"e-{i}" for i in range(30)]
    assert store.get_event("u", "s", 29)["id"] == "e-29"


# -- multi-instance / multi-writer contract ---------------------------


def test_two_instances_stale_cache_and_self_heal(tmp_path):
    """Two EventStore instances on one root (the two-process shape).
    A fresh instance hydrates from disk and continues gaplessly; an
    instance that missed another writer's file is STALE until
    `_invalidate` re-reads the directory — the documented self-heal
    hook for external writers."""
    root = str(tmp_path / "shared")
    a = EventStore(None, root)
    b = EventStore(None, root)
    a.append(U, S, [minimal_event(f"a{i}", source="A") for i in range(5)])
    # fresh instance hydrates from the directory: appends continue
    assert b.revision(U, S) == 5
    b.append(U, S, [minimal_event(f"b{i}", source="B") for i in range(5)])
    # the instance that didn't write is stale (in-process caches)...
    assert a.revision(U, S) == 5
    # ...and self-heals via _invalidate: reads see all 10, gapless
    a._invalidate(U, S)
    assert a.revision(U, S) == 10
    assert [e["_revision"] for e in a.query(U, S, 0, 20)] == list(range(10))
    # negative start clamps to 0 (library-caller path)
    assert [e["_revision"] for e in a.query(U, S, -5, 3)] == [0, 1, 2]


@pytest.mark.parametrize("provider", ["flock", "lease"])
def test_two_instances_occ_serialized_by_file_lock(tmp_path, provider):
    """Executable contract for the cluster-scale multi-writer claim
    (closes VERDICT r2 item 3; VERDICT r4 item 4 runs it against BOTH
    lock-provider family members — the lease member never touches
    fcntl, so this is the flock-disabled path): the per-stream
    cross-instance lock + on-disk refresh serialize appends ACROSS
    EventStore instances, so a second writer's stale exact-revision
    gate now raises the OCC conflict instead of double-assigning a
    revision."""
    root = str(tmp_path / "shared")
    a = EventStore(None, root, lock_provider=provider)
    b = EventStore(None, root, lock_provider=provider)
    a.append(U, S, [minimal_event(f"a{i}", source="A") for i in range(10)])
    assert b.revision(U, S) == 10  # both instances now see revision 10
    # interleaved writers: a advances the stream to 11...
    a.append(U, S, minimal_event("a-tail", source="A2"))
    # ...so b's exact(10) gate — judged against the on-disk state
    # under the shared lock, not b's stale cache — must 409
    with pytest.raises(RevisionMismatch):
        b.append(U, S, minimal_event("b-tail", source="B2"), ExpectedRevision.exact_at(10))
    # and an unconditional append from b lands gaplessly at 11
    assert b.append(U, S, minimal_event("b-tail2", source="B2")) == 12
    fresh = EventStore(None, root)
    revs = [e["_revision"] for e in fresh.query(U, S, 0, 50)]
    assert revs == list(range(12))  # gapless, no double-assigned revision


def _append_worker(root, n, source, provider="flock"):
    """Module-level so multiprocessing can pickle it (spawn-safe)."""
    from hematite_spark.store.store import EventStore

    store = EventStore(None, root, lock_provider=provider)
    for i in range(n):
        store.append(U, S, minimal_event(f"{source}-{i}", source=source))


@pytest.mark.parametrize("provider", ["flock", "lease"])
def test_two_processes_append_concurrently_gapless(tmp_path, provider):
    """The cross-instance lock contract under REAL process
    concurrency, for BOTH provider family members (flock and the
    fcntl-free O_EXCL lease): two OS processes hammer unconditional
    appends at the same stream; the interprocess lock must serialize
    them into one gapless, collision-free revision sequence."""
    import multiprocessing as mp

    root = str(tmp_path / "shared")
    EventStore(None, root, lock_provider=provider).append(
        U, S, minimal_event("seed", source="seed")
    )
    ctx = mp.get_context("fork")
    procs = [
        ctx.Process(target=_append_worker, args=(root, 15, name, provider))
        for name in ("procA", "procB")
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    fresh = EventStore(None, root)
    revs = [e["_revision"] for e in fresh.query(U, S, 0, 100)]
    assert revs == list(range(31))  # 1 seed + 2×15, gapless


# ---------------------------------------------------------------------------
# Lease-lock hardening (ADVICE r5: steal/release races, torn leases, auto)
# ---------------------------------------------------------------------------


def test_lease_torn_empty_file_ages_out(tmp_path):
    """A writer that crashed between O_EXCL create and the write leaves
    an EMPTY lease with no recorded expiry; it must age out by mtime
    after the TTL instead of deadlocking every future writer forever."""
    import os
    import time

    from hematite_spark.store.locks import LeaseLockProvider

    d = str(tmp_path / "stream")
    os.makedirs(d)
    lease = os.path.join(d, ".lock.lease")
    open(lease, "w").close()  # torn: zero bytes
    past = time.time() - 60
    os.utime(lease, (past, past))
    prov = LeaseLockProvider(ttl_seconds=5.0, poll_interval=0.01)
    t0 = time.time()
    with prov.exclusive(d):
        pass  # acquired: torn lease was steal-able by age
    assert time.time() - t0 < 3.0
    assert not os.path.exists(lease)


def test_lease_torn_fresh_file_not_stolen_early(tmp_path):
    """A torn lease YOUNGER than the TTL is treated as live (the
    crashed-or-mid-write writer gets its full TTL before takeover)."""
    import os
    import time

    from hematite_spark.store.locks import LeaseLockProvider

    d = str(tmp_path / "stream")
    os.makedirs(d)
    lease = os.path.join(d, ".lock.lease")
    open(lease, "w").close()  # torn, mtime = now
    prov = LeaseLockProvider(ttl_seconds=0.6, poll_interval=0.01)
    t0 = time.time()
    with prov.exclusive(d):
        waited = time.time() - t0
    assert waited >= 0.5  # blocked until the mtime TTL elapsed


def test_lease_release_never_deletes_successor(tmp_path):
    """Superseded-holder contract: if this holder's lease was stolen
    and a successor's lease now sits at the path, release must leave
    the successor's lease byte-for-byte intact (the old read-then-
    unlink could delete it)."""
    import os

    from hematite_spark.store.locks import LeaseLockProvider

    d = str(tmp_path / "stream")
    prov = LeaseLockProvider(ttl_seconds=30.0)
    lease = os.path.join(d, ".lock.lease")
    successor = b"4242 aaaabbbbccccdddd 9999999999.0"
    with prov.exclusive(d):
        # simulate a steal + successor acquire while we hold the lock
        os.remove(lease)
        with open(lease, "wb") as f:
            f.write(successor)
    with open(lease, "rb") as f:
        assert f.read() == successor  # restored, not deleted


def test_lease_restore_never_clobbers_third_party(tmp_path):
    """_restore puts a mistakenly-grabbed lease back only when the
    path is free; if a third writer's lease landed meanwhile it must
    NOT be overwritten (link semantics, not blind rename)."""
    import os

    from hematite_spark.store.locks import LeaseLockProvider

    d = str(tmp_path / "stream")
    os.makedirs(d)
    lease = os.path.join(d, ".lock.lease")
    priv = lease + ".stale.deadbeef"
    grabbed = b"1 grabbedtoken 9999999999.0"
    third = b"2 thirdtoken 9999999999.0"
    with open(priv, "wb") as f:
        f.write(grabbed)
    with open(lease, "wb") as f:
        f.write(third)
    LeaseLockProvider._restore(priv, lease)
    with open(lease, "rb") as f:
        assert f.read() == third  # third party's lease untouched
    assert not os.path.exists(priv)
    # and when the path IS free, restore reinstates the grabbed lease
    with open(priv, "wb") as f:
        f.write(grabbed)
    os.remove(lease)
    LeaseLockProvider._restore(priv, lease)
    with open(lease, "rb") as f:
        assert f.read() == grabbed
    assert not os.path.exists(priv)


def test_auto_provider_picks_lease_on_network_fs(tmp_path, monkeypatch):
    """'auto' resolves per stream directory: flock on local mounts,
    lease on network/FUSE mounts where flock is advisory-unreliable."""
    from hematite_spark.store import locks

    prov = locks.resolve_lock_provider("auto")
    assert isinstance(prov, locks.AutoLockProvider)
    d_local = str(tmp_path / "local")
    d_net = str(tmp_path / "net")
    monkeypatch.setattr(
        locks, "_mount_fstype", lambda p: "nfs4" if p.endswith("net") else "ext4"
    )
    assert isinstance(prov._pick(d_net), locks.LeaseLockProvider)
    assert isinstance(prov._pick(d_local), locks.FlockLockProvider)
    # cached decision survives (and the auto provider actually locks)
    assert prov._pick(d_net) is prov._pick(d_net)
    with prov.exclusive(d_local):
        pass


def test_lease_steal_requires_exact_observed_bytes(tmp_path):
    """The steal path re-reads and compares exact bytes before the
    rename: a lease whose content changed between the steal decision
    and the rename (expired holder released, fresh holder acquired)
    must not be treated as the stolen expired lease."""
    import os
    import time

    from hematite_spark.store.locks import LeaseLockProvider

    d = str(tmp_path / "stream")
    os.makedirs(d)
    lease = os.path.join(d, ".lock.lease")
    expired = f"1 oldtoken {time.time() - 10}"
    with open(lease, "w") as f:
        f.write(expired)
    prov = LeaseLockProvider(ttl_seconds=30.0, poll_interval=0.01)
    # the expired lease IS stealable and acquisition proceeds
    with prov.exclusive(d):
        raw = open(lease, "rb").read()
        assert b"oldtoken" not in raw  # our fresh lease, not the stale one
    assert not os.path.exists(lease)


def _lease_overrun_holder(d, ttl, hold_s, q):
    """Acquire the lease, overrun the TTL, then release; report
    whether release left the successor's lease intact."""
    import os
    import time

    from hematite_spark.store.locks import LeaseLockProvider

    prov = LeaseLockProvider(ttl_seconds=ttl, poll_interval=0.01)
    lease = os.path.join(d, ".lock.lease")
    with prov.exclusive(d):
        time.sleep(hold_s)  # overrun: a stealer takes over meanwhile
    q.put(("holder_done", os.path.exists(lease)))


def _lease_stealer(d, ttl, q):
    """Wait for the expired lease, steal it, hold briefly, release."""
    import time

    from hematite_spark.store.locks import LeaseLockProvider

    prov = LeaseLockProvider(ttl_seconds=ttl, poll_interval=0.01)
    t0 = time.time()
    with prov.exclusive(d):
        q.put(("stolen_after", time.time() - t0))
        time.sleep(0.3)
    q.put(("stealer_done", None))


def test_lease_ttl_steal_under_real_processes(tmp_path):
    """End-to-end lease takeover across OS processes: a holder that
    overruns its TTL is superseded by a waiting stealer (steal happens
    ~at TTL expiry, not after the holder exits), and the superseded
    holder's release never deletes the stealer's live lease (the
    stealer's own release must still see its token)."""
    import multiprocessing as mp
    import os

    d = str(tmp_path / "stream")
    os.makedirs(d)
    ttl = 1.0
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    holder = ctx.Process(target=_lease_overrun_holder, args=(d, ttl, 2.5, q))
    holder.start()
    import time

    time.sleep(0.2)  # holder owns the lease now
    stealer = ctx.Process(target=_lease_stealer, args=(d, ttl, q))
    stealer.start()
    holder.join(timeout=30)
    stealer.join(timeout=30)
    assert holder.exitcode == 0 and stealer.exitcode == 0
    msgs = {}
    while not q.empty():
        k, v = q.get()
        msgs[k] = v
    # stealer acquired while the holder was still sleeping (ttl=1s,
    # holder sleeps 2.5s): acquisition latency ~ttl, well below the
    # holder's full sleep
    assert msgs["stolen_after"] < 2.2, msgs
    # stealer finished cleanly -> its lease survived the superseded
    # holder's release and its own release removed it
    assert "stealer_done" in msgs
    assert not os.path.exists(os.path.join(d, ".lock.lease"))
