from hematite_spark.store.store import (
    EventStore,
    ExpectedRevision,
    InvalidEvent,
    RevisionMismatch,
    StoreError,
    StreamNotFound,
    EmptyAppend,
    SourceIdConflict,
)

__all__ = [
    "EventStore",
    "ExpectedRevision",
    "InvalidEvent",
    "RevisionMismatch",
    "StoreError",
    "StreamNotFound",
    "EmptyAppend",
    "SourceIdConflict",
]
