from hematite_spark.store.store import (
    EventStore,
    ExpectedRevision,
    RevisionMismatch,
    StreamNotFound,
    EmptyAppend,
    SourceIdConflict,
)

__all__ = [
    "EventStore",
    "ExpectedRevision",
    "RevisionMismatch",
    "StreamNotFound",
    "EmptyAppend",
    "SourceIdConflict",
]
