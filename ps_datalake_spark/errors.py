"""Error taxonomy mirroring the reference's DataLakeError / DataStoreCorrupted
(/root/reference/src/error.rs:4-115) as a Python exception hierarchy."""

from __future__ import annotations


class DataLakeError(Exception):
    """Base error for the lake engine."""


class NotFound(DataLakeError):
    """No chunk with the requested hash (error.rs NotFound analog)."""


class StoreReadOnly(DataLakeError):
    """Write attempted on a readonly store (store/mod.rs:328-330 analog)."""


class StoreOutOfSpace(DataLakeError):
    """Store quota exceeded (error.rs OutOfSpace analog)."""


class OutOfStores(DataLakeError):
    """No writable store accepted the write (lake/mod.rs:70-112 analog)."""


class StoreBusy(DataLakeError):
    """Another writer holds the store's exclusive write lease (analog of the
    reference's DataStoreWriteGuard exclusivity, src/store/atomic.rs:8-57;
    a poisoned/contended lock surfaces as an error there too, error.rs:71-75)."""


class Corrupted(DataLakeError):
    """Store failed load-time validation (error.rs DataStoreCorrupted analog)."""

    def __init__(self, reason: str):
        super().__init__(f"store corrupted: {reason}")
        self.reason = reason


class InvalidHkey(DataLakeError):
    """Hkey string failed to parse."""
