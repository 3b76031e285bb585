"""The lake core: a content-addressed, deduplicating, (convergently)
encrypted blob store — the reference's actual capability (SURVEY.md §0) —
re-expressed as partitioned Parquet datasets + DataFrame pipelines.

reference parity map (SURVEY.md §2A):
  Store.create/open        ↔ A1/A4/A5 (init, load+validate, magic sniff)
  Store.put_blobs routing  ↔ A10–A14 (dedup put, size routing, chunk tree)
  Lake.get / put waterfall ↔ A15–A17 (federated get, write router)
  hkey codec               ↔ Hkey variants (raw/plain/encrypted/tree)
"""

from .hkey import Hkey
from .lake import Lake
from .store import Store

__all__ = ["Hkey", "Lake", "Store"]
