from .manifest import (Manifest, archive_manifest, gc_lake, load_manifests,
                       load_manifests_at, prune_history, snapshot_epochs,
                       write_manifest)
from .registry import SchemaRegistry

__all__ = ["Manifest", "load_manifests", "write_manifest", "gc_lake",
           "archive_manifest", "load_manifests_at", "prune_history",
           "snapshot_epochs", "SchemaRegistry"]
