from .manifest import (FencedWriterError, Manifest, acquire_writer_gen,
                       archive_manifest, create_tag, current_writer_gen,
                       delete_tag, gc_lake, list_tags, load_manifests,
                       record_restore, restore_count,
                       load_manifests_at, prune_history, read_snapshot_meta,
                       snapshot_active, snapshot_epochs, write_manifest,
                       write_snapshot_meta)
from .registry import SchemaRegistry

__all__ = ["Manifest", "load_manifests", "write_manifest", "gc_lake",
           "archive_manifest", "load_manifests_at", "prune_history",
           "snapshot_epochs", "SchemaRegistry", "FencedWriterError",
           "acquire_writer_gen", "current_writer_gen",
           "read_snapshot_meta", "write_snapshot_meta", "snapshot_active",
           "create_tag", "delete_tag", "list_tags",
           "record_restore", "restore_count"]
