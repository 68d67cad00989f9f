from .manifest import Manifest, load_manifests, write_manifest, gc_lake
from .registry import SchemaRegistry

__all__ = ["Manifest", "load_manifests", "write_manifest", "gc_lake", "SchemaRegistry"]
