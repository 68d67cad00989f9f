"""Versioned schema registry — folds the DDL event stream.

The registry is pure data: an lsn-ordered, lsn-deduped list of entries
``{"lsn", "schema_ver", "ddl"}``; version v means "the first v DDLs
applied" (entry index == schema_ver by the generator's global-order
contract). Keying by lsn makes merging idempotent, so re-running a
committed epoch (crash/restore, BASELINE.json:6 forced checkpoint-restore)
cannot double-apply a DDL. Persisted in the lake (``_schema/registry.json``)
at commit time and broadcast per epoch — never a hot-path actor
(SURVEY.md §2.3 A3: DDL is rare; every partition sees the same sequence, so
cross-partition schema consistency is by construction).
"""

from __future__ import annotations

import json
import os


class SchemaRegistry:
    def __init__(self, entries: list[dict] | None = None):
        dedup = {e["lsn"]: e for e in (entries or [])}
        self.entries: list[dict] = sorted(dedup.values(), key=lambda e: e["lsn"])

    @property
    def ddls(self) -> list[dict]:
        return [e["ddl"] for e in self.entries]

    @property
    def version(self) -> int:
        return len(self.entries)

    def merged(self, new_entries: list[dict]) -> "SchemaRegistry":
        return SchemaRegistry(self.entries + list(new_entries))

    def columns_at(self, version: int) -> list[str]:
        cols: list[str] = []
        for d in self.ddls[:version]:
            if d["action"] == "add_column":
                cols.append(d["name"])
            elif d["action"] == "drop_column":
                cols.remove(d["name"])
            elif d["action"] == "rename_column":
                cols[cols.index(d["name"])] = d["new_name"]
            # alter_type changes no names
        return cols

    def types_at(self, version: int) -> dict[str, str]:
        """Logical type of each evolved column live at `version` —
        "string" | "int64" | "double". add_column carries an optional
        "type" (default string); alter_type WIDENS it in place (values
        written under the old type cast losslessly on the next compact)."""
        tys: dict[str, str] = {}
        for d in self.ddls[:version]:
            if d["action"] == "add_column":
                tys[d["name"]] = d.get("type", "string")
            elif d["action"] == "drop_column":
                tys.pop(d["name"], None)
            elif d["action"] == "rename_column":
                tys[d["new_name"]] = tys.pop(d["name"])
            elif d["action"] == "alter_type":
                tys[d["name"]] = d["new_type"]
        return tys

    def rename_into(self, from_version: int) -> dict[str, str]:
        """Map evolved-column names valid at `from_version` to current names.
        Columns dropped after `from_version` vanish from the mapping — their
        values must be discarded, never resurrected into a later same-named
        column."""
        mapping = {c: c for c in self.columns_at(from_version)}
        for d in self.ddls[from_version:]:
            if d["action"] == "rename_column":
                for k, cur in mapping.items():
                    if cur == d["name"]:
                        mapping[k] = d["new_name"]
            elif d["action"] == "drop_column":
                mapping = {k: cur for k, cur in mapping.items()
                           if cur != d["name"]}
        return mapping

    # --- persistence -----------------------------------------------------
    @staticmethod
    def path(lake_dir: str) -> str:
        return os.path.join(lake_dir, "_schema", "registry.json")

    @staticmethod
    def load(lake_dir: str) -> "SchemaRegistry":
        p = SchemaRegistry.path(lake_dir)
        if not os.path.exists(p):
            return SchemaRegistry()
        with open(p) as f:
            return SchemaRegistry(json.load(f))

    def save(self, lake_dir: str) -> None:
        p = self.path(lake_dir)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.entries, f)
        os.replace(tmp, p)
