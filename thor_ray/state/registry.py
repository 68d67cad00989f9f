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

# lossless-widening order for alter_type under a compatibility policy:
# int64 -> double -> string only ever moves right
_WIDEN_RANK = {"int64": 0, "double": 1, "string": 2}


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

    def apply_policy(self, new_entries: list[dict],
                     policy: str) -> list[dict]:
        """Compatibility enforcement (the Confluent-schema-registry
        analogue): classify each incoming DDL entry against ``policy``
        and stamp violators with a ``rejected`` reason. A rejected entry
        KEEPS its registry slot — the generator's entry-index ==
        schema_ver contract must hold so later events still decode — but
        its effect is skipped everywhere (columns_at / types_at /
        rename_into), so the timeline behaves as if the DDL never ran.

        policy "none": accept everything (default). policy "additive":
        accept only changes a deployed reader survives — add_column
        (old rows read as null) and widening alter_type; drop_column,
        rename_column and narrowing alter_type are rejected. The
        classification is a pure function of (stored registry, batch,
        policy), so crash/replay re-stamps identically."""
        if policy == "none":
            return list(new_entries)
        if policy != "additive":
            raise ValueError(f"unknown ddl_policy {policy!r}")
        tys = self.types_at(self.version)
        out: list[dict] = []
        for e in sorted(new_entries, key=lambda e: e["lsn"]):
            d = e["ddl"]
            a = d["action"]
            reason = None
            if a == "drop_column":
                reason = "additive policy: drop_column breaks deployed readers"
            elif a == "rename_column":
                reason = "additive policy: rename_column breaks deployed readers"
            elif a == "alter_type":
                old = tys.get(d["name"])
                new = d["new_type"]
                if old is not None and _WIDEN_RANK.get(new, 99) \
                        < _WIDEN_RANK.get(old, -1):
                    reason = f"additive policy: narrowing alter_type {old}->{new}"
            if reason is None:
                if a == "add_column":
                    tys[d["name"]] = d.get("type", "string")
                elif a == "alter_type":
                    tys[d["name"]] = d["new_type"]
                out.append(e)
            else:
                out.append({**e, "rejected": reason})
        return out

    def _effective(self, lo: int = 0, hi: int | None = None) -> list[dict]:
        """DDL payloads in slot order, skipping policy-rejected entries
        (their slots still count toward version numbering)."""
        return [e["ddl"] for e in self.entries[lo:hi]
                if not e.get("rejected")]

    def columns_at(self, version: int) -> list[str]:
        cols: list[str] = []
        for d in self._effective(0, version):
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
        for d in self._effective(0, version):
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
        for d in self._effective(from_version, None):
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
        from thor_ray.state.storage import storage_for

        p = self.path(lake_dir)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        storage_for(p).put_bytes(p, json.dumps(self.entries).encode())
