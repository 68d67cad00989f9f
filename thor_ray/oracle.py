"""Single-process reference applier — the test oracle (SURVEY.md §5.3).

Deliberately simple: fold all change events in global ``lsn`` order with a
plain dict, dropping repeated ``lsn``s (at-least-once duplicates). No Ray.
Semantics (FIXTURES.md §2 oracle contract):

  I/U  -> upsert the full row by (repo, path); ``extra`` is a *full
          replacement* of every evolved column existing at the event's
          schema version (missing later-added columns become null).
  D    -> delete the key if present (no-op otherwise).
  DDL  -> bump registry: add_column (existing rows -> the DDL's
          default if present, else null),
          rename_column (values carry over under the new name), or
          drop_column (values discarded; a later same-named add starts null).

The engine's distributed apply (thor_ray.pipelines.cdc) must reproduce this
state exactly; tests compare per-row sha256(content) plus full equality on
evolved columns (BASELINE.json:15).
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd
import pyarrow as pa


def apply_events(
    events: pa.Table | pd.DataFrame,
    initial: pa.Table | pd.DataFrame | None = None,
    ddl_policy: str = "none",
    update_mode: str = "full",
) -> tuple[pd.DataFrame, list[dict]]:
    """Fold events (optionally on top of a bootstrap base table);
    returns (final_table, ddl_list).

    final_table columns: repo path commit lang content + evolved columns
    (current names), sorted by (repo, path). ddl_list is the ordered DDL
    payload sequence (the registry timeline, rejected entries included).

    ddl_policy mirrors CdcConfig.ddl_policy ("none" | "additive"): under
    "additive", drop_column / rename_column / narrowing alter_type DDLs
    are skipped (no state effect), and values writers send under the
    rejected evolution (e.g. the new name of a rejected rename) are
    discarded — `extra` keys that don't match a live column never apply.

    update_mode mirrors CdcConfig.update_mode:
      "full"  — a U event is a whole-row replacement (`extra` replaces
                every evolved column at the event's schema version).
      "patch" — a U event is a PARTIAL image (Debezium/Hudi partial
                update): a null commit/lang/content means "unchanged",
                and `extra` carries ONLY the evolved columns being set
                (null values inside `extra` are ignored — a patch can
                never set a column to null). A patch on an absent key
                upserts the provided columns (the rest start null).
                I remains a full replacement; D clears the key, so a
                patch after a delete starts from an empty row. In patch
                mode only I requires content (a U with null content is a
                legal partial image, not a dead-letter event).
    """
    from thor_ray.state.registry import _WIDEN_RANK

    def _rejected(d: dict, tys: dict[str, str]) -> bool:
        if ddl_policy == "none":
            return False
        if ddl_policy != "additive":
            raise ValueError(f"unknown ddl_policy {ddl_policy!r}")
        a = d["action"]
        if a in ("drop_column", "rename_column"):
            return True
        if a == "alter_type":
            old = tys.get(d["name"])
            return old is not None and _WIDEN_RANK.get(d["new_type"], 99) \
                < _WIDEN_RANK.get(old, -1)
        return False
    if isinstance(events, pa.Table):
        df = events.to_pandas()
    else:
        df = events
    df = df.sort_values("lsn", kind="stable").drop_duplicates("lsn", keep="first")

    state: dict[tuple[str, str], dict] = {}
    if initial is not None:
        if isinstance(initial, pa.Table):
            initial = initial.to_pandas()
        for row in initial.itertuples(index=False):
            state[(row.repo, row.path)] = {
                "repo": row.repo, "path": row.path, "commit": row.commit,
                "lang": row.lang, "content": row.content,
            }
    evolved: list[str] = []
    ddls: list[dict] = []
    tys: dict[str, str] = {}

    for row in df.itertuples(index=False):
        if row.op == "DDL":
            d = json.loads(row.ddl)
            ddls.append(d)
            if _rejected(d, tys):
                continue   # slot consumed, no state effect
            if d["action"] == "add_column":
                tys[d["name"]] = d.get("type", "string")
            elif d["action"] == "drop_column":
                tys.pop(d["name"], None)
            elif d["action"] == "rename_column":
                tys[d["new_name"]] = tys.pop(d["name"], "string")
            elif d["action"] == "alter_type":
                tys[d["name"]] = d["new_type"]
            if d["action"] == "add_column":
                evolved.append(d["name"])
                for r in state.values():
                    r[d["name"]] = d.get("default")
            elif d["action"] == "drop_column":
                evolved.remove(d["name"])
                for r in state.values():
                    r.pop(d["name"], None)
            elif d["action"] == "rename_column":
                evolved[evolved.index(d["name"])] = d["new_name"]
                for r in state.values():
                    r[d["new_name"]] = r.pop(d["name"], None)
            elif d["action"] == "alter_type":
                # widening cast: values stored under the narrow type
                # re-read as the wide one (int64 -> double is lossless)
                c = d["name"]
                for r in state.values():
                    if r.get(c) is not None:
                        r[c] = float(r[c])
            continue
        content_required = ("I", "U") if update_mode == "full" else ("I",)
        if row.op not in ("I", "U", "D") or row.repo is None or row.path is None \
                or (row.op in content_required and row.content is None):
            continue  # malformed → dead-letter queue, never applied
        key = (row.repo, row.path)
        if row.op == "D":
            state.pop(key, None)
            continue
        extra = json.loads(row.extra) if row.extra else {}
        if update_mode == "patch" and row.op == "U":
            rec = state.get(key) or {
                "repo": row.repo, "path": row.path, "commit": None,
                "lang": None, "content": None,
                **{c: None for c in evolved}}
            for c in ("commit", "lang", "content"):
                v = getattr(row, c)
                if v is not None:
                    rec[c] = v
            for c in evolved:
                v = extra.get(c)
                if v is not None:
                    rec[c] = v
            state[key] = rec
            continue
        rec = {
            "repo": row.repo,
            "path": row.path,
            "commit": row.commit,
            "lang": row.lang,
            "content": row.content,
        }
        for c in evolved:
            rec[c] = extra.get(c)  # full replacement at this event's version
        state[key] = rec

    cols = ["repo", "path", "commit", "lang", "content"] + evolved
    out = pd.DataFrame(list(state.values()), columns=cols)
    return out.sort_values(["repo", "path"]).reset_index(drop=True), ddls


def content_sha(df: pd.DataFrame) -> pd.Series:
    """Per-row sha256(content) — the BASELINE.json:15 invariant column."""
    return df["content"].map(lambda s: hashlib.sha256(s.encode()).hexdigest())


def table_hash(df: pd.DataFrame) -> str:
    """sha256 over sorted per-row content sha256s (FIXTURES.md §3)."""
    shas = sorted(content_sha(df).tolist())
    return hashlib.sha256("".join(shas).encode()).hexdigest()
