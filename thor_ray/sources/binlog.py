"""Binlog tail source — the FileStreamSource analogue (SURVEY.md §2.1 S2).

An "epoch" is a bounded lsn slice of the sharded change-event log
(micro-batch tail). Reads are predicate-pushed: shard files are
mostly-lsn-sorted (bounded shuffle window), so Parquet row-group statistics
prune most of the file for a given lsn range — the tail never rescans the
whole log. DDL events are tiny and read driver-side (they are broadcast to
every partition's applier, SURVEY.md §7 "cross-partition DDL consistency").
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data


def shard_files(binlog_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(binlog_dir, "shard-*.parquet")))


def max_lsn(binlog_dir: str) -> int:
    """Max lsn across shards, from Parquet row-group stats (no data read)."""
    hi = 0
    for p in shard_files(binlog_dir):
        md = pq.read_metadata(p)
        idx = md.schema.names.index("lsn")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                hi = max(hi, st.max)
    return hi


def shard_frontiers(binlog_dir: str) -> dict[str, int]:
    """Max lsn per shard (files grouped by the shard-XXXX name prefix)."""
    out: dict[str, int] = {}
    for p in shard_files(binlog_dir):
        shard = os.path.basename(p)[:10]  # "shard-XXXX"
        md = pq.read_metadata(p)
        idx = md.schema.names.index("lsn")
        hi = out.get(shard, 0)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                hi = max(hi, st.max)
        out[shard] = hi
    return out


def expected_shards(binlog_dir: str) -> list[str] | None:
    """The declared shard set, from the writer's `_shards.json` marker.

    Without it, a shard whose first segment hasn't been delivered yet is
    invisible to shard_frontiers — the frontier min would skip it and
    commit watermarks past its future lower-lsn events (ADVICE round 1)."""
    p = os.path.join(binlog_dir, "_shards.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)["shards"]
    return None


def safe_frontier(binlog_dir: str, slack: int = 0,
                  expected: list[str] | None = None) -> int:
    """Highest lsn safe to commit past while the log may still grow: the
    slowest shard's max lsn minus a skew allowance. Committing beyond it
    would advance watermarks past events a lagging shard hasn't delivered
    (SURVEY.md §2.9 W2/W3). While any declared shard (the `_shards.json`
    marker, or `expected`) has no data yet, the frontier is 0."""
    fr = shard_frontiers(binlog_dir)
    exp = expected if expected is not None else expected_shards(binlog_dir)
    if exp is not None and any(s not in fr for s in exp):
        return 0
    return max(min(fr.values(), default=0) - slack, 0)


def read_epoch(binlog_dir: str, lo: int, hi: int,
               override_num_blocks: int | None = None,
               columns: list[str] | None = None) -> "ray.data.Dataset":
    """Data events (op != DDL) with lsn in (lo, hi] as a streaming Dataset.

    `columns` prunes at the read (the apply path doesn't need txn/ts/ddl —
    don't decode or shuffle them)."""
    files = shard_files(binlog_dir)
    if not files:
        from thor_ray.gen import EVENT_SCHEMA
        sel = columns or EVENT_SCHEMA.names
        return ray.data.from_arrow(EVENT_SCHEMA.empty_table().select(sel))
    flt = (pc.field("lsn") > lo) & (pc.field("lsn") <= hi) & (pc.field("op") != "DDL")
    kw = {}
    if override_num_blocks:
        kw["override_num_blocks"] = override_num_blocks
    if columns:
        kw["columns"] = columns
    return ray.data.read_parquet(files, filter=flt, **kw)


def read_ddl_events(binlog_dir: str, lo: int, hi: int) -> list[dict]:
    """Driver-side read of DDL events in (lo, hi], lsn-ordered, deduped.

    Returns [{"lsn", "schema_ver", "ddl": {...}}, ...]; tiny by contract
    (DDL is rare — SURVEY.md §2.3 A3)."""
    files = shard_files(binlog_dir)
    if not files:
        return []
    ds = pads.dataset(files)
    t = ds.to_table(
        columns=["lsn", "schema_ver", "ddl"],
        filter=(pc.field("lsn") > lo) & (pc.field("lsn") <= hi)
        & (pc.field("op") == "DDL"),
    )
    rows = sorted(
        {r["lsn"]: r for r in t.to_pylist()}.values(), key=lambda r: r["lsn"]
    )
    return [
        {"lsn": r["lsn"], "schema_ver": r["schema_ver"], "ddl": json.loads(r["ddl"])}
        for r in rows
    ]
