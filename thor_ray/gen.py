"""Deterministic synthetic fixtures: base lake table + change-event binlog.

Schemas per FIXTURES.md §1–2 (which implement BASELINE.json:15's input_hint
``(repo, path, commit, lang, content)`` and the CDC event contract of
BASELINE.json:6: at-least-once delivery with injected duplicates, bounded
out-of-order skew, mid-stream DDL schema evolution).

All generation is seeded (numpy Generator); no wall clock, no global state.
Duplicated events keep their original ``lsn`` (at-least-once re-delivery of
the *same* record, Kafka semantics — SURVEY.md §2.9 W4), so exactly-once is
achieved downstream by dropping repeated ``lsn``s.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["py", "java", "go", "rs", "ts", "c", "md"]

_EPOCH_TS_US = 1_600_000_000_000_000  # fixed base timestamp (us), no wall clock

BASE_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),  # 64-bit offsets: a fixture slice can exceed 2 GB of text
    ]
)

EVENT_SCHEMA = pa.schema(
    [
        ("lsn", pa.int64()),
        ("txn", pa.int64()),
        ("op", pa.string()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
        ("extra", pa.large_string()),
        ("ddl", pa.string()),
        ("ts", pa.timestamp("us")),
        ("schema_ver", pa.int32()),
        ("shard", pa.int32()),
    ]
)


def _text_pool(seed: int, size: int = 1 << 20) -> str:
    """A deterministic ASCII pool; contents are cheap slices of it."""
    rng = np.random.default_rng(seed ^ 0x9E3779B9)
    # printable ASCII, whitespace-rich so it looks like source text
    alphabet = np.frombuffer(
        b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        b" ._()=+-*/{}[]<>:;#\n    ",
        dtype=np.uint8,
    )
    return rng.choice(alphabet, size=size).tobytes().decode("ascii")


def _hex40(vals: np.ndarray) -> list[str]:
    """Deterministic 40-char lowercase hex 'commit' ids from int64 values."""
    return [f"{(int(v) * 0x9E3779B97F4A7C15) & ((1 << 160) - 1):040x}" for v in vals]


def gen_base_table(
    n_repos: int = 200,
    paths_per_repo: int = 50,
    seed: int = 42,
    content_len: tuple[int, int] = (64, 2048),
) -> pa.Table:
    """Base lake table: unique PK (repo, path); FIXTURES.md §1."""
    rng = np.random.default_rng(seed)
    pool = _text_pool(seed)
    n = n_repos * paths_per_repo
    repo_idx = np.repeat(np.arange(n_repos), paths_per_repo)
    path_idx = np.tile(np.arange(paths_per_repo), n_repos)
    repos = [f"org{i % 37}/project{i}" for i in range(n_repos)]
    exts = rng.integers(0, len(LANGS), size=n)
    lo, hi = content_len
    # zipf-ish lengths clipped to [lo, hi]
    lens = np.clip((rng.pareto(1.5, size=n) * lo + lo).astype(np.int64), lo, hi)
    offs = rng.integers(0, len(pool) - hi - 1, size=n)
    repo_col = [repos[i] for i in repo_idx]
    path_col = [
        f"src/pkg{p % 13}/mod{p % 7}/file{p}.{LANGS[e]}"
        for p, e in zip(path_idx, exts)
    ]
    content = [
        f"// {r}/{p} v0\n{pool[o : o + l]}"
        for r, p, o, l in zip(repo_col, path_col, offs, lens)
    ]
    return pa.table(
        {
            "repo": repo_col,
            "path": path_col,
            "commit": _hex40(rng.integers(1, 1 << 62, size=n)),
            "lang": [LANGS[e] for e in exts],
            "content": content,
        },
        schema=BASE_SCHEMA,
    )


@dataclass
class BinlogConfig:
    """Knobs per FIXTURES.md §2; all defaults are the small-scale test tier."""

    n_events: int = 100_000
    n_shards: int = 8
    dup_rate: float = 0.05
    shuffle_window: int = 512
    ddl_every: int = 25_000          # 0 disables DDL injection
    ddl_drops: bool = False          # include drop_column in the DDL cycle
    ddl_widens: bool = False         # include alter_type (int64→double) widening
    ddl_defaults: bool = False       # every other add_column carries a DEFAULT
                                     # (existing rows backfill at fold time)
    delete_rate: float = 0.05
    update_rate: float = 0.60        # remainder after delete/ddl = inserts
    new_key_rate: float = 0.30       # fraction of I events that mint a new key
    corrupt_rate: float = 0.0        # fraction of malformed events (DLQ fodder)
    content_len: tuple[int, int] = (64, 512)
    seed: int = 42
    # "full": a U event carries the whole row image. "patch": a U event
    # carries ONLY a subset of {commit, lang, content} plus a subset of the
    # evolved columns in `extra` (null / absent = unchanged) — the
    # Debezium/Hudi partial-image wire shape (CdcConfig.update_mode).
    update_mode: str = "full"
    # Key-skew knobs (round-4 verdict #4): `hot_frac` of key-bearing
    # events target the FIRST base repo's keys (a hot tenant), and of
    # those, `hot_key_frac` hit that repo's FIRST path (one hottest
    # (repo, path) key). Defaults 0.0 keep every existing fixture
    # byte-identical (the skew draws are taken after all other draws).
    hot_frac: float = 0.0
    hot_key_frac: float = 0.0


@dataclass
class Binlog:
    shards: list[pa.Table]
    config: BinlogConfig
    n_ddl: int
    max_lsn: int
    evolved_schema: list[str] = field(default_factory=list)

    def write(self, out_dir: str, row_group_size: int = 16 * 1024) -> list[str]:
        """Small row groups matter: the epoch tail prunes by lsn via
        row-group statistics — one giant group per shard would force every
        epoch to decode the whole shard (measured 2-3× epoch slowdown)."""
        os.makedirs(out_dir, exist_ok=True)
        self._write_shard_marker(out_dir)
        paths = []
        for i, t in enumerate(self.shards):
            p = os.path.join(out_dir, f"shard-{i:04d}.parquet")
            pq.write_table(t, p, row_group_size=row_group_size)
            paths.append(p)
        return paths

    def write_jsonl(self, out_dir: str, gzip: bool = False) -> list[str]:
        """JSONL shard files (`shard-NNNN.jsonl[.gz]`) — the
        Kafka-Connect-style JSON wire tier of the same log (`gzip=True`
        writes the compressed wire real log shippers emit); `ts`
        serialized as epoch-µs int64 (JSON has no timestamp type). Same
        lsn/frontier contract as the parquet tier (thor_ray.sources.binlog
        reads all tiers)."""
        os.makedirs(out_dir, exist_ok=True)
        self._write_shard_marker(out_dir)
        paths = []
        ext = "jsonl.gz" if gzip else "jsonl"
        for i, t in enumerate(self.shards):
            p = os.path.join(out_dir, f"shard-{i:04d}.{ext}")
            df = t.to_pandas()
            df["ts"] = df["ts"].astype("int64")  # datetime64[us] -> µs
            df.to_json(p, orient="records", lines=True,
                       compression="gzip" if gzip else None)
            paths.append(p)
        return paths

    def write_csv(self, out_dir: str) -> list[str]:
        """CSV shard files (`shard-NNNN.csv`) — the StringConverter wire
        tier; same field layout as the JSONL tier (ts as epoch-µs int64)."""
        import pyarrow.csv as pacsv

        os.makedirs(out_dir, exist_ok=True)
        self._write_shard_marker(out_dir)
        paths = []
        for i, t in enumerate(self.shards):
            p = os.path.join(out_dir, f"shard-{i:04d}.csv")
            t2 = t.set_column(t.schema.get_field_index("ts"), "ts",
                              t["ts"].cast(pa.int64()))
            pacsv.write_csv(t2, p)
            paths.append(p)
        return paths

    def write_envelope(self, out_dir: str) -> list[str]:
        """Debezium change-event envelope shard files
        (`shard-NNNN.envelope.jsonl`) — the full JsonConverter wire: each
        line is ``{"key": <key json>, "value": <envelope json>}`` with
        the row image under ``after`` (null for deletes), op c/u/d, and
        ALL log-position metadata (lsn/txn/shard/schema_ver/ts_us) under
        ``source`` so deletes keep their position. DDL events ride the
        same wire as op='ddl' lines with the statement in a top-level
        ``ddl`` field (the schema-change-message shape). Ingest path:
        ``sources.binlog.envelope_to_binlog`` converts the wire to the
        parquet tier losslessly."""
        import pyarrow.compute as pc

        from thor_ray.stages.envelope import to_change_envelope

        os.makedirs(out_dir, exist_ok=True)
        self._write_shard_marker(out_dir)
        env = to_change_envelope(
            key_cols=["repo", "path"],
            payload_cols=["repo", "path", "commit", "lang", "content",
                          "extra"],
            op_col="op", ts_col="ts",
            source_cols=["lsn", "txn", "shard", "schema_ver", "ts_us"],
            source_name="binlog")
        paths = []
        for i, t in enumerate(self.shards):
            t2 = t.append_column("ts_us", pc.cast(t["ts"], pa.int64()))
            is_ddl = pc.equal(pc.fill_null(t2["op"], ""), "DDL")
            data = env(t2.filter(pc.invert(is_ddl)))
            lines = [json.dumps({"key": k, "value": v})
                     for k, v in zip(data["key"].to_pylist(),
                                     data["value"].to_pylist())]
            for r in t2.filter(is_ddl).to_pylist():
                val = {"before": None, "after": None, "op": "ddl",
                       "ts_ms": (r["ts_us"] // 1000
                                 if r["ts_us"] is not None else None),
                       "source": {"name": "binlog", "lsn": r["lsn"],
                                  "txn": r["txn"], "shard": r["shard"],
                                  "schema_ver": r["schema_ver"],
                                  "ts_us": r["ts_us"]},
                       "ddl": r["ddl"]}
                lines.append(json.dumps({"key": None,
                                         "value": json.dumps(val)}))
            p = os.path.join(out_dir, f"shard-{i:04d}.envelope.jsonl")
            with open(p, "w") as f:
                f.write("\n".join(lines) + ("\n" if lines else ""))
            paths.append(p)
        return paths

    def _write_shard_marker(self, out_dir: str) -> None:
        """Declare the expected shard set BEFORE any data lands, so the
        reader's safe_frontier never commits past a shard whose first
        segment hasn't been delivered yet (thor_ray.sources.binlog)."""
        p = os.path.join(out_dir, "_shards.json")
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            # only shards that will actually deliver data — an empty shard
            # would pin the frontier at 0 forever. update_mode travels so
            # key compaction can refuse partial-image (patch) logs, which
            # it would silently corrupt (compact_binlog_keys).
            json.dump({"shards": [f"shard-{i:04d}"
                                  for i, t in enumerate(self.shards)
                                  if t.num_rows > 0],
                       "update_mode": self.config.update_mode}, f)
        os.replace(tmp, p)

    def write_segments(self, out_dir: str, n_segments: int,
                       first: int = 0, last: int | None = None,
                       row_group_size: int = 16 * 1024) -> list[str]:
        """Write segment files [first, last) of an n_segments split per
        shard — simulates a GROWING log for tail/follow tests (Kafka
        segment-roll analogue). Segment files match the shard-*.parquet
        glob the tail source reads."""
        os.makedirs(out_dir, exist_ok=True)
        self._write_shard_marker(out_dir)
        last = n_segments if last is None else last
        paths = []
        for i, t in enumerate(self.shards):
            seg_len = (t.num_rows + n_segments - 1) // max(n_segments, 1)
            for s in range(first, last):
                seg = t.slice(s * seg_len, seg_len)
                if seg.num_rows == 0:
                    continue
                p = os.path.join(out_dir, f"shard-{i:04d}-s{s:03d}.parquet")
                pq.write_table(seg, p, row_group_size=row_group_size)
                paths.append(p)
        return paths


def _ddl_timeline(n_events: int, ddl_every: int, drops: bool = False,
                  widens: bool = False,
                  defaults: bool = False) -> list[tuple[int, dict]]:
    """Positions (1-based lsn) and payloads of DDL events, deterministic.

    Alternates add_column / rename_column (renames only once a column
    exists); with ``drops`` the cycle gains drop_column (drops only while
    ≥2 columns exist, so a rename victim always remains); with ``widens``
    it gains alter_type, widening the oldest still-int64 column to double
    (adds alternate string/int64 types so a widening victim exists).
    Column names are never reused — a dropped name stays dead."""
    if not ddl_every:
        return []
    out: list[tuple[int, dict]] = []
    cols: list[str] = []
    tys: dict[str, str] = {}
    ncycle = 2 + int(drops) + int(widens)
    widen_phase = 2 if widens else -1
    drop_phase = (3 if widens else 2) if drops else -1
    k = 0

    def add() -> None:
        name = f"c{k}"
        ty = "int64" if (widens and k % 2 == 0) else "string"
        d = {"action": "add_column", "name": name, "type": ty}
        if defaults and k % 2 == 0:
            # MySQL ALTER ADD COLUMN DEFAULT semantics: rows existing at
            # the DDL fold backfill the default (later events unchanged)
            d["default"] = 7 if ty == "int64" else f"dflt_{name}"
        out.append((pos, d))
        cols.append(name)
        tys[name] = ty

    for pos in range(ddl_every, n_events + 1, ddl_every):
        phase = k % ncycle
        int_cols = [c for c in cols if tys[c] == "int64"]
        if phase == drop_phase and len(cols) >= 2:
            victim = cols[k // ncycle % len(cols)]
            out.append((pos, {"action": "drop_column", "name": victim}))
            cols.remove(victim)
            tys.pop(victim)
        elif phase == widen_phase and int_cols:
            victim = int_cols[0]
            out.append((pos, {"action": "alter_type", "name": victim,
                              "new_type": "double"}))
            tys[victim] = "double"
        elif cols and phase == 1:
            victim = cols[k // 2 % len(cols)]
            new = f"{victim}_r{k}"
            out.append((pos, {"action": "rename_column", "name": victim, "new_name": new}))
            cols[cols.index(victim)] = new
            tys[new] = tys.pop(victim)
        else:
            add()
        k += 1
    return out


def columns_at_version(ddls: list[dict], version: int) -> list[str]:
    """Evolved column names after applying the first `version` DDLs."""
    cols: list[str] = []
    for d in ddls[:version]:
        if d["action"] == "add_column":
            cols.append(d["name"])
        elif d["action"] == "drop_column":
            cols.remove(d["name"])
        elif d["action"] == "rename_column":
            cols[cols.index(d["name"])] = d["new_name"]
        # alter_type changes no names
    return cols


def gen_binlog(base: pa.Table, cfg: BinlogConfig) -> Binlog:
    """Generate the sharded change-event log over (and beyond) base's keys.

    True global order = lsn order. Events are then sharded by key hash
    (Kafka partition-by-key analogue), duplicates injected, and each shard
    file shuffled within a bounded window (FIXTURES.md §2 knobs).
    """
    rng = np.random.default_rng(cfg.seed + 1)
    pool = _text_pool(cfg.seed + 2)
    n = cfg.n_events

    base_repo = base.column("repo").to_pylist()
    base_path = base.column("path").to_pylist()
    key_repo: list[str] = list(base_repo)
    key_path: list[str] = list(base_path)

    ddl_at = dict(_ddl_timeline(n, cfg.ddl_every, drops=cfg.ddl_drops,
                                widens=cfg.ddl_widens,
                                defaults=cfg.ddl_defaults))
    ddls = [ddl_at[p] for p in sorted(ddl_at)]

    # pre-draw randomness in bulk
    op_draw = rng.random(n)
    corrupt_draw = rng.random(n)
    newkey_draw = rng.random(n)
    key_draw = rng.random(n)
    lang_draw = rng.integers(0, len(LANGS), size=n)
    lo, hi = cfg.content_len
    len_draw = np.clip((rng.pareto(1.5, size=n) * lo + lo).astype(np.int64), lo, hi)
    off_draw = rng.integers(0, len(pool) - hi - 1, size=n)
    commit_ints = rng.integers(1, 1 << 62, size=n)
    txn_step = rng.random(n) < 0.4  # ~2.5 events per txn
    # patch mode: which base columns (3 bits, never zero) / evolved columns
    # (bit j → evolved[j]) a partial U sets
    patch_bits = rng.integers(1, 8, size=n)
    patch_evbits = rng.integers(0, 1 << 62, size=n)
    # skew draws come from a SEPARATE generator so the main rng stream —
    # and therefore every hot_frac=0 fixture, including the cached bench
    # fixture — stays byte-identical at the same seed
    skew_rng = np.random.default_rng(cfg.seed + 7)
    hot_draw = skew_rng.random(n)
    hotkey_draw = skew_rng.random(n)
    # the hot tenant = the base table's first repo (gen_base_table lays
    # repos out contiguously, so its keys are the leading rows)
    n_hot = 1
    while n_hot < len(base_repo) and base_repo[n_hot] == base_repo[0]:
        n_hot += 1

    cols: dict[str, list] = {k: [] for k in (
        "lsn", "txn", "op", "repo", "path", "commit", "lang",
        "content", "extra", "ddl", "ts", "schema_ver", "shard")}
    ap = {k: cols[k].append for k in cols}

    ver = 0
    evolved: list[str] = []
    etypes: dict[str, str] = {}

    def _eval(c: str, lsn: int):
        """Typed evolved value at the event's schema version: string cols
        carry "col:lsn", int64 cols the lsn, widened (double) cols lsn+0.5
        — a FRACTIONAL value, so an engine that silently truncates to the
        pre-widen int type cannot match the oracle."""
        t = etypes[c]
        if t == "string":
            return f"{c}:{lsn}"
        if t == "int64":
            return int(lsn)
        return lsn + 0.5

    txn = 0
    new_key_counter = 0
    d_thresh = cfg.delete_rate
    u_thresh = cfg.delete_rate + cfg.update_rate

    for i in range(n):
        lsn = i + 1
        if txn_step[i]:
            txn += 1
        ts = _EPOCH_TS_US + lsn * 1000
        ddl = ddl_at.get(lsn)
        if ddl is not None:
            ap["lsn"](lsn); ap["txn"](txn); ap["op"]("DDL")
            ap["repo"](None); ap["path"](None); ap["commit"](None)
            ap["lang"](None); ap["content"](None); ap["extra"](None)
            ap["ddl"](json.dumps(ddl, sort_keys=True))
            ap["ts"](ts); ap["schema_ver"](ver); ap["shard"](0)
            if ddl["action"] == "add_column":
                evolved.append(ddl["name"])
                etypes[ddl["name"]] = ddl.get("type", "string")
            elif ddl["action"] == "drop_column":
                evolved.remove(ddl["name"])
                etypes.pop(ddl["name"])
            elif ddl["action"] == "rename_column":
                evolved[evolved.index(ddl["name"])] = ddl["new_name"]
                etypes[ddl["new_name"]] = etypes.pop(ddl["name"])
            elif ddl["action"] == "alter_type":
                etypes[ddl["name"]] = ddl["new_type"]
            ver += 1
            continue
        d = op_draw[i]
        if cfg.corrupt_rate and corrupt_draw[i] < cfg.corrupt_rate:
            # malformed event: unknown op / null key / null payload — must
            # land in the dead-letter queue, not the lake (SURVEY.md §2.1 S5)
            kind = int(corrupt_draw[i] / cfg.corrupt_rate * 3)
            ts = _EPOCH_TS_US + lsn * 1000
            if kind == 0:     # unknown op
                ap["lsn"](lsn); ap["op"]("X"); ap["repo"]("bad/repo"); ap["path"]("p")
                ap["commit"](None); ap["lang"](None); ap["content"]("x")
            elif kind == 1:   # null key
                ap["lsn"](lsn); ap["op"]("I"); ap["repo"](None); ap["path"](None)
                ap["commit"]("c"); ap["lang"]("py"); ap["content"]("x")
            else:             # full image with null content (patch mode: a
                              # null-content U is LEGAL, so corrupt an I)
                bad_op = "I" if cfg.update_mode == "patch" else "U"
                ap["lsn"](lsn); ap["op"](bad_op); ap["repo"]("bad/repo"); ap["path"]("p")
                ap["commit"]("c"); ap["lang"]("py"); ap["content"](None)
            ap["txn"](txn); ap["extra"]("{}"); ap["ddl"](None); ap["ts"](ts)
            ap["schema_ver"](ver); ap["shard"](int(lsn) % cfg.n_shards)
            continue
        if d < d_thresh:
            op = "D"
        elif d < u_thresh:
            op = "U"
        else:
            op = "I"
        if op == "I" and newkey_draw[i] < cfg.new_key_rate:
            new_key_counter += 1
            repo = f"org{new_key_counter % 53}/newproj{new_key_counter % 211}"
            path = f"gen/dir{new_key_counter % 17}/f{new_key_counter}.{LANGS[lang_draw[i]]}"
            key_repo.append(repo)
            key_path.append(path)
        elif cfg.hot_frac and hot_draw[i] < cfg.hot_frac:
            # skewed tier: hot tenant (first base repo), optionally one
            # hottest key within it
            j = 0 if hotkey_draw[i] < cfg.hot_key_frac \
                else int(key_draw[i] * n_hot)
            repo, path = key_repo[j], key_path[j]
        else:
            j = int(key_draw[i] * len(key_repo))
            repo, path = key_repo[j], key_path[j]
        ap["lsn"](lsn); ap["txn"](txn); ap["op"](op)
        ap["repo"](repo); ap["path"](path)
        is_patch = op == "U" and cfg.update_mode == "patch"
        if op == "D":
            ap["commit"](None); ap["lang"](None); ap["content"](None)
        elif is_patch:
            # partial image: null = unchanged; bits guarantee ≥1 base col set
            b = int(patch_bits[i])
            o, ln = off_draw[i], len_draw[i]
            ap["commit"](
                f"{(int(commit_ints[i]) * 0x9E3779B97F4A7C15) & ((1 << 160) - 1):040x}"
                if b & 1 else None)
            ap["lang"](LANGS[lang_draw[i]] if b & 2 else None)
            ap["content"](f"// {repo}/{path}@{lsn}\n{pool[o : o + ln]}"
                          if b & 4 else None)
        else:
            ap["commit"](f"{(int(commit_ints[i]) * 0x9E3779B97F4A7C15) & ((1 << 160) - 1):040x}")
            ap["lang"](LANGS[lang_draw[i]])
            o, ln = off_draw[i], len_draw[i]
            ap["content"](f"// {repo}/{path}@{lsn}\n{pool[o : o + ln]}")
        # evolved values at this event's schema version: full replacement
        # (I, and U in full mode) or the patched subset only (patch U)
        if is_patch:
            ev_set = [c for j, c in enumerate(evolved)
                      if (int(patch_evbits[i]) >> j) & 1]
        else:
            ev_set = evolved
        ap["extra"](
            json.dumps({c: _eval(c, lsn) for c in ev_set}, sort_keys=True)
            if ev_set else "{}"
        )
        ap["ddl"](None); ap["ts"](ts); ap["schema_ver"](ver)
        ap["shard"](_key_shard(repo, path, cfg.n_shards))

    tbl = pa.table({k: pa.array(v, type=EVENT_SCHEMA.field(k).type) for k, v in cols.items()},
                   schema=EVENT_SCHEMA)

    shards = _shard_tables(tbl, cfg, rng)
    return Binlog(shards=shards, config=cfg, n_ddl=ver, max_lsn=n, evolved_schema=evolved)


def _key_shard(repo: str, path: str, n_shards: int) -> int:
    # stable, python-hash-independent
    h = 2166136261
    for ch in (repo + "\x00" + path).encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return h % n_shards


def _shard_tables(tbl: pa.Table, cfg: BinlogConfig, rng: np.random.Generator) -> list[pa.Table]:
    """Split by shard, inject duplicates, bounded-window shuffle each shard."""
    shard_col = tbl.column("shard").to_numpy()
    out = []
    for s in range(cfg.n_shards):
        idx = np.nonzero(shard_col == s)[0]
        m = len(idx)
        if m == 0:
            out.append(tbl.slice(0, 0))
            continue
        # duplicates: re-emit a sample of rows (same lsn), displaced forward
        n_dup = int(m * cfg.dup_rate)
        if n_dup:
            # DDL events are never duplicated (FIXTURES.md §2); they live in
            # shard 0 — exclude by op check
            ops = tbl.column("op").take(pa.array(idx)).to_pylist()
            data_pos = np.array([k for k, o in enumerate(ops) if o != "DDL"])
            pick = rng.choice(data_pos, size=min(n_dup, len(data_pos)), replace=False)
            dup_offsets = rng.integers(1, max(2, cfg.shuffle_window), size=len(pick))
            order = np.concatenate([np.arange(m).astype(np.float64),
                                    pick + dup_offsets + 0.5])
            rows = np.concatenate([idx, idx[pick]])
        else:
            order = np.arange(m).astype(np.float64)
            rows = idx
        # bounded-window shuffle: jitter each position by < window/2, DDL pinned
        if cfg.shuffle_window > 1:
            jitter = rng.uniform(0, cfg.shuffle_window / 2, size=len(order))
            if s == 0 and cfg.ddl_every:
                ops_all = tbl.column("op").take(pa.array(rows)).to_pylist()
                jitter[np.array([o == "DDL" for o in ops_all])] = 0.0
            order = order + jitter
        out.append(tbl.take(pa.array(rows[np.argsort(order, kind="stable")])))
    return out


def write_fixture(
    out_dir: str,
    n_keys: int = 10_000,
    cfg: BinlogConfig | None = None,
    seed: int = 42,
) -> dict:
    """Materialize base.parquet + binlog/shard-*.parquet under out_dir.

    Returns a manifest dict (paths + config) and is a no-op if the fixture
    already exists (marker file carries the config hash).
    """
    cfg = cfg or BinlogConfig(seed=seed)
    n_repos = max(1, n_keys // 50)
    knobs = {k: str(v) for k, v in vars(cfg).items()}
    if cfg.hot_frac == 0.0:
        # skew-off output is byte-identical to pre-knob fixtures (the
        # skew draws use a separate rng AND the hot tier is gated on
        # hot_frac alone — hot_key_frac is inert without it), so the
        # key must not change — keeps the cached 32M scaling fixture
        # valid across rounds
        knobs.pop("hot_frac")
        knobs.pop("hot_key_frac")
    key = json.dumps(
        {"n_keys": n_keys, "seed": seed, "fmt": 3, **knobs},
        sort_keys=True,
    )
    marker = os.path.join(out_dir, "_FIXTURE_OK")
    base_path = os.path.join(out_dir, "base.parquet")
    binlog_dir = os.path.join(out_dir, "binlog")
    if os.path.exists(marker) and open(marker).read() == key:
        return {"base": base_path, "binlog_dir": binlog_dir, "cached": True}
    # config changed: clear the whole dir — stale shard files from the old
    # config would be picked up by the binlog glob and corrupt the stream
    if os.path.exists(out_dir):
        import shutil
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    base = gen_base_table(n_repos=n_repos, paths_per_repo=max(1, n_keys // n_repos), seed=seed)
    pq.write_table(base, base_path, row_group_size=64 * 1024)
    log = gen_binlog(base, cfg)
    log.write(binlog_dir)
    with open(marker, "w") as f:
        f.write(key)
    return {"base": base_path, "binlog_dir": binlog_dir, "cached": False,
            "max_lsn": log.max_lsn, "n_ddl": log.n_ddl}
