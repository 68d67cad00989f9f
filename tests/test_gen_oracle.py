"""M0 tests: generator determinism + contract, oracle applier sanity."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from thor_ray import gen, oracle


def small_cfg(**kw) -> gen.BinlogConfig:
    base = dict(n_events=5_000, n_shards=4, dup_rate=0.08, shuffle_window=64,
                ddl_every=1_000, delete_rate=0.08, update_rate=0.55, seed=7)
    base.update(kw)
    return gen.BinlogConfig(**base)


def concat_shards(log: gen.Binlog) -> pa.Table:
    return pa.concat_tables(log.shards)


def test_base_table_deterministic_and_unique():
    a = gen.gen_base_table(n_repos=20, paths_per_repo=10, seed=5)
    b = gen.gen_base_table(n_repos=20, paths_per_repo=10, seed=5)
    assert a.equals(b)
    assert a.num_rows == 200
    keys = set(zip(a.column("repo").to_pylist(), a.column("path").to_pylist()))
    assert len(keys) == 200  # PK unique
    assert a.schema.equals(gen.BASE_SCHEMA)


def test_binlog_deterministic():
    base = gen.gen_base_table(n_repos=10, paths_per_repo=10, seed=5)
    l1 = gen.gen_binlog(base, small_cfg())
    l2 = gen.gen_binlog(base, small_cfg())
    for s1, s2 in zip(l1.shards, l2.shards):
        assert s1.equals(s2)


def test_binlog_contract():
    base = gen.gen_base_table(n_repos=10, paths_per_repo=10, seed=5)
    cfg = small_cfg()
    log = gen.gen_binlog(base, cfg)
    t = concat_shards(log)
    assert t.schema.equals(gen.EVENT_SCHEMA)
    lsn = t.column("lsn").to_numpy()
    n_dupes = len(lsn) - len(np.unique(lsn))
    assert n_dupes > 0, "dup_rate>0 must inject duplicates"
    # all true lsns present exactly once after dedup
    assert set(np.unique(lsn)) == set(range(1, cfg.n_events + 1))
    # duplicates are verbatim re-emissions
    df = t.to_pandas()
    per_lsn = df.groupby("lsn").nunique()
    assert (per_lsn.max(axis=1) <= 1).all(), "duplicate lsns must be identical rows"
    # DDL cadence
    ddl = df[df.op == "DDL"]
    assert len(ddl.drop_duplicates("lsn")) == cfg.n_events // cfg.ddl_every
    assert ddl["repo"].isna().all() and ddl["ddl"].notna().all()
    # schema_ver consistent with lsn order
    d = df.drop_duplicates("lsn").sort_values("lsn")
    assert (np.diff(d["schema_ver"].to_numpy()) >= 0).all()
    # D events have null payload
    dels = df[df.op == "D"]
    assert dels["content"].isna().all() and dels["commit"].isna().all()


def test_bounded_skew():
    base = gen.gen_base_table(n_repos=10, paths_per_repo=10, seed=5)
    cfg = small_cfg(dup_rate=0.0)
    log = gen.gen_binlog(base, cfg)
    for shard in log.shards:
        lsn = shard.column("lsn").to_numpy()
        # displacement vs sorted position bounded by ~window
        pos = np.argsort(np.argsort(lsn, kind="stable"), kind="stable")
        disp = np.abs(pos - np.arange(len(lsn)))
        assert disp.max() <= 2 * cfg.shuffle_window


def test_oracle_fold_semantics():
    events = pa.table(
        {
            "lsn": pa.array([1, 2, 3, 4, 5, 6, 7, 3], type=pa.int64()),
            "txn": pa.array([1] * 8, type=pa.int64()),
            "op": ["I", "I", "U", "DDL", "I", "D", "U", "U"],
            "repo": ["r", "r", "r", None, "r", "r", "r", "r"],
            "path": ["a", "b", "a", None, "c", "b", "c", "a"],
            "commit": ["c1", "c2", "c3", None, "c5", None, "c7", "c3"],
            "lang": ["py"] * 3 + [None, "py", None, "py", "py"],
            "content": ["v1", "v2", "v3", None, "v5", None, "v7", "v3"],
            "extra": ["{}", "{}", "{}", None, '{"c0": "x"}', None, '{"c0": "y"}', "{}"],
            "ddl": [None, None, None, '{"action":"add_column","name":"c0","type":"string"}',
                    None, None, None, None],
            "ts": pa.array([gen._EPOCH_TS_US + i for i in range(8)], type=pa.timestamp("us")),
            "schema_ver": pa.array([0, 0, 0, 0, 1, 1, 1, 0], type=pa.int32()),
            "shard": pa.array([0] * 8, type=pa.int32()),
        },
        schema=gen.EVENT_SCHEMA,
    )
    final, ddls = oracle.apply_events(events)
    assert len(ddls) == 1
    got = {(r.repo, r.path): (r.content, r.c0) for r in final.itertuples()}
    # key a: lsn3 wins (dup lsn3 dropped); written at ver0 -> c0 null
    # key b: deleted at lsn6
    # key c: lsn7 wins with c0=y
    assert got == {("r", "a"): ("v3", None), ("r", "c"): ("v7", "y")}


def test_oracle_rename_carries_values():
    rows = [
        (1, "I", "r", "a", "v1", "{}", None, 0),
        (2, "DDL", None, None, None, None, '{"action":"add_column","name":"c0","type":"string"}', 0),
        (3, "U", "r", "a", "v2", '{"c0": "val"}', None, 1),
        (4, "DDL", None, None, None, None, '{"action":"rename_column","name":"c0","new_name":"c0_r"}', 1),
        (5, "I", "r", "b", "v3", '{"c0_r": "w"}', None, 2),
    ]
    events = pa.table(
        {
            "lsn": pa.array([r[0] for r in rows], type=pa.int64()),
            "txn": pa.array([1] * 5, type=pa.int64()),
            "op": [r[1] for r in rows],
            "repo": [r[2] for r in rows],
            "path": [r[3] for r in rows],
            "commit": ["c" if r[1] in "IU" else None for r in rows],
            "lang": ["py" if r[1] in "IU" else None for r in rows],
            "content": [r[4] for r in rows],
            "extra": [r[5] for r in rows],
            "ddl": [r[6] for r in rows],
            "ts": pa.array([gen._EPOCH_TS_US + r[0] for r in rows], type=pa.timestamp("us")),
            "schema_ver": pa.array([r[7] for r in rows], type=pa.int32()),
            "shard": pa.array([0] * 5, type=pa.int32()),
        },
        schema=gen.EVENT_SCHEMA,
    )
    final, _ = oracle.apply_events(events)
    assert list(final.columns) == ["repo", "path", "commit", "lang", "content", "c0_r"]
    got = {(r.repo, r.path): r.c0_r for r in final.itertuples()}
    assert got == {("r", "a"): "val", ("r", "b"): "w"}  # rename carried "val" to c0_r


def test_columns_at_version_matches_generator():
    base = gen.gen_base_table(n_repos=5, paths_per_repo=5, seed=5)
    cfg = small_cfg()
    log = gen.gen_binlog(base, cfg)
    df = concat_shards(log).to_pandas().drop_duplicates("lsn").sort_values("lsn")
    ddls = [json.loads(d) for d in df[df.op == "DDL"]["ddl"]]
    assert gen.columns_at_version(ddls, len(ddls)) == log.evolved_schema


def test_registry_types_at():
    """types_at folds add/rename/widen/drop; rename carries the type,
    alter_type widens in place, drop removes it."""
    from thor_ray.state import SchemaRegistry
    ddls = [
        {"action": "add_column", "name": "a", "type": "int64"},
        {"action": "add_column", "name": "b"},            # default string
        {"action": "rename_column", "name": "a", "new_name": "a2"},
        {"action": "alter_type", "name": "a2", "new_type": "double"},
        {"action": "drop_column", "name": "b"},
    ]
    reg = SchemaRegistry([{"lsn": i + 1, "schema_ver": i, "ddl": d}
                          for i, d in enumerate(ddls)])
    assert reg.types_at(1) == {"a": "int64"}
    assert reg.types_at(2) == {"a": "int64", "b": "string"}
    assert reg.types_at(3) == {"a2": "int64", "b": "string"}
    assert reg.types_at(4) == {"a2": "double", "b": "string"}
    assert reg.types_at(5) == {"a2": "double"}
    assert reg.columns_at(5) == ["a2"]


def test_oracle_widen_casts_existing_values():
    """alter_type must cast already-stored narrow values at the DDL point
    (a pre-widen winner reads back as an integral double)."""
    import pyarrow as pa
    from thor_ray import oracle
    ev = pa.table({
        "lsn": [1, 2, 3, 4],
        "txn": [1, 1, 2, 3],
        "op": ["DDL", "I", "DDL", "I"],
        "repo": [None, "r", None, "r2"],
        "path": [None, "p", None, "p2"],
        "commit": [None, "c" * 40, None, "c" * 40],
        "lang": [None, "py", None, "py"],
        "content": [None, "x", None, "y"],
        "extra": [None, '{"n": 2}', None, '{"n": 4.5}'],
        "ddl": ['{"action": "add_column", "name": "n", "type": "int64"}',
                None,
                '{"action": "alter_type", "name": "n", "new_type": "double"}',
                None],
        "ts": [1, 2, 3, 4],
        "schema_ver": [0, 1, 1, 2],
        "shard": [0, 0, 0, 0],
    })
    out, ddls = oracle.apply_events(ev)
    vals = out.set_index("repo")["n"].to_dict()
    assert vals == {"r": 2.0, "r2": 4.5}
    assert all(isinstance(v, float) for v in vals.values())
