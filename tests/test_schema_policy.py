"""DDL compatibility-policy enforcement (Confluent-schema-registry
analogue): CdcConfig.ddl_policy="additive" rejects drop_column /
rename_column / narrowing alter_type while keeping the rejected entry's
registry SLOT (schema_ver numbering is load-bearing for event decode).
The engine under a policy must equal the oracle folded under the same
policy, rejection must be crash/replay-idempotent, and values written
under a rejected evolution must be discarded on both sides."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from thor_ray import gen, oracle
from thor_ray.pipelines import CdcConfig, CdcPipeline
from thor_ray.state.registry import SchemaRegistry


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def policy_fixture(tmp_path_factory):
    """Binlog whose DDL timeline contains drops (and renames via the
    standard cycle) — the additive policy has real work to do."""
    d = str(tmp_path_factory.mktemp("polfix"))
    base = gen.gen_base_table(n_repos=20, paths_per_repo=15, seed=23)
    cfg = gen.BinlogConfig(n_events=9_000, n_shards=4, dup_rate=0.05,
                           shuffle_window=128, ddl_every=1_200,
                           ddl_drops=True, delete_rate=0.06,
                           update_rate=0.55, seed=23)
    log = gen.gen_binlog(base, cfg)
    actions = [x["action"] for _, x in
               gen._ddl_timeline(cfg.n_events, cfg.ddl_every, drops=True)]
    assert "drop_column" in actions and "rename_column" in actions, actions
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    ev = pa.concat_tables(log.shards)
    exp_none, ddls = oracle.apply_events(ev, initial=base)
    exp_add, _ = oracle.apply_events(ev, initial=base,
                                     ddl_policy="additive")
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    return {"dir": d, "base_path": base_path, "binlog_dir": binlog_dir,
            "expected_none": exp_none, "expected_additive": exp_add,
            "ddls": ddls}


def test_policy_oracle_differs(policy_fixture):
    """Sanity: the policy changes the outcome on this fixture (a dropped
    column survives under additive), so the equality tests below are not
    vacuous."""
    cols_none = set(policy_fixture["expected_none"].columns)
    cols_add = set(policy_fixture["expected_additive"].columns)
    assert cols_none != cols_add, (cols_none, cols_add)


@pytest.mark.parametrize("write_mode", ["cow", "delta"])
def test_additive_policy_matches_oracle(ray_session, policy_fixture,
                                        tmp_path, write_mode):
    lake = str(tmp_path / f"lake_{write_mode}")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=policy_fixture["binlog_dir"],
        num_partitions=8, epoch_size=2_000, write_mode=write_mode,
        ddl_policy="additive"))
    pipe.run(base=policy_fixture["base_path"])
    got = normalize(pipe.final_table().to_pandas())
    exp = normalize(policy_fixture["expected_additive"])
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # rejected DDLs are observable in epoch metrics
    rejected = sum(r.n_applied.get("ddl_rejected", 0)
                   for r in pipe.reports)
    assert rejected > 0
    # registry: every entry holds its slot; rejected ones carry a reason
    reg = SchemaRegistry.load(lake)
    assert reg.version == len(policy_fixture["ddls"])
    assert any(e.get("rejected") for e in reg.entries)
    # version numbering intact: effective columns exclude rejected effects
    assert set(reg.columns_at(reg.version)) == \
        set(exp.columns) - {"repo", "path", "commit", "lang", "content"}


def test_none_policy_unchanged(ray_session, policy_fixture, tmp_path):
    """Default policy reproduces the plain oracle fold exactly (guards
    against the policy plumbing disturbing the no-policy path)."""
    lake = str(tmp_path / "lake_none")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=policy_fixture["binlog_dir"],
        num_partitions=8, epoch_size=2_000))
    pipe.run(base=policy_fixture["base_path"])
    got = normalize(pipe.final_table().to_pandas())
    exp = normalize(policy_fixture["expected_none"])
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_policy_rerun_idempotent(ray_session, policy_fixture, tmp_path):
    """Crash/replay: re-running a committed epoch under the policy
    re-stamps the same rejections (pure function of stored registry +
    batch + policy) and changes nothing."""
    lake = str(tmp_path / "lake_rerun")
    cfg = CdcConfig(lake_dir=lake, binlog_dir=policy_fixture["binlog_dir"],
                    num_partitions=8, epoch_size=2_000,
                    ddl_policy="additive")
    pipe = CdcPipeline(cfg)
    pipe.run(base=policy_fixture["base_path"])
    before = SchemaRegistry.load(lake).entries
    state_before = normalize(pipe.final_table().to_pandas())
    pipe.run_epoch(pipe.reports[-1].epoch)   # committed-epoch re-run
    after = SchemaRegistry.load(lake).entries
    assert after == before
    state_after = normalize(pipe.final_table().to_pandas())
    pd.testing.assert_frame_equal(state_after, state_before,
                                  check_dtype=False)


def test_apply_policy_classification():
    """Unit: the classifier accepts adds + widening, rejects drops,
    renames and narrowing, and never reorders or loses slots."""
    reg = SchemaRegistry([])
    batch = [
        {"lsn": 1, "schema_ver": 0,
         "ddl": {"action": "add_column", "name": "c0", "type": "int64"}},
        {"lsn": 2, "schema_ver": 1,
         "ddl": {"action": "alter_type", "name": "c0",
                 "new_type": "double"}},
        {"lsn": 3, "schema_ver": 2,
         "ddl": {"action": "rename_column", "name": "c0",
                 "new_name": "c1"}},
        {"lsn": 4, "schema_ver": 3,
         "ddl": {"action": "drop_column", "name": "c0"}},
        {"lsn": 5, "schema_ver": 4,
         "ddl": {"action": "alter_type", "name": "c0",
                 "new_type": "int64"}},   # narrowing double->int64
    ]
    stamped = reg.apply_policy(batch, "additive")
    assert [bool(e.get("rejected")) for e in stamped] == \
        [False, False, True, True, True]
    merged = reg.merged(stamped)
    assert merged.version == 5
    assert merged.columns_at(5) == ["c0"]
    assert merged.types_at(5) == {"c0": "double"}
    # none policy is a pass-through
    assert reg.apply_policy(batch, "none") == batch
    with pytest.raises(ValueError):
        reg.apply_policy(batch, "bogus")
