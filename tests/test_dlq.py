"""Dead-letter queue: malformed events are routed aside, never applied,
never silently dropped (SURVEY.md §2.1 S5; Connect errors.tolerance=all)."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from thor_ray import gen, oracle
from thor_ray.pipelines import CdcConfig, CdcPipeline


def test_corrupt_events_hit_dlq_not_lake(ray_session, tmp_path):
    base = gen.gen_base_table(n_repos=10, paths_per_repo=10, seed=4)
    cfg = gen.BinlogConfig(n_events=5_000, n_shards=4, dup_rate=0.03,
                           shuffle_window=64, ddl_every=2_000,
                           corrupt_rate=0.02, seed=4)
    log = gen.gen_binlog(base, cfg)
    binlog_dir = str(tmp_path / "binlog")
    log.write(binlog_dir)
    events = pa.concat_tables(log.shards)
    n_corrupt = len([o for o in events.column("op").to_pylist() if o == "X"])
    assert n_corrupt > 0

    expected, _ = oracle.apply_events(events, initial=base)

    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)
    lake = str(tmp_path / "lake")
    pipe = CdcPipeline(CdcConfig(lake_dir=lake, binlog_dir=binlog_dir,
                                 num_partitions=8, epoch_size=1_250))
    pipe.run(base=base_path)

    got = pipe.final_table().to_pandas()
    got = got.where(pd.notna(got), None).sort_values(["repo", "path"]) \
        .reset_index(drop=True)[sorted(got.columns)]
    exp = expected.where(pd.notna(expected), None) \
        .sort_values(["repo", "path"]).reset_index(drop=True)[sorted(expected.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # every malformed event (minus duplicate deliveries) landed in the DLQ
    dlq_files = glob.glob(os.path.join(lake, "_dlq", "*.parquet"))
    assert dlq_files
    dlq = pa.concat_tables([pq.read_table(f) for f in dlq_files]).to_pandas()
    dlq = dlq.drop_duplicates("lsn")
    corrupt_lsns = {
        r["lsn"] for r in events.to_pylist()
        if r["op"] not in ("I", "U", "D", "DDL")
        or (r["op"] != "DDL" and r["repo"] is None)
        or (r["op"] in ("I", "U") and r["content"] is None)
    }
    assert set(dlq["lsn"]) == corrupt_lsns


def test_replay_dlq_reinjects_repaired(ray_session, tmp_path):
    """DLQ reprocessing: a repair transform re-validates dead-lettered
    events and re-injects them into the binlog at fresh lsns; the next
    run() folds them through the normal exactly-once apply path. Final
    state == oracle fold of (clean log + repaired events appended in
    original-lsn order)."""
    import numpy as np

    import pyarrow.compute as pc

    base = gen.gen_base_table(n_repos=10, paths_per_repo=10, seed=11)
    cfg = gen.BinlogConfig(n_events=5_000, n_shards=4, dup_rate=0.03,
                           shuffle_window=64, ddl_every=0,
                           corrupt_rate=0.02, seed=11)
    log = gen.gen_binlog(base, cfg)
    binlog_dir = str(tmp_path / "binlog")
    log.write(binlog_dir)
    events = pa.concat_tables(log.shards)
    ev = events.to_pandas()
    bad = (~ev["op"].isin(["I", "U", "D", "DDL"])
           | ((ev["op"] != "DDL") & ev["repo"].isna())
           | (ev["op"].isin(["I", "U"]) & ev["content"].isna()))
    assert bad.any()

    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)
    lake = str(tmp_path / "lake")
    pipe = CdcPipeline(CdcConfig(lake_dir=lake, binlog_dir=binlog_dir,
                                 num_partitions=8, epoch_size=1_250))
    pipe.run(base=base_path)

    # a replay with NO fix repairs nothing: everything stays dead-lettered
    assert pipe.replay_dlq() == 0
    assert glob.glob(os.path.join(lake, "_dlq", "dlq-*.parquet"))

    def fix(t: pa.Table) -> pa.Table:
        idx = t.schema.get_field_index
        t = t.set_column(idx("op"), "op",
                         pc.if_else(pc.equal(t["op"], "X"),
                                    pa.scalar("I"), t["op"]))
        t = t.set_column(idx("repo"), "repo",
                         pc.fill_null(t["repo"], "fixed/repo"))
        t = t.set_column(idx("path"), "path", pc.fill_null(t["path"], "fp"))
        t = t.set_column(idx("content"), "content",
                         pc.fill_null(t["content"], "fixed-content"))
        return t

    n_bad = int(ev.loc[bad].drop_duplicates("lsn").shape[0])
    assert pipe.replay_dlq(fix) == n_bad
    # consumed originals archived, nothing left pending, re-issue a no-op
    assert not glob.glob(os.path.join(lake, "_dlq", "dlq-*.parquet"))
    assert glob.glob(os.path.join(lake, "_dlq", "replayed", "*.parquet"))
    assert pipe.replay_dlq(fix) == 0

    pipe.run()  # rpl segments ride the normal apply path

    rep = ev.loc[bad].drop_duplicates("lsn").sort_values("lsn").copy()
    rep["op"] = rep["op"].where(rep["op"] != "X", "I")
    rep["repo"] = rep["repo"].fillna("fixed/repo")
    rep["path"] = rep["path"].fillna("fp")
    rep["content"] = rep["content"].fillna("fixed-content")
    rep["lsn"] = ev["lsn"].max() + 1 + np.arange(len(rep), dtype=np.int64)
    clean_t = events.filter(pa.array((~bad).to_numpy()))
    rep_t = pa.Table.from_pandas(rep, schema=gen.EVENT_SCHEMA,
                                 preserve_index=False)
    expected, _ = oracle.apply_events(
        pa.concat_tables([clean_t, rep_t]), initial=base)

    got = pipe.final_table().to_pandas()
    got = got.where(pd.notna(got), None).sort_values(["repo", "path"]) \
        .reset_index(drop=True)[sorted(got.columns)]
    exp = expected.where(pd.notna(expected), None) \
        .sort_values(["repo", "path"]).reset_index(drop=True)[sorted(expected.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_check_constraints(ray_session, tmp_path):
    """Declarative CHECK constraints (CdcConfig.constraints): events
    failing a named vectorized rule are dead-lettered with a _violation
    marker, never applied; replay_dlq strips the marker, applies the
    fix, re-validates against the same constraints, and re-injects."""
    import pyarrow.compute as pc

    base = gen.gen_base_table(n_repos=10, paths_per_repo=10, seed=7)
    cfgb = gen.BinlogConfig(n_events=5_000, n_shards=4, dup_rate=0.0,
                            ddl_every=0, delete_rate=0.08,
                            update_rate=0.5, seed=7)
    log = gen.gen_binlog(base, cfgb)
    events = pa.concat_tables(log.shards)
    ev = events.to_pandas()
    CAP = 200

    def content_cap(t: pa.Table) -> pa.Array:
        return pc.or_kleene(
            pc.equal(t["op"], "D"),
            pc.less_equal(pc.utf8_length(t["content"]), CAP))

    viol = ev[(ev["op"].isin(["I", "U"]))
              & (ev["content"].str.len() > CAP)]
    assert len(viol) > 0
    clean = events.filter(pa.array(~ev["lsn"].isin(viol["lsn"]).to_numpy()))
    expected, _ = oracle.apply_events(clean, initial=base)

    binlog_dir = str(tmp_path / "binlog")
    log.write(binlog_dir)
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)
    lake = str(tmp_path / "lake")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=binlog_dir, num_partitions=8,
        epoch_size=1_250, constraints=[("content_cap", content_cap)]))
    pipe.run(base=base_path)

    def norm(df):
        df = df.where(pd.notna(df), None)
        return df.sort_values(["repo", "path"]).reset_index(drop=True)[
            sorted(df.columns)]

    pd.testing.assert_frame_equal(norm(pipe.final_table().to_pandas()),
                                  norm(expected), check_dtype=False)

    # the DLQ is self-describing: every violation, labeled with its rule
    dlq_files = glob.glob(os.path.join(lake, "_dlq", "dlq-*.parquet"))
    dlq = pa.concat_tables([pq.read_table(f) for f in dlq_files]) \
        .to_pandas().drop_duplicates("lsn")
    assert set(dlq["lsn"]) == set(viol["lsn"])
    assert (dlq["_violation"] == "check:content_cap").all()

    # repair: truncate to the cap → passes re-validation → re-injected;
    # each repaired event becomes the latest version of its key
    def fix(t: pa.Table) -> pa.Table:
        i = t.column_names.index("content")
        return t.set_column(i, "content", pc.cast(
            pc.utf8_slice_codeunits(t["content"], 0, CAP),
            pa.large_string()))

    n = pipe.replay_dlq(fix)
    assert n == len(viol)
    pipe.run()

    rep = viol.sort_values("lsn").groupby(["repo", "path"],
                                          as_index=False).last()
    rep["content"] = rep["content"].str.slice(0, CAP)
    want = expected.set_index(["repo", "path"])
    for _, r in rep.iterrows():
        want.loc[(r["repo"], r["path"]),
                 ["commit", "lang", "content"]] = \
            [r["commit"], r["lang"], r["content"]]
    want = want.reset_index()
    pd.testing.assert_frame_equal(norm(pipe.final_table().to_pandas()),
                                  norm(want), check_dtype=False)
    # nothing left dead-lettered (the fix repaired everything)
    assert not glob.glob(os.path.join(lake, "_dlq", "dlq-*.parquet"))
