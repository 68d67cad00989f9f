"""Before-image changefeed (sources.read_changefeed_full): every change
row carries the previous image of its key — the full Debezium
before/after event shape — derived per-partition with zero shuffle.
Before-images must equal the oracle state at the previous epoch exactly;
the after-only projection must equal read_changefeed; the envelope
export must serialize real before objects."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pandas as pd
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from thor_ray import gen, oracle
from thor_ray.pipelines import CdcConfig, CdcPipeline
from thor_ray.sources import read_changefeed, read_changefeed_full

EPOCH = 1_500
N_EVENTS = 6_000
PAY = ["commit", "lang", "content"]


@pytest.fixture(scope="module")
def fixture(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("cffull"))
    base = gen.gen_base_table(n_repos=15, paths_per_repo=10, seed=77)
    cfg = gen.BinlogConfig(n_events=N_EVENTS, n_shards=3, dup_rate=0.05,
                           shuffle_window=96, ddl_every=0,
                           delete_rate=0.12, update_rate=0.5, seed=77)
    log = gen.gen_binlog(base, cfg)
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    lake = os.path.join(d, "lake")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=binlog_dir, num_partitions=6,
        epoch_size=EPOCH, write_mode="delta", compact_every=1_000_000))
    pipe.run(base=base_path)
    events = __import__("pyarrow").concat_tables(log.shards)
    return {"dir": d, "base": base, "lake": lake, "events": events,
            "max_lsn": log.max_lsn,
            "n_epochs": -(-log.max_lsn // EPOCH)}


def oracle_state(fixture, epoch: int) -> dict:
    """(repo, path) -> row dict of the oracle fold at an epoch boundary."""
    hi = min(epoch * EPOCH, fixture["max_lsn"])
    prefix = fixture["events"].filter(
        pc.less_equal(fixture["events"]["lsn"], hi))
    expected, _ = oracle.apply_events(prefix, initial=fixture["base"])
    out = {}
    for r in expected.to_dict("records"):
        out[(r["repo"], r["path"])] = r
    return out


def test_before_images_match_oracle(ray_session, fixture):
    cf = read_changefeed_full(fixture["lake"], 0).to_pandas()
    assert set(cf["op"]) <= {"I", "U", "D"}
    assert len(cf) > 0
    # after-only projection == the plain changefeed (D payload nulled)
    plain = read_changefeed(fixture["lake"], 0).to_pandas()
    for c in PAY:
        plain.loc[plain["op"] == "D", c] = None
    key = ["repo", "path", "epoch"]
    a = cf[plain.columns].sort_values(key).reset_index(drop=True)
    b = plain.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a.where(pd.notna(a), None), b.where(pd.notna(b), None),
        check_dtype=False)

    n_del = n_ins = 0
    for e in sorted(cf["epoch"].unique()):
        prev = oracle_state(fixture, int(e) - 1)
        cur = oracle_state(fixture, int(e))
        rows = cf[cf["epoch"] == e]
        for r in rows.to_dict("records"):
            k = (r["repo"], r["path"])
            was = prev.get(k)
            if was is None:
                # key did not exist before this epoch
                assert pd.isna(r["before_lsn"]), (k, e)
                assert all(r[f"before_{c}"] is None
                           or pd.isna(r[f"before_{c}"]) for c in PAY)
                n_ins += 1
            else:
                assert not pd.isna(r["before_lsn"]), (k, e)
                for c in PAY:
                    got, want = r[f"before_{c}"], was[c]
                    assert (got == want
                            or (pd.isna(got) and pd.isna(want))), \
                        (k, e, c, got, want)
            if r["op"] == "D":
                n_del += 1
                assert all(r[c] is None or pd.isna(r[c]) for c in PAY)
                # `was` may be None: an I+D folded within one epoch is a
                # D winner whose key never existed at the prior boundary
                assert k not in cur
            else:
                # after image == oracle state at this epoch's boundary,
                # unless a later event in the SAME epoch re-touched the key
                # (winners are per-epoch folds, so it can't) — exact match
                now = cur.get(k)
                assert now is not None, (k, e)
                for c in PAY:
                    got, want = r[c], now[c]
                    assert (got == want
                            or (pd.isna(got) and pd.isna(want))), \
                        (k, e, c, got, want)
    assert n_del > 0 and n_ins > 0   # the fixture exercises both paths


def test_tail_range_and_tiered_compaction(ray_session, fixture, tmp_path):
    n = fixture["n_epochs"]
    tail = read_changefeed_full(fixture["lake"], n - 2).to_pandas()
    assert set(tail["epoch"]) <= {n - 1, n}
    full = read_changefeed_full(fixture["lake"], 0).to_pandas()
    sub = full[full["epoch"] > n - 2]
    assert len(tail) == len(sub)
    # identical rows including before images (fold base = epochs <= n-2)
    key = ["repo", "path", "epoch"]
    a = tail.sort_values(key).reset_index(drop=True)
    b = sub[tail.columns].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a.where(pd.notna(a), None), b.where(pd.notna(b), None),
        check_dtype=False)

    with pytest.raises(ValueError):
        read_changefeed_full(fixture["lake"], n)        # empty range

    # tiered compaction: fold epochs <= n-2; tail keeps working, folded
    # ranges are refused loudly
    from thor_ray.sources import compact_upto
    lk = str(tmp_path / "lake2")
    shutil.copytree(fixture["lake"], lk)
    compact_upto(lk, n - 2)
    tail2 = read_changefeed_full(lk, n - 2).to_pandas()
    a2 = tail2.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a2.where(pd.notna(a2), None), a.where(pd.notna(a), None),
        check_dtype=False)
    with pytest.raises(ValueError):
        read_changefeed_full(lk, 0)


def test_envelope_export_with_before(ray_session, fixture, tmp_path):
    from thor_ray.sources import export_changefeed_envelopes

    out = str(tmp_path / "env")
    res = export_changefeed_envelopes(fixture["lake"], out, 0,
                                      with_before=True)
    assert res["epochs_written"] == fixture["n_epochs"]

    recs = []
    for f in glob.glob(os.path.join(out, "epoch=*", "*.json")):
        with open(f) as fh:
            for line in fh:
                if line.strip():
                    recs.append(json.loads(line))
    cf = read_changefeed_full(fixture["lake"], 0).to_pandas()
    assert len(recs) == len(cf)
    by_key = {}
    for r in recs:
        v = json.loads(r["value"])
        k = json.loads(r["key"])
        by_key[(k["repo"], k["path"], v["source"]["epoch"])] = v
    opmap = {"I": "c", "U": "u", "D": "d"}
    for row in cf.to_dict("records"):
        v = by_key[(row["repo"], row["path"], row["epoch"])]
        assert v["op"] == opmap[row["op"]]
        if pd.isna(row["before_lsn"]):
            assert v["before"] is None
        else:
            for c in PAY:
                want = row[f"before_{c}"]
                got = v["before"][c]
                assert (got == want
                        or (got is None and (want is None or pd.isna(want))))
        if row["op"] == "D":
            assert v["after"] is None
        else:
            assert v["after"]["content"] == row["content"]
