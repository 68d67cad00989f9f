"""BinlogProducer: the public write edge of the binlog (Kafka idempotent
producer analogue) — programmatic events fold to the oracle state, lsns
are never reused across restarts, torn flushes stay exactly-once."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pytest

from thor_ray import gen, oracle
from thor_ray.pipelines import CdcConfig, CdcPipeline
from thor_ray.sources import BinlogProducer, read_produced_events
from thor_ray.sources import binlog as binlog_src


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.where(pd.notna(df), None)
    return df.sort_values(["repo", "path"]).reset_index(drop=True)[
        sorted(df.columns)]


def test_producer_roundtrip_matches_oracle(ray_session, tmp_path):
    """Produce I/U/D + DDL programmatically across several flushes; the
    replayed lake equals the oracle fold of the produced log."""
    import pyarrow.parquet as pq

    base = gen.gen_base_table(n_repos=8, paths_per_repo=8, seed=11)
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)
    bdir = str(tmp_path / "binlog")
    keys = base.select(["repo", "path"]).to_pylist()

    with BinlogProducer(bdir, n_shards=3) as prod:
        for i, kv in enumerate(keys[:40]):
            prod.append("U", kv["repo"], kv["path"], commit=f"c{i}",
                        lang="py", content=f"v1 body {i}")
        prod.flush()
        prod.append_ddl("add_column", "stars", type="int64")
        for i, kv in enumerate(keys[:20]):
            prod.append("U", kv["repo"], kv["path"], commit=f"d{i}",
                        lang="go", content=f"v2 body {i}",
                        extra={"stars": i})
        for kv in keys[40:50]:
            prod.append("D", kv["repo"], kv["path"])
        prod.append("I", "new/repo", "src/brand/new.py", commit="n1",
                    lang="py", content="fresh file")
        # context-manager exit flushes the tail

    events = read_produced_events(bdir)
    assert events.num_rows == 40 + 1 + 20 + 10 + 1
    # lsns are contiguous and globally unique
    lsns = events["lsn"].to_pylist()
    assert lsns == list(range(1, len(lsns) + 1))
    expected, ddls = oracle.apply_events(events, initial=base)
    assert [d["name"] for d in ddls] == ["stars"]

    pipe = CdcPipeline(CdcConfig(lake_dir=str(tmp_path / "lake"),
                                 binlog_dir=bdir, num_partitions=4,
                                 epoch_size=50))
    pipe.run(base=base_path)
    pd.testing.assert_frame_equal(normalize(pipe.final_table().to_pandas()),
                                  normalize(expected), check_dtype=False)

    # per-key shard stickiness (Kafka key-partitioning contract)
    ev = events.to_pandas()
    data = ev[ev["op"] != "DDL"]
    assert (data.groupby(["repo", "path"])["shard"].nunique() == 1).all()


def test_producer_restart_and_torn_flush(ray_session, tmp_path):
    """A restarted producer continues above its committed lsn; a torn
    flush (segments written, state commit lost) never reuses lsns."""
    bdir = str(tmp_path / "binlog")
    p1 = BinlogProducer(bdir, n_shards=2)
    p1.append("I", "r1", "a.py", commit="c", lang="py", content="x")
    p1.append("I", "r1", "b.py", commit="c", lang="py", content="y")
    r1 = p1.flush()
    assert (r1["first_lsn"], r1["last_lsn"]) == (1, 2)

    # restart: state resumes
    p2 = BinlogProducer(bdir)
    assert p2.next_lsn == 3 and p2.n_shards == 2
    p2.append("U", "r1", "a.py", commit="c2", lang="py", content="x2")
    assert p2.flush()["first_lsn"] == 3

    # torn flush: delete the state file (crash before commit); the
    # orphan segments on disk still hold lsns 1..3 — a fresh producer
    # must resume ABOVE them, not reuse
    os.remove(os.path.join(bdir, "_producer.json"))
    p3 = BinlogProducer(bdir, n_shards=2)
    assert p3.next_lsn == 4
    p3.append("D", "r1", "b.py")
    assert p3.flush()["first_lsn"] == 4
    assert binlog_src.max_lsn(bdir) == 4

    # shard-count mismatch with the declared marker is refused
    with pytest.raises(ValueError, match="shards"):
        BinlogProducer(bdir, n_shards=5)
    # the declared-shard marker keeps not-yet-written shards visible
    with open(os.path.join(bdir, "_shards.json")) as f:
        assert json.load(f)["shards"] == ["shard-0000", "shard-0001"]


def test_producer_jsonl_wire(ray_session, tmp_path):
    """The producer honors the log's existing text wire tier."""
    bdir = str(tmp_path / "binlog")
    p = BinlogProducer(bdir, n_shards=2, fmt="jsonl")
    p.append("I", "r", "x.py", commit="c", lang="py", content="body")
    p.append("I", "r", "y.py", commit="c", lang="py", content="body2")
    p.append_ddl("add_column", "stars", type="int64", default=3)
    p.flush()
    files = binlog_src.shard_files(bdir)
    assert files and files[0].endswith(".jsonl")
    ev = read_produced_events(bdir)
    assert ev.num_rows == 3 and ev["lsn"].to_pylist() == [1, 2, 3]
    # the DDL payload (incl. default) survives the text wire
    import json as _json
    d = _json.loads(ev.filter(pa.compute.equal(ev["op"], "DDL"))
                    ["ddl"].to_pylist()[0])
    assert d == {"action": "add_column", "name": "stars",
                 "type": "int64", "default": 3}
    assert ev.schema.field("ts").type == pa.timestamp("us")
    # a second producer inherits the wire format from the log
    p2 = BinlogProducer(bdir)
    assert p2.fmt == "jsonl"


@pytest.mark.parametrize("seed", [101, 102, 103])
def test_producer_randomized_equivalence(ray_session, tmp_path, seed):
    """Seeded property test (repo convention: deterministic, bounded):
    random op mixes, random flush boundaries, random mid-stream producer
    restarts, a random DDL — the replayed lake always equals the oracle
    fold of the produced log."""
    import numpy as np
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    base = gen.gen_base_table(n_repos=6, paths_per_repo=8, seed=seed)
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)
    bdir = str(tmp_path / "binlog")
    keys = base.select(["repo", "path"]).to_pylist()

    n_events = 400
    ddl_at = int(rng.integers(50, 350))
    prod = BinlogProducer(bdir, n_shards=int(rng.integers(2, 5)))
    have_ddl = False
    for i in range(n_events):
        if i == ddl_at:
            prod.append_ddl("add_column", "score", type="int64")
            have_ddl = True
        kv = keys[int(rng.integers(0, len(keys)))]
        r = rng.random()
        if r < 0.15:
            prod.append("D", kv["repo"], kv["path"])
        else:
            extra = {"score": int(rng.integers(0, 100))} \
                if have_ddl and r < 0.5 else None
            prod.append("U", kv["repo"], kv["path"],
                        commit=f"s{seed}e{i}",
                        lang=["py", "go", "md"][i % 3],
                        content=f"content {seed} {i} " + "x" * int(
                            rng.integers(0, 60)),
                        extra=extra)
        if rng.random() < 0.05 and len(prod):
            prod.flush()
        if rng.random() < 0.02:
            prod.flush()
            prod = BinlogProducer(bdir)     # mid-stream restart
    prod.flush()

    events = read_produced_events(bdir)
    assert events.num_rows == n_events + 1
    assert events["lsn"].to_pylist() == list(
        range(1, events.num_rows + 1))
    expected, _ = oracle.apply_events(events, initial=base)

    pipe = CdcPipeline(CdcConfig(
        lake_dir=str(tmp_path / "lake"), binlog_dir=bdir,
        num_partitions=4, epoch_size=int(rng.integers(40, 120))))
    pipe.run(base=base_path)
    pd.testing.assert_frame_equal(
        normalize(pipe.final_table().to_pandas()), normalize(expected),
        check_dtype=False)


def test_producer_fencing(ray_session, tmp_path):
    """Zombie-producer protection: constructing a producer takes over the
    log; a paused older instance's next flush fails closed instead of
    double-allocating lsns."""
    from thor_ray.sources.producer import ProducerFencedError

    bdir = str(tmp_path / "binlog")
    old = BinlogProducer(bdir, n_shards=2)
    old.append("I", "r", "a.py", commit="c", lang="py", content="x")
    new = BinlogProducer(bdir)          # takeover
    with pytest.raises(ProducerFencedError, match="superseded"):
        old.flush()
    # the new producer is unaffected and continues the lsn sequence
    new.append("I", "r", "b.py", commit="c", lang="py", content="y")
    assert new.flush()["first_lsn"] == 1
    assert binlog_src.max_lsn(bdir) == 1
