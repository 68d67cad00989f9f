"""Round-4 advisor-fix regression tests.

Covers the ADVICE.md round-3 items: the cyclic view's frozen-base
contract (safe_frontier over a grown base must fail loudly, not assert
delivery of never-re-mapped lower-pass events), the wire codec's int32
offset-overflow guard, and the stream consumers' state/emit parquet
publishes routing through the storage interface.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from thor_ray import gen
from thor_ray.sources import binlog as bs
from thor_ray.state import storage as st


def _small_log(tmp_path, n_events=800, seed=3):
    base = gen.gen_base_table(n_repos=6, paths_per_repo=5, seed=seed)
    log = gen.gen_binlog(base, gen.BinlogConfig(
        n_events=n_events, n_shards=2, seed=seed))
    bdir = str(tmp_path / "binlog")
    log.write(bdir)
    return base, log, bdir


class TestCyclicFrozenBase:
    def test_safe_frontier_ok_on_frozen_base(self, tmp_path):
        _, _, bdir = _small_log(tmp_path)
        span = bs.max_lsn(bdir)
        view = str(tmp_path / "view")
        bs.write_cyclic_view(view, bdir, passes=3)
        base_fr = bs.safe_frontier(bdir)
        assert bs.safe_frontier(view) == 2 * span + base_fr

    def test_safe_frontier_raises_on_grown_base(self, tmp_path):
        base, log, bdir = _small_log(tmp_path)
        span = bs.max_lsn(bdir)
        view = str(tmp_path / "view")
        bs.write_cyclic_view(view, bdir, passes=3)
        # the base grows after view creation: append a later segment
        # (schema-compatible shard with lsns beyond the recorded span)
        import pyarrow.parquet as pq

        first = bs.shard_files(bdir)[0]
        t = pq.read_table(first)
        shifted = t.set_column(
            t.schema.get_field_index("lsn"), "lsn",
            pa.array(np.asarray(t["lsn"]) + span, type=pa.int64()))
        pq.write_table(shifted,
                       os.path.join(bdir, "shard-9999-0000.parquet"))
        assert bs.max_lsn(bdir) > span
        with pytest.raises(ValueError, match="frozen"):
            bs.safe_frontier(view)


class TestWireOffsetOverflow:
    def test_frame_column_guards_int32_offsets(self, monkeypatch):
        from thor_ray.stages import wire

        payload = pa.array(["x" * 40, "y" * 40], type=pa.string())
        sids = np.array([1, 2], dtype=np.uint32)
        # sanity: under the real ceiling this frames fine
        framed = wire.frame_column(payload, sids)
        back, sid = wire.unframe_column(framed)
        assert back.to_pylist() == payload.to_pylist()
        # shrink the ceiling below the framed size: must raise, not wrap
        monkeypatch.setattr(wire, "_MAX_BINARY_BYTES", 64)
        with pytest.raises(ValueError, match="int32 offset"):
            wire.frame_column(payload, sids)


class RecordingStorage(st.LocalFSStorage):
    """LocalFSStorage that records every put_atomic final path."""

    def __init__(self):
        self.atomic_paths: list[str] = []

    def put_atomic(self, final_path, stage, durable=True):
        self.atomic_paths.append(final_path)
        return super().put_atomic(final_path, stage, durable=durable)


class TestConsumerFilesRouteThroughStorage:
    def test_windowed_aggregator_publishes_atomically(
            self, ray_session, tmp_path):
        from thor_ray.pipelines.stream_window import WindowedAggregator

        _, _, bdir = _small_log(tmp_path)
        rec = RecordingStorage()
        prev = st.set_default_storage(rec)
        try:
            w = WindowedAggregator(
                bdir, str(tmp_path / "wagg"), 200_000,
                lateness_us=600_000, group_col="op")
            w.advance(complete=True)
        finally:
            st.set_default_storage(prev)
        names = [os.path.basename(p) for p in rec.atomic_paths]
        assert any(n.startswith("emit-b") for n in names), names
        assert any(n.startswith("open-b") for n in names), names
        # no stray direct final-name writes: the published files exist
        # and parse (atomic path actually produced them)
        out = tmp_path / "wagg"
        for n in names:
            if n.startswith(("emit-b", "open-b")):
                pd.read_parquet(out / n)


class TestFreqSetJoinTier:
    """Round-3 verdict 'what's wrong' #1: the repeated-set families must
    have a distributed (no driver materialization) membership tier whose
    output is IDENTICAL to the broadcast tier."""

    def _docs(self):
        boiler = "subscribe to our newsletter"
        docs = {
            1: ["alpha one", boiler, "beta two"],
            2: [boiler, "gamma three"],
            3: ["delta four", "epsilon five"],
            4: [boiler],
            5: ["zeta six", "alpha one"],
        }
        import ray
        return ray.data.from_pandas(pd.DataFrame({
            "doc_id": list(docs),
            "text": ["\n".join(v) for v in docs.values()],
        })).repartition(3)

    def test_paragraph_dedup_join_matches_broadcast(self, ray_session):
        from thor_ray.ops.text import paragraph_dedup

        outs = {}
        for tier in ("broadcast", "join"):
            outs[tier] = paragraph_dedup(
                self._docs(), "text", "doc_id", max_freq=1,
                gather=tier).to_pandas() \
                .sort_values("doc_id").reset_index(drop=True)
        assert len(outs["broadcast"]) > 0
        pd.testing.assert_frame_equal(outs["broadcast"], outs["join"])

    def _span_docs(self):
        import ray
        planted = "A" * 40  # repeated 40-byte span across docs
        rows = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": [
                "prefix " + planted + " suffix one",
                "other " + planted + " tail",
                "unique text with no repeats at all here",
                planted + planted,  # doubled span
            ],
        })
        return ray.data.from_pandas(rows).repartition(2)

    def test_span_stats_join_matches_broadcast(self, ray_session):
        from thor_ray.ops.text import repeated_span_stats

        outs = {}
        for tier in ("broadcast", "join"):
            outs[tier] = repeated_span_stats(
                self._span_docs(), "text", "doc_id", k=16, min_docs=2,
                gather=tier).to_pandas() \
                .sort_values("doc_id").reset_index(drop=True) \
                .astype({"doc_id": "int64", "n_dup_spans": "int64"})
        assert len(outs["broadcast"]) > 0
        pd.testing.assert_frame_equal(outs["broadcast"], outs["join"])

    def test_strip_spans_join_matches_broadcast(self, ray_session):
        from thor_ray.ops.text import strip_repeated_spans

        outs = {}
        for tier in ("broadcast", "join"):
            outs[tier] = strip_repeated_spans(
                self._span_docs(), "text", "doc_id", k=16, min_docs=2,
                gather=tier).to_pandas() \
                .sort_values("doc_id").reset_index(drop=True)
        assert len(outs["broadcast"]) == 4      # strip keeps every doc
        pd.testing.assert_frame_equal(outs["broadcast"], outs["join"])

    def test_empty_freq_set_join_falls_back(self, ray_session):
        from thor_ray.ops.text import paragraph_dedup

        import ray
        ds = ray.data.from_pandas(pd.DataFrame({
            "doc_id": [1, 2], "text": ["solo one", "solo two"]}))
        got = paragraph_dedup(ds, "text", "doc_id", max_freq=1,
                              gather="join").to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got["text"].tolist() == ["solo one", "solo two"]


def test_scheme_routed_exchange_dir(ray_session, tmp_path):
    """The spill exchange works with a scheme-routed exchange_dir
    (file:// here; s3:// in production resolves the same way): stage-1
    spills, stage-2 lists/reads and the post-epoch cleanup all go through
    the storage layer, auto-resolved per worker process via pyarrow.fs —
    the multi-node shared-exchange story (docs/STORAGE.md) exercised
    end-to-end. Final state must equal a plain-path replay."""
    import pyarrow.parquet as pq

    from thor_ray import oracle
    from thor_ray.pipelines.cdc import CdcConfig, CdcPipeline

    base = gen.gen_base_table(n_repos=8, paths_per_repo=6, seed=31)
    log = gen.gen_binlog(base, gen.BinlogConfig(
        n_events=3_000, n_shards=2, dup_rate=0.05, shuffle_window=64,
        ddl_every=1_200, delete_rate=0.05, update_rate=0.5, seed=31))
    bdir = str(tmp_path / "binlog")
    log.write(bdir)
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)
    expected, _ = oracle.apply_events(
        pa.concat_tables(log.shards), initial=base)

    ex_root = str(tmp_path / "exchange")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=str(tmp_path / "lake"), binlog_dir=bdir,
        num_partitions=8, epoch_size=1_000, shuffle="spill",
        exchange_dir=f"file://{ex_root}"))
    pipe.run(base=base_path)

    got = pipe.final_table().to_pandas()
    want = expected.to_pandas() if hasattr(expected, "to_pandas") \
        else expected
    cols = sorted(set(got.columns) & set(want.columns))
    got = got[cols].sort_values(["repo", "path"]).reset_index(drop=True)
    want = want[cols].sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # consumed epochs were cleaned through the scheme path
    leftover = [d for d in (os.listdir(ex_root)
                            if os.path.isdir(ex_root) else [])]
    assert leftover == [], leftover


class TestSizeAwareJoinPartitions:
    """Round-3 verdict #4 'Done' criterion: unit test on the formula."""

    def test_floor_applies_when_sizes_unknown(self):
        from thor_ray.ops.relational import _default_join_partitions

        class NoMeta:
            class _lp:
                class dag:
                    @staticmethod
                    def infer_metadata():
                        raise RuntimeError("no metadata")
            _logical_plan = _lp
        assert _default_join_partitions(NoMeta(), NoMeta(), ncpu=32) == 8
        assert _default_join_partitions(NoMeta(), NoMeta(), ncpu=8) == 4

    def test_bytes_derived_fanout(self):
        from thor_ray.ops.relational import (_JOIN_PARTITION_BYTES,
                                             _default_join_partitions)

        def sized(n_bytes):
            class Meta:
                size_bytes = n_bytes

            class DS:
                class _logical_plan:
                    class dag:
                        @staticmethod
                        def infer_metadata():
                            return Meta
            return DS()

        # small inputs stay at the floor
        assert _default_join_partitions(
            sized(1 << 20), sized(1 << 20), ncpu=32) == 8
        # 100 GB + 28 GB at 256 MB/partition = 512 partitions
        total = 128 << 30
        got = _default_join_partitions(
            sized(100 << 30), sized(28 << 30), ncpu=32)
        assert got == -(-total // _JOIN_PARTITION_BYTES) == 512
        # one known side is enough
        assert _default_join_partitions(
            sized(10 << 30), sized(None), ncpu=32) == 40

    def test_real_parquet_read_has_metadata_size(self, ray_session):
        """The metadata path actually fires for fresh parquet reads —
        and never triggers execution (no materialized blocks)."""
        import ray

        from thor_ray.ops.relational import _metadata_size_bytes

        ds = ray.data.read_parquet("/root/testdata/sf0.001/orders.parquet")
        sz = _metadata_size_bytes(ds)
        assert sz is not None and sz > 0


class TestGatherTierProperty:
    def test_property_tiers_equal_on_random_corpora(self, ray_session):
        """Property (seeded sweep): for random corpora over a tiny
        paragraph alphabet (guaranteeing cross-doc repeats), the join
        tier of paragraph_dedup equals the broadcast tier exactly."""
        import ray

        from thor_ray.ops.text import paragraph_dedup

        alphabet = ["aa bb", "cc dd", "ee ff", "gg hh", "ii jj"]
        rng = np.random.default_rng(13)
        for trial in range(4):
            n_docs = int(rng.integers(3, 12))
            docs = {
                i + 1: [alphabet[j] for j in rng.integers(
                    0, len(alphabet), int(rng.integers(1, 6)))]
                for i in range(n_docs)
            }
            ds_of = lambda: ray.data.from_pandas(pd.DataFrame({
                "doc_id": list(docs),
                "text": ["\n".join(v) for v in docs.values()],
            })).repartition(2)
            outs = {}
            for tier in ("broadcast", "join"):
                df = paragraph_dedup(
                    ds_of(), "text", "doc_id", max_freq=1,
                    gather=tier).to_pandas()
                if df.empty:   # all-dropped corpus: Ray drops 0-row cols
                    df = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                       "text": pd.Series(dtype="object")})
                outs[tier] = df.sort_values("doc_id") \
                    .reset_index(drop=True)
            pd.testing.assert_frame_equal(
                outs["broadcast"], outs["join"]), (trial, docs)


class TestPyArrowFSCrashWindow:
    def test_crash_between_stage_and_publish_leaves_no_final(
            self, tmp_path):
        """A crash injected after staging but before the adapter's
        publish (upload/move) must leave the final name absent and the
        previous content intact — same contract the LocalFSStorage
        fault tests pin."""
        from thor_ray.state.storage import PyArrowFSStorage

        store = PyArrowFSStorage()
        p = str(tmp_path / "m" / "part-00000.json")
        store.put_bytes(p, b'{"epoch": 1}')

        class Boom(RuntimeError):
            pass

        def staging_crash(tmp):
            with open(tmp, "wb") as f:
                f.write(b'{"epoch": 2}')
            raise Boom("crash before publish")

        with pytest.raises(Boom):
            store.put_atomic(p, staging_crash)
        assert store.read_bytes(p) == b'{"epoch": 1}'   # old state intact
        # no stray temp files beside the final
        names = os.listdir(tmp_path / "m")
        assert names == ["part-00000.json"], names


class TestSeekLsnForTs:
    """Kafka offsetsForTimes analogue (sources/binlog.py::seek_lsn_for_ts):
    footer-stat-pruned event-time seek == the full-scan oracle, across
    parquet and JSONL tiers, with end-of-log and before-start edges."""

    def _oracle(self, log, ts_us):
        import pyarrow.compute as pc
        t = pa.concat_tables(log.shards)
        ts = t["ts"]
        if pa.types.is_timestamp(ts.type):
            import pyarrow as _pa
            mask = pc.greater_equal(
                ts, _pa.scalar(pd.Timestamp(ts_us, unit="us")))
        else:
            mask = pc.greater_equal(ts, ts_us)
        hit = t.filter(mask)
        return int(pc.min(hit["lsn"]).as_py()) if hit.num_rows else None

    def test_matches_full_scan_oracle_parquet(self, tmp_path):
        base = gen.gen_base_table(n_repos=6, paths_per_repo=5, seed=5)
        log = gen.gen_binlog(base, gen.BinlogConfig(
            n_events=2_000, n_shards=3, seed=5, shuffle_window=64))
        bdir = str(tmp_path / "b")
        log.write(bdir)
        t = pa.concat_tables(log.shards)
        ts_col = t["ts"].to_pandas()
        lo_us = int(pd.Timestamp(ts_col.min()).value // 1000)
        hi_us = int(pd.Timestamp(ts_col.max()).value // 1000)
        for ts_us in (lo_us - 10_000, lo_us + (hi_us - lo_us) // 3,
                      lo_us + 2 * (hi_us - lo_us) // 3, hi_us,
                      hi_us + 10_000):
            got = bs.seek_lsn_for_ts(bdir, ts_us)
            assert got == self._oracle(log, ts_us), ts_us

    def test_jsonl_tier_and_cyclic_refusal(self, tmp_path):
        base = gen.gen_base_table(n_repos=5, paths_per_repo=4, seed=6)
        log = gen.gen_binlog(base, gen.BinlogConfig(
            n_events=800, n_shards=2, seed=6))
        jdir = str(tmp_path / "j")
        log.write_jsonl(jdir)
        t = pa.concat_tables(log.shards)
        ts_col = t["ts"].to_pandas()
        mid_us = int(pd.Timestamp(ts_col.quantile(0.5)).value // 1000)
        got = bs.seek_lsn_for_ts(jdir, mid_us)
        assert got == self._oracle(log, mid_us)

        pdir = str(tmp_path / "p")
        log.write(pdir)
        view = str(tmp_path / "view")
        bs.write_cyclic_view(view, pdir, passes=2)
        with pytest.raises(ValueError, match="cyclic"):
            bs.seek_lsn_for_ts(view, mid_us)
