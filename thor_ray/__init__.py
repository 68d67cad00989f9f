"""thor_ray — a from-scratch, Ray-Data-native CDC / incremental-ingest engine.

Capability target: hk-Lei/thor's Kafka-Connect-style log-collection pipeline
(reference tree at /root/reference is empty in this sandbox; the authoritative
spec is BASELINE.json:6,14,15 — see SURVEY.md §0 for the citation protocol).

Layout:
  gen.py        deterministic fixture generators (base lake table + binlog)
  oracle.py     single-process reference applier (test oracle, no Ray)
  sources/      readers: base table, binlog tail
  stages/       stateless SMT transforms (map_batches stages)
  state/        commit manifests, schema registry
  pipelines/    the flagship CDC apply pipeline
  ops/          standalone relational / text / dedup / ann operator library
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import thor_ray` light; heavy deps load
    on first use)."""
    if name in ("CdcConfig", "CdcPipeline"):
        from thor_ray.pipelines import cdc

        return getattr(cdc, name)
    if name == "run_flagship":
        from thor_ray.pipelines.flagship import run_flagship

        return run_flagship
    if name in ("read_lake", "read_lake_at", "snapshot_diff"):
        from thor_ray.sources import lake

        return getattr(lake, name)
    # NOTE: no lazy alias for `queries`/`oracle_sql` — the name collides
    # with the thor_ray.queries SUBMODULE (import binding would shadow the
    # function after first submodule import). Use thor_ray.queries.queries().
    raise AttributeError(name)
