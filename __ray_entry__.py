"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Fill these in as you implement operators from
SURVEY.md §2. Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: do not
call ``ray.init()`` / ``ray.shutdown()`` here, in the library code these
functions use, or inside the callables.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship CDC pipeline at smoke scale: generate the deterministic
    base+binlog fixture (BASELINE.json:15 input shape — (repo, path, commit,
    lang, content)), bootstrap the lake, replay every epoch (upsert + dedup
    + DDL + exactly-once manifests), return the materialized lake table.

    Uses the synthetic fixture rather than sf0.001 because the north_rule
    input (BASELINE.json:14-15) is the source-code-repo change-event table,
    not the TPC-H-ish star schema; the sf tables back queries()/oracle_sql().
    """
    from thor_ray.pipelines.flagship import run_flagship

    pipe = run_flagship("/tmp/thor_ray_entry", n_keys=1_000, n_events=10_000,
                        n_shards=4, num_partitions=8, epoch_size=2_500)
    return pipe.final_table()


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from thor_ray.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for the SQL-expressible queries (rows-only ops omit)."""
    from thor_ray.queries import oracle_sql as _s

    return _s()
