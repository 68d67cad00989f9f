"""Transform chains, predicate gating, and the dead-letter split.

Connect analogues (SURVEY.md §2.2, §2.1 S5; `[K]` — public Kafka Connect
``TransformationChain`` / ``errors.tolerance=all`` + DLQ): a chain is just
function composition over Arrow batches; the DLQ split routes invalid rows
aside instead of dropping them silently.
"""

from __future__ import annotations

import os
import uuid
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

Batch = pa.Table
Transform = Callable[[Batch], Batch]


class TransformChain:
    """Composable list of batch transforms → one map_batches callable."""

    def __init__(self, *transforms: Transform):
        self.transforms = list(transforms)

    def add(self, t: Transform) -> "TransformChain":
        self.transforms.append(t)
        return self

    def __call__(self, batch: Batch) -> Batch:
        for t in self.transforms:
            batch = t(batch)
        return batch


def predicate_gate(predicate: Callable[[Batch], pa.Array],
                   transform: Transform) -> Transform:
    """Apply `transform` only to rows matching `predicate` (Connect's
    SMT predicates); non-matching rows pass through unchanged.

    Requires the transform to preserve schema and row count (row-wise
    rewrite); input row ORDER is preserved."""
    def fn(t: Batch) -> Batch:
        import numpy as np

        mask = predicate(t)
        idx = pa.array(np.arange(len(t), dtype=np.int64))
        t2 = t.append_column("__gate_idx", idx)
        yes = t2.filter(mask)
        kept = yes.column("__gate_idx")
        yes = transform(yes.drop_columns(["__gate_idx"])) \
            .append_column("__gate_idx", kept)
        no = t2.filter(pc.invert(mask))
        out = pa.concat_tables([yes, no], promote_options="permissive")
        order = pc.sort_indices(out.column("__gate_idx"))
        return out.take(order).drop_columns(["__gate_idx"])
    return fn


def split_valid(t: Batch, rules: list[Callable[[Batch], pa.Array]]) -> tuple[Batch, Batch]:
    """(valid, invalid) by AND of vectorized validity rules."""
    if not rules:
        return t, t.slice(0, 0)
    mask = rules[0](t)
    for r in rules[1:]:
        mask = pc.and_kleene(mask, r(t))
    mask = pc.fill_null(mask, False)
    return t.filter(mask), t.filter(pc.invert(mask))


def dlq_stage(dlq_dir: str, rules: list[Callable[[Batch], pa.Array]],
              tag: str = "",
              names: "list[str] | None" = None) -> Transform:
    """Dead-letter split as a map_batches stage: invalid rows are written to
    ``dlq_dir`` (one small parquet per offending batch, content-addressed so
    task retries overwrite instead of duplicating), valid rows flow on.

    With ``names`` (one per rule — the CHECK-constraint tier), each
    dead-lettered row gains a ``_violation`` column naming the FIRST
    failed rule, so the DLQ is self-describing; ``replay_dlq`` strips the
    marker before re-injection."""
    if names is not None and len(names) != len(rules):
        raise ValueError(f"{len(names)} names for {len(rules)} rules")

    def fn(t: Batch) -> Batch:
        if names is None:
            valid, invalid = split_valid(t, rules)
        else:
            import numpy as np

            masks = [pc.fill_null(r(t), False) for r in rules]
            ok = masks[0]
            for m in masks[1:]:
                ok = pc.and_(ok, m)
            valid, invalid = t.filter(ok), t.filter(pc.invert(ok))
            if invalid.num_rows:
                first = np.full(len(t), "", dtype=object)
                for name, m in list(zip(names, masks))[::-1]:
                    first[pc.invert(m).to_numpy(zero_copy_only=False)] = name
                vio = first[pc.invert(ok).to_numpy(zero_copy_only=False)]
                invalid = invalid.append_column(
                    "_violation", pa.array(vio, type=pa.string()))
        if invalid.num_rows:
            os.makedirs(dlq_dir, exist_ok=True)
            # deterministic name from the invalid rows' identity
            import hashlib

            key_cols = [c for c in ("shard", "lsn") if c in invalid.column_names]
            ident = (
                ",".join(str(v) for c in key_cols for v in invalid[c].to_pylist())
                or uuid.uuid4().hex
            )
            name = hashlib.sha256((tag + ident).encode()).hexdigest()[:24]
            from thor_ray.state.storage import storage_for

            path = os.path.join(dlq_dir, f"dlq-{name}.parquet")
            storage_for(path).put_atomic(
                path, lambda tmp: pq.write_table(invalid, tmp))
        return valid
    return fn
