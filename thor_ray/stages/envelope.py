"""Change-event envelope converter pair — the Debezium wire-format analogue.

Debezium (the de-facto CDC layer on Kafka Connect — public classes
``io.debezium.transforms.ExtractNewRecordState`` and the
``before/after/op/ts_ms/source`` event-envelope schema; reference tree is
empty, SURVEY.md §0, so anchors are ``[K]`` public knowledge) frames every
change event as a JSON envelope::

    key   = {"<pk col>": ..., ...}
    value = {"before": null, "after": {<row image>}|null,
             "op": "c"|"u"|"d", "ts_ms": <int>|null,
             "source": {"name": ..., "lsn": ..., ...}}

``to_change_envelope`` serializes flat event rows into that wire shape;
``extract_new_record_state`` is the inverse (Debezium's most-used SMT):
parse the envelope, surface the ``after`` image as flat columns, and apply
a delete-handling mode. Both are vectorized end-to-end: encode via polars'
Rust ``struct.json_encode`` (per-column, quote-escaping included), decode
via Arrow's C++ block JSON parser over the joined lines — no per-row
Python on either side.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pajson

from .smt import Batch, Transform

# thor op codes -> Debezium envelope op codes
_OP_MAP = {"I": "c", "U": "u", "D": "d"}


def _json_encode_struct(t: Batch, cols: list[str]) -> pa.Array:
    """One JSON-object string per row from the named columns (vectorized
    polars kernel; handles escaping, unicode, nested nulls)."""
    import polars as pl

    df = pl.from_arrow(t.select(cols))
    out = df.select(pl.struct(cols).struct.json_encode().alias("j"))["j"]
    arr = out.to_arrow()
    if pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    return arr


def to_change_envelope(key_cols: list[str],
                       payload_cols: list[str] | None = None,
                       op_col: str | None = None,
                       ts_col: str | None = None,
                       source_cols: list[str] | None = None,
                       source_name: str = "thor_ray",
                       before_prefix: str | None = None) -> Transform:
    """Serialize rows to ``(key, value)`` envelope strings.

    - ``key_cols`` → the key JSON object (the Kafka record key).
    - ``payload_cols`` (default: every non-meta column) → the ``after``
      image; for deletes (``op_col`` value 'D') ``after`` is ``null``
      (the standard envelope delete shape; ``before`` is always null —
      this log carries after-images only).
    - ``op_col``: thor op codes I/U/D map to envelope c/u/d; omitted →
      every row is a create ('c', the snapshot/read shape).
    - ``ts_col``: a timestamp column emitted as epoch-ms ``ts_ms``.
    - ``source_cols``: provenance fields embedded under ``source`` next
      to ``source.name`` (e.g. lsn/shard/txn).
    - ``before_prefix``: rows carry the PREVIOUS image in sibling
      ``<prefix><payload col>`` columns (the ``sources.read_changefeed_full``
      shape, prefix ``"before_"``) — the envelope's ``before`` object is
      encoded from them, null where ``<prefix>lsn`` is null (the key did
      not exist). Omitted → ``before`` is always null (after-only log).
    """
    def fn(t: Batch) -> Batch:
        meta = {op_col, ts_col, *(source_cols or []), *key_cols}
        payload = payload_cols or [
            c for c in t.column_names
            if (c not in meta or c in key_cols)
            and not (before_prefix and c.startswith(before_prefix))]
        after = _json_encode_struct(t, payload)
        key = _json_encode_struct(t, key_cols)
        n = t.num_rows
        if op_col is not None:
            o = t[op_col]
            op = pc.if_else(
                pc.equal(o, "I"), pa.scalar("c"),
                pc.if_else(pc.equal(o, "U"), pa.scalar("u"),
                           pa.scalar("d")))
            after = pc.if_else(pc.equal(o, "D"), pa.scalar("null"), after)
        else:
            op = pa.array(["c"] * n, pa.string())
        if ts_col is not None:
            ts_ms = pc.cast(pc.cast(t[ts_col], pa.timestamp("ms")),
                            pa.int64())
            ts_str = pc.cast(ts_ms, pa.string())
            ts_str = pc.fill_null(ts_str, "null")
        else:
            ts_str = pa.array(["null"] * n, pa.string())
        # source object: fixed name + optional provenance columns
        import json as _json
        name_lit = _json.dumps(source_name)
        if source_cols:
            src_body = _json_encode_struct(t, list(source_cols))
            # splice {"name":...} into the encoded object: {"a":1} ->
            # {"name":"x","a":1}  (src_body is never null/empty here)
            src = pc.binary_join_element_wise(
                pa.scalar('{"name":' + name_lit + ","),
                pc.utf8_slice_codeunits(src_body, 1), "")
        else:
            src = pa.array(['{"name":' + name_lit + "}"] * n, pa.string())
        if before_prefix is not None:
            # key columns are immutable — no before_ sibling, reuse them
            bt = t.select([before_prefix + c if before_prefix + c
                           in t.column_names else c for c in payload]) \
                  .rename_columns(payload)
            before = _json_encode_struct(bt, payload)
            ex = before_prefix + "lsn"
            if ex in t.column_names:
                before = pc.if_else(pc.is_valid(t[ex]), before,
                                    pa.scalar("null"))
        else:
            before = pa.array(["null"] * n, pa.string())
        value = pc.binary_join_element_wise(
            pa.scalar('{"before":'), before,
            pa.scalar(',"after":'), after,
            pa.scalar(',"op":"'), op,
            pa.scalar('","ts_ms":'), ts_str,
            pa.scalar(',"source":'), src,
            pa.scalar("}"), "")
        return pa.table({"key": key, "value": value})
    return fn


def extract_new_record_state(value_col: str = "value",
                             delete_mode: str = "drop",
                             add_source_fields:
                             "list[str] | dict[str, pa.DataType] | None"
                             = None,
                             payload_schema: pa.Schema | None = None,
                             key_col: str | None = None) -> Transform:
    """Debezium ``ExtractNewRecordState``: envelope strings → flat rows.

    Parses the ``value_col`` JSON envelopes (Arrow block parser over the
    joined lines — one C++ parse per batch), surfaces every ``after``
    field as a column, and handles deletes per ``delete_mode``:

    - ``"drop"`` (Debezium default): delete events (and tombstones —
      null values, which carry no image at all) are removed.
    - ``"rewrite"``: delete rows kept (payload columns null) plus a
      ``__deleted`` string column 'true'/'false'. Since the envelope's
      ``after`` is null on deletes, pass ``key_col`` (the record-key JSON
      column — where Debezium keeps a delete's identity) to coalesce the
      key fields back in, so a delete row still names the key it kills.

    ``add_source_fields`` surfaces envelope provenance as ``__<field>``
    columns (the ``add.fields=source.lsn,...`` analogue); a plain list
    assumes int64 when ``payload_schema`` pins types (pass a dict of
    field → Arrow type for other provenance types). Pass
    ``payload_schema`` to pin the after-image column types (otherwise
    Arrow's JSON inference decides — ints become int64, floats double).
    """
    if delete_mode not in ("drop", "rewrite"):
        raise ValueError(f"delete_mode must be 'drop' or 'rewrite', "
                         f"got {delete_mode!r}")
    if isinstance(add_source_fields, dict):
        src_fields = dict(add_source_fields)
    else:
        src_fields = {f: pa.int64() for f in (add_source_fields or [])}

    def _block_parse_lines(arr: pa.Array,
                           parse: "pajson.ParseOptions | None" = None):
        if len(arr) == 0:
            return None
        la = pa.ListArray.from_arrays(
            pa.array([0, len(arr)], pa.int32()), arr)
        joined = pc.binary_join(la, pa.scalar("\n"))[0].as_py()
        return pajson.read_json(pa.BufferReader(joined.encode()),
                                parse_options=parse)

    def fn(t: Batch) -> Batch:
        # tombstones (null value) are droppable in both modes: they carry
        # no after image and no key payload to rewrite
        t = t.filter(pc.is_valid(t[value_col]))
        flat = t[value_col].combine_chunks()
        parse = None
        if payload_schema is not None:
            env_fields = [
                pa.field("after", pa.struct(list(payload_schema))),
                pa.field("op", pa.string()),
                pa.field("ts_ms", pa.int64()),
            ]
            if src_fields:
                env_fields.append(
                    pa.field("source",
                             pa.struct([pa.field(f, ty)
                                        for f, ty in src_fields.items()])))
            parse = pajson.ParseOptions(
                explicit_schema=pa.schema(env_fields),
                unexpected_field_behavior="ignore")
        env = _block_parse_lines(flat, parse)
        if env is None or env.num_rows == 0:
            cols: dict[str, pa.Array] = {}
            if payload_schema is not None:
                cols = {f.name: pa.array([], f.type)
                        for f in payload_schema}
            cols["op"] = pa.array([], pa.string())
            return pa.table(cols)
        after = env["after"].combine_chunks()
        key_tbl = None
        if key_col is not None:
            key_tbl = _block_parse_lines(t[key_col].combine_chunks())
        out: dict[str, object] = {}
        for f in after.type:
            # struct_field of a null struct row yields a null value
            col = pc.struct_field(env["after"], f.name)
            if key_tbl is not None and f.name in key_tbl.column_names:
                # delete rows (after=null) recover their identity from
                # the record key — Debezium keeps it there, not in value
                kc = key_tbl[f.name]
                if kc.type != col.type:
                    kc = pc.cast(kc, col.type)
                col = pc.coalesce(col, kc)
            out[f.name] = col
        op = env["op"]
        out["op"] = op
        for f in src_fields:
            out[f"__{f}"] = pc.struct_field(env["source"], f)
        res = pa.table(out)
        if delete_mode == "drop":
            return res.filter(pc.not_equal(res["op"], "d"))
        deleted = pc.if_else(pc.equal(res["op"], "d"),
                             pa.scalar("true"), pa.scalar("false"))
        return res.append_column("__deleted", deleted)
    return fn
