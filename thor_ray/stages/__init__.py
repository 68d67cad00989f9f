from .smt import (
    cast_fields,
    drop_fields,
    extract_field,
    flatten,
    hoist_field,
    insert_field,
    json_extract,
    key_hash,
    mask_field,
    outbox_router,
    regex_router,
    rename_fields,
    replace_field,
    select_fields,
    smt_filter,
    timestamp_converter,
    timestamp_router,
)
from .chain import TransformChain, predicate_gate, split_valid
from .envelope import extract_new_record_state, to_change_envelope
from .wire import decode_wire, encode_wire

__all__ = [
    "cast_fields", "drop_fields", "extract_field", "flatten", "hoist_field",
    "insert_field", "json_extract", "key_hash", "mask_field",
    "outbox_router", "regex_router",
    "rename_fields", "replace_field", "select_fields", "smt_filter",
    "timestamp_converter", "timestamp_router",
    "TransformChain", "predicate_gate", "split_valid",
    "extract_new_record_state", "to_change_envelope",
    "decode_wire", "encode_wire",
]
