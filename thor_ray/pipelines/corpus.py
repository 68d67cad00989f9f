"""End-to-end training-corpus pipeline: the composition a pretraining-data
user actually runs, built entirely from this repo's operators — normalize →
quality filter → language filter → exact dedup → near-dup dedup → chunk →
token count. (Persist the result with sources.sink.write_partitioned.)

Scale shape of the whole composition: every stage is a streaming
map_batches except two wide steps — (a) the exact-dedup shuffle, which
carries only (id, 16-byte fingerprint), and (b) the near-dup LSH band
shuffle. The corpus TEXT never enters a shuffle, and nothing corpus-sized
ever reaches the driver (both dedup drop-sets are duplicate-count-sized).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from thor_ray.ops import dedup as DD
from thor_ray.ops import text as TX


def build_training_corpus(ds: Dataset, text_col: str = "text",
                          id_col: str = "doc_id",
                          min_quality: float = 0.3,
                          langs: "list[str] | None" = None,
                          jaccard_threshold: float = 0.5,
                          chunk_size: int = 512,
                          chunk_stride: int = 384) -> Dataset:
    """documents(id, text, [lang]) → deduped chunk table
    (id, chunk_id, chunk, n_tokens). See module docstring for the stage
    list; each stage is this repo's standalone operator, so any slice of
    the pipeline can be run or tested on its own."""
    ds = TX.normalize_text(ds, text_col=text_col, out="_norm")

    def use_norm(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in t.column_names if c not in (text_col, "_norm")}
        cols[text_col] = t["_norm"]
        return pa.table(cols)

    ds = ds.map_batches(use_norm, batch_format="pyarrow")
    ds = TX.quality_score(ds, text_col=text_col) \
        .filter(expr=f"quality >= {min_quality}")
    if langs is not None:
        ds = TX.lang_id(ds, text_col=text_col)
        langs_arr = pa.array(langs)
        ds = ds.map_batches(
            lambda t: t.filter(pc.is_in(t["pred_lang"],
                                        value_set=langs_arr)),
            batch_format="pyarrow")
    keep = [id_col, text_col]
    ds = ds.map_batches(lambda t: t.select(keep), batch_format="pyarrow")
    # exact dedup: the shuffle carries ONLY (id, 16-byte fingerprint) —
    # never the text (dedup.py's own guidance) — grouped on a COARSE salt
    # of the fp (fingerprints are near-unique; grouping on the fp itself
    # would be one Python call per document). The non-min-id duplicates
    # come back as a duplicate-count-sized drop set, broadcast into a
    # map-side anti filter over the streaming corpus.
    from thor_ray.ops.relational import semi_join

    ds = TX.md5_fingerprint(ds, text_col=text_col, out="_fp")

    def fp_only(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col], "_fp": t["_fp"],
            "_fps": pc.utf8_slice_codeunits(t["_fp"], 0, 2),
        })

    def dup_ids(g):
        g = g.sort_values(id_col, kind="stable")
        return g[g.duplicated("_fp", keep="first")][[id_col]]

    dup_df = (ds.map_batches(fp_only, batch_format="pyarrow")
              .groupby("_fps").map_groups(dup_ids, batch_format="pandas")
              .to_pandas())
    # a dup-free corpus yields an empty result, which loses its schema
    drops = set(dup_df[id_col]) if id_col in dup_df.columns else set()
    ds = ds.map_batches(lambda t: t.select(keep), batch_format="pyarrow")
    if drops:
        ds = semi_join(ds, drops, on=id_col, anti=True)
    ds = DD.near_dup_dedup(ds, text_col, id_col,
                           jaccard_threshold=jaccard_threshold)
    chunks = TX.chunk_text(ds, text_col=text_col, id_col=id_col,
                           size=chunk_size, stride=chunk_stride)
    return TX.token_count(chunks, text_col="chunk")
