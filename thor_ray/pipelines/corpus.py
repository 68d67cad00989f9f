"""End-to-end training-corpus pipeline: the composition a pretraining-data
user actually runs, built entirely from this repo's operators — normalize →
quality filter → language filter → exact dedup → near-dup dedup → chunk →
token count (→ optional resumable partitioned write).

Scale shape of the whole composition: every stage is a streaming
map_batches except (a) the exact-dedup key shuffle, (b) the near-dup LSH
band shuffle, and (c) the final optional write's key groupby — three wide
steps total over the corpus; nothing corpus-sized ever reaches the driver
(the near-dup drop-set and clusters are output-sized).
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
    # exact dedup first: shuffle on a COARSE salt of the md5 fingerprint
    # (256 groups — fingerprints are near-unique, so grouping on the fp
    # itself would be one Python call per document), resolve exact dups
    # with a C-level drop_duplicates inside each group, keep the min id
    ds = TX.md5_fingerprint(ds, text_col=text_col, out="_fp")

    def salt_fp(t: pa.Table) -> pa.Table:
        return t.append_column("_fps",
                               pc.utf8_slice_codeunits(t["_fp"], 0, 2))

    def drop_exact_dups(g):
        g = g.sort_values(id_col, kind="stable")
        return g.drop_duplicates("_fp", keep="first")[keep]

    ds = (ds.map_batches(salt_fp, batch_format="pyarrow")
          .groupby("_fps")
          .map_groups(drop_exact_dups, batch_format="pandas"))
    ds = DD.near_dup_dedup(ds, text_col, id_col,
                           jaccard_threshold=jaccard_threshold)
    chunks = TX.chunk_text(ds, text_col=text_col, id_col=id_col,
                           size=chunk_size, stride=chunk_stride)
    return TX.token_count(chunks, text_col="chunk")
