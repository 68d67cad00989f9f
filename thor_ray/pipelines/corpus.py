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
                          chunk_stride: int = 384,
                          strip_span_k: int | None = None,
                          vocab_size: int | None = None,
                          bpe_merges: int | None = None) -> Dataset:
    """documents(id, text, [lang]) → deduped chunk table
    (id, chunk_id, chunk, n_tokens[, token_ids]). See module docstring for
    the stage list; each stage is this repo's standalone operator, so any
    slice of the pipeline can be run or tested on its own.

    Optional tiers: ``strip_span_k`` inserts exact-substring boilerplate
    removal (Lee et al. span strip) between the dedups and the chunker;
    ``vocab_size`` appends vocabulary-mapped token ids to each chunk;
    ``bpe_merges`` trains a BPE merge table on the deduped corpus
    (distributed word histogram) and appends subword tokens per chunk."""
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
    if strip_span_k:
        ds = TX.strip_repeated_spans(ds, text_col=text_col, id_col=id_col,
                                     k=strip_span_k)
    chunks = TX.chunk_text(ds, text_col=text_col, id_col=id_col,
                           size=chunk_size, stride=chunk_stride)
    out = TX.token_count(chunks, text_col="chunk")
    if vocab_size:
        out = _with_token_ids(out, vocab_size)
    if bpe_merges:
        # train on the DEDUPED corpus (pre-chunk) so boilerplate can't
        # dominate the merge table, then encode each chunk in place
        import ray as _ray
        merges = TX.bpe_train(ds, text_col=text_col, n_merges=bpe_merges)
        ranks = {(m["left"], m["right"]): m["rank"] for m in merges}
        rref = _ray.put(ranks)

        def encode_col(t: pa.Table) -> pa.Table:
            return t.append_column(
                "bpe_tokens",
                TX._encode_batch_words(t["chunk"], _ray.get(rref)))

        out = out.map_batches(encode_col, batch_format="pyarrow")
    return out


def _with_token_ids(chunks: Dataset, vocab_size: int) -> Dataset:
    """Append token ids per chunk WITHOUT dropping the other columns
    (tokenize_to_ids emits a lean (id, ids) table; here we keep the full
    chunk row)."""
    import numpy as np
    import ray as _ray

    vocab_pd = TX.vocab_topk(chunks, "chunk", k=vocab_size).to_pandas()
    vocab_pd = vocab_pd.sort_values(["n", "token"],
                                    ascending=[False, True],
                                    kind="stable").reset_index(drop=True)
    toks_u = vocab_pd["token"].to_numpy(dtype="U")
    ids = np.arange(1, len(toks_u) + 1, dtype=np.int64)
    order = np.argsort(toks_u)
    vref = _ray.put((toks_u[order], ids[order]))

    def fn(t: pa.Table) -> pa.Table:
        st_, si = _ray.get(vref)
        lists = pc.split_pattern_regex(pc.fill_null(t["chunk"], ""),
                                       pattern=TX.TOKEN_RE)
        flat = pc.list_flatten(lists)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        arr = flat.to_numpy(zero_copy_only=False).astype("U")
        if len(st_) and len(arr):
            pos = np.minimum(np.searchsorted(st_, arr), len(st_) - 1)
            tid = np.where(st_[pos] == arr, si[pos], 0)
        else:
            tid = np.zeros(len(arr), dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        la = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(tid.astype(np.int64), type=pa.int64()))
        return t.append_column("token_ids", la)

    return chunks.map_batches(fn, batch_format="pyarrow")
