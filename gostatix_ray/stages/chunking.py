"""Sequence chunking and packing for LLM training-data preparation.

Large-scale training-data-pipeline operators (no reference counterpart;
first-class per the build brief):

* ``chunk_documents`` — split each document into fixed-token-count
  chunks (optionally overlapping via ``stride``), the universal
  pre-training / long-context-eval preprocessing step.  Pure per-batch
  ``map_batches`` — zero shuffle, streams at any scale.
* ``pack_documents`` — token-offset bin packing: concatenation-order
  packing that keeps documents whole, assigning each doc to the pack
  its starting token offset falls in (``floor(cum_before / target)``)
  within a partition.  Deterministic and SQL-expressible (unlike
  greedy first-fit, which needs a stateful scan), so it oracle-checks
  bit-exact; ONE part-hash bucket shuffle of slim (part, id, n_tokens)
  rows, with cumsum, pack assignment and aggregation all bucket-local.

Chunking is list-offset surgery on Arrow: ``split_pattern`` tokenizes
once, then new chunk boundaries are written as a fresh offsets vector
over the SAME flat token values (zero-copy in the contiguous
``stride == chunk_tokens`` case; one vectorized ``take`` gather when
chunks overlap), and ``binary_join`` re-materializes chunk text.  No
Python loops anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text_stats import _text


def _chunk_table(batch: pa.Table, *, chunk_tokens: int, stride: int,
                 text_col: str, id_col: str, keep: list[str]) -> pa.Table:
    text = _text(batch[text_col])
    toks = pc.split_pattern(text, pattern=" ")
    off = np.asarray(toks.offsets, dtype=np.int64)
    vals = toks.values
    lens = np.diff(off)  # >= 1 always: split("") yields [""]
    n = len(lens)
    if n == 0:
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()) if n else pa.array([], type=pa.int64()),
            "chunk_id": pa.array([], type=pa.int64()),
            text_col: pa.array([], type=pa.string()),
            "n_tokens": pa.array([], type=pa.int64()),
            **{c: batch[c] for c in keep},
        })
    c, st = chunk_tokens, stride
    if st == c:
        nch = (lens + c - 1) // c
    else:
        # chunks start at i*stride, i = 0..ceil(max(len-c,0)/stride);
        # the final chunk always reaches the document's last token
        nch = (np.maximum(lens - c, 0) + st - 1) // st + 1
    total = int(nch.sum())
    doc_idx = np.repeat(np.arange(n), nch)
    chunk_id = np.arange(total) - np.repeat(np.cumsum(nch) - nch, nch)
    starts = off[:-1][doc_idx] + chunk_id * st
    ends = np.minimum(starts + c, off[1:][doc_idx])
    if st == c:
        # contiguous: within a doc each chunk ends where the next starts,
        # and docs are contiguous in the flat values — one offsets vector
        # over the original token buffer, no copy
        new_off = np.append(starts, off[-1]).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(new_off, type=pa.int32()), vals)
    else:
        clens = ends - starts
        flat_n = int(clens.sum())
        gidx = (np.repeat(starts, clens)
                + np.arange(flat_n)
                - np.repeat(np.cumsum(clens) - clens, clens))
        flat = vals.take(pa.array(gidx))
        new_off = np.append(np.cumsum(clens) - clens, flat_n).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(new_off, type=pa.int32()), flat)
    take_idx = pa.array(doc_idx)
    cols = {
        id_col: batch[id_col].cast(pa.int64()).take(take_idx),
        "chunk_id": pa.array(chunk_id, type=pa.int64()),
        text_col: pc.binary_join(lst, " "),
        "n_tokens": pa.array(ends - starts, type=pa.int64()),
    }
    for k in keep:
        cols[k] = batch[k].take(take_idx)
    return pa.table(cols)


def chunk_documents(ds, *, chunk_tokens: int, stride: int | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    keep: list[str] | None = None):
    """Dataset[id, text, ...] -> Dataset[id, chunk_id, text, n_tokens, *keep].

    Each document becomes ``ceil(n/chunk_tokens)`` chunks of at most
    ``chunk_tokens`` whitespace tokens (the last one shorter).  With
    ``stride < chunk_tokens`` chunks overlap: starts at ``i*stride``
    for ``i = 0..ceil(max(n-chunk,0)/stride)``, so the final chunk
    always covers the document tail (sliding-window long-context prep).
    ``chunk_id`` is 0-based per document.  Empty/null text yields one
    chunk of one empty token, matching ``string_split('', ' ')`` SQL
    semantics.  Per-batch, shuffle-free; output rows ~= input tokens /
    chunk_tokens, so blocks stay bounded.
    """
    st = chunk_tokens if stride is None else int(stride)
    if not (0 < st <= chunk_tokens):
        raise ValueError(f"stride must be in (0, chunk_tokens]; got {st}")
    keep = list(keep or [])

    def _fn(batch: pa.Table) -> pa.Table:
        return _chunk_table(batch, chunk_tokens=chunk_tokens, stride=st,
                            text_col=text_col, id_col=id_col, keep=keep)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def pack_documents(ds, *, target_tokens: int, part_col: str,
                   text_col: str = "text", id_col: str = "doc_id",
                   num_buckets: int = 64):
    """Dataset[id, text, part] -> Dataset[part, pack_id, n_docs, n_tokens].

    Token-offset bin packing: within each ``part_col`` partition,
    documents are laid out in ``id_col`` order and doc *d* joins pack
    ``floor(tokens_before_d / target_tokens)`` — i.e. concatenate the
    partition and cut at target boundaries, but never split a document
    (the doc straddling a boundary stays in the pack it starts in, so
    packs may overflow by at most one document).  Deterministic under
    any input partitioning and SQL-expressible via a window cumsum,
    unlike greedy first-fit (a stateful scan).  ONE shuffle total:
    slim (part, id, n_tokens) rows ride a part-hash bucket exchange;
    each bucket task holds its partitions whole, so the running sum,
    pack assignment AND pack aggregation are all bucket-local (same
    partition-co-location assumption as window_over — one domain's
    slim rows must fit one task, fine for hand-sized mixtures).
    """
    import pandas as pd

    from .dedup import bucketed_groupby

    def _count(batch: pa.Table) -> pa.Table:
        text = _text(batch[text_col])
        # len(string_split(t, ' ')) == spaces + 1, without materializing
        # the token lists
        n = pc.add(pc.count_substring(text, " "), 1).cast(pa.int64())
        return pa.table({
            part_col: batch[part_col],
            id_col: batch[id_col].cast(pa.int64()),
            "n_tokens": n,
        })

    counted = ds.map_batches(_count, batch_format="pyarrow", batch_size=None)

    def _packs(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values([part_col, id_col], kind="stable")
        ntok = df["n_tokens"].to_numpy()
        p, _ = pd.factorize(df[part_col].to_numpy())
        cum = np.cumsum(ntok)
        # per-partition running sum: subtract each partition's carry-in
        # (the global cumsum just before its first row) — vectorized
        # restart, no Python loop over partitions
        newg = np.empty(len(p), dtype=bool)
        newg[0], newg[1:] = True, p[1:] != p[:-1]
        starts = np.flatnonzero(newg)
        carry = np.zeros(len(p), dtype=np.int64)
        carry[starts[1:]] = cum[starts[1:] - 1]
        cum = cum - np.maximum.accumulate(carry)
        pid = (cum - ntok) // target_tokens
        g = (df.assign(pack_id=pid)
               .groupby([part_col, "pack_id"], as_index=False)
               .agg(n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum")))
        g["pack_id"] = g["pack_id"].astype("int64")
        g["n_docs"] = g["n_docs"].astype("int64")
        g["n_tokens"] = g["n_tokens"].astype("int64")
        return g

    return bucketed_groupby(counted, [part_col], _packs,
                            num_buckets=num_buckets)
