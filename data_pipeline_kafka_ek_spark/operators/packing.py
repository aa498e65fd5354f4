"""Sequence packing: assign documents to fixed-capacity training
sequences (the step after chunking/sampling that turns a corpus into
dense, context-window-sized training examples with minimal padding).

Packing is inherently sequential — each document's bin depends on every
earlier decision — so it cannot be a window function or a join. The
scale answer is SHARDING: hash documents into ``n_shards`` independent
streams, pack each shard greedily in doc-id order, and emit
(shard, seq_id) pairs as the global sequence key. Shards are the
parallelism unit (at 100 TB you size n_shards so one shard's id+length
pairs — ~16 B/doc, NOT the text — fit one task comfortably), and within
a shard the pack is a single O(rows) pandas pass via ``applyInPandas``
(the justified Python escape: Arrow-batched, one call per shard, no
per-row overhead).

The greedy rule is the standard first-fit-in-order: a doc joins the
current sequence iff its tokens still fit, else it opens the next one;
oversized docs get a sequence of their own. Fixed order (doc_id) makes
the fixpoint deterministic and engine-independent, so a DuckDB
recursive CTE replays the identical fold and the driver value-hash
checks it (plans/extensions.py::x_pipeline_seq_packing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 128,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy fixed-order sequence packing, sharded by ``id % n_shards``.

    Returns (doc_id, shard, seq_id, n_tokens): ``(shard, seq_id)`` is the
    training sequence the document lands in. Only ids and token counts
    ride the shuffle — the text stays behind and re-joins by doc_id when
    the packed sequences are materialized.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )

    def pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids = []
        seq_id, fill = 0, 0
        for i, n in enumerate(pdf["n_tokens"]):
            n = int(n)
            if i > 0 and fill + n > max_tokens:
                seq_id += 1
                fill = 0
            fill += n
            seq_ids.append(seq_id)
        pdf["seq_id"] = seq_ids
        return pdf[["doc_id", "shard", "seq_id", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard long, seq_id long, n_tokens long"
    )
