"""Connected components over near-dup pair sets (dedup clustering).

Pairwise near-dup operators (``dedup.jaccard_pairs``, ``minhash_lsh_pairs``,
``simhash_pairs``, ``similarity.cosine_pairs_lsh``) emit edges; an LLM
training-data pipeline then needs the *clusters* — keep one representative
per duplicate group, drop the rest. That grouping is connected components
on the pair graph.

Spark formulation: iterative min-label propagation with pointer jumping,
expressed as DataFrame joins — each round every node adopts the minimum
label in its closed neighborhood (1 hop through the edge set), then
labels chase their own labels (``component[n] = component[component[n]]``,
the pointer-jumping step), until a fixpoint. This is the join-based
variant of the classic MapReduce connected-components algorithms
(Hash-to-Min / large-star small-star family, Rastogi et al., ICDE 2013 —
public literature); pointer jumping makes convergence O(log(diameter))
even on path graphs, and near-dup clusters are dense (diameter 1-2), so
2-3 rounds converge in practice. Every round is three slim shuffles over
(node, label) pairs — labels are ids, never payloads. The fixpoint is
unique (min node id per component), so the result is deterministic and
engine-independent: DuckDB replays it with a recursive
transitive-closure CTE and must agree bit-for-bit.

At 100 TB: the edge set (near-dup pairs) is orders of magnitude smaller
than the corpus; label propagation shuffles only (id, id) tuples; each
round ends in ``localCheckpoint(eager=True)``, which truncates the
lineage (iterative joins otherwise stack ever-deeper plans and Catalyst
re-analysis dominates wall-clock long before data does). The driver-side
loop runs one ``count()`` per round against the already-materialized
checkpoint to detect the fixpoint — the standard pattern for iterative
graph algorithms on Spark (same shape GraphX/GraphFrames use
internally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node of the undirected pair graph with its component id
    (the minimum node id in the component). Returns (node, component).

    Pure DataFrame ops: symmetrize edges once, then iterate
    ``label[n] = min(label[n], min(label[neighbor]))`` followed by a
    pointer-jumping step (``label[n] = label[label[n]]``) to the
    fixpoint. ``localCheckpoint`` after every round keeps the plan flat.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("__nmin"))
        )
        hop1 = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("__nmin", F.col("component"))
            ).alias("component"),
        )
        # pointer jumping: follow the label's own label one step, halving
        # the remaining path length each round
        parents = hop1.select(
            F.col("node").alias("component"), F.col("component").alias("__pcomp")
        )
        jumped = hop1.join(parents, "component", "left").select(
            "node", F.coalesce("__pcomp", F.col("component")).alias("component")
        )
        new_labels = jumped.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_representatives(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Collapse duplicate clusters: every doc maps to its cluster's
    representative (the minimum id — singletons represent themselves), so
    ``filter(doc_id == representative)`` keeps exactly one doc per
    cluster. One broadcast-or-shuffle left join; the components relation
    is tiny relative to the corpus (only docs that appear in a pair)."""
    comp = components.select(
        F.col("node").alias(id_col), F.col("component").alias("representative")
    )
    return docs.join(comp, id_col, "left").withColumn(
        "representative", F.coalesce("representative", F.col(id_col))
    )
