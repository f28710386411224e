"""Connected components over a pair graph (near-duplicate clustering).

After near-dup detection (token-Jaccard q16, MinHash-LSH q23, SimHash q24,
embedding cosine q40) a training-data pipeline groups the pairs into
CLUSTERS and keeps one canonical document per cluster.  That grouping is
connected components, computed here by iterative minimum-label propagation:

- every node starts labeled with its own id;
- each round, every node takes the minimum label among itself and its
  neighbors (one join + one groupBy per round);
- converged when no label changed — the label is the component's minimum
  node id, a deterministic canonical cluster id.

Rounds needed = graph diameter (near-dup clusters are dense, so typically
2-4).  Each round is one shuffle join + one shuffle aggregate over the
label frame; intermediates are persisted and the loop is driver-controlled
with an explicit convergence probe — the standard Pregel-style pattern when
an iteration count cannot be known in advance (SURVEY classifies this as a
non-SQL-expressible iterative algorithm; the test oracle uses a recursive
CTE instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Shared propagation-depth bound.  The q50 test oracle unrolls exactly this
#: many label-propagation layers, so keeping the operator's default and the
#: oracle's depth defined in ONE place guarantees they can never disagree
#: (a graph needing more rounds raises here instead of gate-failing
#: confusingly).  Min-label propagation needs rounds ~= graph diameter;
#: near-dup clusters are dense (measured diameter <= ~8 on the synthetic
#: corpus), so 16 leaves ample headroom.
MAX_ITER_DEFAULT = 16


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = MAX_ITER_DEFAULT,
) -> DataFrame:
    """``(id, comp)`` for every node in ``edges``; ``comp`` is the smallest
    node id in the component.  Edges are treated as undirected.

    Raises ``RuntimeError`` if labels have not converged after ``max_iter``
    rounds (rather than silently returning wrong component ids)."""
    # persist the edge list: it feeds every propagation round, and its
    # upstream (e.g. the whole jaccard pair join) must execute once
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .persist()
    )
    nodes = sym.select(F.col("a").alias("id")).distinct()
    # localCheckpoint (eager) after every round: persist() alone caches the
    # DATA but each round's plan still nests every previous round's joins,
    # so driver-side analysis grows superlinearly with iterations — the
    # classic iterative-lineage blowup. Checkpointing truncates the lineage
    # to the materialized partitions.
    labels = nodes.select("id", F.col("id").alias("comp")).localCheckpoint()

    changed = -1
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym["a"] == labels["id"])
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neigh, on="id", how="left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"),
                F.col("comp").alias("_old"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("comp") != F.col("_old")).count()
        labels = new_labels.drop("_old")
        if changed == 0:
            break
    # labels is materialized (localCheckpoint) — the edge cache has served
    # its purpose; release it so repeated invocations in a long-lived
    # session don't accumulate storage blocks
    sym.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); the graph diameter exceeds "
            f"max_iter — raise it (and keep any fixed-depth oracle in sync)"
        )
    return labels


def cluster_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    strategy: str = "auto",
    candidate_budget: int | None = None,
    on_budget: str = "error",
    max_iter: int = MAX_ITER_DEFAULT,
) -> DataFrame:
    """Near-duplicate clustering end-to-end: token-Jaccard pair detection →
    connected components → ``(doc_id-named id_col, cluster_id,
    cluster_size)``; ``cluster_id`` is the component's minimum doc id.

    This is the guarded entry point for the clustering family: the
    ``candidate_budget`` / ``on_budget`` regime guard of
    :func:`~foresttime_builder_spark.operators.dedup.token_jaccard_pairs`
    passes straight through, so at the corpus scale where the exact
    prefix-join pair stream is shuffle-bound (the q16/sf10 regime) the
    clustering either raises with actionable advice before ANY full-corpus
    shuffle (``on_budget='error'``) or degrades to banded MinHash-LSH
    candidates with the same exact verification (``on_budget='degrade'``) —
    the components step is identical either way, it just consumes the
    surviving pair stream.  Without the guard the pair stage would inherit
    the exact path's disk-exceeding shuffle even though the components
    themselves are cheap.
    """
    from foresttime_builder_spark.operators.dedup import token_jaccard_pairs

    pairs = token_jaccard_pairs(
        df,
        id_col,
        text_col,
        threshold=threshold,
        strategy=strategy,
        candidate_budget=candidate_budget,
        on_budget=on_budget,
    )
    comp = connected_components(pairs, src="doc_a", dst="doc_b", max_iter=max_iter)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, on="comp").select(
        F.col("id").alias(id_col),
        F.col("comp").alias("cluster_id"),
        "cluster_size",
    )


def dedup_finalize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    strategy: str = "auto",
    candidate_budget: int | None = None,
    on_budget: str = "error",
    max_iter: int = MAX_ITER_DEFAULT,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Dedup FINALIZE — keep exactly one representative per near-dup
    cluster (longest document in whitespace tokens, doc id tie-break) and
    pass every singleton through; the step after clustering that a
    training pipeline actually ships.  Returns ``(id_col, cluster_id,
    cluster_size, n_tokens)`` — one row per surviving document.

    Composes :func:`cluster_near_dups` (whose ``candidate_budget`` /
    ``on_budget`` regime guard passes through — the whole finalize chain
    degrades to banded-LSH candidates in the exact path's infeasible
    regime) with one extra hash shuffle on the cluster key.  The keep rule
    is a total order, so the result is deterministic and engine-portable.

    Pass ``clusters`` (a :func:`cluster_near_dups`-shaped frame — e.g. a
    persisted/materialized one from an earlier pipeline stage) to finalize
    from it directly instead of recomputing the pair graph; the similarity
    parameters are then ignored.
    """
    if clusters is None:
        clusters = cluster_near_dups(
            df,
            id_col,
            text_col,
            threshold=threshold,
            strategy=strategy,
            candidate_budget=candidate_budget,
            on_budget=on_budget,
            max_iter=max_iter,
        )
    toks = df.select(
        id_col, F.size(F.split(F.col(text_col), " ")).alias("n_tokens")
    )
    joined = toks.join(clusters, on=id_col, how="left").select(
        id_col,
        "n_tokens",
        F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        F.coalesce(F.col("cluster_size"), F.lit(1)).alias("cluster_size"),
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_tokens"), F.col(id_col))
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(id_col, "cluster_id", "cluster_size", "n_tokens")
    )
