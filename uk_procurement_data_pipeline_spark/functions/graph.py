"""Distributed connected components: min-label propagation + pointer jumping.

The Spark form of union-find for grouping near-duplicate documents beyond
pairwise matches (SURVEY.md §2 D3 clustering): every node repeatedly adopts
the smallest label among itself and its neighbours until no label changes.

Two methods:
- ``method="jump"`` (default, the 100 TB answer): every round is one
  propagation step (adopt the min label among self + neighbours) followed
  by one pointer-jumping step (adopt your label's label — path halving, as
  in classic PRAM list-ranking and the MapReduce CC literature, e.g.
  Rastogi et al. HashToMin / Kiveris et al. large-star small-star). The
  min label travels ~2^k hops after k rounds, so rounds ~ log2(diameter):
  a 64-hop chain converges in 6 rounds where plain propagation needs 63.
- ``method="label"``: plain propagation, one shuffle per round, rounds ~
  diameter. Kept for comparison and for shallow graphs where the extra
  self-join per round costs more than it saves.

Scale notes (the parts that matter at 100 TB):
- Each round is a constant number of shuffles (edge⋈label join + groupBy
  min, plus for "jump" one label⋈label self-join) — linear in edge count,
  never all-pairs.
- The loop STOPS on convergence (changed-label count reaches 0), not on a
  fixed iteration budget — a fixed budget silently mislabels any component
  whose diameter exceeds it. At the fixpoint the label is constant along
  every edge and the component minimum labels itself, so labels are exact.
- Iterative plans MUST materialize per round (``localCheckpoint``):
  lazy lineage doubles every iteration and re-runs the upstream pipeline
  each round (measured 242s vs ~3s at sf0.1 for the minhash pair graph).
- The convergence probe is a ``count`` over the *already materialized*
  round result, so it adds one cheap job per round, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 32,
    method: str = "jump",
) -> DataFrame:
    """Return ``(node, component)`` where component = min reachable node id.

    ``edges`` is treated as undirected (both directions are added here).
    Isolated nodes never appear in ``edges`` and so are absent from the
    result — callers join back to their node table if singletons matter.
    Raises ``RuntimeError`` if ``max_rounds`` is hit before convergence so
    wrong labels can never be returned silently.

    ``method="jump"`` adds a pointer-jumping (path-halving) step each round
    — rounds ~ log2(diameter) instead of ~ diameter (see module docstring).
    Correctness of the jump step: a node's label is always a node id in the
    same component (the min over some reachable subset), so adopting the
    label's own label stays within the component and only decreases.
    """
    if method not in ("jump", "label"):
        raise ValueError(f"unknown method {method!r}; use 'jump' or 'label'")
    sym = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        nb_min = (
            sym.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("label").alias("nb_label")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nb_label").alias("nb_min"))
        )
        stepped = labels.join(nb_min, labels.node == nb_min.src, "left").select(
            "node",
            F.col("label").alias("prev_label"),
            F.least(
                F.col("label"), F.coalesce(F.col("nb_min"), F.col("label"))
            ).alias("label"),
        )
        if method == "jump":
            # Path halving: label := label(label), looked up in THIS round's
            # freshly-propagated table (jumping through the stale previous
            # round only compounds to 2^k - 1 hops; through the current one
            # it reaches 2^(k+1) - 2). Every label is itself a node in the
            # table (it is the min of a set of node ids from this
            # component), so the left join cannot miss — coalesce keeps the
            # step total regardless. Materialize the propagated result
            # first so the self-join does not recompute the edge join.
            stepped = stepped.localCheckpoint(eager=True)
            parent = stepped.select(
                F.col("node").alias("label"), F.col("label").alias("gp_label")
            )
            stepped = stepped.join(parent, "label", "left").select(
                "node",
                "prev_label",
                F.least(
                    F.col("label"), F.coalesce(F.col("gp_label"), F.col("label"))
                ).alias("label"),
            )
        stepped = stepped.localCheckpoint(eager=True)
        labels = stepped.select("node", "label")
        if stepped.where(F.col("label") != F.col("prev_label")).count() == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge within {max_rounds} rounds "
        f"(method={method!r}); raise max_rounds (rounds ~ log2(diameter) "
        "for 'jump', ~ diameter for 'label')"
    )
