"""Distributed connected components via min-label propagation.

The Spark form of union-find for grouping near-duplicate documents beyond
pairwise matches (SURVEY.md §2 D3 clustering): every node repeatedly adopts
the smallest label among itself and its neighbours until no label changes.

Scale notes (the parts that matter at 100 TB):
- Each round is ONE shuffle (edge⋈label join + groupBy min) — linear in
  edge count, never all-pairs.
- Rounds are bounded by the graph diameter, and the loop STOPS on
  convergence (changed-label count reaches 0), not on a fixed iteration
  budget — a fixed budget silently mislabels any component whose diameter
  exceeds it.
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
) -> DataFrame:
    """Return ``(node, component)`` where component = min reachable node id.

    ``edges`` is treated as undirected (both directions are added here).
    Isolated nodes never appear in ``edges`` and so are absent from the
    result — callers join back to their node table if singletons matter.
    Raises ``RuntimeError`` if ``max_rounds`` is hit before convergence so
    wrong labels can never be returned silently.
    """
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
        stepped = (
            labels.join(nb_min, labels.node == nb_min.src, "left")
            .select(
                "node",
                F.col("label").alias("prev_label"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nb_min"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        labels = stepped.select("node", "label")
        if stepped.where(F.col("label") != F.col("prev_label")).count() == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge within {max_rounds} rounds; "
        "raise max_rounds (rounds needed ~ graph diameter; consider "
        "pointer-jumping / large-star small-star for log-diameter graphs)"
    )
