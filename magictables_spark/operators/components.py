"""Connected components — turns near-duplicate PAIRS into duplicate
GROUPS (the step after any pair-generating dedup: keep one doc per
component). The reference has no graph step at all; large-scale
training-data dedup needs one (pair lists chain: A~B, B~C => {A,B,C}).

Algorithm: min-label propagation. Every node starts labeled with its
own id; each round a node takes the min of its label and its
neighbors' labels; converged when no label changes. Rounds needed =
graph diameter — near-dup graphs are shallow (tight clusters), so this
terminates in a handful of rounds.

Scale notes (100 TB):
- each round is ONE shuffle (edge-label join + min-agg on node id);
  the label frame is |V| rows — tiny next to the corpus;
- ``localCheckpoint`` truncates the lineage each round, or Spark would
  re-execute the whole chain every iteration and the plan would grow
  unboundedly;
- the driver-side loop only reads a 1-row convergence count per round;
  all data stays distributed;
- for adversarial diameters (long chains), swap the propagation body
  for the large-star/small-star rounds of Kiveris et al., "Connected
  Components in MapReduce and Beyond" (SOCC'14) — O(log^2 n) rounds
  with the same (id, label) interface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iter: int = 25,
    strict: bool = True,
) -> DataFrame:
    """(id, component) for every node; component = min reachable id.

    ``edges`` is undirected input (each pair listed once is enough).
    ``nodes`` optionally supplies the full node set (first column) so
    isolated nodes — e.g. documents with no duplicate — appear as
    singleton components.

    Iteration bound: min-label propagation moves a label ONE hop per
    round, so convergence needs ``graph diameter`` rounds — fine for
    near-dup graphs (tight, shallow clusters), adversarial for long
    chains. A run that exhausts ``max_iter`` without converging RAISES
    under ``strict=True`` (the default) instead of silently returning
    half-merged components; callers with genuinely deep graphs should
    raise ``max_iter`` or switch to a large-star/small-star scheme
    (Kiveris et al., SOCC'14)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))

    labels = und.select(F.col("a").alias("id")).distinct()
    if nodes is not None:
        ids = nodes.select(F.col(nodes.columns[0]).alias("id")).distinct()
        labels = labels.union(ids).distinct()
    labels = labels.withColumn("component", F.col("id"))

    converged = False
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, und.b == labels.id)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        proposed = (
            labels.join(nbr_min, labels.id == nbr_min.a, "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce("nbr_min", F.col("component"))).alias(
                    "new_component"
                ),
                "component",
            )
        )
        changed = proposed.filter(F.col("new_component") != F.col("component")).limit(1).count()
        labels = proposed.select(
            "id", F.col("new_component").alias("component")
        ).localCheckpoint(eager=True)
        if changed == 0:
            converged = True
            break
    if not converged and strict:
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} "
            "rounds (graph diameter exceeds the bound); raise max_iter or "
            "use a large-star/small-star scheme for deep graphs"
        )
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_rounds: int = 20,
) -> DataFrame:
    """(id, component) via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SOCC'14) — O(log^2 n) rounds instead of min-label propagation's
    O(diameter), so deep chains converge where :func:`connected_components`
    hits its iteration bound.

    Each round rewrites the edge set:
    - large-star: for every neighborhood, attach all neighbors LARGER
      than the minimum label to that minimum (star around the min);
    - small-star: attach all neighbors <= the center to the minimum.
    Edges monotonically point toward smaller labels; a fixed point means
    every node links directly to its component's minimum id. Per round:
    one groupBy-min + one join — same shuffle budget per round as
    min-label, but exponentially fewer rounds on long paths.
    """
    e = edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
    # undirected, no self loops
    parents = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )

    for _ in range(max_rounds):
        # hash-to-min round: m(a) = min over N(a) ∪ {a}; every member of
        # the closed neighborhood links to m(a). Re-SYMMETRIZING before
        # the next round is what makes minima hop multiple edges per
        # round (distance to the component min roughly halves).
        neigh_min = (
            parents.groupBy("a")
            .agg(F.min("b").alias("mb"))
            .select("a", F.least(F.col("a"), F.col("mb")).alias("m"))
        )
        stars = (
            parents.join(neigh_min, "a")
            .select(F.col("m").alias("x"), F.col("b").alias("y"))
            .union(neigh_min.select(F.col("m").alias("x"), F.col("a").alias("y")))
        )
        relinked = (
            stars.union(stars.select(F.col("y").alias("x"), F.col("x").alias("y")))
            .filter(F.col("x") != F.col("y"))
            .distinct()
            .select(F.col("x").alias("a"), F.col("y").alias("b"))
            .localCheckpoint(eager=True)
        )
        # fixed point: the (distinct, symmetric) edge sets are equal
        if (
            relinked.exceptAll(parents).limit(1).count() == 0
            and parents.exceptAll(relinked).limit(1).count() == 0
        ):
            parents = relinked
            break
        parents = relinked

    # at the fixed point the graph is a star per component; the center
    # (component minimum) still lists its members as neighbors, so the
    # component id is least(self, min neighbor)
    comp = parents.groupBy("a").agg(F.min("b").alias("mb")).select(
        F.col("a").alias("id"), F.least(F.col("a"), F.col("mb")).alias("component")
    )
    # roots (component minima) and isolated nodes map to themselves
    if nodes is not None:
        ids = nodes.select(F.col(nodes.columns[0]).cast("long").alias("id")).distinct()
    else:
        # derive the universe from the RAW edges (not the de-looped
        # working set): a node appearing only in a self-loop is still a
        # node, and min-label's output includes it
        ids = e.select(F.col("a").alias("id")).union(
            e.select(F.col("b").alias("id"))
        ).distinct()
    return ids.join(comp, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )
