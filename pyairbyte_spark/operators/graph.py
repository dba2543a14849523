"""Bounded-iteration graph algorithms as DataFrame plans.

Complements ``operators/dedup.py::connected_components`` (min-label
propagation) with weighted iterative computation — PageRank — engineered
the same way the HLL sketch is: *integer-exact*, so a SQL oracle can
verify every rank unit-for-unit instead of hand-waving about float
convergence.

Fixed-point trick: ranks live in integer "units" (default 1e9 per unit
mass). Every per-iteration step is integer arithmetic — contribution =
``rank DIV out_degree`` (truncating division, identical in Spark and
DuckDB for non-negative values), damping = ``(85 * sum) DIV 100`` —
so K unrolled SQL CTE iterations reproduce the distributed loop
bit-for-bit. Float PageRank cannot be oracle-checked this way (sum
order changes the low bits); integer sums are order-independent.

Scale: each iteration is one (edges ⋈ ranks) hash join on the source
id plus one groupBy on the destination — the standard GraphX/Pregel
message shape, partitioned by node id, no driver materialization. The
iteration count is a bounded hyperparameter (walk length), not a
convergence loop, so the plan depth is fixed.

Overflow headroom: sum of all rank mass ~ N * scale; the 85× damping
multiply needs N * scale * 85 < 2^63, so the default scale (1e9)
is safe past 10^8 nodes.

Reference analog: none (the reference has no graph surface); extends
the §2.11 beyond-reference inventory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000

# Below this many nodes, per-iteration rank/degree/contribution tables
# are BROADCAST to the edge scan instead of shuffle-joined: the edge
# list (the big side) then never crosses an exchange — each iteration
# shuffles only the partially-aggregated (node, contribution) pairs.
# Rank rows are ~60 bytes in a hash relation, so the default (2M nodes
# ≈ 120 MB broadcast) stays well inside executor memory; above it the
# sort-merge path takes over (a billion-node graph cannot broadcast
# its rank vector). Size-adaptive, decided from a measured count —
# not a local-mode constant.
PAGERANK_BROADCAST_MAX_NODES = int(
    os.environ.get("SPARK_GRAFT_PAGERANK_BROADCAST_NODES", "2000000")
)


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge list.

    Returns (node, rank_units) where rank_units is the fixed-point
    rank after ``iterations`` steps from a uniform start of ``scale``
    units per node. Dangling mass is dropped (simplified PageRank) —
    feed symmetric edges for an undirected walk, which has none.
    """
    # Edges/degrees/nodes feed every iteration: checkpoint them once so
    # round N does not rebuild the base scan N times from lineage (the
    # same discipline as connected_components); each round's ranks are
    # checkpointed so the plan stays ONE round deep.
    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst")
    ).localCheckpoint(eager=False)
    deg = (
        e.groupBy("__src")
        .agg(F.count(F.lit(1)).alias("__deg"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    base = (scale * (100 - damping_pct)) // 100
    # One count decides the join strategy for every iteration: rank /
    # degree / contribution tables are all bounded by the node count,
    # and when that fits a broadcast the (much larger) edge table never
    # shuffles — integer sums are order-independent, so the result is
    # bit-identical either way.
    bcast = nodes.count() <= PAGERANK_BROADCAST_MAX_NODES
    hint = F.broadcast if bcast else (lambda df: df)
    ranks = nodes.withColumn("r", F.lit(scale).cast("long"))
    prev_ckpt = None
    for i in range(iterations):
        contrib = (
            e.join(hint(ranks), e.__src == ranks.node)
            .join(hint(deg), "__src")
            .select(
                F.col("__dst").alias("node"),
                F.expr("r DIV __deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = nodes.join(hint(contrib), "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_pct} * coalesce(__s, 0L)) DIV 100"
                )
            ).cast("long").alias("r"),
        )
        if bcast:
            # Broadcast path: DON'T checkpoint per round. The fused
            # plan chains the K broadcast stages under ONE action —
            # AQE materializes round i's rank broadcast from round
            # i-1's stage output, nothing recomputes (e/deg/nodes are
            # checkpointed leaves; the identical deg broadcast subtree
            # becomes a ReusedExchange), and the K driver round-trips
            # the eager checkpoints paid (plus their block writes)
            # drop out. Plan depth grows linearly in the bounded
            # iteration count, so planning stays cheap.
            continue
        if i < iterations - 1:
            # Sort-merge path (node count above the broadcast bound):
            # eager per-round checkpoints keep the plan ONE round deep
            # — at that scale planning a K-round SMJ lineage (and
            # re-sorting through it on a retry) costs more than the
            # round-trips. The release below truncates lineage, so the
            # new round MUST be materialized before its input's blocks
            # go (the connected_components discipline).
            ranks = ranks.localCheckpoint(eager=True)
            if prev_ckpt is not None:
                from pyairbyte_spark.operators.dedup import (
                    _release_local_checkpoint,
                )

                _release_local_checkpoint(prev_ckpt)
            prev_ckpt = ranks
    return ranks.select("node", F.col("r").alias("rank_units"))
