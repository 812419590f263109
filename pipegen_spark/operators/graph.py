"""Graph operators over edge sets: fixed-iteration PageRank.

Together with connected components (operators/dedup.py dup_clusters,
min-label propagation) and Lloyd's k-means (operators/embeddings.py),
this rounds out the iterative-algorithm family: each iteration is a
plain join + aggregate over the EDGE set, unrolled a fixed number of
times so the whole computation stays declarative and oracle-checkable.

Scale design (100 TB discipline):
- Per iteration: ONE shuffle keyed on the destination node for the
  contribution aggregate; the rank-to-edge join is an equi-join on the
  source node (hash-partitioned; AQE broadcasts if ranks are small).
- Integer arithmetic throughout: total rank mass is PR_SCALE integer
  units, per-edge contributions and the damping step use DIV — the
  truncation is deterministic and identical on both engines, so the
  oracle is bit-exact (the mass lost to truncation per iteration is
  < n_nodes + n_edges units, i.e. < 1e-6 of the mass at the default
  scale — irrelevant for ranking).
- The node count reaches every row as a broadcast 1-row aggregate, not
  a driver-side collect.

Reference parity: the reference (mcolomerc/pipegen) has no graph
operators; this extends it per the north star (SURVEY.md §2B-B29 [EXT]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipegen_spark.functions import dialect as dl

PR_SCALE = 10**12  # total rank mass in integer units
PR_DAMP_NUM = 85  # damping factor 0.85 as a rational
PR_DAMP_DEN = 100


def pagerank_fixed(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge set.

    Every node must have out-degree >= 1 (no dangling-mass step; feed
    symmetric edges for an undirected graph). Returns
    (id, rank_micro) for every node, rank in PR_SCALE integer units.
    """
    src, dst = F.col(src_col), F.col(dst_col)
    # Materialize the edge set ONCE (same discipline as dup_clusters):
    # `edges` is often the tail of an expensive pipeline (here a distinct
    # over the fact scan), and it feeds nodes, out-degrees AND every
    # iteration's contribution join — without truncating the lineage each
    # unrolled round re-executes that whole upstream plan (measured:
    # 5.4 s -> 4.1 s warm at sf0.1 on the supply graph — the remaining
    # cost is the fixed per-stage floor of the unrolled rounds). At
    # cluster scale use durable checkpoint() instead.
    edges = edges.select(src, dst).localCheckpoint(eager=True)
    nodes = (
        edges.select(src.alias("id"))
        .unionByName(edges.select(dst.alias("id")))
        .distinct()
    )
    outdeg = edges.groupBy(src.alias("id")).agg(F.count("*").alias("od"))
    ncnt = nodes.agg(F.count("*").alias("n"))
    base = nodes.crossJoin(F.broadcast(ncnt))
    ranks = base.select(
        "id", "n", F.expr(dl.idiv(str(PR_SCALE), "n", dl.SPARK)).alias("r")
    )
    teleport = dl.idiv(
        f"{(PR_DAMP_DEN - PR_DAMP_NUM)} * CAST({PR_SCALE} AS BIGINT)",
        f"{PR_DAMP_DEN} * n",
        dl.SPARK,
    )
    damped = dl.idiv(
        f"{PR_DAMP_NUM} * coalesce(s, CAST(0 AS BIGINT))",
        str(PR_DAMP_DEN),
        dl.SPARK,
    )
    for _ in range(iters):
        contribs = (
            edges.select(src.alias("id"), dst.alias("to"))
            .join(outdeg, "id")
            .join(ranks.select("id", "r"), "id")
            .select(
                F.col("to").alias("id"),
                F.expr(dl.idiv("r", "od", dl.SPARK)).alias("c"),
            )
        )
        sums = contribs.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = (
            base.join(sums, "id", "left")
            .select(
                "id",
                "n",
                F.expr(f"({teleport}) + ({damped})").alias("r"),
            )
            # NOT checkpointed per round: with the edge set materialized
            # the re-executed lineage is rank-frame-sized joins only, and
            # a measured A/B showed per-round eager checkpoints cost more
            # in extra jobs than they save (4.1 s -> 5.1 s warm at
            # sf0.1). For many more iterations (or big rank frames),
            # checkpoint every K rounds like dup_clusters.
        )
    return ranks.select("id", F.col("r").alias("rank_micro"))
