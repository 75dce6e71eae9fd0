"""Graph network operators (the GNM subsystem, gnm/gnmgraph.cpp):
DijkstraShortestPath (:185,242), ConnectedComponents (:427) re-expressed
as iterative DataFrame fixpoints (the GraphFrames/Pregel shape).

Both operators loop on the driver but every iteration is a pure
distributed join + groupBy; the driver only checks a convergence
count. Iteration counts are bounded by the graph diameter — at scale
add `.localCheckpoint()` every few rounds to cut lineage (noted
inline). Edges are (src, dst, weight) rows; graphs are treated as
DIRECTED (pass both directions for undirected semantics, matching
GNMGraph's explicit direction handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected view: every edge in both directions."""
    cols = edges.columns
    rev = edges.select(
        F.col(dst).alias(src), F.col(src).alias(dst),
        *[c for c in cols if c not in (src, dst)],
    )
    return edges.select(*cols).unionByName(rev.select(*cols))


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """(node, component) with component = min node id reachable
    (GNMGraph::ConnectedComponents, gnm/gnmgraph.cpp:427). Classic
    min-label propagation: labels converge in O(diameter) rounds; each
    round is one join + one groupBy (all shuffles on the node key)."""
    e = symmetrize(edges.select(src, dst), src, dst)
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("component", F.col("node"))
    for it in range(max_iterations):
        # neighbor labels: for each dst, the min label among its srcs
        nbr = (
            e.join(labels, e[src] == labels["node"])
            .select(F.col(dst).alias("node"), "component")
            .groupBy("node")
            .agg(F.min("component").alias("nbr_min"))
        )
        new = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        new = new.localCheckpoint(eager=True)  # cut lineage per round
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def shortest_paths(
    edges: DataFrame,
    source,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    max_iterations: int = 50,
) -> DataFrame:
    """(node, dist) single-source shortest path costs
    (GNMGraph::DijkstraShortestPath, gnm/gnmgraph.cpp:185).
    Distributed Bellman-Ford relaxation: each round relaxes every edge
    once (join on the frontier, groupBy(dst) min); terminates when no
    distance improves. Unreachable nodes are absent from the result
    (the reference returns an empty path for them)."""
    e = edges.select(src, dst, weight)
    dist = e.sparkSession.createDataFrame(
        [(source, 0.0)], f"node {e.schema[src].dataType.simpleString()}, dist double"
    )
    for it in range(max_iterations):
        relax = (
            e.join(dist, e[src] == dist["node"])
            .select(
                F.col(dst).alias("node"),
                (F.col("dist") + F.col(weight).cast("double")).alias("cand"),
            )
            .groupBy("node")
            .agg(F.min("cand").alias("cand"))
        )
        new = (
            dist.join(relax, "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(float("inf"))),
                    F.coalesce(F.col("cand"), F.lit(float("inf"))),
                ).alias("dist"),
            )
        )
        new = new.localCheckpoint(eager=True)
        improved = (
            new.alias("n")
            .join(dist.alias("o"), "node", "left")
            .filter(F.col("o.dist").isNull() | (F.col("n.dist") < F.col("o.dist")))
            .count()
        )
        dist = new
        if improved == 0:
            break
    return dist
