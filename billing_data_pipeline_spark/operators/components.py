"""[EXT] Connected components for near-duplicate cluster resolution.

Pairwise near-dup detection (MinHash/SimHash/embedding-cosine) yields
EDGES; dedup policy usually needs CLUSTERS — "keep one canonical doc per
group of transitively-connected near-dups". Greedy keep-first (drop the
larger id of every pair, operators/similarity.cosine_dedup_survivors) can
over-keep on chains (a~b, b~c, a!~c drops b and c but keeps a AND c's
cluster split); transitive closure is the principled answer and needs an
iterative fixpoint — the one genuinely non-single-pass operator in the
dedup stack.

Implementation: min-label propagation. Every node starts labeled with its
own id; each round every node takes the min of its own label and its
neighbors' labels; fixpoint = every node labeled with the min id of its
component. Rounds = graph diameter — near-dup clusters are shallow (a
handful of hops), so this converges in 2-4 rounds in practice. Each round
is one join (labels into edges, shuffle on the node key) + one groupBy
min; `localCheckpoint` truncates the growing lineage so round N's plan
does not replay rounds 1..N-1. At 100 TB-with-long-chains scale the
standard upgrade is alternating large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), which squares
the label-jump distance per round (O(log n) rounds); the row-level
operators (join + min-agg) are identical, so this module is the same plan
shape with more rounds.

Convergence detection is driver-side but O(1) data: labels only ever
decrease, so SUM(label) is strictly decreasing until fixpoint and equal
exactly at it — one scalar action per round, no row-level diff join.

Oracle: DuckDB expresses the same fixpoint declaratively as a recursive
CTE (reachability, then MIN over reached ids per node) — so even this
iterative operator is hash-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame, edges: DataFrame, id_col: str = "id", max_rounds: int = 25
) -> DataFrame:
    """(id) + undirected (src, dst) edges -> (id, component_id) where
    component_id = min node id reachable from id. Deterministic; singleton
    nodes keep their own id."""
    bidir = edges.selectExpr("src", "dst").unionByName(
        edges.selectExpr("dst AS src", "src AS dst")
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    prev_sum = None
    for _ in range(max_rounds):
        msgs = bidir.join(labels, bidir.src == labels.id).select(
            F.col("dst").alias("id"), "label"
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("id", F.col("label").alias("component_id"))


def components_oracle_sql(nodes_sql: str, pairs_sql: str, id_col: str) -> str:
    """DuckDB twin: recursive reachability closure, then MIN(reached) per
    node. ``pairs_sql`` must yield columns (id_a, id_b); ``nodes_sql`` a
    relation with ``id_col``. UNION (distinct) bounds the working set and
    guarantees termination."""
    return f"""
WITH RECURSIVE pairs AS (
    SELECT id_a, id_b FROM ({pairs_sql}) p
),
e AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(src, dst) AS (
    SELECT {id_col}, {id_col} FROM ({nodes_sql}) n
    UNION
    SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
)
SELECT src AS {id_col}, MIN(dst) AS component_id FROM reach GROUP BY src
"""
