"""Distributed graph operators over DataFrame-shaped edge lists.

The engine's graph surface (triangle counting, PageRank, and the
connected components in ``functions/dedup.py``) all follow the same
discipline: the graph is an edge DataFrame, every iteration/step is a
key-equi shuffle join plus a map-side-combinable aggregate, and nothing
ever materializes a neighborhood cross product or funnels through the
driver. Reference parity note: the reference has no graph operators —
these back the dedup-cluster and co-occurrence analyses a training-data
pipeline needs at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meerschaum_spark.functions.persist import pin as _pin


def basket_pairs(df: DataFrame, basket_col: str, item_col: str,
                 out_a: str = "u", out_b: str = "v") -> DataFrame:
    """Within-basket unordered item pairs (``out_a < out_b``), generated
    ARRAY-SIDE: each basket's distinct items aggregate into one sorted
    array (map-side-combined ``collect_set``, one shuffle on the basket
    key) and the O(w²) pair expansion happens inside the task on the
    (small) basket width w — never a basket×basket or row×row join. The
    co-occurrence / market-basket edge builder."""
    baskets = (df.select(basket_col, item_col).distinct()
               .groupBy(basket_col)
               .agg(F.sort_array(F.collect_set(item_col)).alias("_items")))
    arr = F.col("_items")
    n = F.size(arr)
    elem_type = [f.dataType.simpleString() for f in baskets.schema.fields
                 if f.name == "_items"][0][len("array<"):-1]
    pairs = F.when(
        n >= 2,
        F.flatten(F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at(arr, i).alias(out_a),
                    F.element_at(arr, j).alias(out_b))))),
    ).otherwise(F.array().cast(
        f"array<struct<{out_a}:{elem_type},{out_b}:{elem_type}>>"))
    return (baskets.select(F.explode(pairs).alias("_pr"))
            .select(f"_pr.{out_a}", f"_pr.{out_b}"))


def support_edges(pairs: DataFrame, min_support: int,
                  a: str = "u", b: str = "v") -> DataFrame:
    """Distinct undirected edges whose pair co-occurs at least
    ``min_support`` times — one map-side-combined count aggregate."""
    return (pairs.groupBy(a, b)
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= min_support)
            .select(a, b))


def degrees(edges: DataFrame, a: str = "u", b: str = "v",
            node: str = "node") -> DataFrame:
    """Undirected degree per node from an edge list."""
    return (edges.select(F.explode(F.array(a, b)).alias(node))
            .groupBy(node).agg(F.count(F.lit(1)).alias("deg")))


def pagerank_int(edges: DataFrame, iterations: int,
                 scale: int = 1_000_000_000,
                 d_num: int = 85, d_den: int = 100,
                 a: str = "u", b: str = "v",
                 checkpoint_every: int = 8,
                 pin_edges: bool = True) -> DataFrame:
    """PageRank over an UNDIRECTED edge list in exact scaled-integer
    arithmetic — every engine computes bit-identical ranks because the
    only operations are 64-bit integer multiply, floor-divide, and sum.

    Recurrence (per node v, damping d = d_num/d_den)::

        rank0(v)   = scale
        rank_k(v)  = floor((d_den - d_num) * scale / d_den)
                     + Σ_{u ∈ N(v)} floor(d_num * rank_{k-1}(u)
                                          / (d_den * deg(u)))

    Overflow bound: ranks total ≈ |V|·scale, so d_num·max_rank must stay
    under 2^63 — the default scale supports graphs to ~10^8 nodes.

    Scale shape: one directed-both-ways edge frame is built once (the
    only multi-consumer plan — it feeds every iteration, so it is
    checkpointed); each iteration is ONE hash join (ranks → out-edges on
    the source key) and ONE map-side-combinable sum on the destination
    key. Each rank frame has exactly ONE consumer (the next iteration),
    so intermediate checkpoints are NOT needed for recompute safety —
    they exist only to bound Catalyst's analysis cost on deep chains,
    every ``checkpoint_every`` iterations (measured: per-iteration
    checkpointing cost +40% at 5 iterations; an unbounded chain blows
    up analysis time at high iteration counts). Standard
    Pregel-on-DataFrames economics; nothing collects.
    """
    base = (d_den - d_num) * scale // d_den
    # the edge list feeds degrees() AND both arms of the directed union
    # below — pin it so the (possibly expensive) edge derivation — e.g.
    # part_pagerank's basket expansion + support filter — materializes
    # once instead of per consumer (pin_edges=False when the caller
    # hands in an already-checkpointed frame — a second eager
    # checkpoint would copy it for nothing)
    if pin_edges:
        edges = edges.transform(_pin)
    deg = degrees(edges, a, b)
    directed = (edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
                .unionByName(
                    edges.select(F.col(b).alias("src"),
                                 F.col(a).alias("dst"))))
    out_edges = (directed.join(deg.withColumnRenamed("node", "src"),
                               on="src")
                 .transform(_pin))
    ranks = deg.select(F.col("node"),
                       F.lit(int(scale)).cast("long").alias("rank"))
    for i in range(int(iterations)):
        contrib = (out_edges
                   .join(ranks.withColumnRenamed("node", "src"), on="src")
                   .select(F.col("dst").alias("node"),
                           F.expr(f"({d_num} * rank) div ({d_den} * deg)")
                           .alias("c")))
        ranks = (contrib.groupBy("node")
                 .agg((F.lit(int(base)) + F.sum("c")).cast("long")
                      .alias("rank")))
        if (i + 1) % max(1, int(checkpoint_every)) == 0:
            ranks = ranks.transform(_pin)
    return ranks
