"""G4: relational message passing on DataFrames (SURVEY.md §2.10 G4,
§4.2 decision 1).

The reference's RGCN layer (``src/model/rgcn.py:45-125``) computes,
per layer: for every edge, transform the source feature by a
per-relation weight, mean-aggregate at the destination, add a
self-loop term, apply an activation. Catalyst cannot express
iteration, so the layer loop lives on the driver with
``localCheckpoint()`` per iteration to truncate lineage — the one
place in the engine where imperative control flow is genuinely
required (SURVEY §4.2: "no custom Catalyst rule — just loop
discipline").

Feature vectors are ``array<double>`` columns; the per-edge transform
is a relation-dependent *scalar* gate (the basis-decomposition
special case with one basis) so everything stays in JVM array
arithmetic — zip_with/transform — with no Python in the loop. The
full-matrix variant slots a Pandas-UDF matmul into ``_edge_message``
without touching the propagation skeleton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


def propagate(
    nodes: DataFrame,          # (node_id long, feat array<double>)
    edges: DataFrame,          # (src long, rel long, dst long)
    n_layers: int = 2,
    self_weight: float = 0.5,
    n_dims: int | None = None,
) -> DataFrame:
    """Iterative mean-aggregation message passing.

    Per layer:  feat'(v) = self_weight * feat(v)
                + (1-self_weight) * mean over in-edges (u,r,v) of
                  gate(r) * feat(u),      gate(r) = 1 / (1 + r)

    Deterministic (mean via exact count + per-dimension sum of gated
    features; summation order inside a dimension is engine-managed but
    the test fixture uses exactly-representable values).

    ``n_dims`` (feature width) is read off the first node row when not
    given — one tiny driver action before the loop, never per-layer.
    """
    if n_dims is None:
        n_dims = len(nodes.select("feat").head()[0])
    gate = 1.0 / (1.0 + F.col("rel").cast("double"))
    feats = nodes
    for _ in range(n_layers):
        msgs = (
            edges.join(feats.withColumnRenamed("node_id", "src"), "src")
            .select(
                F.col("dst").alias("node_id"),
                F.transform("feat", lambda x: x * gate).alias("msg"),
            )
        )
        # One groupBy(node_id) with a sum per dimension column: the
        # aggregate state per node is n_dims partial-sum cells + one
        # count, so task memory is O(1) in in-degree — a power-law hub
        # with 10^8 in-edges costs the same task memory as a leaf.
        # No posexplode (row count stays |edges|, not |edges|·dims),
        # no collect_list (hash aggregate stays in whole-stage
        # codegen; list aggregation would force ObjectHashAggregate).
        agg = (
            msgs.groupBy("node_id")
            .agg(
                F.count("*").alias("n_in"),
                *[
                    F.sum(F.col("msg").getItem(i)).alias(f"s{i}")
                    for i in range(n_dims)
                ],
            )
            .select(
                "node_id",
                "n_in",
                F.array(*[F.col(f"s{i}") for i in range(n_dims)]).alias(
                    "sum_msg"
                ),
            )
        )
        feats = (
            feats.join(agg, "node_id", "left")
            .select(
                "node_id",
                F.when(
                    F.col("n_in").isNotNull(),
                    F.zip_with(
                        "feat",
                        F.transform(
                            "sum_msg", lambda s: s / F.col("n_in")
                        ),
                        lambda f, m: self_weight * f + (1 - self_weight) * m,
                    ),
                )
                .otherwise(F.transform("feat", lambda f: f * self_weight))
                .alias("feat"),
            )
        )
        # truncate lineage: without this the plan doubles per layer
        feats = feats.localCheckpoint(eager=True)
    return feats


@register(
    "ml_graph_propagate",
    oracle=None,
    doc="G4: 2-layer relational message passing over the part "
    "co-occurrence graph — source features gated per relation, "
    "mean-aggregated at destinations, mixed with a self-loop term; "
    "driver-side layer loop with localCheckpoint lineage truncation. "
    "Rows-only check; exact propagation arithmetic is pinned by a "
    "hand-computed fixture test.",
    tags=("G4", "M1", "ml"),
)
def ml_graph_propagate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # small deterministic graph: suppliers as nodes, lineitem part->supp
    # co-occurrence as edges, one-hot-ish features from the node id
    lineitem = load(spark, sf_dir, "lineitem")
    edges = (
        lineitem.select(
            F.col("l_partkey").alias("src"),
            (F.col("l_linenumber") % 3).cast("long").alias("rel"),
            F.col("l_suppkey").alias("dst"),
        )
        .dropDuplicates()
    )
    nodes = (
        edges.select(F.col("src").alias("node_id"))
        .union(edges.select("dst"))
        .distinct()
        .select(
            "node_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda i: F.when((F.col("node_id") % 8).cast("int") == i.cast("int"), 1.0).otherwise(0.0),
            ).alias("feat"),
        )
    )
    out = propagate(nodes, edges, n_layers=2)
    return out.select(
        "node_id",
        F.round(F.get("feat", 0), 6).alias("f0"),
        F.round(F.get("feat", 1), 6).alias("f1"),
        F.round(F.aggregate("feat", F.lit(0.0), lambda a, x: a + x), 6).alias("fsum"),
    )
