"""Hand-computed fixture test for G4 message passing: pins the exact
per-layer arithmetic (gate, mean aggregation, self-loop mix) that the
rows-only driver check can't see.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mathorcup_spark.ml.graph_embed import propagate


@pytest.fixture(scope="module")
def tiny_graph(spark):
    nodes = spark.createDataFrame(
        [
            Row(node_id=0, feat=[1.0, 0.0]),
            Row(node_id=1, feat=[0.0, 1.0]),
            Row(node_id=2, feat=[2.0, 2.0]),
        ]
    )
    #   0 -r0-> 2   (gate 1/(1+0) = 1.0)
    #   1 -r1-> 2   (gate 1/(1+1) = 0.5)
    #   0 -r0-> 1
    edges = spark.createDataFrame(
        [Row(src=0, rel=0, dst=2), Row(src=1, rel=1, dst=2), Row(src=0, rel=0, dst=1)]
    )
    return nodes, edges


def test_one_layer_hand_computed(spark, tiny_graph):
    nodes, edges = tiny_graph
    out = {r.node_id: r.feat for r in propagate(nodes, edges, n_layers=1).collect()}
    # node 0: no in-edges → 0.5 * [1,0]
    assert out[0] == [0.5, 0.0]
    # node 1: one in-edge from 0 gated 1.0 → mean=[1,0];
    #         0.5*[0,1] + 0.5*[1,0] = [0.5, 0.5]
    assert out[1] == [0.5, 0.5]
    # node 2: msgs [1,0]*1.0 and [0,1]*0.5 → mean=[0.5, 0.25];
    #         0.5*[2,2] + 0.5*[0.5,0.25] = [1.25, 1.125]
    assert out[2] == [1.25, 1.125]


def test_two_layers_compose(spark, tiny_graph):
    nodes, edges = tiny_graph
    l1 = {r.node_id: r.feat for r in propagate(nodes, edges, n_layers=1).collect()}
    l2 = {r.node_id: r.feat for r in propagate(nodes, edges, n_layers=2).collect()}
    # layer 2 applied to layer-1 features, node 1:
    # 0.5*l1[1] + 0.5*(l1[0]*1.0)
    want = [0.5 * a + 0.5 * b for a, b in zip(l1[1], l1[0])]
    assert l2[1] == pytest.approx(want, abs=1e-12)


def test_deterministic_across_runs(spark, tiny_graph):
    nodes, edges = tiny_graph
    a = sorted(map(tuple, propagate(nodes, edges, 2).collect()))
    b = sorted(map(tuple, propagate(nodes, edges, 2).collect()))
    assert a == b


def test_matrix_msg_hand_computed(spark, tiny_graph):
    """The full-matrix face: one layer over the tiny graph must equal
    the NumPy-free hand replay msg = W_r · feat with
    W_r = sum_b coef(r,b) V_b (basis_matrix_msg's exact algebra)."""
    from mathorcup_spark.ml.graph_embed import _mm_v, basis_matrix_msg

    nodes, edges = tiny_graph

    def w(rel, i, j, B=2):
        acc = None
        for b in range(B):
            coef = (((rel + b) % B) + 1) / (B + 1)
            term = coef * _mm_v(b, i, j, 2)
            acc = term if acc is None else acc + term
        return acc

    def matvec(rel, feat):
        out = []
        for i in range(2):
            acc = 0.0
            for j in range(2):
                acc = acc + feat[j] * w(rel, i, j)
            out.append(acc)
        return out

    got = {
        r.node_id: r.feat
        for r in propagate(
            nodes, edges, n_layers=1,
            msg_fn=basis_matrix_msg(n_bases=2, n_dims=2),
        ).collect()
    }
    # node 2 receives msgs from 0 (rel 0, feat [1,0]) and 1 (rel 1,
    # feat [0,1]); mean then 0.5/0.5 self-mix with [2,2]
    m0, m1 = matvec(0, [1.0, 0.0]), matvec(1, [0.0, 1.0])
    mean = [(a + b) / 2 for a, b in zip(m0, m1)]
    want2 = [0.5 * 2.0 + 0.5 * m for m in mean]
    assert got[2] == pytest.approx(want2, abs=1e-12)
    # node 0: no in-edges -> pure self decay
    assert got[0] == [0.5, 0.0]
