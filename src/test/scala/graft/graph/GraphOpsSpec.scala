package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked graph primitives on tiny crafted graphs. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("triangles: one closed triangle plus a dangling spoke") {
    // 1-2-3 closed, 4 hangs off 1
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
      .toDF("src", "dst")
    val rows = GraphOps.triangles(edges).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(rows(1L).getAs[Long]("n_triangles") === 1L)
    assert(rows(2L).getAs[Long]("n_triangles") === 1L)
    assert(rows(4L).getAs[Long]("n_triangles") === 0L)
    assert(rows(2L).getAs[Double]("clustering") === 1.0) // deg 2, 1 tri
    // node 1: degree 3, one triangle → 2·1/(3·2) = 1/3
    assert(rows(1L).getAs[Double]("clustering") === 0.333333)
    assert(rows(4L).getAs[Double]("clustering") === 0.0)
  }

  test("pagerank: mass conserved, symmetric nodes tie, sink-free cycle is uniform") {
    // directed 3-cycle: perfectly symmetric → uniform ranks
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = GraphOps.pageRank(cycle).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("pagerank")).toMap
    assert(pr.values.toSet.size === 1, s"cycle ranks must be uniform: $pr")
    assert(math.abs(pr.values.sum - 1.0) < 1e-4)
    // star: everything points at 5 → 5 outranks the leaves
    val star = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L), (5L, 1L))
      .toDF("src", "dst")
    val ps = GraphOps.pageRank(star).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("pagerank")).toMap
    assert(ps(5L) > ps(2L) && ps(2L) === ps(3L) && ps(3L) === ps(4L))
    assert(ps(1L) > ps(2L)) // 1 receives 5's whole rank
  }
}
