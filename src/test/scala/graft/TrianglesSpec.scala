package graft

import graft.operators.Triangles

/** Exact triangle counts + clustering coefficients on hand-checked
  * graphs. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(nodes: Seq[Long], edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Double)] =
    Triangles.nodeMetrics(nodes.toDF("node"), edges.toDF("u", "v"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap

  test("K4: every node in 3 triangles, clustering 1.0") {
    val nodes = Seq(0L, 1L, 2L, 3L)
    val edges = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val m = metrics(nodes, edges)
    nodes.foreach { n => assert(m(n) == ((3L, 3L, 1.0)), s"node $n") }
  }

  test("triangle + pendant chain: counts and coefficients by hand") {
    // triangle 0-1-2, chain 2-3-4, isolated 5
    val m = metrics(Seq(0L, 1L, 2L, 3L, 4L, 5L),
      Seq(0L -> 1L, 1L -> 2L, 0L -> 2L, 2L -> 3L, 3L -> 4L))
    assert(m(0L) == ((2L, 1L, 1.0)))
    assert(m(1L) == ((2L, 1L, 1.0)))
    // node 2: degree 3, 1 triangle of 3 possible pairs → 2/6 = 0.3333
    assert(m(2L) == ((3L, 1L, 0.3333)))
    assert(m(3L) == ((2L, 0L, 0.0)))   // wedge center, not closed
    assert(m(4L) == ((1L, 0L, 0.0)))   // degree 1 → coefficient 0
    assert(m(5L) == ((0L, 0L, 0.0)))   // isolated
  }

  test("orientation, duplicates, and self-loops do not change counts") {
    val canon = metrics(Seq(0L, 1L, 2L), Seq(0L -> 1L, 1L -> 2L, 0L -> 2L))
    val messy = metrics(Seq(0L, 1L, 2L),
      Seq(1L -> 0L, 0L -> 1L, 2L -> 1L, 0L -> 2L, 2L -> 0L, 1L -> 1L))
    assert(canon == messy)
    assert(canon(0L) == ((2L, 1L, 1.0)))
  }
}
