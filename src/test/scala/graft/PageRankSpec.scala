package graft

import graft.operators.PageRank

/** Exact micro-unit PageRank: hand-checked updates, conservation,
  * dangling/isolated behavior, determinism. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] =
    PageRank.ranksMicro(nodes.toDF("node"),
      edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two-node cycle is a fixpoint at the initial rank") {
    // r' = 150000 + 85*(10^6/1)/100 = 10^6 for both, every iteration
    val r = ranks(Seq(1L, 2L), Seq(1L -> 2L, 2L -> 1L), 5)
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("hub-and-spoke: one iteration matches the integer update by hand") {
    // hub 0 -> leaves 1,2 (outdeg 2); leaves -> hub (outdeg 1)
    // r1(hub)  = 150000 + 85*(10^6 + 10^6)/100   = 1_850_000
    // r1(leaf) = 150000 + 85*(10^6 DIV 2)/100    =   575_000
    val e = Seq(0L -> 1L, 0L -> 2L, 1L -> 0L, 2L -> 0L)
    val r1 = ranks(Seq(0L, 1L, 2L), e, 1)
    assert(r1 == Map(0L -> 1850000L, 1L -> 575000L, 2L -> 575000L))
    // micro-unit mass is conserved up to the documented floor bleed
    val r10 = ranks(Seq(0L, 1L, 2L), e, 10)
    val total = r10.values.sum
    assert(total <= 3000000L && total > 3000000L - 10 * 4)
    // hub stays the most central node
    assert(r10(0L) > r10(1L) && r10(1L) == r10(2L))
  }

  test("isolated nodes settle at the damping floor; dangling nodes absorb") {
    // 1 -> 2 (2 dangling), 3 isolated
    val r = ranks(Seq(1L, 2L, 3L), Seq(1L -> 2L), 3)
    assert(r(3L) == 150000L)          // no in-edges ever
    assert(r(1L) == 150000L)          // loses its mass, gains none
    // 2 receives from 1's decaying rank; after 3 iters:
    // r1(2)=150000+850000=1000000; r1(1)=150000
    // r2(2)=150000+85*150000/100=277500; r3(2)=277500 (1 stays 150000)
    assert(r(2L) == 277500L)
  }

  test("parallel edges weight contributions per occurrence") {
    // 1 -> 2 twice, 1 -> 3 once: outdeg(1)=3, 2 gets 2 shares
    val r = ranks(Seq(1L, 2L, 3L),
      Seq(1L -> 2L, 1L -> 2L, 1L -> 3L), 1)
    // share = 10^6 DIV 3 = 333333
    assert(r(2L) == 150000L + 85L * (2 * 333333L) / 100L)
    assert(r(3L) == 150000L + 85L * 333333L / 100L)
  }

  test("personalized walk: teleport mass stays with the seeds; unreachable nodes rank 0") {
    // path 1 -> 2 -> 3, seed {1}; 4 isolated
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val edges = Seq(1L -> 2L, 2L -> 3L).toDF("src", "dst")
    val r = PageRank.ranksMicro(nodes, edges, 3,
      seeds = Some(Seq(1L).toDF("node")))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // seed keeps its base every iteration (nothing points at it)
    assert(r(1L) == 150000L)
    // nodes NOT reachable from a seed get exactly 0 — no damping floor
    assert(r(4L) == 0L)
    // proximity ordering: 2 (one hop) above 3 (two hops)
    assert(r(2L) > r(3L) && r(3L) > 0L)
    // hand-check r(2): i1 = 0 + 85%*10^6 = 850000; i2 = 85%*150000 =
    // 127500; i3 stays 127500 (1's rank is 150000 from i1 on)
    assert(r(2L) == 127500L)
    // global walk over the same graph gives 4 the damping floor
    val g = PageRank.ranksMicro(nodes, edges, 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(g(4L) == 150000L)
  }

  test("deterministic across runs and partitionings") {
    val nodes = (0L until 200L)
    val edges = nodes.flatMap(i => Seq(i -> ((i * 7 + 1) % 200),
      i -> ((i * 13 + 5) % 200)))
    val a = ranks(nodes, edges, 6)
    val b = PageRank.ranksMicro(
      nodes.toDF("node").repartition(7),
      edges.toDF("src", "dst").repartition(3), 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
