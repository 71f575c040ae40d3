package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.Graph

/** Connected-components: the size-gated local union-find and the
  * distributed label-propagation loop must agree exactly. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("local union-find and distributed propagation agree") {
    import spark.implicits._
    // chains, a cycle, an isolated pair, and a star — varied diameters
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),       // chain 1..5
      (10L, 11L), (11L, 12L), (12L, 10L),            // cycle
      (20L, 21L),                                    // pair
      (30L, 31L), (30L, 32L), (30L, 33L), (30L, 34L) // star
    ).toDF("a", "b")
    val sym = Graph.symmetrize(edges)
    val local = Graph.connectedComponents(sym)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = Graph.connectedComponents(sym, localEdgeThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(local == dist)
    val expected = (1L to 5L).map(_ -> 1L) ++
      Seq(10L, 11L, 12L).map(_ -> 10L) ++ Seq(20L, 21L).map(_ -> 20L) ++
      (30L to 34L).map(_ -> 30L)
    assert(local == expected.toSet)
  }
}
