package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.Graph

/** The distributed connected-components path (label propagation + pointer
  * jumping + checksum fixpoint) exercised over the REAL near-dup pair graph
  * — not just the synthetic toy in GraphSpec — by forcing the size gate to
  * zero. Both paths must produce identical components, so the code that
  * only runs above 1M edges in production is oracle-checked by the
  * union-find result it must match.
  */
class GraphPairSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("distributed CC agrees with union-find on the dedup pair graph") {
    val dsets = Dedup.cachedShingleSets(spark, graft.TestSpark.sfDir)
    val pairs = Dedup.jaccardPairs(dsets)
      .filter(col("jaccard") >= 0.5).select(col("a"), col("b"))
    val sym = Graph.symmetrize(pairs).cache()
    assert(sym.count() > 0, "pair graph is empty — the test proves nothing")
    val local = Graph.connectedComponents(sym)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = Graph.connectedComponents(sym, localEdgeThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sym.unpersist()
    assert(dist == local)
  }
}
