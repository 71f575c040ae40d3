package graft

import org.scalatest.funsuite.AnyFunSuite

/** Search-family semantics + plan-shape guards (see operators/Search). */
class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)

  private def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("q_search_conjunctive is map-only: no exchange before the sort") {
    // scan → filter → project; the only exchange permitted is the final
    // presentation orderBy
    val p = plan("q_search_conjunctive")
    val sortAt = p.indexOf("Sort")
    assert(sortAt >= 0, s"expected the presentation sort in the plan:\n$p")
    val fromSortDown = p.substring(sortAt) // the subtree at and below Sort
    assert(fromSortDown.sliding("Exchange".length).count(_ == "Exchange") <= 1, p)
    // conjunctive semantics: every returned doc contains all query terms
    val docs = run("q_search_conjunctive").collect().map(_.getLong(0)).toSet
    assert(docs.nonEmpty)
    import org.apache.spark.sql.functions._
    val texts = graft.core.Tables.load(spark, TestSpark.sfDir, "documents")
      .filter(col("doc_id").isin(docs.take(5).toSeq: _*))
      .select(lower(col("text"))).collect().map(_.getString(0))
    texts.foreach { t =>
      graft.operators.Search.queryTerms.foreach(q => assert(t.contains(q), q))
    }
  }

  test("q_bm25 broadcasts the corpus-constants row; no corpus-wide join shuffle") {
    val p = plan("q_bm25")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // top-k, not a global sort materialization
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_heavy_hitters aggregates partially map-side and takes top-k") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    val rows = run("q_heavy_hitters").collect()
    assert(rows.length == 20)
    // descending frequency with term tiebreak
    val freqs = rows.map(_.getAs[Long]("freq"))
    assert(freqs.sameElements(freqs.sortBy(-_)))
  }

  test("q_inverted_index filters to query terms before the aggregate") {
    val rows = run("q_inverted_index").collect()
    assert(rows.map(_.getAs[String]("term")).toSeq ==
      graft.operators.Search.queryTerms.sorted)
    rows.foreach(r => assert(r.getAs[Long]("df") > 0))
  }

  test("q_tfidf emits at most 3 terms per sampled doc, weight-descending") {
    val rows = run("q_tfidf").collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val ws = rs.map(_.getAs[Double]("weight"))
      assert(ws.sameElements(ws.sortBy(-_)))
    }
  }

  test("q_approx_distinct sketch lands within the asserted bound") {
    val r = run("q_approx_distinct").collect().head
    assert(r.getAs[Boolean]("approx_ok"))
    assert(r.getAs[Long]("n_exact") > 0)
  }
}
