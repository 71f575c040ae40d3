package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.lang._
import graft.lang.Lang._
import graft.lang.Compiler._

/** The automatic index rewrite (IndexTransf): a plain eq-filter loop must
  * transparently execute against a keyed in-memory index — the reference's
  * transf_to_idx + eq_filter_to_lookup behavior, plan-asserted.
  */
class IndexTransfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def loopOver(table: String, attr: String): Command =
    CForeach(EBinop(OCons, EAtom(AInt(1L)), EAtom(ANil(TInt))), "kv",
      CAssign("out", EUnop(OLength,
        EFilter(LikeBag, ELoc(table), "o",
          EBinop(OEq, EAccess(EVar("o"), attr), EVar("kv"))))))

  test("loop point-filter swaps the store table for a keyed cached index") {
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val env = Env(Map.empty, Map("orders" -> orders), spark)
    val indexed = IndexTransf.indexStore(loopOver("orders", "o_custkey"), env)
    val keyed = indexed.store("orders")
    assert(keyed ne orders, "store must be re-represented")
    // the filter the loop body compiles now scans the in-memory index, and
    // its partitioning comes from the key hash (no new Exchange needed)
    val lookup = keyed.filter($"o_custkey" === 7L)
    val plan = lookup.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), s"expected cache hit:\n$plan")
    assert(lookup.count() ===
      orders.filter($"o_custkey" === 7L).count())
    keyed.unpersist()
  }

  test("non-loop or correlated filters do NOT trigger the rewrite") {
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
    val env = Env(Map.empty, Map("orders" -> orders), spark)
    // filter outside any loop: one scan, an index would cost more than it saves
    val once = CAssign("out", EUnop(OLength,
      EFilter(LikeBag, ELoc("orders"), "o",
        EBinop(OEq, EAccess(EVar("o"), "o_custkey"), EAtom(AInt(1L))))))
    assert(IndexTransf.indexStore(once, env).store("orders") eq orders)
    // correlated "key" (mentions the row binder): not a point lookup
    val correlated = CForeach(EBinop(OCons, EAtom(AInt(1L)), EAtom(ANil(TInt))),
      "kv", CAssign("out", EUnop(OLength,
        EFilter(LikeBag, ELoc("orders"), "o",
          EBinop(OEq, EAccess(EVar("o"), "o_custkey"),
            EAccess(EVar("o"), "o_orderkey"))))))
    assert(IndexTransf.indexStore(correlated, env).store("orders") eq orders)
  }

  test("indexed run equals plain run") {
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val keys = List(1L, 2L, 3L).foldRight[Expr](EAtom(ANil(TInt))) {
      (k, acc) => EBinop(OCons, EAtom(AInt(k)), acc)
    }
    val prog = CLetMut(
      EAtom(ANil(TRecord.sorted("k" -> TInt, "n" -> TInt))), "out",
      CSeq(
        CForeach(keys, "kv",
          CAssign("out", EBinop(OCons,
            ERecord(List("k" -> EVar("kv"), "n" -> EUnop(OLength,
              EFilter(LikeBag, ELoc("orders"), "o",
                EBinop(OEq, EAccess(EVar("o"), "o_custkey"), EVar("kv")))))),
            ELoc("out")))),
        CAssign("result", ELoc("out"))))
    val env = Env(Map.empty, Map("orders" -> orders), spark)
    val plain = Interp.run(prog, env).store("result")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val fast = IndexTransf.runIndexed(prog, env).store("result")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(plain === fast)
  }
}
