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

  test("two filtered attributes → composed index, filters routed per attribute") {
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val prog = CForeach(EBinop(OCons, EAtom(AInt(1L)), EAtom(ANil(TInt))), "kv",
      CSeq(
        CAssign("a", EUnop(OLength,
          EFilter(LikeBag, ELoc("orders"), "o",
            EBinop(OEq, EAccess(EVar("o"), "o_custkey"), EVar("kv"))))),
        CAssign("b", EUnop(OLength,
          EFilter(LikeBag, ELoc("orders"), "o",
            EBinop(OEq, EAccess(EVar("o"), "o_orderkey"), EVar("kv")))))))
    val env = Env(Map.empty, Map("orders" -> orders), spark)
    val (cmd, indexed) = IndexTransf.transform(prog, env)
    // both components live in the store under non-colliding names
    val byCust = indexed.store(IndexTransf.componentName("orders", "o_custkey"))
    val byKey = indexed.store(IndexTransf.componentName("orders", "o_orderkey"))
    assert(indexed.store("orders") eq orders, "original binding untouched")
    // the command now reads each component for its own attribute
    def locs(c: Command): Seq[String] = c match {
      case CForeach(_, _, CSeq(CAssign(_, e1), CAssign(_, e2))) =>
        Seq(e1, e2).collect {
          case EUnop(_, EFilter(_, ELoc(t), _, _)) => t
        }
      case _ => Nil
    }
    assert(locs(cmd) === Seq(
      IndexTransf.componentName("orders", "o_custkey"),
      IndexTransf.componentName("orders", "o_orderkey")))
    // each component is an in-memory cache hit and agrees with the source
    for ((comp, attr, k) <- Seq((byCust, "o_custkey", 7L),
        (byKey, "o_orderkey", 100L))) {
      val lookup = comp.filter(col(attr) === k)
      val plan = lookup.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), s"expected cache hit:\n$plan")
      assert(lookup.count() === orders.filter(col(attr) === k).count())
    }
    byCust.unpersist(); byKey.unpersist()
  }

  test("a table assigned in the command is NOT composed (staleness guard)") {
    // routed component reads are snapshots; a CAssign to the base table
    // would leave them stale, so composition must be skipped entirely
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val prog = CSeq(
      CForeach(EBinop(OCons, EAtom(AInt(1L)), EAtom(ANil(TInt))), "kv",
        CSeq(
          CAssign("a", EUnop(OLength,
            EFilter(LikeBag, ELoc("orders"), "o",
              EBinop(OEq, EAccess(EVar("o"), "o_custkey"), EVar("kv"))))),
          CAssign("b", EUnop(OLength,
            EFilter(LikeBag, ELoc("orders"), "o",
              EBinop(OEq, EAccess(EVar("o"), "o_orderkey"), EVar("kv"))))))),
      // the mutation that would invalidate routed snapshots
      CAssign("orders", EBinop(OConcat, ELoc("orders"), ELoc("orders"))))
    val env = Env(Map.empty, Map("orders" -> orders), spark)
    val (cmd, indexed) = IndexTransf.transform(prog, env)
    assert(cmd === prog, "command must be left unrouted")
    assert(!indexed.store.contains(
      IndexTransf.componentName("orders", "o_custkey")))
    assert(!indexed.store.contains(
      IndexTransf.componentName("orders", "o_orderkey")))
    // and the end-to-end indexed run still matches the plain run
    val plain = Interp.run(CSeq(prog, CAssign("result", ELoc("orders"))), env)
      .store("result").count()
    val fast = IndexTransf.runIndexed(
      CSeq(prog, CAssign("result", ELoc("orders"))), env)
      .store("result").count()
    assert(plain === fast)
  }

  test("composed table with cons-chain inserts IS composed and maintained") {
    // the reference's compo_idx_wf: one insert updates every component.
    // A loop inserts a row, then point-filters the table on BOTH attributes
    // — composition must happen (chain writes are maintainable), the
    // routed component reads must see each insert, and the result must
    // equal the plain run.
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val keys = List(1L, 2L).foldRight[Expr](EAtom(ANil(TInt))) {
      (k, acc) => EBinop(OCons, EAtom(AInt(k)), acc)
    }
    def cnt(attr: String, k: Expr) = EUnop(OLength,
      EFilter(LikeBag, ELoc("orders"), "o",
        EBinop(OEq, EAccess(EVar("o"), attr), k)))
    val prog = CLetMut(
      EAtom(ANil(TRecord.sorted("k" -> TInt, "na" -> TInt, "nb" -> TInt))),
      "out",
      CSeq(
        CForeach(keys, "kv", CSeq(
          CAssign("orders", EBinop(OCons, ERecord(List(
            "o_orderkey" -> EBinop(OPlus, EVar("kv"), EAtom(AInt(1000000L))),
            "o_custkey" -> EVar("kv"))), ELoc("orders"))),
          CAssign("out", EBinop(OCons, ERecord(List(
            "k" -> EVar("kv"),
            "na" -> cnt("o_custkey", EVar("kv")),
            "nb" -> cnt("o_orderkey",
              EBinop(OPlus, EVar("kv"), EAtom(AInt(1000000L)))))),
            ELoc("out"))))),
        CAssign("result", ELoc("out"))))
    def rows(env: Env) = env.store("result")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    val plain = rows(Interp.run(prog,
      Env(Map.empty, Map("orders" -> orders), spark)))
    val fastEnd = IndexTransf.runIndexed(prog,
      Env(Map.empty, Map("orders" -> orders), spark))
    assert(fastEnd.compoIndexes.contains("orders"),
      "composed handle must survive chain inserts")
    assert(rows(fastEnd) === plain)
    // the routed reads found the inserted rows (nb counts only the insert)
    assert(plain.map(_._3) === Seq(1L, 1L))
    fastEnd.compoIndexes("orders").unpersist()
  }

  test("composed-index insert maintains every component consistently") {
    import graft.operators.CompoIndex
    val base = Seq((1L, 10L), (2L, 20L), (3L, 20L)).toDF("a", "b")
    val compo = CompoIndex.build(base, Seq("a", "b"), partitions = 4)
    val grown = compo.insert(Seq((4L, 20L)).toDF("a", "b"))
    // both components see the inserted row (compo_idx_wf: one delta, all
    // components stay consistent)
    assert(grown.lookup("a", 4L).count() === 1)
    assert(grown.lookup("b", 20L).count() === 3)
    // the pre-insert component caches still serve the old rows
    assert(grown.lookup("a", 1L).count() === 1)
    assert(compo.lookup("b", 20L).count() === 2)
    grown.unpersist(); compo.unpersist()
  }

  test("cons insert into an indexed table maintains the keyed index") {
    // loop: insert a row for the key, then point-count the key — the
    // reference's cons_to_insert + use_idx composition. The index handle
    // must survive every insert (incremental keyed delta, no re-key), and
    // results must equal the plain run.
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val keys = List(1L, 2L).foldRight[Expr](EAtom(ANil(TInt))) {
      (k, acc) => EBinop(OCons, EAtom(AInt(k)), acc)
    }
    val countFor = EUnop(OLength, EFilter(LikeBag, ELoc("orders"), "o",
      EBinop(OEq, EAccess(EVar("o"), "o_custkey"), EVar("kv"))))
    val prog = CLetMut(
      EAtom(ANil(TRecord.sorted("k" -> TInt, "n" -> TInt))), "out",
      CSeq(
        CForeach(keys, "kv", CSeq(
          CAssign("orders", EBinop(OCons, ERecord(List(
            "o_orderkey" -> EBinop(OPlus, EVar("kv"), EAtom(AInt(1000000L))),
            "o_custkey" -> EVar("kv"))), ELoc("orders"))),
          CAssign("out", EBinop(OCons,
            ERecord(List("k" -> EVar("kv"), "n" -> countFor)),
            ELoc("out"))))),
        CAssign("result", ELoc("out"))))
    def rows(env: Env) = env.store("result")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val plainEnv = Env(Map.empty, Map("orders" -> orders), spark)
    val plain = rows(Interp.run(prog, plainEnv))
    val fastEnd = IndexTransf.runIndexed(prog,
      Env(Map.empty, Map("orders" -> orders), spark))
    assert(fastEnd.indexes.contains("orders"),
      "index handle must survive cons inserts")
    assert(rows(fastEnd) === plain)
    // the maintained entry still answers lookups incl. the inserted rows
    val n1 = fastEnd.store("orders").filter($"o_custkey" === 1L).count()
    assert(n1 === orders.filter($"o_custkey" === 1L).count() + 1)
    fastEnd.store("orders").unpersist()
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

  private def constPredLoop(pred: Expr): Command = {
    val keys = List(1L, 2L).foldRight[Expr](EAtom(ANil(TInt))) {
      (k, acc) => EBinop(OCons, EAtom(AInt(k)), acc)
    }
    CLetMut(
      EAtom(ANil(TRecord.sorted("k" -> TInt, "n" -> TInt))), "out",
      CSeq(
        CForeach(keys, "kv",
          CAssign("out", EBinop(OCons,
            ERecord(List("k" -> EVar("kv"), "n" -> EUnop(OLength,
              EFilter(LikeBag, ELoc("orders"), "o", pred)))),
            ELoc("out")))),
        CAssign("result", ELoc("out"))))
  }

  test("constant-predicate loop filter routes through a bitmap cell") {
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val pred = EBinop(OLess, EAccess(EVar("o"), "o_custkey"), EAtom(AInt(40)))
    val prog = constPredLoop(pred)
    val env = Env(Map.empty, Map("orders" -> orders), spark)
    val (cmd, idxEnv) = IndexTransf.transform(prog, env)
    // the bitmap cell exists: the table extended with the precomputed bit
    assert(idxEnv.store.contains("orders@bitmap0"))
    val cell = idxEnv.store("orders@bitmap0")
    assert(cell.columns.contains("@bit"))
    // the routed filter tests the bit and strips it back to the row fields
    var routed = false
    Rewrites.mapExprs(cmd)(e => Rewrites.foldExpr(e) {
      case pr @ EProj(_, EFilter(_, ELoc("orders@bitmap0"), x,
          EAccess(EVar(x2), "@bit")), _, _) if x == x2 =>
        routed = true; pr
      case other => other
    })
    assert(routed, s"no bitmap-routed filter in:\n$cmd")
    // semantics: routed run equals plain run
    val plain = Interp.run(prog, env).store("result")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val fast = Interp.run(cmd, idxEnv).store("result")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(plain === fast)
    cell.unpersist()
  }

  test("scoped CLetMut table gets a bind-time index annotation") {
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val keys = List(1L, 2L).foldRight[Expr](EAtom(ANil(TInt))) {
      (k, acc) => EBinop(OCons, EAtom(AInt(k)), acc)
    }
    val prog = CLetMut(ELoc("orders"), "t",
      CLetMut(EAtom(ANil(TRecord.sorted("k" -> TInt, "n" -> TInt))), "out",
        CSeq(
          CForeach(keys, "kv", CAssign("out", EBinop(OCons,
            ERecord(List("k" -> EVar("kv"), "n" -> EUnop(OLength,
              EFilter(LikeBag, ELoc("t"), "o",
                EBinop(OEq, EAccess(EVar("o"), "o_custkey"), EVar("kv")))))),
            ELoc("out")))),
          CAssign("result", ELoc("out")))))
    val env = Env(Map.empty, Map("orders" -> orders), spark)
    val (cmd, e2) = IndexTransf.transform(prog, env)
    assert(e2.indexHints.get("t") === Some(Seq("o_custkey")))
    assert(cmd === prog, "single-attribute case needs no routing")
    val plain = Interp.run(prog, env).store("result")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val fast = Interp.run(cmd, e2).store("result")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(plain === fast)
  }

  test("scoped composed index: filters routed, chain inserts maintained") {
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val keys = List(1L, 2L).foldRight[Expr](EAtom(ANil(TInt))) {
      (k, acc) => EBinop(OCons, EAtom(AInt(k)), acc)
    }
    def cnt(attr: String, key: Expr) = EUnop(OLength,
      EFilter(LikeBag, ELoc("t"), "o",
        EBinop(OEq, EAccess(EVar("o"), attr), key)))
    val newKey = EBinop(OPlus, EVar("kv"), EAtom(AInt(1000000L)))
    val prog = CLetMut(ELoc("orders"), "t",
      CLetMut(EAtom(ANil(
        TRecord.sorted("k" -> TInt, "na" -> TInt, "nb" -> TInt))), "out",
        CSeq(
          CForeach(keys, "kv", CSeq(
            CAssign("t", EBinop(OCons,
              ERecord(List("o_custkey" -> EVar("kv"), "o_orderkey" -> newKey)),
              ELoc("t"))),
            CAssign("out", EBinop(OCons,
              ERecord(List("k" -> EVar("kv"),
                "na" -> cnt("o_custkey", EVar("kv")),
                "nb" -> cnt("o_orderkey", newKey))),
              ELoc("out"))))),
          CAssign("result", ELoc("out")))))
    val env = Env(Map.empty, Map("orders" -> orders), spark)
    val (cmd, e2) = IndexTransf.transform(prog, env)
    assert(e2.indexHints.get("t").map(_.toSet) ===
      Some(Set("o_custkey", "o_orderkey")))
    // body filters now read the per-attribute component cells
    var routedCells = Set.empty[String]
    Rewrites.mapExprs(cmd)(e => Rewrites.foldExpr(e) {
      case f @ EFilter(_, ELoc(t), _, _) if t.contains("@") =>
        routedCells += t; f
      case other => other
    })
    assert(routedCells === Set(
      IndexTransf.componentName("t", "o_custkey"),
      IndexTransf.componentName("t", "o_orderkey")))
    val plain = Interp.run(prog, env).store("result")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val fast = Interp.run(cmd, e2).store("result")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(plain === fast)
    // the inserted row is visible through the routed component (nb counts
    // exactly the row this iteration inserted)
    assert(fast.forall(_._3 === 1L))
  }

  test("bitmap not introduced for written tables or loop-varying predicates") {
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val env = Env(Map.empty, Map("orders" -> orders), spark)
    // predicate mentions the loop variable → dict-index territory, no bitmap
    val varying = constPredLoop(
      EBinop(OLess, EAccess(EVar("o"), "o_custkey"), EVar("kv")))
    val (_, e1) = IndexTransf.transform(varying, env)
    assert(!e1.store.keys.exists(_.contains("@bitmap")))
    // table written in the command → bitmap would go stale, must skip
    val written = CSeq(constPredLoop(
      EBinop(OLess, EAccess(EVar("o"), "o_custkey"), EAtom(AInt(40)))),
      CAssign("orders", EBinop(OConcat, ELoc("orders"), ELoc("orders"))))
    val (c2, e2) = IndexTransf.transform(written, env)
    assert(!e2.store.keys.exists(_.contains("@bitmap")))
    assert(c2 === written)
  }
}
