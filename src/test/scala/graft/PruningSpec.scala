package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.lang._
import graft.lang.Lang._
import graft.lang.Compiler._

/** The Optimize.v column family (Pruning): the `cols` analysis, the fusion
  * rewrites' structure, and differential semantics — fused/narrowed programs
  * must agree with their sources row-for-row (the ScalaCheck analog of
  * proj_proj/efilter_efilter/filter_into_join/proj_into_join/
  * proj_pushdown_* `preserve_sem` proofs).
  */
class PruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def xk = EAccess(EVar("x"), "k")
  private def xv = EAccess(EVar("x"), "v")

  test("cols: collects accessed fields, None on whole-row escape, shadowing") {
    assert(Pruning.cols("x", EBinop(OPlus, xk, xv)) === Some(List("k", "v")))
    assert(Pruning.cols("x", EVar("x")) === None) // whole row escapes
    assert(Pruning.cols("x", EVar("y")) === Some(Nil))
    // shadowed binder: inner x is a different variable
    val shadowed = EProj(LikeBag, ELoc("t"), "x", EAccess(EVar("x"), "other"))
    assert(Pruning.cols("x", shadowed) === Some(Nil))
    // a let that rebinds x shields its body but not its bound expr
    assert(Pruning.cols("x", ELet(xk, "x", EAccess(EVar("x"), "w")))
      === Some(List("k")))
  }

  test("proj_proj: nested projections fuse into a let-composed body") {
    val r2 = ERecord(List("a" -> xk))
    val outer = ERecord(List("b" -> EAccess(EVar("y"), "a")))
    val e = EProj(LikeBag, EProj(LikeBag, ELoc("t"), "x", r2), "y", outer)
    Pruning.fuse(e) match {
      case EProj(LikeBag, ELoc("t"), "x", ELet(v, "y", body)) =>
        assert(v === r2 && body === outer)
      case other => fail(s"expected fused EProj, got $other")
    }
  }

  test("filter_into_join: post-join filter merges into the join predicate") {
    val p = EBinop(OEq, xk, EAccess(EVar("y"), "k"))
    val r = ERecord(List("a" -> xv))
    val pf = EBinop(OLess, EAccess(EVar("z"), "a"), EAtom(AInt(50)))
    val e = EFilter(LikeBag,
      EJoin(LikeBag, ELoc("t1"), ELoc("t2"), "x", "y", p, r), "z", pf)
    Pruning.fuse(e) match {
      case EJoin(LikeBag, ELoc("t1"), ELoc("t2"), "x", "y",
          EBinop(OAnd, p2, ELet(v, "z", body)), r2) =>
        assert(p2 === p && v === r && body === pf && r2 === r)
      case other => fail(s"expected EJoin with merged predicate, got $other")
    }
  }

  test("narrow: join inputs over store tables project just the used columns") {
    val p = EBinop(OEq, xk, EAccess(EVar("y"), "k"))
    val r = ERecord(List("a" -> xv, "b" -> EAccess(EVar("y"), "w")))
    val c = CAssign("out",
      EJoin(LikeBag, ELoc("t1"), ELoc("t2"), "x", "y", p, r))
    val schemas = Map(
      "t1" -> Seq("k", "v", "unused1", "unused2"),
      "t2" -> Seq("k", "w", "unused3"))
    Pruning.narrow(c, schemas.get) match {
      case CAssign("out", EJoin(_, EProj(_, ELoc("t1"), x1, ERecord(f1)),
          EProj(_, ELoc("t2"), x2, ERecord(f2)), "x", "y", _, _)) =>
        assert(f1.map(_._1) === List("k", "v"))
        assert(f2.map(_._1) === List("k", "w"))
        assert(f1.forall { case (n, e) => e === EAccess(EVar(x1), n) })
        assert(f2.forall { case (n, e) => e === EAccess(EVar(x2), n) })
      case other => fail(s"expected narrowed join inputs, got $other")
    }
    // idempotent: a second pass sees the narrow projections, not ELoc
    val once = Pruning.narrow(c, schemas.get)
    assert(Pruning.narrow(once, schemas.get) === once)
  }

  test("narrow does not fire when the whole row escapes or all columns used") {
    val pAll = EBinop(OEq, xk, EAccess(EVar("y"), "k"))
    val rEscape = ERecord(List("whole" -> EVar("x"), "b" -> EAccess(EVar("y"), "k")))
    val c = CAssign("out",
      EJoin(LikeBag, ELoc("t1"), ELoc("t2"), "x", "y", pAll, rEscape))
    val schemas = Map("t1" -> Seq("k", "v"), "t2" -> Seq("k"))
    // left: EVar(x) escapes → cols None → untouched; right: uses all of t2
    assert(Pruning.narrow(c, schemas.get) === c)
  }

  // --- differential semantics on random data ---

  private val rnd = new scala.util.Random(11)
  private def randTable(n: Int): DataFrame =
    Seq.fill(n)((rnd.nextInt(10).toLong, rnd.nextInt(100).toLong,
        rnd.nextInt(7).toLong))
      .toDF("k", "v", "w")

  private def rowsOf(e: Expr, store: Map[String, DataFrame]): Seq[String] =
    compile(e, Env(Map.empty, store, spark)).asInstanceOf[TV].df
      .collect().map(_.toString).toSeq.sorted

  test("fuse preserves semantics on a filter/proj/join stack") {
    val store = Map("t1" -> randTable(150), "t2" -> randTable(80))
    val p = EBinop(OEq, xk, EAccess(EVar("y"), "k"))
    val r = ERecord(List("a" -> xv, "b" -> EAccess(EVar("y"), "w")))
    val pf = EBinop(OLess, EAccess(EVar("z"), "a"), EAtom(AInt(60)))
    val rp = ERecord(List("c" -> EBinop(OPlus,
      EAccess(EVar("q"), "a"), EAccess(EVar("q"), "b"))))
    val stack = EProj(LikeBag,
      EFilter(LikeBag,
        EJoin(LikeBag, ELoc("t1"), ELoc("t2"), "x", "y", p, r), "z", pf),
      "q", rp)
    val fused = Pruning.fuse(stack)
    assert(fused !== stack) // the rewrite actually fired
    assert(rowsOf(fused, store) === rowsOf(stack, store))
  }

  test("narrow preserves semantics and prunes the compiled scan") {
    val store = Map("t1" -> randTable(150), "t2" -> randTable(80))
    val p = EBinop(OEq, xk, EAccess(EVar("y"), "k"))
    val r = ERecord(List("a" -> xv))
    val e = EJoin(LikeBag, ELoc("t1"), ELoc("t2"), "x", "y", p, r)
    val c = CAssign("out", e)
    val narrowed = Pruning.narrow(c,
      t => store.get(t).map(_.columns.toSeq)) match {
      case CAssign("out", e2) => e2
      case other => fail(s"unexpected $other")
    }
    assert(narrowed !== e)
    assert(rowsOf(narrowed, store) === rowsOf(e, store))
  }
}
