package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lang._
import graft.lang.Lang._
import graft.lang.Compiler._

/** Collection-kind annotation (CollectionTransf): the reference's
  * annotate_collection + push_down_collection demos reproduced
  * structurally, plus semantic equality of annotated vs plain programs.
  */
class CollectionTransfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def evalv(e: Expr) =
    spark.range(1).select(asScalar(
      compile(e, Env(Map.empty, Map.empty, spark))).as("v")).head().get(0)

  test("reference demo ex: sort of list filter re-kinds to a bag pipeline") {
    // CollectionTransf.v:53-56
    val ex = ESort(LikeList, EFilter(LikeList, ELoc("tbl"), "x",
      EBinop(OEq, EAccess(EVar("x"), "attr"), EAtom(AInt(0)))))
    val got = CollectionTransf.annotate(ex)
    assert(got === ESort(LikeBag, EFilter(LikeBag, EBagOf(ELoc("tbl")), "x",
      EBinop(OEq, EAccess(EVar("x"), "attr"), EAtom(AInt(0))))))
  }

  test("reference demo ex1: option-match running minimum becomes set-min") {
    // CollectionTransf.v:58-62
    val ex1 = EFold(
      EProj(LikeList, ELoc("tbl"), "r", EAccess(EVar("r"), "attr")),
      EAtom(ANone()), "v", "acc",
      EOptMatch(EVar("acc"), EUnop(OSome, EVar("v")), "x",
        EIf(EBinop(OLess, EVar("v"), EVar("x")),
          EUnop(OSome, EVar("v")), EVar("acc"))))
    val got = CollectionTransf.annotate(ex1)
    assert(got === EACIFold(AGMin,
      EProj(LikeSet, ESetOf(ELoc("tbl")), "r", EAccess(EVar("r"), "attr"))))
  }

  test("sum fold and length annotate to bag aggregates") {
    val l = ELoc("t")
    assert(CollectionTransf.annotate(EFold(l, EAtom(AInt(0)), "v", "acc",
      EBinop(OPlus, EVar("v"), EVar("acc")))) ===
      EACFold(AGSum, EBagOf(l)))
    assert(CollectionTransf.annotate(EUnop(OLength, l)) ===
      EACFold(AGCount, EBagOf(l)))
    // eq-nil becomes a bag emptiness test (typed nil only)
    assert(CollectionTransf.annotate(EBinop(OEq, l, EAtom(ANil(TInt)))) ===
      EBinop(OEq, EBagOf(l), EAtom(AEmptyBag(TInt))))
    assert(CollectionTransf.annotate(EBinop(OEq, l, EAtom(ANil(THole)))) ===
      EBinop(OEq, l, EAtom(ANil(THole))))
  }

  test("non-idiomatic folds are left alone") {
    val l = ELoc("t")
    // wrong seed
    assert(CollectionTransf.annotate(EFold(l, EAtom(AInt(1)), "v", "acc",
      EBinop(OPlus, EVar("v"), EVar("acc")))).isInstanceOf[EFold])
    // acc*31+v (rolling hash) is order-dependent — must stay a fold
    assert(CollectionTransf.annotate(EFold(l, EAtom(AInt(0)), "v", "acc",
      EBinop(OPlus, EBinop(OTimes, EVar("acc"), EAtom(AInt(31))),
        EVar("v")))).isInstanceOf[EFold])
  }

  test("annotated program computes the same values as the source") {
    def lit(xs: Long*): Expr = xs.foldRight[Expr](EAtom(ANil(TInt))) {
      (x, acc) => EBinop(OCons, EAtom(AInt(x)), acc)
    }
    val src = EFilter(LikeList, lit(5L, 3L, 9L, 3L, 7L), "x",
      EBinop(OLess, EAtom(AInt(3)), EVar("x")))
    val sumIdiom = EFold(src, EAtom(AInt(0)), "v", "acc",
      EBinop(OPlus, EVar("v"), EVar("acc")))
    val minIdiom = EFold(src, EAtom(ANone(TInt)), "v", "acc",
      EOptMatch(EVar("acc"), EUnop(OSome, EVar("v")), "x",
        EIf(EBinop(OLess, EVar("v"), EVar("x")),
          EUnop(OSome, EVar("v")), EVar("acc"))))
    for (e <- Seq(sumIdiom, EUnop(OLength, src), minIdiom)) {
      val annotated = CollectionTransf.annotate(e)
      assert(annotated !== e, s"annotation must fire on $e")
      assert(evalv(annotated) === evalv(e))
    }
    assert(evalv(CollectionTransf.annotate(sumIdiom)) === 21L)
  }
}
