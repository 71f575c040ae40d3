package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lang._
import graft.lang.Lang._
import graft.lang.RefInterp._

/** Unit pins for the executable reference semantics — the corners where
  * getting it subtly wrong would make the differential harness agree on
  * the wrong answer: fold_right direction, None-first value order,
  * unsigned word order, total division, dict key ordering. */
class RefInterpSpec extends AnyFunSuite {

  private def ev(e: Expr): V = interp(e, REnv())

  test("Z.div / Z.modulo: floor semantics, total at zero") {
    // (-7) / 2 = -4, (-7) mod 2 = 1 (divisor sign), 7 / -2 = -4, 7 mod -2 = -1
    assert(zdiv(-7, 2) == BigInt(-4) && zmod(-7, 2) == BigInt(1))
    assert(zdiv(7, -2) == BigInt(-4) && zmod(7, -2) == BigInt(-1))
    // Coq: a / 0 = 0, a mod 0 = a
    assert(zdiv(5, 0) == BigInt(0) && zmod(5, 0) == BigInt(5))
    assert(ev(EBinop(ODiv, EAtom(AInt(5)), EAtom(AInt(0)))) == VI(0))
    assert(ev(EBinop(OMod, EAtom(AInt(5)), EAtom(AInt(0)))) == VI(5))
  }

  test("EFold is fold_right: subtraction exposes direction") {
    // fold_right (-) 0 [1;2;3] = 1 - (2 - (3 - 0)) = 2
    val l = literal(VList(Vector(VI(1), VI(2), VI(3))), TList(TInt))
    val e = EFold(l, EAtom(AInt(0)), "x", "a",
      EBinop(OMinus, EVar("x"), EVar("a")))
    assert(ev(e) == VI(2))
  }

  test("EDictFold folds entries right in key order") {
    // entries sorted: (1,a)(2,b)(3,c); fold_right concat acc-second:
    // f (1,a) (f (2,b) (f (3,c) "")) = "abc"
    val d = literal(VDict(Vector((VI(3), VS("c")), (VI(1), VS("a")),
      (VI(2), VS("b")))), TDict(TInt, TString))
    val e = EDictFold(d, EAtom(AString("")), "k", "v", "acc",
      EBinop(OConcatString, EVar("v"), EVar("acc")))
    assert(ev(e) == VS("abc"))
  }

  test("value order: None < Some, unsigned words, lexicographic lists") {
    assert(cmp(VOpt(None), VOpt(Some(VI(-100)))) < 0)
    // -1L as word = 2^64-1: unsigned order puts it ABOVE 1
    assert(cmp(VW(-1L), VW(1L)) > 0)
    assert(cmp(VList(Vector(VI(1))), VList(Vector(VI(1), VI(0)))) < 0)
    val sorted = ev(ESort(LikeList, literal(
      VList(Vector(VOpt(Some(VI(0))), VOpt(None), VOpt(Some(VI(-5))))),
      TList(TOption(TInt)))))
    assert(sorted == VList(Vector(VOpt(None), VOpt(Some(VI(-5))),
      VOpt(Some(VI(0))))))
  }

  test("dict insert keeps keys sorted and overwrites; lookup/delete agree") {
    val d0 = ETernop(OInsert, ETernop(OInsert,
      EAtom(AEmptyDict(TInt, TString)),
      EAtom(AInt(2)), EAtom(AString("two"))),
      EAtom(AInt(1)), EAtom(AString("one")))
    assert(ev(d0) == VDict(Vector((VI(1), VS("one")), (VI(2), VS("two")))))
    val over = ETernop(OInsert, d0, EAtom(AInt(2)), EAtom(AString("TWO")))
    assert(ev(over) == VDict(Vector((VI(1), VS("one")), (VI(2), VS("TWO")))))
    assert(ev(EBinop(OLookup, d0, EAtom(AInt(2)))) == VOpt(Some(VS("two"))))
    assert(ev(EBinop(OLookup, d0, EAtom(AInt(9)))) == VOpt(None))
    assert(ev(EBinop(ODelete, d0, EAtom(AInt(1)))) ==
      VDict(Vector((VI(2), VS("two")))))
  }

  test("bag/set canonicalization and ESort's list result") {
    val l = literal(VList(Vector(VI(3), VI(1), VI(3), VI(2))), TList(TInt))
    assert(ev(EBagOf(l)) == VBag(Vector(VI(1), VI(2), VI(3), VI(3))))
    assert(ev(ESetOf(l)) == VSet(Vector(VI(1), VI(2), VI(3))))
    assert(ev(ESort(LikeBag, EBagOf(l))) ==
      VList(Vector(VI(1), VI(2), VI(3), VI(3))))
  }

  test("EACIFold: VOption None on empty, min over ints otherwise") {
    assert(ev(EACIFold(AGMin, EAtom(AEmptySet(TInt)))) == VOpt(None))
    val s = literal(VSet(Vector(VI(-2), VI(7))), TSet(TInt))
    assert(ev(EACIFold(AGMin, s)) == VOpt(Some(VI(-2))))
    assert(ev(EACIFold(AGMax, s)) == VOpt(Some(VI(7))))
  }

  test("commands: CLetMut scopes, CForeach folds left, CAssign persists") {
    // for x in [1,2,3]: out := x :: out  — prepends, so out = [3,2,1]
    val prog = CForeach(literal(VList(Vector(VI(1), VI(2), VI(3))),
      TList(TInt)), "x",
      CAssign("out", EBinop(OCons, EVar("x"), ELoc("out"))))
    val fin = RefInterp.run(prog, REnv("out" -> VList(Vector.empty)))
    assert(fin.store("out") == VList(Vector(VI(3), VI(2), VI(1))))
    // CLetMut restores the outer binding after its body
    val scoped = CSeq(
      CLetMut(EAtom(AInt(9)), "cell", CAssign("probe", ELoc("cell"))),
      CAssign("after", ELoc("cell")))
    val fin2 = RefInterp.run(scoped, REnv("cell" -> VI(1)))
    assert(fin2.store("probe") == VI(9) && fin2.store("after") == VI(1))
  }

  test("literal/interp round-trip on a nested value") {
    val v = VRec(Vector(
      "a" -> VList(Vector(VOpt(None), VOpt(Some(VI(4))))),
      "b" -> VDict(Vector((VS("k"), VBag(Vector(VI(1), VI(1))))))))
    val t = TRecord.sorted(
      "a" -> TList(TOption(TInt)),
      "b" -> TDict(TString, TBag(TInt)))
    assert(ev(literal(v, t)) == v)
  }
}
