package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lang._
import graft.lang.Lang._
import graft.lang.Parser.parseExpr

/** The reference's RelTransfEx examples replicated program-for-program
  * (fiat2/src/fiat2/RelTransfEx.v:19-84): the surface text parses to the
  * exact ASTs the reference's `Goal … reflexivity` states, and our
  * normalize performs the same to_join / filter_pushdown rewrites its
  * `ex3_op` pipeline composes.
  */
class RelTransfExSpec extends AnyFunSuite {

  private def i(n: Long) = EAtom(AInt(n))

  test("ex1 parses to the reference's let + flatmap-check-ret AST (:19-35)") {
    val src =
      """let scores = [ { s : 1 } ] in
        |x <- scores;
        |check(80 < x[s]);
        |ret x""".stripMargin
    assert(parseExpr(src) ===
      ELet(
        EBinop(OCons, ERecord(List("s" -> i(1))), EAtom(ANil())),
        "scores",
        EFlatmap(LikeList, EVar("scores"), "x",
          EIf(EBinop(OLess, i(80), EAccess(EVar("x"), "s")),
            EBinop(OCons, EVar("x"), EAtom(ANil())),
            EAtom(ANil())))))
    // and to_filter recognition turns the body into a real EFilter
    Rewrites.normalize(parseExpr(src)) match {
      case ELet(_, "scores", EFilter(_, EVar("scores"), "x", _)) => ()
      case other => fail(s"expected filter recognition under the let, got $other")
    }
  }

  test("ex2 parses to nested flatmaps and normalizes to EJoin (:41-55)") {
    val src =
      """x <- mut scores;
        |n <- mut names;
        |check(x[s_id] == n[n_id]);
        |ret { name : n[n_name], score : x[s_score] }""".stripMargin
    assert(parseExpr(src) ===
      EFlatmap(LikeList, ELoc("scores"), "x",
        EFlatmap(LikeList, ELoc("names"), "n",
          EIf(EBinop(OEq, EAccess(EVar("x"), "s_id"), EAccess(EVar("n"), "n_id")),
            EBinop(OCons,
              ERecord(List("name" -> EAccess(EVar("n"), "n_name"),
                "score" -> EAccess(EVar("x"), "s_score"))),
              EAtom(ANil())),
            EAtom(ANil())))))
    Rewrites.normalize(parseExpr(src)) match {
      case EJoin(_, ELoc("scores"), ELoc("names"), "x", "n",
          EBinop(OEq, _, _), ERecord(_)) => ()
      case other => fail(s"expected join recognition, got $other")
    }
  }

  test("ex3 normalizes like ex3_op: join recognized AND the p-only conjunct pushed (:57-84)") {
    val src =
      """p <- mut persons;
        |e <- mut employees;
        |check(p[age] < 40 && p[id] == e[id]);
        |ret { name : p[name], salary : e[salary] }""".stripMargin
    Rewrites.normalize(parseExpr(src)) match {
      // the reference's ex3_op = filter_pushdown ∘ to_join: the age
      // conjunct (left-only) moves INTO the persons source; the equality
      // stays as the join predicate
      case EJoin(_, EFilter(_, ELoc("persons"), _,
            EBinop(OLess, _, _)), ELoc("employees"), "p", "e",
          EBinop(OEq, _, _), ERecord(_)) => ()
      case other => fail(s"expected pushed filter under the join, got $other")
    }
  }
}
