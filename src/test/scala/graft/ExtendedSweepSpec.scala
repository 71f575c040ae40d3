package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.Tag
import graft.lang._
import graft.lang.Lang._
import graft.lang.RefInterp._
import graft.lang.Compiler.{CV, Env, TV}
import scala.util.Random

/** EXTENDED differential sweep over the round-11 type space (words
  * inside collections/dict keys, nested options, option-valued dicts,
  * run-length bag order) at ~10x the committed seed counts. SKIPPED in
  * the default suite (it adds minutes and the committed batteries cover
  * the same space at CI depth) — run explicitly:
  *   GRAFT_SWEEP=1 sbt "testOnly graft.ExtendedSweepSpec"
  * Last full run (r11): 1200/1200 seeds agreed, 0 overflow-skipped.
  */
object Sweep extends Tag("graft.Sweep")

class ExtendedSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val fieldNames = Vector("a", "b", "c", "d")
  private def genType(rnd: Random, d: Int, allowOpt: Boolean = true): FType =
    if (d <= 0) rnd.nextInt(5) match {
      case 0 | 1 => TInt
      case 2 => TBool
      case 3 => TString
      case 4 => TWord
    } else rnd.nextInt(11) match {
      case 0 | 1 => TInt
      case 2 => TBool
      case 3 => TString
      case 4 if allowOpt => TOption(
        if (rnd.nextInt(3) == 0) TOption(genType(rnd, 0))
        else genType(rnd, 0))
      case 4 => TInt
      case 5 | 6 => TList(genType(rnd, d - 1))
      case 7 => TBag(genType(rnd, d - 1))
      case 8 => TSet(genType(rnd, d - 1))
      case 9 =>
        if (rnd.nextBoolean())
          TDict(rnd.nextInt(3) match {
            case 0 => TInt; case 1 => TString; case 2 => TWord
          }, genType(rnd, d - 1))
        else
          TRecord(fieldNames.take(2 + rnd.nextInt(2)).toList
            .map(n => n -> genType(rnd, d - 1)))
      case 10 => TWord
    }

  private def genValue(t: FType, rnd: Random): V = t match {
    case TInt => VI(BigInt(rnd.between(-9, 10)))
    case TWord => VW(Vector(0L, 1L, 2L, 5L, -1L, -2L, 1L << 62,
      Int.MaxValue.toLong, Int.MinValue.toLong, rnd.nextLong())(
      rnd.nextInt(10)))
    case TBool => VB(rnd.nextBoolean())
    case TString => VS(Random.javaRandomToRandom(
      new java.util.Random(rnd.nextLong()))
      .alphanumeric.take(rnd.nextInt(4)).mkString.toLowerCase)
    case TUnit => VUnit
    case TOption(u) =>
      if (rnd.nextInt(10) < 3) VOpt(None) else VOpt(Some(genValue(u, rnd)))
    case TList(u) => VList(Vector.fill(rnd.nextInt(4))(genValue(u, rnd)))
    case TBag(u) => VBag(sortedV(Vector.fill(rnd.nextInt(4))(genValue(u, rnd))))
    case TSet(u) => VSet(listToSet(Vector.fill(rnd.nextInt(4))(genValue(u, rnd))))
    case TDict(kt, vt) =>
      VDict(Vector.fill(rnd.nextInt(3))((genValue(kt, rnd), genValue(vt, rnd)))
        .foldLeft(Vector.empty[(V, V)])((d, e) => dictInsert(d, e._1, e._2)))
    case TRecord(fs) =>
      VRec(fs.map { case (n, u) => n -> genValue(u, rnd) }.toVector)
    case THole => throw new IllegalStateException("hole in generator")
  }

  private var uid = 0
  private def fresh(p: String): String = { uid += 1; p + uid }

  /** Random well-typed expression biased toward the closed-divergence
    * surfaces: sorts, set/bag/dict canonicalization, option matches. */
  private def genExpr(t: FType, scope: Vector[(String, FType)], rnd: Random,
      d: Int): Expr = {
    def sub(u: FType, dd: Int = d - 1): Expr = genExpr(u, scope, rnd, dd)
    def bound(x: String, xt: FType, rt: FType): Expr =
      genExpr(rt, scope :+ (x -> xt), rnd, d - 1)
    def leaf(): Expr = {
      val vars = scope.filter(_._2 == t)
      if (vars.nonEmpty && rnd.nextBoolean())
        EVar(vars(rnd.nextInt(vars.size))._1)
      else literal(genValue(t, rnd), t)
    }
    if (d <= 0) leaf()
    else t match {
      case TList(u) => rnd.nextInt(6) match {
        case 0 => EBinop(OCons, sub(u), sub(TList(u)))
        case 1 =>
          val src = rnd.nextInt(3) match {
            case 0 => (LikeList, TList(u))
            case 1 => (LikeBag, TBag(u)); case 2 => (LikeSet, TSet(u))
          }
          ESort(src._1, sub(src._2))
        case 2 =>
          val x = fresh("x")
          EFilter(LikeList, sub(TList(u)), x, bound(x, u, TBool))
        case 3 =>
          val u2 = genType(rnd, 1)
          val x = fresh("x")
          EProj(LikeList, sub(TList(u2)), x, bound(x, u2, u))
        case 4 =>
          val x = fresh("x")
          EFlatmap(LikeList, sub(TList(u)), x,
            EBinop(OCons, EVar(x), EBinop(OCons, EVar(x),
              EAtom(ANil(u)))))
        case 5 => leaf()
      }
      case TBag(u) => rnd.nextInt(3) match {
        case 0 => EBinop(OBagInsert, sub(TBag(u)), sub(u))
        case 1 => EBagOf(sub(TList(u)))
        case 2 => leaf()
      }
      case TSet(u) => rnd.nextInt(3) match {
        case 0 => EBinop(OSetInsert, sub(TSet(u)), sub(u))
        case 1 => ESetOf(sub(TList(u)))
        case 2 => leaf()
      }
      case TDict(kt, vt) => rnd.nextInt(3) match {
        case 0 => ETernop(OInsert, sub(TDict(kt, vt)), sub(kt), sub(vt))
        case 1 => EBinop(ODelete, sub(TDict(kt, vt)), sub(kt))
        case 2 => leaf()
      }
      case TOption(u) => rnd.nextInt(3) match {
        case 0 => EUnop(OSome, sub(u))
        case 1 =>
          val kt = if (rnd.nextBoolean()) TInt else TWord
          EBinop(OLookup, sub(TDict(kt, u)), sub(kt))
        case 2 => leaf()
      }
      case TBool => rnd.nextInt(3) match {
        case 0 =>
          val u = genType(rnd, 2)
          EBinop(OEq, sub(u), sub(u))
        case 1 =>
          val x = fresh("x"); val u = genType(rnd, 1)
          EOptMatch(sub(TOption(u)), EAtom(ABool(false)), x,
            EBinop(OEq, EVar(x), bound(x, u, u)))
        case 2 => leaf()
      }
      case TInt => rnd.nextInt(3) match {
        case 0 => EUnop(OLength, sub(TList(genType(rnd, 1))))
        case 1 => EBinop(OPlus, sub(TInt), sub(TInt))
        case 2 => leaf()
      }
      case TRecord(fs) =>
        if (rnd.nextBoolean()) ERecord(fs.map { case (n, u) => n -> sub(u) })
        else leaf()
      case _ => leaf()
    }
  }

  test("extended sweep: 1200 seeds over words-in-collections / nested options / bag order", Sweep) {
    assume(sys.env.contains("GRAFT_SWEEP"),
      "opt-in depth sweep: set GRAFT_SWEEP=1 to run")
    var overflow = 0
    for (i <- 0 until 1200) {
      val rnd = new Random(770000 + i)
      val t = genType(rnd, 1 + rnd.nextInt(2))
      val e = genExpr(t, Vector.empty, rnd, 2 + rnd.nextInt(2))
      val syn = TypeCheck.synthesize(e, Map.empty, Map.empty)
      assert(syn == t, s"[sweep $i] synthesized $syn intended $t\n$e")
      val expected = interp(e, REnv())
      try {
        val got = Compiler.compileProgram(e,
          Env(Map.empty, Map.empty, spark)) match {
          case CV(c) =>
            fromSpark(spark.range(1).select(c.as("v")).head.get(0), t)
          case TV(_) => fail(s"[sweep $i] scalar compiled to a table")
        }
        assert(cmp(got, expected) == 0,
          s"[sweep $i] compiled=$got reference=$expected\n$e")
      } catch {
        case ex: Throwable
            if Option(ex.getMessage).exists(_.contains("overflow")) =>
          overflow += 1
      }
    }
    info(s"1200 seeds, $overflow overflow-skipped")
    assert(overflow < 60)
  }
}
