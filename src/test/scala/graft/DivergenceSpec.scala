package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.lang._
import graft.lang.Lang._
import graft.lang.RefInterp._
import graft.lang.Compiler.{CV, Env}

/** The README "Known divergences" pinned EXECUTABLE: each test demonstrates
  * the engine differing from the reference semantics exactly as documented
  * — and nothing more. If an engine change closes one of these gaps, the
  * failing test is the signal to update the README (and usually to
  * celebrate); if a change widens a gap, `DifferentialSpec` is the side
  * that catches it.
  */
class DivergenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def evalCompiled(e: Expr): Any =
    Compiler.compile(e, Env(Map.empty, Map.empty, spark)) match {
      case CV(c) => spark.range(1).select(c.as("v")).head.get(0)
      case _ => fail("expected a scalar")
    }

  test("nested options flatten: Some(None) is indistinguishable from None") {
    // match (Some None) with None => 1 | Some _ => 5
    val e = EOptMatch(EUnop(OSome, EAtom(ANone(TInt))),
      EAtom(AInt(1)), "x", EAtom(AInt(5)))
    // reference: the Some branch
    assert(interp(e, REnv()) == VI(5))
    // engine: nullable encoding collapses Some(None) to null → None branch
    assert(evalCompiled(e) == 1L)
  }

  test("collections of words sort signed in the engine, unsigned in the reference") {
    val l = EBinop(OCons, EAtom(AWord(-1L)),
      EBinop(OCons, EAtom(AWord(1L)), EAtom(ANil(TWord))))
    val sorted = ESort(LikeList, l)
    // reference: -1 as a word is 2^64-1, the LARGEST value
    assert(interp(sorted, REnv()) == VList(Vector(VW(1L), VW(-1L))))
    // engine: bare longs sort signed
    assert(evalCompiled(sorted) ==
      scala.collection.mutable.ArraySeq(-1L, 1L))
    // the scalar comparison is exact in both: OWLessU is unsigned
    assert(interp(EBinop(OWLessU, EAtom(AWord(1L)), EAtom(AWord(-1L))),
      REnv()) == VB(true))
    assert(evalCompiled(EBinop(OWLessU, EAtom(AWord(1L)),
      EAtom(AWord(-1L)))) == true)
  }

  test("TInt overflows past 2^63 by default; wideInt and the reference grow") {
    val big = EBinop(OTimes, EAtom(AInt(1L << 62)), EAtom(AInt(4)))
    assert(interp(big, REnv()) == VI(BigInt(1L << 62) * 4)) // reference: Z
    val err = intercept[Exception] { evalCompiled(big) } // default: ANSI
    assert(err.getMessage.contains("ARITHMETIC_OVERFLOW") ||
      err.getMessage.toLowerCase.contains("overflow"))
    val wide = Compiler.compile(big,
      Env(Map.empty, Map.empty, spark, wideInt = true)) match {
      case CV(c) => spark.range(1).select(c.as("v")).head.get(0)
      case _ => fail("expected a scalar")
    }
    assert(fromSpark(wide, TInt) == VI(BigInt(1L << 62) * 4))
  }

  test("correlated aggregates over tables above the localization cap raise the directed error") {
    // The reference interprets ARBITRARY correlated bodies nested-loop-
    // style (fiat2/src/fiat2/Interpret.v:273-299). The engine decorrelates
    // every shape a distributed plan can express — filter chains, scalar
    // aggregates in projections and filter predicates incl. non-equi,
    // join legs/binders/sources, folds/sorts over correlated chains —
    // and, for order-safe aggregates with NO peelable chain in any form
    // (e.g. an aggregate over a DOUBLY-NESTED correlated flatmap, as
    // here), falls back to SCALAR-LAND: every table leg localizes to
    // its canonical array literal and the aggregate compiles per outer
    // row (Compiler.liftLocsToArrays). That localization is capped at
    // 10k rows — a driver array of an unbounded table is not a plan —
    // so the same shape over a table ABOVE the cap REFUSES with an
    // error directing the user to the EJoin/comprehension form, rather
    // than silently collecting an arbitrarily large table.
    val rowT = TRecord.sorted("k" -> TInt, "v" -> TInt)
    val fmBody = EFlatmap(LikeList, ELoc("t2"), "y",
      EIf(EBinop(OEq, EAccess(EVar("y"), "k"), EAccess(EVar("x"), "k")),
        EBinop(OCons, EVar("y"), EBinop(OCons, EVar("y"),
          EAtom(ANil(rowT)))),
        EAtom(ANil(rowT))))
    val fmBody2 = EFlatmap(LikeList, fmBody, "z",
      EBinop(OCons, EVar("z"), EBinop(OCons, EVar("z"),
        EAtom(ANil(rowT)))))
    val prog = EProj(LikeList, ELoc("t1"), "x",
      ERecord(List("k" -> EAccess(EVar("x"), "k"),
        "h" -> EUnop(OLength, fmBody2))))
    // the reference evaluates it fine (arbitrary-body semantics): the
    // matching row doubles in the inner flatmap, doubles again in the
    // outer — length 4
    val rows = VList(Vector(VRec(Vector("k" -> VI(1), "v" -> VI(5)))))
    val ref = interp(prog, REnv("t1" -> rows, "t2" -> rows))
    assert(ref == VList(Vector(VRec(Vector("h" -> VI(4), "k" -> VI(1))))))
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", LongType)))
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, 5L)), schema)
    // BELOW the cap the shape is supported-and-correct (round 10): the
    // scalar-land fallback matches the reference
    Compiler.compileProgram(prog,
      Env(Map.empty, Map("t1" -> df, "t2" -> df), spark)) match {
      case Compiler.TV(out) =>
        val got = out.collect().map(r =>
          (r.getAs[Long]("k"), r.getAs[Long]("h"))).toSeq
        assert(got == Seq((1L, 4L)))
      case other => fail(s"expected a table result, got $other")
    }
    // ABOVE the cap (10k+1 rows in the aggregate's table leg) the
    // directed error remains
    val big = spark.range(10001).select(col("id").as("k"),
      col("id").as("v"))
    val err = intercept[UnsupportedOperationException] {
      Compiler.compileProgram(prog,
        Env(Map.empty, Map("t1" -> df, "t2" -> big), spark)) match {
        case Compiler.TV(out) => out.collect()
        case other => other
      }
    }
    assert(err.getMessage.contains("EJoin"),
      s"expected the directed rewrite-as-EJoin error, got: ${err.getMessage}")
  }

  test("bag sort position differs between element-array and (value,count) encodings") {
    // {a,a,b} vs {a,c} with a<b<c: element arrays order them Lt; the
    // reference's run-length pairs order them Gt — the one place the
    // engine's bag encoding is OBSERVABLE, and only via sort position of
    // bags nested inside ordered collections. Equality agrees everywhere.
    def runLength(xs: Vector[V]): Vector[(V, Int)] =
      xs.foldRight(Vector.empty[(V, Int)]) { (v, acc) =>
        acc.headOption match {
          case Some((w, n)) if cmp(v, w) == 0 => (w, n + 1) +: acc.tail
          case _ => (v, 1) +: acc
        }
      }
    def coqBagCompare(a: Vector[V], b: Vector[V]): Int = {
      val (ra, rb) = (runLength(a), runLength(b))
      ra.zip(rb).iterator.map { case ((v1, n1), (v2, n2)) =>
        val c = cmp(v1, v2); if (c != 0) c else n1.compareTo(n2)
      }.find(_ != 0).getOrElse(ra.size.compareTo(rb.size))
    }
    val bagA = Vector[V](VI(1), VI(1), VI(2)) // {a,a,b}
    val bagB = Vector[V](VI(1), VI(3)) // {a,c}
    assert(cmp(VBag(bagA), VBag(bagB)) < 0) // engine/RefInterp: element-wise
    assert(coqBagCompare(bagA, bagB) > 0) // reference: (value,count) pairs
  }

  test("word family boundaries: 125 wraps in Decimal, 126+ wraps in bytes (no ceiling)") {
    // The reference's section parameter ranges over any width: Z
    // (fiat2/src/fiat2/Language.v:4). Through round 9 the engine capped
    // widths at 125 (Decimal(38,0) residues — a pinned divergence); round
    // 10 closed it with the multi-limb Bytes family, so the former
    // directed error must be GONE and the representation handoff at the
    // 125/126 boundary must be seamless.
    import graft.functions.{WordMathBytes, WordOps}
    // boundary width of the Decimal family still wraps correctly:
    // (2^125 - 1) + 1 ≡ 0 (mod 2^125)
    val w125 = WordOps.forWidth(125)
    val maxW = org.apache.spark.sql.functions
      .lit(new java.math.BigDecimal(new java.math.BigInteger("2").pow(125)
        .subtract(java.math.BigInteger.ONE)))
      .cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val wrapped = spark.range(1)
      .select(w125.wadd(maxW, w125.literal(1L)).as("v"))
      .head.getDecimal(0)
    assert(wrapped.toBigInteger == java.math.BigInteger.ZERO)
    // first Bytes width and a deep one: (2^w - 1) + 1 ≡ 0 (mod 2^w), and
    // the residue round-trips the fixed-length encoding
    for (w <- Seq(126, 256, 1000)) {
      val fam = WordOps.forWidth(w).asInstanceOf[WordOps.Bytes]
      val max = org.apache.spark.sql.functions.lit(WordMathBytes.toBytes(
        java.math.BigInteger.ONE.shiftLeft(w).subtract(java.math.BigInteger.ONE), w))
      val z = spark.range(1).select(fam.wadd(max, fam.literal(1L)).as("v"))
        .head.getAs[Array[Byte]](0)
      assert(WordMathBytes.fromBytes(z) == java.math.BigInteger.ZERO,
        s"width $w wrap")
      assert(z.length == (w + 7) / 8, s"width $w fixed length")
    }
  }
}
