package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lang._
import graft.lang.Lang._

/** The SQL extraction backend: emitted text shape, the refusal stance on
  * engine-divergent operators, and execution equivalence with the compiled
  * path on a real program.
  */
class ToSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("filter/proj/join emit aliased ANSI SQL") {
    val filter = EFilter(LikeBag, ELoc("t"), "x",
      EBinop(OLess, EAccess(EVar("x"), "k"), EAtom(AInt(5))))
    assert(ToSql(filter) === "SELECT * FROM t AS x WHERE (x.k < 5)")
    val proj = EProj(LikeBag, ELoc("t"), "x",
      ERecord(List("a" -> EAccess(EVar("x"), "k"))))
    assert(ToSql(proj) === "SELECT x.k AS a FROM t AS x")
    assert(ToSql(EACFold(AGCount, proj)) ===
      "SELECT CAST(COUNT(*) AS BIGINT) AS value FROM (SELECT x.k AS a FROM t AS x)")
    assert(ToSql(EACFold(AGSum,
      EProj(LikeBag, ELoc("t"), "x", EAccess(EVar("x"), "k")))) ===
      "SELECT CAST(SUM(x.k) AS BIGINT) AS value FROM t AS x")
  }

  test("set/bag conversions, union-all, and scalar-subquery aggregates") {
    val proj = EProj(LikeBag, ELoc("t"), "x",
      ERecord(List("a" -> EAccess(EVar("x"), "k"))))
    assert(ToSql(ESetOf(proj)) ===
      "SELECT DISTINCT * FROM (SELECT x.k AS a FROM t AS x)")
    assert(ToSql(EBagOf(proj)) === ToSql(proj), "bag conversion is identity")
    assert(ToSql(EBinop(OConcat, ELoc("t"), ELoc("u"))) ===
      "SELECT * FROM (SELECT * FROM t) UNION ALL SELECT * FROM (SELECT * FROM u)")
    // bag strip under aggregates; set strip only under MIN/MAX
    val vals = EProj(LikeBag, ELoc("t"), "x", EAccess(EVar("x"), "k"))
    assert(ToSql(EACFold(AGSum, EBagOf(vals))) === ToSql(EACFold(AGSum, vals)))
    assert(ToSql(EACIFold(AGMin, ESetOf(vals))) ===
      ToSql(EACIFold(AGMin, vals)))
    assert(ToSql(EACFold(AGCount, ESetOf(vals))).contains("DISTINCT"),
      "count over a set must keep the dedup")
    assert(ToSql(EACIFold(AGMax, vals)) ===
      "SELECT CAST(MAX(x.k) AS BIGINT) AS value FROM t AS x")
    // aggregate in scalar position = scalar subquery
    assert(ToSql(EProj(LikeBag, ELoc("u"), "y", ERecord(List(
      "n" -> EUnop(OLength, ELoc("t")))))) ===
      "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT * FROM t)) AS n FROM u AS y")
  }

  test("annotated fold extracts and executes identically on Spark") {
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .createOrReplaceTempView("t_sql_agg")
    val src = "fold (x <- mut t_sql_agg; check(x[k] < 3); ret x[v]) 0 v acc v + acc"
    val annotated = CollectionTransf.annotate(
      Rewrites.normalize(Parser.parseExpr(src)))
    val sqlText = ToSql(annotated)
    assert(spark.sql(sqlText).head().getLong(0) === 30L)
  }

  test("refuses engine-divergent operators instead of mistranslating") {
    // Coq floor div/mod have no portable SQL builtin — extraction must
    // refuse (ToPython.v renders EFlatmap2 WRONGLY; refusal avoids that
    // class of bug by construction)
    assertThrows[ToSql.Unextractable](ToSql(
      EProj(LikeBag, ELoc("t"), "x", ERecord(List(
        "d" -> EBinop(ODiv, EAccess(EVar("x"), "k"), EAtom(AInt(3))))))))
    assertThrows[ToSql.Unextractable](ToSql(ELoc("bad-name")))
    assertThrows[ToSql.Unextractable](ToSql(
      EFilter(LikeBag, ELoc("t"), "x",
        EBinop(OEq, EAccess(EVar("x"), "s"), EAtom(AString("a\nb"))))))
  }

  test("extracted SQL computes the same rows as the compiled program") {
    import spark.implicits._
    val src =
      """a <- mut t_sql_spec;
        |check(a[k] < 3);
        |ret { kk : a[k], s : a[v] +++ "!" }""".stripMargin
    val prog = ESort(LikeList, Rewrites.normalize(Parser.parseExpr(src)))
    val df = Seq((1L, "x"), (2L, "y"), (5L, "z")).toDF("k", "v")
    df.createOrReplaceTempView("t_sql_spec")
    val viaSql = spark.sql(ToSql(prog))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val viaCompile = Compiler.compileProgram(prog,
      Compiler.Env(Map.empty, Map("t_sql_spec" -> df), spark,
        storeTypes = Map("t_sql_spec" -> TBag(TRecord.sorted(
          "k" -> TInt, "v" -> TString)))))
      .asInstanceOf[Compiler.TV].df
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaSql === viaCompile)
    assert(viaSql === Seq((1L, "x!"), (2L, "y!")))
  }

  test("whole-program extraction: bindings become view DDL in order") {
    val q1 = EFilter(LikeBag, ELoc("t"), "x",
      EBinop(OLess, EAccess(EVar("x"), "k"), EAtom(AInt(5))))
    val q2 = EProj(LikeBag, ELoc("big"), "y",
      ERecord(List("a" -> EAccess(EVar("y"), "k"))))
    val prog = CLetMut(q1, "big", CAssign("result", q2))
    assert(ToSql.program(prog) === List(
      "CREATE OR REPLACE TEMP VIEW big AS SELECT * FROM t AS x WHERE (x.k < 5)",
      "CREATE OR REPLACE TEMP VIEW result AS SELECT y.k AS a FROM big AS y"))
  }

  test("whole-program extraction refuses re-assignment and control flow") {
    val q = ELoc("t")
    // re-assignment: Spark freezes a view's definition at CREATE time,
    // DuckDB resolves at query time — divergent, must refuse
    assertThrows[ToSql.Unextractable](ToSql.program(
      CLetMut(q, "v", CAssign("v", ELoc("u")))))
    assertThrows[ToSql.Unextractable](ToSql.program(
      CForeach(EAtom(ANil(TInt)), "x", CAssign("out", q))))
    assertThrows[ToSql.Unextractable](ToSql.program(
      CIf(EAtom(ABool(true)), CAssign("a", q), CSkip)))
    // straight-line single assignment is fine
    assert(ToSql.program(CSeq(CAssign("a", q), CAssign("b", ELoc("a"))))
      .length === 2)
    // redefining a BASE table an earlier view already read diverges the
    // same way (Spark froze view `a`'s plan against the base `t`; DuckDB
    // would re-resolve it to the new view) — must refuse
    assertThrows[ToSql.Unextractable](ToSql.program(
      CSeq(CAssign("a", ELoc("t")),
        CSeq(CAssign("t", ELoc("u")), CAssign("r", ELoc("a"))))))
    // a self-referential definition resolves to the base table on Spark
    // but to the view itself on DuckDB — refuse
    assertThrows[ToSql.Unextractable](ToSql.program(
      CAssign("t", EFilter(LikeBag, ELoc("t"), "x",
        EBinop(OLess, EAccess(EVar("x"), "k"), EAtom(AInt(5)))))))
  }
}
