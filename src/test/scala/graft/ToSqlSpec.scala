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
      Compiler.Env(Map.empty, Map("t_sql_spec" -> df), spark))
      .asInstanceOf[Compiler.TV].df
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaSql === viaCompile)
    assert(viaSql === Seq((1L, "x!"), (2L, "y!")))
  }
}
