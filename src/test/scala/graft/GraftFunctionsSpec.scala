package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ArrayMath, Fingerprints, GraftFunctions, WordOps}

/** The SQL registration must expose exactly the Column-API semantics —
  * each registered function is compared against its Column face on the
  * same inputs, and bad arities must fail analysis, not silently bind. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered = { GraftFunctions.register(spark); spark }

  test("SQL faces agree with the Column API") {
    val s = registered
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0), "hello graft world"),
      (-7L, Seq(0.5, -1.5, 2.5), Seq(2.0, 0.0, -2.0), "a b a b c")
    ).toDF("id", "va", "vb", "text")
    df.createOrReplaceTempView("gf_probe")
    val viaSql = s.sql(
      """SELECT id, graft_dot(va, vb) AS d, graft_l2sq(va, vb) AS l2,
        |  graft_md5_low64(text) AS fp,
        |  graft_simhash64(split(text, ' ')) AS sh,
        |  graft_minhash(split(text, ' '), 4) AS mh,
        |  graft_word_wmul(id, 9223372036854775807L) AS wm,
        |  graft_word_divu(id, 3L) AS du
        |FROM gf_probe ORDER BY id""".stripMargin).collect()
    val viaCols = df.select($"id", ArrayMath.dot($"va", $"vb").as("d"),
        ArrayMath.l2sq($"va", $"vb").as("l2"),
        Fingerprints.md5Low64($"text").as("fp"),
        Fingerprints.simhash(split($"text", " ")).as("sh"),
        Fingerprints.minhash(split($"text", " "), 4).as("mh"),
        WordOps.wmul($"id", lit(Long.MaxValue)).as("wm"),
        WordOps.divu($"id", lit(3L)).as("du"))
      .orderBy("id").collect()
    assert(viaSql.toSeq === viaCols.toSeq)
  }

  test("wrong arity and non-literal minhash perms fail loudly") {
    val s = registered
    intercept[Exception] { s.sql("SELECT graft_dot(array(1.0))").collect() }
    intercept[Exception] {
      s.sql("SELECT graft_minhash(array('a'), 1 + 1)").collect()
    }
  }
}
