package graft.operators

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler (test scope): warm stage timings for the slow-query hunt.
  * Run: Test/runMain graft.operators.ProfMain <sfDir> <name> [name...]
  * (declared in graft.operators for access to the package-private
  * shingle cache). Each named query runs twice — cold (after cache
  * clear) and warm — so one-time JIT/codegen cost is visible separately
  * from plan cost.
  */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    names.foreach { q =>
      spark.sqlContext.clearCache()
      t(s"$q cold") { SparkEntry.queries(q)(spark, sfDir).count() }
      spark.sqlContext.clearCache()
      t(s"$q warm") { SparkEntry.queries(q)(spark, sfDir).count() }
    }
    // stage decomposition of the clusters query, warm
    spark.sqlContext.clearCache()
    val dsets = Dedup.cachedShingleSets(spark, sfDir)
    t("stage: shingles(cached)") { dsets.count() }
    val pairs = Dedup.jaccardPairs(dsets)
      .filter(col("jaccard") >= 0.5).select(col("a"), col("b"))
    t("stage: pairs") { pairs.count() }
    val sym = graft.plans.Graph.symmetrize(pairs)
    t("stage: symmetrize") { sym.count() }
    t("stage: components") { graft.plans.Graph.connectedComponents(sym).count() }
    spark.stop()
  }
}
