package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic: print the optimizer's sizeInBytes statistics for the
  * inputs the adaptive-partitioning derivations read (cached shingle sets;
  * the salted-join scan legs), per scale directory. Used to pick the
  * bytes-per-partition constants from MEASURED estimator output rather than
  * guessed expansion factors.
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/testdata_27x",
        "/root/repo/testdata_81x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .appName("stats-probe").getOrCreate()
    for (dir <- dirs) {
      val dsets = graft.operators.Dedup.shingleSets(
        graft.core.Tables.load(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism)).cache()
      dsets.count()
      val dstat = dsets.queryExecution.optimizedPlan.stats.sizeInBytes
      val li = graft.core.Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
      val ord = graft.core.Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority")
      println(s"[stats-probe] dir=$dir dsets=$dstat " +
        s"lineitem=${li.queryExecution.optimizedPlan.stats.sizeInBytes} " +
        s"orders=${ord.queryExecution.optimizedPlan.stats.sizeInBytes}")
      dsets.unpersist(blocking = true)
    }
    s.stop()
  }
}
