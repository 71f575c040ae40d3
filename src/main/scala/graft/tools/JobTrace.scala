package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Scratch diagnostic: run one registered query N times and print every
  * Spark job's (id, description) per rep — for pinning job-count
  * nondeterminism to a specific duplicated/raced stage. Dev-only. */
object JobTrace {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: JobTrace <query_name> [sfDir] [reps]\n" +
          "  env: SPARK_GRAFT_CPUS, JOBTRACE_EXPLAIN=1, " +
          "JOBTRACE_DRAIN_MS (listener-bus settle wait, default 1500)")
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 4
    // the tool exists to count jobs ACCURATELY: on a loaded box the bus
    // can lag past a fixed sleep, so settle until the count is stable
    // for 3 polls (bounded by JOBTRACE_DRAIN_MS per poll window)
    val drainMs = sys.env.getOrElse("JOBTRACE_DRAIN_MS", "1500").toLong
    val spark = graft.core.ScaleConf.tuned(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = ArrayBuffer[(Int, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.synchronized {
            jobs += ((js.jobId,
              Option(js.properties)
                .flatMap(p => Option(p.getProperty(
                  "spark.job.description"))).getOrElse("") + " | " +
              Option(js.properties)
                .flatMap(p => Option(p.getProperty(
                  "spark.sql.execution.id"))).getOrElse("-")))
          }
      })
    val fn = graft.SparkEntry.queries(name)
    if (sys.env.get("JOBTRACE_EXPLAIN").contains("1"))
      fn(spark, sfDir).explain("formatted")
    for (r <- 1 to reps) {
      jobs.synchronized(jobs.clear())
      fn(spark, sfDir).count()
      // settle: wait until no new JobStart lands for 3 consecutive polls
      var last = jobs.synchronized(jobs.size)
      var stable = 0
      var waited = 0L
      while (stable < 3 && waited < drainMs * 4) {
        Thread.sleep(drainMs / 3 max 100); waited += (drainMs / 3 max 100)
        val now = jobs.synchronized(jobs.size)
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      val snap = jobs.synchronized(jobs.toVector)
      println(s"=== rep $r: ${snap.size} jobs")
      snap.foreach { case (id, d) => println(f"  job $id%4d  $d") }
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      graft.plans.KeyedIndexRule.clear()
    }
    spark.stop()
  }
}
