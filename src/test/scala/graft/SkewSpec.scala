package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The 100 TB killer the uniform scale corpora never exercised (r14
  * directive 4): a power-law join/group key. `ScaleUp --zipf` builds
  * `testdata_skew9x` with ~48k-row hot orderkeys (vs ~4 uniform); this
  * spec asserts the mitigation actually FIRES on it — the deterministic
  * salt spread (plans/Salting.scala) structurally AND at the task level:
  * no single task may eat the hot key whole (per-task shuffle-read
  * records, salted vs unsalted).
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val skewDir = "/root/repo/testdata_skew9x"
  private def needCorpus(): Unit =
    assume(new java.io.File(s"$skewDir/lineitem.parquet").exists(),
      s"skew corpus missing — run ScaleUp --zipf into $skewDir")

  test("saltedJoin spreads the join across (key, salt) — structurally") {
    // the salt must be part of the shuffle key: hot key rows land on
    // `salts` reducers instead of one
    val p = SparkEntry.queries("q_salted_join")(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"),
      s"salted join lost its salt column (plain single-reducer key):\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("salted join splits the hot key across tasks on the skew corpus") {
    needCorpus()
    // the DIRECT no-single-task-owns-the-hot-key assertion: unsalted, a
    // hot key's joined rows land on exactly ONE reducer; salted over 8,
    // they must land on several. Measure the hottest key's partition
    // spread in the executed salted join.
    val li = spark.read.parquet(s"$skewDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val ord = spark.read.parquet(s"$skewDir/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val hot = li.groupBy("l_orderkey").count()
      .orderBy(desc("count")).limit(1).collect()(0).getLong(0)
    // the suite session runs 4 shuffle partitions with AQE coalescing —
    // at that granularity every key shares a partition with a quarter of
    // the data and the spread is unmeasurable; pin 32 un-coalesced
    // reducers and force the shuffled join for the measurement
    val confs = Seq(
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = graft.plans.Salting.saltedJoin(li, ord, "l_orderkey", 8)
      val spread = joined.filter(li("l_orderkey") === hot)
        .select(spark_partition_id().as("pid"))
        .distinct().count()
      assert(spread >= 4,
        s"hot key $hot landed on only $spread partition(s) — salting is " +
          "not spreading it (unsalted would be exactly 1)")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("no single task dominates the skewed join once salting engages") {
    needCorpus()
    // the directive's property, measured at the TASK level: per-task
    // shuffle-read records of the join stage. Unsalted, the hot key's
    // rows all land on one reducer (that task reads several times the
    // average); salted over 8, the max task must sit near the average.
    // (AQE's own skew=true split is the cluster-scale remedy — its
    // size-based detector reads compressed map statuses whose ~100 KB
    // partitions sit far below cluster-sized thresholds at this corpus
    // size, so the engine-level salt is the path asserted here.)
    import org.apache.spark.scheduler._
    val maxRecords = new java.util.concurrent.atomic.AtomicLong(0)
    val sumRecords = new java.util.concurrent.atomic.AtomicLong(0)
    val nTasks = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null && m.shuffleReadMetrics != null) {
          val r = m.shuffleReadMetrics.recordsRead
          if (r > 0) {
            maxRecords.getAndUpdate(c => math.max(c, r))
            sumRecords.addAndGet(r); nTasks.incrementAndGet()
          }
        }
      }
    }
    val confs = Seq(
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.addSparkListener(listener)
    def measure(salted: Boolean): (Long, Double) = {
      maxRecords.set(0); sumRecords.set(0); nTasks.set(0)
      val li = spark.read.parquet(s"$skewDir/lineitem.parquet")
        .filter(col("l_orderkey") < 1000000000000L)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val ord = spark.read.parquet(s"$skewDir/orders.parquet")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      val joined =
        if (salted) graft.plans.Salting.saltedJoin(li, ord, "l_orderkey", 8)
        else li.join(ord, Seq("l_orderkey"))
      joined.groupBy("o_orderpriority").count().collect()
      // settle the async listener bus
      var last = -1L; var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val now = sumRecords.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      (maxRecords.get(), sumRecords.get().toDouble / nTasks.get())
    }
    try {
      val (unsaltedMax, unsaltedAvg) = measure(salted = false)
      val (saltedMax, saltedAvg) = measure(salted = true)
      val unsaltedRatio = unsaltedMax / unsaltedAvg
      val saltedRatio = saltedMax / saltedAvg
      // the corpus genuinely skews the unsalted join (hot reducer reads
      // ~3x+ the average), and salting flattens it to near-uniform
      assert(unsaltedRatio > 2.0,
        f"skew corpus no longer skews: unsalted max/avg $unsaltedRatio%.2f")
      assert(saltedRatio < unsaltedRatio / 1.5,
        f"salting did not flatten the hot task: salted max/avg " +
          f"$saltedRatio%.2f vs unsalted $unsaltedRatio%.2f")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
