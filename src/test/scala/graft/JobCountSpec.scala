package graft

import org.scalatest.funsuite.AnyFunSuite

/** Job-count DETERMINISM as a test, not a bench observation (r14
  * directive 5): r13/r14 each chased a job-count nondeterminism (the
  * jsrc distinct-outer broadcast race, the zip distinct-outer shuffle)
  * found only by eyeballing bench artifacts. This spec runs the whole
  * correlated-aggregate family (and the two previously-flaky queries'
  * fixed forms) twice each under Bench's per-rep hygiene and asserts the
  * job count is identical across reps — a raced stage materialization
  * shows up as a count delta here, in CI, not in a committed artifact
  * three rounds later.
  */
class JobCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
  private lazy val listenerInstalled: Unit = {
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCounter.incrementAndGet(); ()
        }
      })
  }

  /** One measured execution with Bench.runOnce's cache hygiene, so rep 2
    * pays the same plan cost as rep 1 (a cached relation or leftover
    * index would fake determinism by eliding jobs). */
  /** Wait until the (async) listener bus stops delivering JobStarts —
    * stable for 300ms, bounded at 15s. JobStart posts at submission,
    * strictly before the action unblocks, so this only absorbs residual
    * bus lag. */
  private def settle(): Unit = {
    var last = jobCounter.get()
    var stableFor = 0
    var waited = 0
    while (stableFor < 3 && waited < 150) {
      Thread.sleep(100); waited += 1
      val now = jobCounter.get()
      if (now == last) stableFor += 1 else { stableFor = 0; last = now }
    }
  }

  private def jobsOf(name: String): Int = {
    listenerInstalled
    val before = spark.sparkContext.getPersistentRDDs.keySet
    settle() // a previous run's stragglers must not leak into this rep
    val j0 = jobCounter.get()
    SparkEntry.queries(name)(spark, TestSpark.sfDir).count()
    settle()
    val jobs = jobCounter.get() - j0
    spark.sqlContext.clearCache()
    spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => !before(id) }
      .values.foreach(_.unpersist(blocking = false))
    graft.plans.KeyedIndexRule.clear()
    jobs
  }

  private val family = Seq(
    "q_lang_corr_agg", "q_lang_corr_filter", "q_lang_corr_filter_big",
    "q_lang_corr_nonequi", "q_lang_corr_flatmap", "q_lang_corr_fold",
    "q_lang_corr_cond", "q_lang_corr_gate", "q_lang_corr_jbind",
    "q_lang_corr_legbind", "q_lang_corr_jsrc", "q_lang_corr_nested",
    "q_lang_corr_zip", "q_lang_corr_join", "q_lang_corr_widen",
    "q_lang_corr_rangekey", "q_stream_curate")

  /** r17 verdict directive 8: the pagerank lazy-checkpoint win is a
    * JOB-count property (one executing job for the whole loop), invisible
    * to plan dumps — an eager-checkpoint regression (or a Spark upgrade
    * changing localCheckpoint semantics) would be silent. Pin it as
    * iteration-count INVARIANCE: with lazy per-iteration checkpoints the
    * loop contributes zero jobs until the final action, so tripling the
    * iteration count must not change the job count; an eager regression
    * adds one materialization job per iteration and fails loudly here. */
  test("pagerank loop submits no per-iteration materialization jobs") {
    listenerInstalled
    import spark.implicits._
    // AQE OFF for this measurement only: under AQE, building each
    // iteration's checkpoint RDD (queryExecution.toRdd) eagerly
    // materializes that iteration's shuffle query stages — a constant 3
    // jobs/iteration that exists in BOTH the lazy and eager shapes and
    // would drown the signal. With AQE off, a lazy localCheckpoint
    // contributes ZERO jobs at loop-build time (the final action runs
    // the whole lineage as one multi-stage job), so the job count is
    // invariant in the iteration count; an eager-checkpoint regression
    // adds one materialization job per iteration and fails loudly.
    val edges = (0L until 60L)
      .map(i => (i % 12, (i * 7 + 3) % 12)).toDF("src", "dst")
    def jobsAt(iters: Int): Int = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      settle()
      val j0 = jobCounter.get()
      graft.plans.Graph.pageRank(edges, iters).count()
      settle()
      val jobs = jobCounter.get() - j0
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !before(id) }
        .values.foreach(_.unpersist(blocking = false))
      jobs
    }
    // auto-broadcast also OFF: each iteration's rebuild join otherwise
    // broadcasts its (tiny, stats-known) contribs side, and the
    // BroadcastExchange executes as one job per iteration inside the
    // final action — again identical in both shapes, again drowning the
    // signal this guard exists to see.
    val aqeKey = "spark.sql.adaptive.enabled"
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevAqe = spark.conf.get(aqeKey)
    val prevBc = spark.conf.get(bcKey)
    val (j4, j12) = try {
      spark.conf.set(aqeKey, "false")
      spark.conf.set(bcKey, "-1")
      (jobsAt(4), jobsAt(12))
    } finally {
      spark.conf.set(aqeKey, prevAqe)
      spark.conf.set(bcKey, prevBc)
    }
    assert(j4 == j12,
      s"pageRank scheduled $j4 jobs at 4 iterations but $j12 at 12 — " +
        "per-iteration jobs are back (eager checkpoint regression?)")
  }

  family.foreach { name =>
    test(s"$name job count is identical across reps") {
      val r1 = jobsOf(name)
      val r2 = jobsOf(name)
      assert(r1 == r2,
        s"$name scheduled $r1 jobs on rep 1 but $r2 on rep 2 — a raced " +
          "stage materialization is back")
    }
  }
}
