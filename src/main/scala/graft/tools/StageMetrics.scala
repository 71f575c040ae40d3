package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Scratch diagnostic: run one registered query and print per-stage task
  * metrics — executor CPU vs run time, GC time, shuffle read/write, and
  * spill bytes — the facts the r15 growth fit's 27x->81x tail flags need
  * before any knob is touched (both easy theories, partition-granularity
  * spill and heap starvation, were probed and refuted; see README
  * "Round-15 ritual artifacts"). A stage whose cpu/run ratio collapses
  * at 81x is scheduler/IO-bound; one whose spill or GC column lights up
  * is memory-bound; one whose cpu grows super-linearly is doing
  * genuinely more work per row. Dev-only.
  */
object StageMetrics {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: StageMetrics <query_name> [sfDir]\n" +
          "  env: SPARK_GRAFT_CPUS (default 4, matching Bench)")
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GRAFT_ADVISORY_MB: override AQE's post-shuffle advisory partition
    // size. The 64 MB default is sized on shuffle BYTES-ON-WIRE; the
    // gram-exploding aggregates expand ~10x in memory, so AQE coalesces
    // them back into spilling partitions no matter how high the static
    // shuffle.partitions is set (why the r15 partition-knob probe showed
    // no effect). Lets the spill-onset hypothesis be tested in isolation.
    val advisory = sys.env.getOrElse("GRAFT_ADVISORY_MB", "64")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        s"${advisory}m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // (stageId, name, tasks, runMs, cpuMs, gcMs, shufReadB, shufWriteB,
    //  memSpillB, diskSpillB, peakMemB)
    val stages = ArrayBuffer[(Int, String, Int, Long, Long, Long, Long,
      Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        stages.synchronized {
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
            si.numTasks, m.executorRunTime, m.executorCpuTime / 1000000L,
            m.jvmGCTime, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.memoryBytesSpilled,
            m.diskBytesSpilled, m.peakExecutionMemory))
        }
      }
    })
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // let the listener bus drain
    val rows = stages.synchronized(stages.sortBy(-_._4).toVector)
    def mb(b: Long): String = if (b == 0) "-" else f"${b / 1048576.0}%.0fM"
    println(f"${"stage"}%5s ${"tasks"}%5s ${"run_s"}%7s ${"cpu_s"}%7s " +
      f"${"cpu/run"}%7s ${"gc_s"}%6s ${"shRd"}%6s ${"shWr"}%6s " +
      f"${"spillM"}%6s ${"spillD"}%6s ${"peakEx"}%7s  name")
    rows.foreach { case (id, nm, n, run, cpu, gc, sr, sw, ms, ds, pk) =>
      println(f"$id%5d $n%5d ${run / 1e3}%7.1f ${cpu / 1e3}%7.1f " +
        f"${if (run == 0) 0.0 else cpu.toDouble / run}%7.2f " +
        f"${gc / 1e3}%6.1f ${mb(sr)}%6s ${mb(sw)}%6s ${mb(ms)}%6s " +
        f"${mb(ds)}%6s ${mb(pk)}%7s  $nm")
    }
    val (runT, cpuT, gcT) = rows.foldLeft((0L, 0L, 0L)) { case ((r, c, g), s) =>
      (r + s._4, c + s._5, g + s._6)
    }
    println(f"[stage-metrics] $name wall=$wall%.1fs stages=${rows.size} " +
      f"task_run=${runT / 1e3}%.1fs task_cpu=${cpuT / 1e3}%.1fs " +
      f"(cpu/run=${if (runT == 0) 0.0 else cpuT.toDouble / runT}%.2f) " +
      f"gc=${gcT / 1e3}%.1fs " +
      f"spill_disk=${mb(rows.map(_._10).sum)}")
    spark.stop()
  }
}
