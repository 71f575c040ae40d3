package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.ScaleConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration filter (same contract as Bench): SPARK_GRAFT_ONLY=q_a,q_b
    // dumps a subset; the driver never sets it, so driver runs dump everything
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) =>
        val unknown = names -- SparkEntry.queries.keySet
        require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names not registered: " +
          unknown.mkString(", "))
        SparkEntry.queries.filter(q => names(q._1))
      case None => SparkEntry.queries
    }
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      // drop any dump from a previous run FIRST: if this query fails now,
      // a stale success must not masquerade as a pass in a reused outDir
      graft.core.Tables.deleteTree(new java.io.File(s"$outDir/$name"))
      val before = spark.sparkContext.getPersistentRDDs.keySet
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // A thrown query must be VISIBLE in the correctness artifact, not
        // silently absent (r8: 10 thrown queries produced an all-green
        // 154/154 report). Dump a one-row error-marker parquet — it can
        // never hash-match any oracle, so the compare records an explicit
        // failing entry for this name.
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        // the marker write itself must never abort the run (a session-fatal
        // first failure would otherwise skip every remaining query)
        try spark.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(
            s"query threw: ${failures(name).take(500)}")),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__graft_error",
              org.apache.spark.sql.types.StringType))))
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        catch { case m: Throwable =>
          System.err.println(s"[verify] $name marker write failed: " +
            s"${m.getMessage}")
        }
      }
      // queries build private caches (indexes, shingle sets); drop them so
      // 100+ queries don't accumulate executor memory. localCheckpoint
      // blocks live outside the SQL cache manager — drop them too, but
      // only those persisted DURING this query: a blanket unpersist would
      // destroy any lineage-truncated checkpoint a module holds across
      // queries, making it permanently unrecomputable
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !before(id) }
        .values.foreach(_.unpersist(blocking = false))
      graft.plans.KeyedIndexRule.clear()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // self-describing failure record alongside the dumps (the error-marker
    // parquets above make failures visible in the driver's compare; this
    // file carries the full messages)
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/failures.json"), failJson)
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} queries FAILED: " +
        failures.keys.mkString(", "))
    spark.stop()
  }

}
