package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-growth smoke for the quadratic-prone operators: runs each query on
  * sf0.01 and on a synthetic 8× blow-up of the same tables, and asserts
  * wall time grows ≲ linearly. This is the only way local testing can catch
  * ACCIDENTAL QUADRATIC candidate generation (an uncapped hot shingle, an
  * all-pairs self-join sneaking past a cap) — at 100 TB such a bug is the
  * difference between hours and never-finishes, but at one fixed SF it just
  * looks like a slightly slow query.
  *
  * Blow-up construction preserves problem STRUCTURE instead of densifying
  * it: each of the 8 document copies gets offset doc_ids and a per-copy
  * suffix on EVERY token, so shingles never collide across copies — the
  * near-dup cluster structure replicates 8×, exactly what 8× more
  * real-world data looks like. (A naive 8× duplication would give every
  * document 8 exact copies, inflating cluster sizes — legitimately
  * superlinear work, useless as a regression signal.) Lineitem copies get
  * offset order/part keys so the derived pagerank edge set grows too.
  *
  * The bound is 12× wall for 8× data: honest-linear measures ~1-3× here
  * (constant scheduling overhead and JIT noise dominate at this SF), while
  * a quadratic dominant stage lands near 64× — the gap is wide enough that
  * the assertion discriminates despite local wall-clock noise. Ratios are
  * printed so rounds can track drift.
  */
class ScaleGrowthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val baseDir = "/root/testdata/sf0.01"
  // q_lang_corr_filter_big rides along to pin the correlated-aggregate
  // unnesting: its lineitem aggregate side grows 8x while the supplier
  // outer is fixed — the grouped-agg + join plan must grow ≲ linearly.
  // The round-10 train-then-score text ops (bigram LM, DSIR selection,
  // BPE merges) join corpus streams against corpus-derived models — the
  // per-copy token suffix grows their vocabularies 8x too, so a
  // superlinear ratio would expose a model side accidentally exploding
  // against the stream side.
  // q_mine_pairs / q_dedup_incr_near ride the LSH candidate machinery
  // (copy-suffixed shingles keep buckets copy-local; the +10M doc_id
  // offset preserves the % 50 arrival split); q_embed_hashing is the
  // map+agg featurization pass.
  private val queries =
    Seq("q_substring_dup", "q_exact_substring_rm", "q_pipeline_clean",
      "q_dedup_clusters",
      "q_pagerank", "q_lang_corr_filter_big",
      "q_lm_score", "q_dsir_select", "q_bpe_merges", "q_bpe_encode",
      "q_mine_pairs", "q_dedup_incr_near", "q_embed_hashing")
  private val bound = 12.0

  private def blowUp(tmp: String): Unit = {
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    (0 until 8).map { i =>
      docs
        .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "$1c" + i))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val li = spark.read.parquet(s"$baseDir/lineitem.parquet")
    (0 until 8).map { i =>
      li
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * 1000003L))
        .withColumn("l_partkey", col("l_partkey") + lit(i * 999983L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    // supplier rides along unchanged: the correlated-aggregate query's
    // OUTER side stays fixed while its lineitem aggregate side grows 8x
    spark.read.parquet(s"$baseDir/supplier.parquet")
      .write.mode("overwrite").parquet(s"$tmp/supplier.parquet")
  }

  private def time(name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    spark.sqlContext.clearCache()
    dt
  }

  /** Events blow-up: 8 time-shifted copies (1000 days apart, so pairs and
    * windows never span copies — per-hour event density stays constant,
    * the honest 8×-more-history shape). `hot = false`: every copy gets
    * distinct users. `hot = true`: copies 1-7 route all CLICK events to
    * ONE user — that user's window/bucket partition holds ~7/8 of all
    * clicks (the straggler shape) while the true output stays base-sized
    * (the hot user's errors/purchases live only in copy 0, and copies are
    * time-disjoint), so superlinear wall = processing bug, not output. */
  private def blowUpEvents(tmp: String, hot: Boolean): Unit = {
    val ev = graft.core.Tables.load(spark, baseDir, "events")
    val norm = ev.select(col("event_id"), graft.core.Tables.tsCol(ev).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
    (0 until 8).map { i =>
      val shifted = norm
        .withColumn("event_id", col("event_id") + lit(i * 100000000L))
        .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 1000} DAYS"))
      if (i == 0) shifted
      else if (hot) shifted.withColumn("user_id",
        when(col("event_type") === "click", lit(1L))
          .otherwise(col("user_id") + lit(i * 1000000L)))
      else shifted.withColumn("user_id", col("user_id") + lit(i * 1000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
  }

  test("event-time family grows ≲ linearly under 8x blow-up, incl. hot user") {
    val evQueries = Seq("q_asof_join", "q_range_join")
    for (hot <- Seq(false, true)) {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_scale_events_").toString
      try {
        blowUpEvents(tmp, hot)
        val tag = if (hot) "hot-user" else "distinct"
        val offenders = evQueries.flatMap { q =>
          time(q, baseDir) // warm-up
          val base = math.max(time(q, baseDir), 0.05)
          val blown = time(q, tmp)
          val r = blown / base
          info(f"$q%-14s $tag%-8s base=$base%.2fs 8x=$blown%.2fs ratio=$r%.1f")
          if (r > bound) Some(q -> r) else None
        }
        assert(offenders.isEmpty,
          s"superlinear growth under 8x $tag events blow-up (bound $bound): " +
            offenders.map { case (q, r) => f"$q=$r%.1fx" }.mkString(", "))
      } finally {
        graft.core.Tables.deleteTree(new java.io.File(tmp))
      }
    }
  }

  /** Embeddings blow-up: 8 copies with offset vec_ids. The similarity
    * family's probe/candidate sets are vec_id-bounded (knn qid < 5, dedup
    * candidate batch < 500, IVF centroid seeds), so they stay copy-0 /
    * base-sized while the CORPUS side grows 8× — the incremental-ingest
    * shape at 8× history. Copies keep identical vectors deliberately:
    * every family member is broadcast-probe over a corpus scan (never
    * corpus×corpus), so WORK must stay corpus-linear by construction and
    * densified similarity may only grow the OUTPUT linearly — a
    * superlinear wall here means a probe side stopped broadcasting or a
    * corpus self-join crept in. */
  private def blowUpEmbeddings(tmp: String): Unit = {
    val em = spark.read.parquet(s"$baseDir/embeddings.parquet")
    (0 until 8).map { i =>
      em.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
  }

  test("similarity family grows ≲ linearly under 8x embeddings blow-up") {
    val simQueries = Seq("q_ann_ivf_topk", "q_dedup_embedding", "q_knn_label")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_scale_sim_").toString
    try {
      blowUpEmbeddings(tmp)
      val offenders = simQueries.flatMap { q =>
        time(q, baseDir) // warm-up: JIT + codegen for this query's plan
        val base = math.max(time(q, baseDir), 0.05)
        val blown = time(q, tmp)
        val r = blown / base
        info(f"$q%-18s base=$base%.2fs 8x=$blown%.2fs ratio=$r%.1f")
        if (r > bound) Some(q -> r) else None
      }
      assert(offenders.isEmpty,
        s"superlinear growth under 8x embeddings blow-up (bound $bound): " +
          offenders.map { case (q, r) => f"$q=$r%.1fx" }.mkString(", "))
    } finally {
      graft.core.Tables.deleteTree(new java.io.File(tmp))
    }
  }

  test("wall time grows ≲ linearly under an 8x data blow-up") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_scale_smoke_").toString
    try {
      blowUp(tmp)
      val ratios = queries.map { q =>
        time(q, baseDir) // warm-up: JIT + codegen for this query's plan
        val base = math.max(time(q, baseDir), 0.05)
        val blown = time(q, tmp)
        val r = blown / base
        info(f"$q%-20s base=$base%.2fs 8x=$blown%.2fs ratio=$r%.1f")
        q -> r
      }
      val offenders = ratios.filter(_._2 > bound)
      assert(offenders.isEmpty,
        s"superlinear growth under 8x blow-up (bound $bound): " +
          offenders.map { case (q, r) => f"$q=$r%.1fx" }.mkString(", "))
    } finally {
      graft.core.Tables.deleteTree(new java.io.File(tmp))
    }
  }
}
