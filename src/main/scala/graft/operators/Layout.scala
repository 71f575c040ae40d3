package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}
import graft.functions.ZOrder

/** Multi-dimensional data layout: Z-order clustering. Sorting a table by
  * ONE lexicographic key bounds only that key's prefix per file; sorting by
  * the interleaved Z-value bounds EVERY participating dimension at once, so
  * min/max (parquet footer) pruning works for predicates on any of them —
  * the layout step a 100 TB corpus runs before writing so later scans can
  * skip most files regardless of which dimension they filter on.
  */
object Layout {

  /** Range-partition + sort by the Z-value of (a, b): each output
    * partition (→ file, when written) covers a tight hyper-rectangle of
    * BOTH dimensions. The z column is dropped — layout is a physical
    * property, not schema. */
  def zorderRepartition(df: DataFrame, a: Column, b: Column,
      numPartitions: Int): DataFrame = {
    val z = ZOrder.zorder2(a, b).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** DuckDB replay of `Morton.spread` as a CTE chain (each step reads the
    * previous one, so the expression tree stays linear). */
  private val spreadSteps = Seq(
    (16, "281470681808895"), // 0x0000FFFF0000FFFF
    (8, "71777214294589695"), // 0x00FF00FF00FF00FF
    (4, "1085102592571150095"), // 0x0F0F0F0F0F0F0F0F
    (2, "3689348814741910323"), // 0x3333333333333333
    (1, "6148914691236517205")) // 0x5555555555555555

  private def spreadCtes: String =
    spreadSteps.zipWithIndex.map { case ((sh, mask), i) =>
      val prev = if (i == 0) "d" else s"s$i"
      s"s${i + 1} AS (SELECT *, ((a${i} | (a${i} << $sh)) & $mask) AS a${i + 1}," +
        s" ((b${i} | (b${i} << $sh)) & $mask) AS b${i + 1} FROM $prev)"
    }.mkString(",\n")

  val queries: Seq[GraftQuery] = Seq(

    // Z-ORDER CLUSTERING, oracle-exact: 16-bit dims from part/supp keys,
    // z-value via the native codegen'd bit-spread, bucketed by the top
    // z-bits. The per-bucket MIN/MAX of BOTH dimensions is the point:
    // every bucket bounds a and b simultaneously (a hyper-rectangle),
    // which is what makes footer-stats pruning effective on either
    // predicate after a z-ordered write. DuckDB replays the identical
    // spread chain with 64-bit masks — bit-for-bit.
    GraftQuery.sql("q_zorder_layout",
      s"""WITH d AS (SELECT (l_partkey & 65535) AS a0, (l_suppkey & 65535) AS b0
         |           FROM lineitem),
         |$spreadCtes,
         |z AS (SELECT (a5 | (b5 << 1)) AS zval, a0, b0 FROM s5)
         |SELECT (zval >> 14) AS zbucket, COUNT(*) AS n,
         |  MIN(a0) AS a_min, MAX(a0) AS a_max,
         |  MIN(b0) AS b_min, MAX(b0) AS b_max
         |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin) { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem").select(
        $"l_partkey".cast("long").bitwiseAND(65535L).as("a"),
        $"l_suppkey".cast("long").bitwiseAND(65535L).as("b"))
      li.select($"a", $"b", ZOrder.zorder2($"a", $"b").as("zval"))
        .groupBy(shiftright($"zval", 14).as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min($"a").as("a_min"), max($"a").as("a_max"),
          min($"b").as("b_min"), max($"b").as("b_max"))
        .orderBy("zbucket")
    },

    // COMPACTION PLANNING (the small-files problem): assign input files to
    // output bins of ~target size by chunking the cumulative size in
    // manifest order — exactly what a compaction job computes before its
    // bin-per-task rewrite (documents stand in as the manifest; n_chars as
    // file size; target 25000). bin = starting-offset / target keeps
    // every bin ≤ target + one file, never splits a file, and is exact
    // integer math in both engines.
    //
    // The global prefix sum is DISTRIBUTED (r17, was a single-partition
    // window): range-partition by doc_id, take per-range totals (one tiny
    // aggregate, ≤ #partitions rows — the bounded collect), turn them into
    // exclusive cumulative offsets on the driver, and add each range's
    // offset to its in-partition running sum (a window PARTITIONED by the
    // pinned range id — never one partition carrying the whole input). The
    // classic two-phase scan: exact at 10^8+ manifest rows, identical
    // result at any partition count because ranges of doc_id are
    // contiguous. The range ids are sealed (localCheckpoint) so the
    // totals pass and the cumsum pass see the SAME partitioning even if
    // range sampling would re-draw.
    GraftQuery.sql("q_compaction_bins",
      """WITH m AS (SELECT doc_id, n_chars,
        |        SUM(n_chars) OVER (ORDER BY doc_id
        |          ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM documents)
        |SELECT CAST((cum - n_chars) // 25000 AS BIGINT) AS bin,
        |  COUNT(*) AS n_files, CAST(SUM(n_chars) AS BIGINT) AS bytes
        |FROM m GROUP BY 1 ORDER BY bin""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val parts = math.max(2, s.sparkContext.defaultParallelism)
      val m = Tables.load(s, dir, "documents")
        .select($"doc_id", $"n_chars")
        .repartitionByRange(parts, $"doc_id")
        .withColumn("pid", spark_partition_id())
        .localCheckpoint(true)
      val totals = m.groupBy($"pid").agg(sum($"n_chars").as("t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      // exclusive prefix over the pid-ordered range totals: offset of
      // range k = sum of all lower ranges' totals
      val offByPid: Map[Int, Long] = totals.map(_._1).zip(
        totals.map(_._2).scanLeft(0L)(_ + _).init).toMap
      m.withColumn("cum",
          sum($"n_chars").over(Window.partitionBy($"pid").orderBy($"doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            + coalesce(element_at(typedlit(offByPid), $"pid"), lit(0L)))
        .groupBy(floor(($"cum" - $"n_chars") / 25000).as("bin"))
        .agg(count(lit(1)).as("n_files"),
          sum($"n_chars").cast("long").as("bytes"))
        .orderBy("bin")
    },
  )
}
