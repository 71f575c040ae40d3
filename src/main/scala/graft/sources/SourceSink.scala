package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}

/** Source/sink format coverage beyond parquet: CSV, JSON-lines, ORC, and a
  * PARTITIONED parquet sink. The reference has no file formats at all —
  * its sources are environment bindings and its sink is `CAssign`
  * (`fiat2/src/fiat2/Language.v:210-217`) — so this family is the Spark
  * face of §2.1: every query writes a deterministic slice through the
  * format and reads it back, proving the round trip preserves values
  * (the DuckDB oracle computes the same result straight from parquet).
  *
  * Scale notes: CSV and JSON-lines are splittable line formats — a 100 TB
  * read parallelizes by input split exactly like parquet, minus column
  * pruning/statistics (the queries here project narrow slices up front
  * for that reason). The partitioned-parquet sink is the layout decision
  * that matters at scale: `partitionBy(status)` turns the read-back's
  * status filter into PartitionFilters (directory pruning — the scan
  * never touches non-matching files; asserted in SourceSinkSpec).
  *
  * Sinks land under java.io.tmpdir/graft_sinks/<query>/<sf> — per-scale
  * paths so sf0.01 verify runs and sf0.1 bench runs never read each
  * other's output; rewritten (Overwrite) on every invocation so reruns
  * see current data.
  */
object SourceSink {

  private def sinkDir(name: String, sfDir: String): String = {
    val sf = new java.io.File(sfDir).getName
    new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), "graft_sinks"),
      s"$name/$sf").getAbsolutePath
  }

  /** The deterministic slice every roundtrip writes: one narrow projection
    * of orders (key, customer, status, priority) — wide enough to exercise
    * strings + longs, narrow enough that the sink stays format-bound. */
  private def ordersSlice(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus").as("status"), col("o_orderpriority").as("priority"))

  /** Shared read-back aggregate: per-status counts + key sums — integer
    * arithmetic only, so the roundtrip compare is exact in any format.
    * Key sums accumulate in Decimal(38,0) and RENDER as exact decimal
    * strings: a group of 64-bit ids exceeds int64 long before 100 TB
    * (the 27x corpus already does — 1.7e19 per status), ANSI's long-sum
    * overflow would kill the roundtrip for a reason that has nothing to
    * do with the format, and past 2^53 only a string survives every
    * engine's exact-compare path (the q_lang_wide_sum precedent). */
  private def rollup(df: DataFrame): DataFrame =
    df.groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_custkey").cast("decimal(38,0)")).cast("string")
          .as("sum_cust"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("status")

  private val rollupSql =
    """SELECT o_orderstatus AS status, COUNT(*) AS n,
      |  CAST(CAST(SUM(o_custkey) AS HUGEINT) AS VARCHAR) AS sum_cust,
      |  MAX(o_orderkey) AS max_key
      |FROM orders GROUP BY 1 ORDER BY status""".stripMargin

  val queries: Seq[GraftQuery] = Seq(

    // CSV sink + source: header round trip with an explicit read schema
    // (schema inference at 100 TB means an extra full pass — never infer).
    GraftQuery.sql("q_csv_roundtrip", rollupSql) { (s, dir) =>
      val out = sinkDir("csv", dir)
      ordersSlice(s, dir).write.mode(SaveMode.Overwrite)
        .option("header", "true").csv(out)
      rollup(s.read
        .schema("o_orderkey BIGINT, o_custkey BIGINT, status STRING, priority STRING")
        .option("header", "true").csv(out))
    },

    // JSON-lines sink + source — the interchange format of most public
    // text-corpus dumps; same explicit-schema discipline.
    GraftQuery.sql("q_jsonl_roundtrip", rollupSql) { (s, dir) =>
      val out = sinkDir("jsonl", dir)
      ordersSlice(s, dir).write.mode(SaveMode.Overwrite).json(out)
      rollup(s.read
        .schema("o_orderkey BIGINT, o_custkey BIGINT, status STRING, priority STRING")
        .json(out))
    },

    // ORC sink + source — the other columnar container; pruning and
    // predicate pushdown work as for parquet.
    GraftQuery.sql("q_orc_roundtrip", rollupSql) { (s, dir) =>
      val out = sinkDir("orc", dir)
      ordersSlice(s, dir).write.mode(SaveMode.Overwrite).orc(out)
      rollup(s.read.orc(out))
    },

    // BUCKETED TABLES: both join sides written `bucketBy(custkey)` into
    // the session catalog, then joined — the co-located layout that makes
    // repeated fact-dim joins SHUFFLE-FREE at cluster scale (the §2.8
    // dict index as a physical design; BucketingSpec plan-asserts the
    // no-Exchange property). The oracle is the plain join.
    GraftQuery.sql("q_bucketed_join",
      """SELECT c_mktsegment AS segment, COUNT(*) AS n,
        |  CAST(CAST(SUM(o_orderkey) AS HUGEINT) AS VARCHAR) AS key_sum
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY segment""".stripMargin) { (s, dir) =>
      val sf = new java.io.File(dir).getName.replace('.', '_')
      val (ot, ct) = (s"orders_bkt_$sf", s"customer_bkt_$sf")
      // a fresh session's catalog doesn't know tables a PREVIOUS session
      // left in the warehouse directory, and saveAsTable then refuses the
      // existing location — drop both the entry and the stale directory
      Seq(ot, ct).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val wh = s.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:")
        Tables.deleteTree(new java.io.File(wh, t))
      }
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(ot)
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(ct)
      s.table(ot).join(s.table(ct), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey").cast("decimal(38,0)")).cast("string")
            .as("key_sum"))
        .orderBy("segment")
    },

    // SCHEMA EVOLUTION: two parquet batches written with different
    // schemas (the second adds `priority`) read back as ONE relation via
    // mergeSchema — rows from the old batch surface the new column as
    // null. This is how a long-lived corpus absorbs new metadata without
    // rewriting history; mergeSchema is opt-in because reconciling
    // footers costs a pass over file metadata at scale.
    GraftQuery.sql("q_schema_evolution",
      """SELECT priority, COUNT(*) AS n, CAST(CAST(SUM(o_custkey) AS HUGEINT) AS VARCHAR) AS cust_sum FROM (
        |  SELECT NULL AS priority, o_custkey FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderpriority, o_custkey FROM orders WHERE o_orderkey % 2 = 1)
        |GROUP BY priority ORDER BY priority NULLS FIRST""".stripMargin) { (s, dir) =>
      val out = sinkDir("evolve", dir)
      val slice = ordersSlice(s, dir)
      slice.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/v1")
      slice.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("priority"))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/v2")
      s.read.option("mergeSchema", "true").parquet(s"$out/v1", s"$out/v2")
        .groupBy(col("priority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_custkey").cast("decimal(38,0)")).cast("string")
            .as("cust_sum"))
        .orderBy(col("priority").asc_nulls_first)
    },

    // Partitioned parquet sink: partitionBy(status), read back with a
    // status filter — the filter becomes a PartitionFilter (directory
    // pruning), so the scan reads only the 'F' partition's files.
    GraftQuery.sql("q_partitioned_sink",
      """SELECT o_orderpriority AS priority, COUNT(*) AS n,
        |  CAST(CAST(SUM(o_custkey) AS HUGEINT) AS VARCHAR) AS sum_cust
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY 1 ORDER BY priority""".stripMargin) { (s, dir) =>
      val out = sinkDir("part_parquet", dir)
      ordersSlice(s, dir).write.mode(SaveMode.Overwrite)
        .partitionBy("status").parquet(out)
      s.read.parquet(out)
        .filter(col("status") === "F")
        .groupBy(col("priority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_custkey").cast("decimal(38,0)")).cast("string")
            .as("sum_cust"))
        .orderBy("priority")
    },
  )
}
