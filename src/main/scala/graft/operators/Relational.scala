package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{Fiat2, GraftQuery, Tables}

/** The relational core of the reference — EFilter / EJoin / EProj / ESort /
  * aggregation folds (SURVEY.md §2.4-2.5) — expressed Spark-first: declarative
  * DataFrame plans so Catalyst does pushdown, pruning, and join selection.
  *
  * Money arithmetic runs in DECIMAL (exact, order-insensitive across engines)
  * and is cast to DOUBLE only at the output edge so Spark and DuckDB agree
  * bit-for-bit.
  */
object Relational {
  private val D = DecimalType(18, 2)
  private def dec(c: org.apache.spark.sql.Column) = c.cast(D)

  val queries: Seq[GraftQuery] = Seq(

    // EACFold AGSum/AGCount over grouped bags (fiat2/src/fiat2/Interpret.v:212-216)
    // composed with EFilter + dict-index-style grouping (DictIndexImpl.v:25-33).
    GraftQuery.sql("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec($"l_quantity")).cast("double").as("sum_qty"),
          sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec($"l_extendedprice") * (lit(1).cast(D) - dec($"l_discount")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },

    // EJoin with equi-predicate + fused EProj (fiat2/src/fiat2/Interpret.v:405-466)
    // — the Ex_Employee workload shape (Ex_Employee.v:23-27): small dimension
    // side is broadcast so the join is shuffle-free at any scale.
    GraftQuery.sql("q_employee_join",
      """SELECT s_name AS emp_name, n_name AS dept_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_name".as("emp_name"), $"n_name".as("dept_name"))
    },
  )

  /** Flagship: the Ex_Employee join end-to-end on the smallest SF. */
  def flagship(spark: SparkSession): DataFrame =
    queries.find(_.name == "q_employee_join").get
      .run(spark, "/root/testdata/sf0.001")
}
