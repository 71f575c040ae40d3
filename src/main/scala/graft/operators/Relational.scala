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
    // EFilter with a multi-conjunct predicate (fiat2/src/fiat2/Interpret.v:369-404)
    // — both conjuncts reach the parquet scan as PushedFilters.
    GraftQuery.sql("q_filter",
      """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS qty
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .filter($"l_quantity" > 45 && $"l_returnflag" === "R")
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("qty"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Generalized θ-join: equi-conjunct + inequality
    // (fiat2/src/fiat2/Interpret.v:405-466). Catalyst extracts the equi-key
    // and evaluates the inequality as a residual join condition.
    GraftQuery.sql("q_theta_join",
      """SELECT n1.n_regionkey AS rk, COUNT(*) AS n_pairs
        |FROM nation n1 JOIN nation n2
        |  ON n1.n_regionkey = n2.n_regionkey
        | AND n1.n_nationkey < n2.n_nationkey
        |GROUP BY n1.n_regionkey ORDER BY rk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val n1 = Tables.load(s, dir, "nation").alias("n1")
      val n2 = Tables.load(s, dir, "nation").alias("n2")
      n1.join(n2,
        $"n1.n_regionkey" === $"n2.n_regionkey" &&
          $"n1.n_nationkey" < $"n2.n_nationkey")
        .groupBy($"n1.n_regionkey".as("rk"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("rk")
    },

    // EACFold AGSum + AGCount over the whole table as a bag
    // (fiat2/src/fiat2/Interpret.v:212-216,320-326).
    GraftQuery.sql("q_agg_sum_count",
      """SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
        |  COUNT(*) AS n FROM lineitem""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .agg(sum(dec($"l_quantity")).cast("double").as("total_qty"),
          count(lit(1)).as("n"))
    },

    // EACIFold AGMin/AGMax — TOption result, None (null) on empty set
    // (fiat2/src/fiat2/Interpret.v:218-238): min_over_empty is null per group.
    GraftQuery.sql("q_agg_min_max",
      """SELECT p_brand, MIN(p_size) AS min_size,
        |  CAST(MAX(p_retailprice) AS DOUBLE) AS max_price,
        |  MIN(CASE WHEN p_size > 100 THEN p_size END) AS min_over_empty
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "part").groupBy($"p_brand")
        .agg(min($"p_size").as("min_size"),
          max($"p_retailprice").cast("double").as("max_price"),
          min(when($"p_size" > 100, $"p_size")).as("min_over_empty"))
        .orderBy("p_brand")
    },

    // group-by as dict-index construction: TDict key (TBag row) sizes + sums
    // (fiat2/src/fiat2/DictIndexImpl.v:25-33).
    GraftQuery.sql("q_groupby_bags",
      """SELECT c_nationkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "customer").groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(dec($"c_acctbal")).cast("double").as("bal"))
        .orderBy("c_nationkey")
    },
    // The reference's NOT-EXISTS idiom: nested flatmap compared to []
    // (fiat2/src/fiat2/Ex_BFS.v `check([...] = [])`) — in Spark, a left-anti
    // join (also the frontier-minus-visited step inside Graph.bfs).
    GraftQuery.sql("q_anti_join",
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders").filter($"o_totalprice" > 250000),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey").orderBy("c_custkey")
    },

    // haskellServer's two routes (haskellServer/src/Lib.hs:28-46): range-scan
    // filter (`get_artist_less_than`) + FK join (`get_album_and_artist`),
    // over the driver tables' analog (orders=albums, customers=artists).
    GraftQuery.sql("q_server_routes",
      """SELECT o_orderkey AS album_id, c_name AS artist
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_custkey < 20 ORDER BY album_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "orders")
        .join(broadcast(Tables.load(s, dir, "customer")
          .filter($"c_custkey" < 20)), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey".as("album_id"), $"c_name".as("artist"))
        .orderBy("album_id")
    },
    // SQL entry point: the ONE string below runs verbatim on Spark (over
    // registered views) AND as its own DuckDB oracle — `spark.sql(...)` is a
    // first-class way to author engine queries (SURVEY.md §3.4).
    {
      val sqlText =
        """SELECT o_orderpriority AS priority, COUNT(*) AS n
          |FROM orders WHERE o_totalprice > 150000
          |GROUP BY o_orderpriority ORDER BY priority""".stripMargin
      GraftQuery.sql("q_sql_text", sqlText) { (s, dir) =>
        Tables.registerAll(s, dir)
        s.sql(sqlText)
      }
    },
  )

  /** Flagship: the Ex_Employee join end-to-end on the smallest SF. */
  def flagship(spark: SparkSession): DataFrame =
    queries.find(_.name == "q_employee_join").get
      .run(spark, "/root/testdata/sf0.001")
}
