package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** The cluster-scale form of the reference's dict index: bucketed tables.
  * Two tables bucketed by the join key join WITHOUT a shuffle — the
  * `bucketBy(attr)` physical design SURVEY.md §2.8 prescribes.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed-bucketed equi-join plans without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.load(spark, TestSpark.sfDir, "orders")
      val customer = Tables.load(spark, TestSpark.sfDir, "customer")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bkt")
      customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_bkt")
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it computes the same result as the plain join
      val n = joined.count()
      val expected = orders.join(customer,
        col("o_custkey") === col("c_custkey")).count()
      assert(n === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
