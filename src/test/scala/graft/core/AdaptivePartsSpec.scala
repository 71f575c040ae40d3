package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The scale-adaptive partition derivation (r17): the jaccard pair
  * exchanges and the salted join derive their width from input bytes, so
  * per-partition state stays flat at any scale — but below the local
  * parallelism the derivation must be a NO-OP, keeping every small-scale
  * plan (and the bench at sf0.1/sf0.01) byte-identical to the pre-r17
  * shape.
  */
class AdaptivePartsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("forBytes clamps small inputs to the local parallelism") {
    val dp = spark.sparkContext.defaultParallelism
    assert(AdaptiveParts.forBytes(spark, BigInt(0)) == dp)
    assert(AdaptiveParts.forBytes(spark, BigInt(1) << 20) == dp)
    // exactly one target unit still rounds within the clamp at local dp
    assert(AdaptiveParts.forBytes(spark,
      BigInt(AdaptiveParts.targetBytesPerPartition)) == math.max(dp, 2))
  }

  test("forBytes grows linearly with input and caps at 512") {
    val t = AdaptiveParts.targetBytesPerPartition
    assert(AdaptiveParts.forBytes(spark, BigInt(t) * 100) == 101)
    assert(AdaptiveParts.forBytes(spark, BigInt(t) * 100000) == 512)
    // the 81x harness derivation: 833 MB of cached shingle sets -> 25
    assert(AdaptiveParts.forBytes(spark, BigInt(833014088L)) == 25)
  }

  test("sizes-join hint engages only past the broadcast threshold") {
    // r17 verdict directive 5: the hint must never replace an automatic
    // broadcast of the skinny sizes side (broadcasting it shuffles
    // NOTHING; any shuffled join moves the whole pair list). The gate is
    // the build side's own estimate vs autoBroadcastJoinThreshold — so
    // with the threshold forced below the estimate, the hint engages and
    // the sizes joins become ShuffledHashJoin; at the default threshold
    // they stay broadcast (pinned by the small-scale test below).
    val docs = Seq(
      1L -> "aaa bbb ccc ddd eee",
      2L -> "aaa bbb ccc ddd eee",
      3L -> "fff ggg hhh iii jjj").toDF("doc_id", "text")
    val dsets = graft.operators.Dedup.shingleSets(docs).cache()
    dsets.count()
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "1")
      val plan = graft.operators.Dedup.jaccardPairs(dsets)
        .queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin"),
        s"with broadcast disabled the sizes joins must be hinted " +
          s"shuffle_hash (sort-merge would sort the pair list):\n$plan")
    } finally {
      spark.conf.set(key, prev)
      dsets.unpersist(blocking = false)
    }
  }

  test("below the widen threshold jaccardPairs keeps the un-repartitioned plan") {
    val docs = Seq(
      1L -> "aaa bbb ccc ddd eee",
      2L -> "aaa bbb ccc ddd eee",
      3L -> "fff ggg hhh iii jjj").toDF("doc_id", "text")
    val dsets = graft.operators.Dedup.shingleSets(docs).cache()
    dsets.count()
    try {
      val plan = graft.operators.Dedup.jaccardPairs(dsets)
        .queryExecution.executedPlan.toString
      // tiny input derives below defaultParallelism: no explicit
      // repartition exchange (REPARTITION_BY_NUM origin) and no forced
      // hash-join hint may appear — the pre-r17 plan, byte-identical
      assert(!plan.contains("REPARTITION_BY_NUM"),
        s"small-scale jaccard plan gained a repartition:\n$plan")
      assert(!plan.contains("ShuffledHashJoin"),
        s"small-scale jaccard plan gained a forced hash join:\n$plan")
    } finally dsets.unpersist(blocking = false)
  }
}
