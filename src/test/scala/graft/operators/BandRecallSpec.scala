package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURE-RECALL TRIPWIRE for the 16-perm / 8-band LSH index
  * (ADVICE r10): at the j = 0.5 verification threshold a borderline pair
  * misses every band with probability ≈ (1 − 0.5²)⁸ ≈ 10%, so the
  * hash-green differential against the EXHAUSTIVE DuckDB oracle
  * (`q_dedup_minhash`, `q_dedup_incr_near`, `q_mine_pairs`) is a property
  * of THIS fixture, not of the algorithm. This test pins that property
  * directly: every true pair at j ≥ 0.5 — including the cross-split pairs
  * the incremental query reports — must share at least one band bucket.
  * If regenerated test data ever lands a near-threshold pair the bands
  * miss, this test names the cause instead of an opaque oracle mismatch.
  */
class BandRecallSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("every fixture pair at j >= 0.5 shares a band bucket (LSH recall = 1 here)") {
    val dsets = Dedup.cachedShingleSets(spark, graft.TestSpark.sfDir)
    // exhaustive ground truth (shared-shingle pair enumeration is exact
    // for j >= 0.5 — see jaccardPairs' cap note)
    val truth = Dedup.jaccardPairs(dsets)
      .filter(col("jaccard") >= 0.5)
      .select(col("a"), col("b"), col("jaccard"))
      .collect()
    assert(truth.nonEmpty, "fixture should contain near-dup pairs — " +
      "regenerated testdata without any makes the LSH oracles vacuous")
    val bands = Dedup.bandRows(Dedup.minhashSignatures(dsets))
    val cands = bands.select(col("doc_id").as("a"),
        col("band"), col("bh"))
      .join(bands.select(col("doc_id").as("b"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("a") < col("b")).select(col("a"), col("b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truth.filterNot(r =>
      cands.contains((r.getLong(0), r.getLong(1))))
    assert(missed.isEmpty,
      "band index missed true near-dup pairs (fixture recall broke — " +
        "the exhaustive oracles will diverge): " +
        missed.map(r => s"(${r.getLong(0)},${r.getLong(1)}) " +
          f"j=${r.getDouble(2)}%.3f").mkString(", "))
  }
}
