package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property check for the BPE merge rewrite: the position-independent
  * drop-left-neighbor formulation (`TextAnalysis.mergeOnce`) must equal a
  * straightforward sequential greedy merge for every a ≠ b stream —
  * including empty arrays, streams of only `a`s, and back-to-back matches.
  */
class TextMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refMerge(t: Vector[String], a: String,
      b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < t.length) {
      if (i < t.length - 1 && t(i) == a && t(i + 1) == b) {
        out += s"${a}_$b"; i += 2
      } else { out += t(i); i += 1 }
    }
    out.result()
  }

  test("mergeOnce == sequential greedy merge on random streams (a != b)") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d")
    val cases = Vector.tabulate(80) { i =>
      // length 0..11, biased toward a/b so matches are dense; includes
      // the directed edges: empty, [b], [a, b, b], [a, a, b], [b, a, b]
      val n = rnd.nextInt(12)
      (i.toLong, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))))
    } ++ Vector(
      (100L, Vector.empty[String]),
      (101L, Vector("b")),
      (102L, Vector("a", "b", "b")),
      (103L, Vector("a", "a", "b")),
      (104L, Vector("b", "a", "b")),
      (105L, Vector("a", "b", "a", "b")))
    val got = cases.toDF("id", "t")
      .select($"id", TextAnalysis.mergeOnce($"t", "a", "b").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    cases.foreach { case (id, t) =>
      assert(got(id) == refMerge(t, "a", "b"),
        s"id=$id t=${t.mkString("[", " ", "]")}")
    }
  }

  test("bpeApply prefix == iterated mergeOnce (the fused-training identity)") {
    // r17: trainMerges derives round k's stream as bpeApply(t, merges so
    // far) instead of caching each round's rewrite — every merge decision
    // (any aggregate over the stream) is unchanged iff the re-derived
    // arrays are element-identical to the iterated rewrites. Merge pairs
    // include tokens PRODUCED by earlier merges (a_b), the case where an
    // ordering bug would show.
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d")
    val cases = Vector.tabulate(60) { i =>
      (i.toLong, Vector.fill(rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size))))
    }
    val merges = List(("a", "b"), ("a_b", "c"), ("b", "a"), ("d", "a_b_c"))
    val got = cases.toDF("id", "t")
      .select($"id", TextAnalysis.bpeApply($"t", merges).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    cases.foreach { case (id, t) =>
      val ref = merges.foldLeft(t) { case (s, (a, b)) => refMerge(s, a, b) }
      assert(got(id) == ref, s"id=$id t=${t.mkString("[", " ", "]")}")
    }
  }
}
