package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}

/** The reference's general `EFold` restricted to associative+commutative
  * steps becomes a typed `Aggregator` — Spark's map-side-combinable UDAF
  * (SURVEY.md §2.9). Demo: modular product, which no built-in aggregate
  * covers, merged associatively so it parallelizes like sum.
  */
object TypedAgg {

  val P = 1000000007L

  /** Π x mod P — associative and commutative, so partial products combine
    * across partitions in any order. */
  object ModProd extends Aggregator[Long, Long, Long] {
    def zero: Long = 1L
    def reduce(b: Long, a: Long): Long = (b * (((a % P) + P) % P)) % P
    def merge(b1: Long, b2: Long): Long = (b1 * b2) % P
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q_typed_agg",
      // inputs normalized to NON-NEGATIVE residues on both sides — DuckDB's
      // % keeps the dividend's sign, the Aggregator normalizes in reduce()
      s"""SELECT event_type,
         |  CAST(list_reduce(list(((CAST(round(value * 100) AS BIGINT) % $P) + $P) % $P),
         |                   (a, b) -> (a * b) % $P) AS BIGINT) AS modprod,
         |  COUNT(*) AS n
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val cents = round($"value" * 100).cast("long")
      Tables.load(s, dir, "events")
        .groupBy($"event_type")
        .agg(udaf(ModProd).apply(cents).as("modprod"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },
  )
}
