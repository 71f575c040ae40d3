package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}
import graft.functions.ArrayMath

/** Similarity search over the embedding column. Brute-force cosine top-k is
  * the exact baseline (query side broadcast, corpus side never shuffled);
  * sign-LSH bucketing is the scale path — candidates meet only inside
  * buckets, so the pair space is bucket-local instead of n².
  *
  * All float math is cast to double and summed strictly left-to-right (the
  * native `DotProduct` codegen expression), which is bit-identical to
  * DuckDB's sequential `list_reduce` fold — so even the top-k ORDER is
  * oracle-checkable.
  */
object Similarity {

  /** Plain Cast, NOT `transform(_, _.cast)`: a higher-order function is
    * CodegenFallback and would pull the whole projection (including the
    * codegen'd dot product) out of whole-stage codegen. */
  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** (vec_id, v, n2) with double vectors and squared norms. */
  private def corpus(df: DataFrame): DataFrame =
    df.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("n2", ArrayMath.dot(col("v"), col("v")))

  /** Deterministic ±1 hyperplanes: one 64-dim row per signature bit, from a
    * seeded PRNG on the driver — shipped as literals so the projection is one
    * codegen'd dot product per bit (no per-element hashing at runtime). */
  private def planes(bits: Int, dim: Int): IndexedSeq[Seq[Double]] = {
    val rnd = new scala.util.Random(0x5eed)
    IndexedSeq.fill(bits)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** 16-bit sign-LSH bucket of a double vector (dim known at plan time). */
  def lshBucket(v: Column, dim: Int): Column =
    planes(16, dim).zipWithIndex.map { case (p, j) =>
      when(ArrayMath.dot(v, typedlit(p)) > 0, shiftleft(lit(1L), j))
        .otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  val queries: Seq[GraftQuery] = Seq(

    // Per-vector stats through the same sequential folds as the oracle.
    GraftQuery.sql("q_embed_stats",
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) AS norm2,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val v = asDouble($"embedding")
      Tables.load(s, dir, "embeddings").select(
        $"vec_id",
        size($"embedding").cast("long").as("dim"),
        ArrayMath.dot(v, v).as("norm2"),
        size(filter($"embedding", x => x > 0)).cast("long").as("n_pos"))
        .orderBy("vec_id")
    },

    // Brute-force cosine top-10 for 5 query vectors: queries broadcast
    // against the corpus, ranked per query. Exact baseline for ANN.
    GraftQuery.sql("q_ann_topk",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |en AS (SELECT vec_id, v, list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b) AS n2 FROM e),
        |q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM en WHERE vec_id < 5),
        |scored AS (SELECT qid, vec_id,
        |             list_reduce(list_transform(list_zip(qv, v), p -> p[1] * p[2]), (a, b) -> a + b)
        |               / sqrt(qn2 * n2) AS sim
        |           FROM q, en WHERE vec_id != qid)
        |SELECT qid, vec_id, sim, CAST(rnk AS BIGINT) AS rnk FROM
        |  (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk FROM scored)
        |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = corpus(Tables.load(s, dir, "embeddings"))
      val q = e.select($"vec_id".as("qid"), $"v".as("qv"), $"n2".as("qn2"))
        .filter($"qid" < 5)
      val scored = e.join(broadcast(q), $"vec_id" =!= $"qid")
        .select($"qid", $"vec_id",
          (ArrayMath.dot($"qv", $"v") / sqrt($"qn2" * $"n2")).as("sim"))
      scored
        .withColumn("rnk",
          row_number().over(Window.partitionBy($"qid")
            .orderBy($"sim".desc, $"vec_id")).cast("long"))
        .filter($"rnk" <= 10)
        .select($"qid", $"vec_id", $"sim", $"rnk")
        .orderBy("qid", "rnk")
    },

    // Scale path: sign-LSH bucketing; exact cosine only within buckets, then
    // near-dup pairs above threshold. Bucket key join — never n² pairs.
    GraftQuery.rowsOnly("q_ann_lsh_pairs") { (s, dir) =>
      import s.implicits._
      val e = corpus(Tables.load(s, dir, "embeddings"))
        .withColumn("bucket", lshBucket($"v", 64)).cache()
      val a = e.select($"vec_id".as("a"), $"v".as("va"), $"n2".as("na"), $"bucket")
      val b = e.select($"vec_id".as("b"), $"v".as("vb"), $"n2".as("nb"), $"bucket")
      a.join(b, Seq("bucket")).filter($"a" < $"b")
        .select($"a", $"b",
          (ArrayMath.dot($"va", $"vb") / sqrt($"na" * $"nb")).as("cosine"))
        .filter($"cosine" >= 0.2)
        .orderBy("a", "b")
    },

    // IVF (inverted-file) ANN: partition the corpus into Voronoi cells of
    // K centroids; queries probe only the nProbe nearest cells. At 100 TB
    // the cell assignment is a one-time pass and each query touches
    // nProbe/K of the data. Centroids here are a deterministic sample
    // (vec_id < 16) — production would k-means a sample; the partition/probe
    // plumbing is identical.
    GraftQuery.rowsOnly("q_ann_ivf_topk") { (s, dir) =>
      import s.implicits._
      val e = corpus(Tables.load(s, dir, "embeddings"))
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cid"), $"v".as("cv"), $"n2".as("cn2"))
      // assign every vector to its nearest centroid (cosine) — including a
      // centroid to its OWN cell (excluding it would warp the index; query
      // self-match is excluded later, at scoring)
      val assigned = e.crossJoin(broadcast(cents))
        .select($"vec_id", $"v", $"n2", $"cid",
          (ArrayMath.dot($"v", $"cv") / sqrt($"n2" * $"cn2")).as("csim"))
        .withColumn("crnk", row_number().over(
          Window.partitionBy($"vec_id").orderBy($"csim".desc, $"cid")))
        .filter($"crnk" === 1)
        .select($"vec_id", $"v", $"n2", $"cid")
      // queries probe their 2 nearest cells
      val probes = e.filter($"vec_id" < 5)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"n2".as("qn2"))
        .crossJoin(broadcast(cents))
        .select($"qid", $"qv", $"qn2", $"cid",
          (ArrayMath.dot($"qv", $"cv") / sqrt($"qn2" * $"cn2")).as("csim"))
        .withColumn("crnk", row_number().over(
          Window.partitionBy($"qid").orderBy($"csim".desc, $"cid")))
        .filter($"crnk" <= 2)
        .select($"qid", $"qv", $"qn2", $"cid")
      val scored = probes.join(assigned, Seq("cid"))
        .filter($"vec_id" =!= $"qid")
        .select($"qid", $"vec_id",
          (ArrayMath.dot($"qv", $"v") / sqrt($"qn2" * $"n2")).as("sim"))
      scored.withColumn("rnk", row_number().over(
        Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id")).cast("long"))
        .filter($"rnk" <= 10)
        .select($"qid", $"vec_id", $"sim", $"rnk")
        .orderBy("qid", "rnk")
    },

    // Embedding-cosine near-dup scan of a bounded candidate batch (vec_id <
    // 500) against the full corpus — the incremental-ingest dedup shape.
    GraftQuery.rowsOnly("q_dedup_embedding") { (s, dir) =>
      import s.implicits._
      val e = corpus(Tables.load(s, dir, "embeddings"))
      val cand = e.filter($"vec_id" < 500)
        .select($"vec_id".as("a"), $"v".as("va"), $"n2".as("na"))
      val scored = e.join(broadcast(cand), $"a" < $"vec_id")
        .select($"a", $"vec_id".as("b"),
          (ArrayMath.dot($"va", $"v") / sqrt($"na" * $"n2")).as("cosine"))
      scored.filter($"cosine" >= 0.35).orderBy("a", "b")
    },
  )
}
