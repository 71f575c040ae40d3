package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}
import graft.functions.ArrayMath

/** Similarity search over the embedding column. Brute-force cosine top-k is
  * the exact baseline (query side broadcast, corpus side never shuffled);
  * sign-LSH bucketing and IVF cells are the scale paths — candidates meet
  * only inside buckets/cells, so the pair space is bucket-local instead of n².
  *
  * All float math is cast to double and summed strictly left-to-right (the
  * native `DotProduct` codegen expression), which is bit-identical to
  * DuckDB's sequential `list_reduce` fold — so even ANN outputs are
  * oracle-checkable: the LSH oracle recomputes the very same hyperplane
  * buckets (planes shipped into the SQL as literals) and the IVF oracle
  * replays the whole assign/probe/score pipeline in SQL.
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

  /** DuckDB fragments shared by the oracles below (bit-exact vs DotProduct:
    * sequential left-to-right double folds — proven by q_ann_topk). */
  private val enSql =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |en AS (SELECT vec_id, v, list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b) AS n2 FROM e)""".stripMargin
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), z -> z[1] * z[2]), (u, w) -> u + w)"

  /** Sequential-fold squared L2 from 0.0 — bit-exact vs the oracle's
    * `list_reduce` (0.0 + x1 == x1 in IEEE, then the same add sequence).
    * Native codegen'd expression (`SquaredDistance`) — the higher-order
    * `aggregate(zip_with(...))` form computes the identical value but is
    * CodegenFallback, which dominated the IVF/k-means/PQ projections. */
  private def l2sq(v: Column, c: Column): Column = ArrayMath.l2sq(v, c)

  /** The (d, cid) cell structs against centroid LITERALS — the map-side
    * argmin building block (`array_min` = min distance, ties to the
    * smallest cid, matching the oracle's ORDER BY d, cid). */
  private def cellStructsOf(cents: Seq[(Long, Seq[Double])]): Column =
    array(cents.map { case (cid, cv) =>
      struct(l2sq(col("v"), typedlit(cv)).as("d"), lit(cid).as("cid")) }: _*)

  /** Assign every row to its nearest centroid — one map-side projection,
    * no Exchange; keeps all input columns and adds `cid`. */
  private def withCell(df: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame =
    df.withColumn("cid", array_min(cellStructsOf(cents))("cid"))

  /** Fixed-point quantum for the Lloyd mean: x * 2^30 is an EXACT double op
    * (power-of-two multiply only shifts the exponent), floor is
    * deterministic, and the resulting BIGINTs sum exactly in ANY order — so
    * the mean update is a plain sum/count partial aggregate (bounded
    * per-group state, map-side combine) yet still bit-replayable by the
    * oracle. Headroom: |x| ≤ 2 and 2^53 / 2^31 = 4×10^6 members per cell
    * before the double cast of the sum loses exactness; a 100 TB run would
    * widen the sum to DECIMAL(38,0), which changes nothing else. */
  private val Quantum = 1L << 30

  /** One Lloyd mean update: a single shuffle keyed (cell, dim) carrying only
    * (sum, count) partials — no per-member state (the round-5 collect_list
    * materialized whole cell memberships). The mean is computed on
    * 2^-30-quantized values so integer summation makes it order-free and
    * engine-exact; returns the centroids as driver values for the next
    * literal-shipped assignment. */
  private def lloydMeans(assigned: DataFrame): Seq[(Long, Seq[Double])] =
    assigned.select(col("cid"), posexplode(col("v")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "x")
      .groupBy(col("cid"), col("i"))
      .agg(sum(floor(col("x") * Quantum)).as("qsum"), count(lit(1)).as("n"))
      .select(col("cid"), col("i"),
        (col("qsum").cast("double") / col("n") / Quantum).as("cx"))
      .groupBy(col("cid"))
      .agg(sort_array(collect_list(struct(col("i"), col("cx")))).as("ic"))
      .select(col("cid"), transform(col("ic"), el => el("cx")).as("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq

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

  /** The LSH oracle recomputes the same buckets from the same plane literals:
    * the dot-against-±1 folds are bit-exact in both engines, so the sign (and
    * hence the bucket, the join, and the cosines) match exactly. */
  private def lshOracleSql: String = {
    val rows = planes(16, 64).zipWithIndex
      .map { case (p, j) => s"($j, [${p.mkString(", ")}])" }
      .mkString(", ")
    s"""WITH planes(j, p) AS (VALUES $rows),
       |$enSql,
       |bk AS (SELECT vec_id, v, n2,
       |  (SELECT SUM(CASE WHEN ${dotSql("en.v", "p")} > 0
       |              THEN CAST(1 AS BIGINT) << j ELSE 0 END) FROM planes) AS bucket
       |  FROM en)
       |SELECT a, b, cosine FROM (
       |  SELECT x.vec_id AS a, y.vec_id AS b,
       |    ${dotSql("x.v", "y.v")} / sqrt(x.n2 * y.n2) AS cosine
       |  FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
       |WHERE cosine >= 0.2 ORDER BY a, b""".stripMargin
  }

  /** Full IVF replay in SQL: same centroid sample, same argmax assignment
    * (ties to the smallest cid), same 2-cell probe, same scoring. */
  private val ivfOracleSql =
    s"""WITH $enSql,
       |c AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM en WHERE vec_id < 16),
       |asg AS (SELECT vec_id, v, n2, cid FROM (
       |  SELECT en.vec_id, en.v, en.n2, c.cid, row_number() OVER (
       |    PARTITION BY en.vec_id
       |    ORDER BY ${dotSql("en.v", "c.cv")} / sqrt(en.n2 * c.cn2) DESC, c.cid) AS crnk
       |  FROM en, c) WHERE crnk = 1),
       |pr AS (SELECT qid, qv, qn2, cid FROM (
       |  SELECT q.vec_id AS qid, q.v AS qv, q.n2 AS qn2, c.cid, row_number() OVER (
       |    PARTITION BY q.vec_id
       |    ORDER BY ${dotSql("q.v", "c.cv")} / sqrt(q.n2 * c.cn2) DESC, c.cid) AS crnk
       |  FROM en q, c WHERE q.vec_id < 5) WHERE crnk <= 2),
       |scored AS (SELECT qid, vec_id,
       |    ${dotSql("qv", "v")} / sqrt(qn2 * n2) AS sim
       |  FROM pr JOIN asg USING (cid) WHERE vec_id != qid)
       |SELECT qid, vec_id, sim, CAST(rnk AS BIGINT) AS rnk FROM
       |  (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk FROM scored)
       |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin

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

    // Int8 symmetric quantization of the embedding column — the storage/
    // serving compression step of an embedding pipeline (map-only: scale =
    // 127/max|x| per vector, round-half-away-from-zero matches in both
    // engines, so the oracle is value-exact including the double `scale`).
    GraftQuery.sql("q_embed_quantize",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
        |q AS (SELECT vec_id, 127.0 / mx AS scale,
        |        list_transform(v, x -> CAST(round(x * (127.0 / mx)) AS BIGINT)) AS qv
        |      FROM m)
        |SELECT vec_id, scale,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_min(qv) AS BIGINT) AS q_min,
        |  CAST(list_max(qv) AS BIGINT) AS q_max
        |FROM q ORDER BY vec_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val v = asDouble($"embedding")
      val mx = array_max(transform(v, x => abs(x)))
      val scale = lit(127.0) / mx
      val qv = transform(v, x => round(x * scale).cast("long"))
      Tables.load(s, dir, "embeddings").select(
        $"vec_id", scale.as("scale"),
        aggregate(qv, lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(qv).as("q_min"),
        array_max(qv).as("q_max"))
        .orderBy("vec_id")
    },

    // Brute-force cosine top-10 for 5 query vectors: queries broadcast
    // against the corpus, ranked per query. Exact baseline for ANN.
    GraftQuery.sql("q_ann_topk",
      s"""WITH $enSql,
        |q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM en WHERE vec_id < 5),
        |scored AS (SELECT qid, vec_id,
        |             ${dotSql("qv", "v")} / sqrt(qn2 * n2) AS sim
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

    // HARD-NEGATIVE MINING (r12) — the contrastive-training complement of
    // q_mine_pairs' random id-shifted negatives: for each anchor, the
    // most-similar candidates BELOW the duplicate band (sim < 0.95, self
    // excluded) — similar enough to be hard, distinct enough not to be a
    // positive. Same exact-fold sim arithmetic and (sim DESC, id) tie
    // order as q_ann_topk, so the ids-and-ranks output is bit-replayable.
    // Scale shape: anchors broadcast (the query-batch stance), one corpus
    // scan, one qid-keyed window; the 100 TB variant swaps the scan for
    // the IVF cell probe exactly like q_ann_ivf_topk.
    GraftQuery.sql("q_hard_negatives",
      s"""WITH $enSql,
        |q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM en WHERE vec_id < 8),
        |scored AS (SELECT qid, vec_id,
        |             ${dotSql("qv", "v")} / sqrt(qn2 * n2) AS sim
        |           FROM q, en WHERE vec_id != qid),
        |hard AS (SELECT * FROM scored WHERE sim < 0.95)
        |SELECT qid, vec_id AS neg_id, sim, CAST(rnk AS BIGINT) AS rnk FROM
        |  (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk FROM hard)
        |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = corpus(Tables.load(s, dir, "embeddings"))
      val q = e.select($"vec_id".as("qid"), $"v".as("qv"), $"n2".as("qn2"))
        .filter($"qid" < 8)
      e.join(broadcast(q), $"vec_id" =!= $"qid")
        .select($"qid", $"vec_id",
          (ArrayMath.dot($"qv", $"v") / sqrt($"qn2" * $"n2")).as("sim"))
        .filter($"sim" < 0.95)
        .withColumn("rnk",
          row_number().over(Window.partitionBy($"qid")
            .orderBy($"sim".desc, $"vec_id")).cast("long"))
        .filter($"rnk" <= 5)
        .select($"qid", $"vec_id".as("neg_id"), $"sim", $"rnk")
        .orderBy("qid", "rnk")
    },

    // FILTERED vector search — top-5 neighbors among vectors satisfying an
    // attribute predicate (label = 2), the retrieval shape of a curated
    // corpus ("nearest English wiki documents", not nearest anything).
    // Pre-filtering beats post-filtering a top-k: the predicate lands on
    // the SCAN (PushedFilters prunes row groups at 100 TB) and the distance
    // computation runs only on survivors; post-filtering k results would
    // return fewer than k whenever the label is rare. Same broadcast-query
    // plan as q_ann_topk otherwise.
    GraftQuery.sql("q_ann_filtered",
      s"""WITH el AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |enl AS (SELECT vec_id, label, v,
        |          list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b) AS n2
        |        FROM el),
        |q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM enl WHERE vec_id < 5),
        |scored AS (SELECT qid, vec_id,
        |             ${dotSql("qv", "v")} / sqrt(qn2 * n2) AS sim
        |           FROM q, enl WHERE label = 2 AND vec_id != qid)
        |SELECT qid, vec_id, sim, CAST(rnk AS BIGINT) AS rnk FROM
        |  (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk FROM scored)
        |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val raw = Tables.load(s, dir, "embeddings")
      val labeled = raw
        .select($"vec_id", $"label", asDouble($"embedding").as("v"))
        .withColumn("n2", ArrayMath.dot($"v", $"v"))
      val q = labeled.filter($"vec_id" < 5)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"n2".as("qn2"))
      labeled.filter($"label" === 2)
        .join(broadcast(q), $"vec_id" =!= $"qid")
        .select($"qid", $"vec_id",
          (ArrayMath.dot($"qv", $"v") / sqrt($"qn2" * $"n2")).as("sim"))
        .withColumn("rnk",
          row_number().over(Window.partitionBy($"qid")
            .orderBy($"sim".desc, $"vec_id")).cast("long"))
        .filter($"rnk" <= 5)
        .select($"qid", $"vec_id", $"sim", $"rnk")
        .orderBy("qid", "rnk")
    },

    // k-NN LABEL PREDICTION: classify each query vector by the majority
    // label of its 10 nearest labeled neighbors — the embedding-classifier
    // shape a curation pipeline uses for quality/domain routing when no
    // trained model ships with the job. Plan: broadcast the query batch,
    // one pass over the labeled corpus computes similarities, a per-query
    // top-k (rank window over qid — k rows of state per query), then a
    // vote count and arg-max. Corpus never shuffles by itself: every
    // exchange after the scan is query-batch-sized. Tie-break: higher
    // vote count first, then smaller label — both engines replay it.
    GraftQuery.sql("q_knn_label",
      s"""WITH el AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |enl AS (SELECT vec_id, label, v,
        |          list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b) AS n2
        |        FROM el),
        |q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM enl WHERE vec_id < 5),
        |scored AS (SELECT qid, vec_id, label,
        |             ${dotSql("qv", "v")} / sqrt(qn2 * n2) AS sim
        |           FROM q, enl WHERE vec_id >= 5),
        |nn AS (SELECT qid, label FROM (
        |         SELECT qid, label,
        |           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
        |         FROM scored) WHERE rnk <= 10),
        |votes AS (SELECT qid, label, COUNT(*) AS n FROM nn GROUP BY qid, label)
        |SELECT qid, label AS pred, n AS votes FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY n DESC, label) AS r
        |  FROM votes) WHERE r = 1 ORDER BY qid""".stripMargin) { (s, dir) =>
      import s.implicits._
      val labeled = Tables.load(s, dir, "embeddings")
        .select($"vec_id", $"label", asDouble($"embedding").as("v"))
        .withColumn("n2", ArrayMath.dot($"v", $"v"))
      val q = labeled.filter($"vec_id" < 5)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"n2".as("qn2"))
      labeled.filter($"vec_id" >= 5)
        .join(broadcast(q))
        .select($"qid", $"vec_id", $"label",
          (ArrayMath.dot($"qv", $"v") / sqrt($"qn2" * $"n2")).as("sim"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id")))
        .filter($"rnk" <= 10)
        .groupBy($"qid", $"label")
        .agg(count(lit(1)).as("n"))
        .withColumn("r", row_number().over(
          Window.partitionBy($"qid").orderBy($"n".desc, $"label")))
        .filter($"r" === 1)
        .select($"qid", $"label".as("pred"), $"n".as("votes"))
        .orderBy("qid")
    },

    // Scale path: sign-LSH bucketing; exact cosine only within buckets, then
    // near-dup pairs above threshold. Bucket key join — never n² pairs.
    GraftQuery.sql("q_ann_lsh_pairs", lshOracleSql) { (s, dir) =>
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
    // plumbing is identical. The 16 centroids are collected to the driver
    // and re-shipped as literals, so cell assignment is ONE map-side
    // projection (argmax over 16 codegen'd dot products) with no Exchange —
    // replacing the round-1 crossJoin + per-vec_id window that shuffled
    // corpus×16 rows.
    GraftQuery.sql("q_ann_ivf_topk", ivfOracleSql) { (s, dir) =>
      import s.implicits._
      val e = corpus(Tables.load(s, dir, "embeddings"))
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cid"), $"v".as("cv"), $"n2".as("cn2"))
        .collect().sortBy(_.getLong(0))
      // per-row array of (csim, -cid) structs: array_max picks the best cell,
      // ties to the smallest cid (struct order = csim, then -cid descending)
      def cellStructs(v: Column, n2: Column) = cents.map { r =>
        struct(
          (ArrayMath.dot(v, typedlit(r.getSeq[Double](1))) /
            sqrt(n2 * lit(r.getDouble(2)))).as("csim"),
          lit(-r.getLong(0)).as("ncid"))
      }
      // assign every vector to its nearest centroid (cosine) — including a
      // centroid to its OWN cell (excluding it would warp the index; query
      // self-match is excluded later, at scoring)
      val assigned = e.select($"vec_id", $"v", $"n2",
        (-array_max(array(cellStructs($"v", $"n2"): _*)).getField("ncid")).as("cid"))
      // queries probe their 2 nearest cells: sort the 16 structs descending,
      // take the head two — still one map-side projection
      val probes = e.filter($"vec_id" < 5)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"n2".as("qn2"),
          explode(slice(reverse(array_sort(array(cellStructs($"v", $"n2"): _*))), 1, 2))
            .as("cc"))
        .select($"qid", $"qv", $"qn2", (-$"cc.ncid").as("cid"))
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
    GraftQuery.sql("q_dedup_embedding",
      s"""WITH $enSql,
        |cand AS (SELECT vec_id AS a, v AS va, n2 AS na FROM en WHERE vec_id < 500)
        |SELECT a, b, cosine FROM (
        |  SELECT cand.a, en.vec_id AS b,
        |    ${dotSql("cand.va", "en.v")} / sqrt(cand.na * en.n2) AS cosine
        |  FROM cand JOIN en ON cand.a < en.vec_id)
        |WHERE cosine >= 0.35 ORDER BY a, b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = corpus(Tables.load(s, dir, "embeddings"))
      val cand = e.filter($"vec_id" < 500)
        .select($"vec_id".as("a"), $"v".as("va"), $"n2".as("na"))
      val scored = e.join(broadcast(cand), $"a" < $"vec_id")
        .select($"a", $"vec_id".as("b"),
          (ArrayMath.dot($"va", $"v") / sqrt($"na" * $"n2")).as("cosine"))
      scored.filter($"cosine" >= 0.35).orderBy("a", "b")
    },

    // K-MEANS centroid TRAINING for IVF (2 Lloyd iterations, deterministic
    // init = the first k vectors): the "production would k-means a sample"
    // step that q_ann_ivf_topk's fixed centroids stand in for. Each
    // iteration is (1) a MAP-SIDE assignment — centroids ship as literals,
    // argmin over k codegen'd L2 folds, no Exchange — and (2) one shuffle
    // keyed (cell, dim) for the mean update carrying only (sum, count)
    // partials (map-side combine, bounded per-group state); at 100 TB that
    // is the minimal movement k-means can do. The mean is defined on
    // 2^-30-quantized members (exact power-of-two scale + floor + integer
    // sum), so it is order-free AND bit-replayable: the oracle — the whole
    // algorithm in SQL — is hash-exact, not a proxy: per-cell member
    // counts and centroid digests after two iterations.
    GraftQuery.sql("q_ivf_kmeans",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |d1 AS (SELECT e.vec_id, c0.cid,
        |         list_reduce(list_transform(range(1, len(e.v)+1), i -> (e.v[i]-c0.cv[i])*(e.v[i]-c0.cv[i])), (a,b) -> a+b) AS d
        |       FROM e, c0),
        |a1 AS (SELECT vec_id, cid FROM
        |        (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d1)
        |       WHERE rn = 1),
        |m1 AS (SELECT a1.cid, r.i,
        |         CAST(SUM(CAST(floor(e.v[r.i] * 1073741824.0) AS BIGINT)) AS DOUBLE)
        |           / COUNT(*) / 1073741824.0 AS cx
        |       FROM a1 JOIN e USING (vec_id), unnest(range(1, len(e.v)+1)) AS r(i)
        |       GROUP BY a1.cid, r.i),
        |c1 AS (SELECT cid, list(cx ORDER BY i) AS cv FROM m1 GROUP BY cid),
        |d2 AS (SELECT e.vec_id, c1.cid,
        |         list_reduce(list_transform(range(1, len(e.v)+1), i -> (e.v[i]-c1.cv[i])*(e.v[i]-c1.cv[i])), (a,b) -> a+b) AS d
        |       FROM e, c1),
        |a2 AS (SELECT vec_id, cid FROM
        |        (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d2)
        |       WHERE rn = 1)
        |SELECT a2.cid AS cid, COUNT(*) AS n, ANY_VALUE(cds.cd) AS cdigest
        |FROM a2 JOIN (SELECT cid, list_reduce(cv, (a,b) -> a+b) AS cd FROM c1) cds USING (cid)
        |GROUP BY a2.cid ORDER BY cid""".stripMargin) { (s, dir) =>
      import s.implicits._
      val k = 8
      val e = Tables.load(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"vec_id", asDouble($"embedding").as("v")).cache()
      val c0 = e.filter($"vec_id" < k).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
      val c1 = lloydMeans(withCell(e, c0))
      val a2 = withCell(e, c1)
      val digests = c1.map { case (cid, cv) => (cid, cv.reduceLeft(_ + _)) }
        .toDF("cid", "cdigest")
      a2.groupBy($"cid").agg(count(lit(1)).as("n"))
        .join(broadcast(digests), "cid")
        .select($"cid", $"n", $"cdigest")
        .orderBy("cid")
    },

    // The TRAINED IVF serving path end-to-end: one Lloyd round trains the
    // cell centroids (q_ivf_kmeans's math), the corpus is partitioned by
    // trained cell, and each query probes only its 2 nearest cells —
    // assignment AND probe are map-side argmins over centroid literals, so
    // the only shuffles are the one Lloyd mean update and the
    // candidate-sized probe join. The oracle replays training, assignment,
    // probing, and cosine scoring in SQL, bit-exact.
    GraftQuery.sql("q_ivf_trained_topk", {
      def l2(v: String, c: String) =
        s"list_reduce(list_transform(range(1, len($v)+1), i -> ($v[i]-$c[i])*($v[i]-$c[i])), (a,b) -> a+b)"
      s"""WITH $enSql,
         |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |d1 AS (SELECT e.vec_id, c0.cid, ${l2("e.v", "c0.cv")} AS d FROM e, c0),
         |a1 AS (SELECT vec_id, cid FROM
         |        (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d1)
         |       WHERE rn = 1),
         |m1 AS (SELECT a1.cid, r.i,
         |         CAST(SUM(CAST(floor(e.v[r.i] * 1073741824.0) AS BIGINT)) AS DOUBLE)
         |           / COUNT(*) / 1073741824.0 AS cx
         |       FROM a1 JOIN e USING (vec_id), unnest(range(1, len(e.v)+1)) AS r(i)
         |       GROUP BY a1.cid, r.i),
         |c1 AS (SELECT cid, list(cx ORDER BY i) AS cv FROM m1 GROUP BY cid),
         |d2 AS (SELECT e.vec_id, c1.cid, ${l2("e.v", "c1.cv")} AS d FROM e, c1),
         |a2 AS (SELECT vec_id, cid FROM
         |        (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d2)
         |       WHERE rn = 1),
         |pr AS (SELECT qid, cid FROM
         |        (SELECT en.vec_id AS qid, c1.cid,
         |           row_number() OVER (PARTITION BY en.vec_id ORDER BY ${l2("en.v", "c1.cv")}, c1.cid) AS crnk
         |         FROM en, c1 WHERE en.vec_id < 5) WHERE crnk <= 2),
         |scored AS (SELECT pr.qid, a2.vec_id, ${dotSql("qe.v", "ce.v")} / sqrt(qe.n2 * ce.n2) AS sim
         |  FROM pr JOIN a2 USING (cid)
         |  JOIN en qe ON qe.vec_id = pr.qid
         |  JOIN en ce ON ce.vec_id = a2.vec_id
         |  WHERE a2.vec_id != pr.qid)
         |SELECT qid, vec_id, sim, CAST(rnk AS BIGINT) AS rnk FROM
         | (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk FROM scored)
         |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val k = 8
      val e = corpus(Tables.load(s, dir, "embeddings"))
        .repartition(s.sparkContext.defaultParallelism).cache()
      val c0 = e.filter($"vec_id" < k).select($"vec_id", $"v").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
      val c1 = lloydMeans(withCell(e.select($"vec_id", $"v"), c0))
      val assigned = withCell(e, c1)
      // probe = the 2 smallest (d, cid) cells per query — map-side argsort
      // over the same centroid literals
      val probes = e.filter($"vec_id" < 5)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"n2".as("qn2"),
          explode(slice(array_sort(cellStructsOf(c1)), 1, 2)).as("pc"))
        .select($"qid", $"qv", $"qn2", $"pc.cid".as("cid"))
      val scored = assigned.join(broadcast(probes), "cid")
        .filter($"vec_id" =!= $"qid")
        .select($"qid", $"vec_id",
          (ArrayMath.dot($"qv", $"v") / sqrt($"qn2" * $"n2")).as("sim"))
      scored.withColumn("rnk", row_number().over(
          Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id"))
          .cast("long"))
        .filter($"rnk" <= 10)
        .select($"qid", $"vec_id", $"sim", $"rnk")
        .orderBy("qid", "rnk")
    },

    // PRODUCT QUANTIZATION (PQ) ANN with ADC scoring — the memory-bound
    // scale path: the 64-dim corpus compresses to 8 one-byte codes per
    // vector (8 subspaces × 16-entry codebooks), and each query scores a
    // row by EIGHT table lookups instead of a 64-dim fold. Codebooks are
    // deterministic sub-vectors of the first 16 corpus rows (the same
    // fixed-sample stance as q_ann_ivf_topk; q_ivf_kmeans shows the
    // trained path). Encoding is one MAP-SIDE projection (argmin over 16
    // codebook literals per subspace, no Exchange); each query computes
    // its 8×16 lookup table map-side once, then the broadcast-join scoring
    // touches only code bytes. Approximate distances sum the 8 LUT entries
    // strictly left-to-right, and the oracle replays codebooks, encoding,
    // LUTs, and ranking in SQL — hash-exact, not a recall proxy.
    GraftQuery.sql("q_ann_pq_topk", {
      def l2(v: String, c: String) =
        s"list_reduce(list_transform(range(1, len($v)+1), i -> ($v[i]-$c[i])*($v[i]-$c[i])), (a,b) -> a+b)"
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cb AS (SELECT m.m, j.vec_id AS j, j.v[m.m*8+1 : m.m*8+8] AS cv
         |       FROM (SELECT UNNEST(range(0, 8)) AS m) m,
         |            (SELECT vec_id, v FROM e WHERE vec_id < 16) j),
         |codes AS (SELECT vec_id, m, j AS code FROM (
         |  SELECT e.vec_id, cb.m, cb.j, row_number() OVER (PARTITION BY e.vec_id, cb.m
         |    ORDER BY ${l2("e.v[cb.m*8+1 : cb.m*8+8]", "cb.cv")}, cb.j) AS rn
         |  FROM e, cb) WHERE rn = 1),
         |lut AS (SELECT e.vec_id AS qid, cb.m, cb.j,
         |          ${l2("e.v[cb.m*8+1 : cb.m*8+8]", "cb.cv")} AS d
         |        FROM e, cb WHERE e.vec_id < 5),
         |scored AS (SELECT lut.qid, codes.vec_id,
         |    list_reduce(list(lut.d ORDER BY lut.m), (a, b) -> a + b) AS adist
         |  FROM codes JOIN lut ON lut.m = codes.m AND lut.j = codes.code
         |  WHERE codes.vec_id != lut.qid
         |  GROUP BY lut.qid, codes.vec_id)
         |SELECT qid, vec_id, adist, CAST(rnk AS BIGINT) AS rnk FROM
         | (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rnk FROM scored)
         |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val subs = 8; val codesPerSub = 16; val subDim = 64 / subs
      val e = corpus(Tables.load(s, dir, "embeddings")).select($"vec_id", $"v")
      // codebooks: subspace m → 16 literal sub-vectors (rows vec_id < 16)
      val cbRows = e.filter($"vec_id" < codesPerSub).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
      def codebook(m: Int): IndexedSeq[Seq[Double]] =
        cbRows.map { case (_, v) => v.slice(m * subDim, (m + 1) * subDim) }
          .toIndexedSeq
      def sub(v: Column, m: Int) = slice(v, m * subDim + 1, subDim)
      // encode: per subspace the argmin (d, j) over the codebook literals —
      // one projection, ties to the smallest code id
      val codeCols = (0 until subs).map { m =>
        array_min(array(codebook(m).zipWithIndex.map { case (cv, j) =>
          struct(l2sq(sub($"v", m), typedlit(cv)).as("d"), lit(j).as("j"))
        }: _*)).getField("j").as(s"c$m")
      }
      val encoded = e.select(($"vec_id" +: codeCols): _*)
      // per-query LUT: lut[m][j] = d(q_sub_m, codebook_m[j]), map-side
      val lutCol = array((0 until subs).map { m =>
        array(codebook(m).map(cv => l2sq(sub($"v", m), typedlit(cv))): _*)
      }: _*)
      val qlut = e.filter($"vec_id" < 5)
        .select($"vec_id".as("qid"), lutCol.as("lut"))
      // ADC: eight array lookups summed left-to-right
      val adist = (0 until subs).map { m =>
        element_at(element_at($"lut", m + 1), col(s"c$m") + 1)
      }.reduceLeft(_ + _)
      val scored = encoded.join(broadcast(qlut), $"vec_id" =!= $"qid")
        .select($"qid", $"vec_id", adist.as("adist"))
      scored.withColumn("rnk", row_number().over(
          Window.partitionBy($"qid").orderBy($"adist", $"vec_id")).cast("long"))
        .filter($"rnk" <= 10)
        .select($"qid", $"vec_id", $"adist", $"rnk")
        .orderBy("qid", "rnk")
    },

    // SEMANTIC DEDUP (SemDeDup-style): cluster the embedding space, then
    // find near-duplicates ONLY within clusters — the trick that turns the
    // whole-corpus n² pair space into Σ n_c² per cluster. Assignment is the
    // IVF map-side argmin over 16 literal centroids (no corpus Exchange);
    // the pair join keys on the cell id, so each cluster's candidate
    // pairs materialize inside one shuffle group and the cross-cluster
    // pair space is never formed. The keep rule is the deterministic
    // greedy-by-id neighbor test: a vector is dropped iff some SMALLER-id
    // vector in its cluster has cosine ≥ 0.35 with it. At 100 TB the
    // centroid count scales with the corpus (k-means via q_ivf_kmeans's
    // machinery) keeping cluster sizes bounded; everything else is
    // unchanged.
    GraftQuery.sql("q_semdedup",
      s"""WITH $enSql,
        |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |d AS (SELECT en.vec_id, c0.cid,
        |        list_reduce(list_transform(range(1, len(en.v)+1),
        |          i -> (en.v[i]-c0.cv[i])*(en.v[i]-c0.cv[i])), (a,b) -> a+b) AS d
        |      FROM en, c0),
        |a AS (SELECT vec_id, cid FROM
        |       (SELECT vec_id, cid, row_number() OVER
        |          (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d)
        |      WHERE rn = 1),
        |m AS (SELECT en.vec_id, en.v, en.n2, a.cid FROM en JOIN a USING (vec_id)),
        |dup AS (SELECT y.vec_id AS b, CAST(COUNT(*) AS BIGINT) AS n_near
        |        FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id < y.vec_id
        |        WHERE ${dotSql("x.v", "y.v")} / sqrt(x.n2 * y.n2) >= 0.35
        |        GROUP BY y.vec_id)
        |SELECT a.vec_id, a.cid, COALESCE(dup.n_near, 0) AS n_near,
        |       dup.n_near IS NULL AS keep
        |FROM a LEFT JOIN dup ON a.vec_id = dup.b
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = corpus(Tables.load(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism))
      val cents = e.filter($"vec_id" < 16).select($"vec_id", $"v").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
      val a = withCell(e, cents)
      val x = a.select($"cid", $"vec_id".as("xa"), $"v".as("va"), $"n2".as("na"))
      val y = a.select($"cid", $"vec_id".as("b"), $"v".as("vb"), $"n2".as("nb"))
      val dup = x.join(y, Seq("cid"))
        .filter($"xa" < $"b")
        .filter((ArrayMath.dot($"va", $"vb") / sqrt($"na" * $"nb")) >= 0.35)
        .groupBy($"b").agg(count(lit(1)).as("n_near"))
      a.select($"vec_id", $"cid")
        .join(dup, a("vec_id") === dup("b"), "left")
        .select($"vec_id", $"cid",
          coalesce($"n_near", lit(0L)).as("n_near"),
          $"n_near".isNull.as("keep"))
        .orderBy("vec_id")
    },

    // FEATURIZATION — the pipeline stage that PRODUCES embeddings from
    // text: the hashing trick (each token hashes to one of 16 dims via
    // the cross-engine md5-low64, term counts L2-normalize into a unit
    // vector). Output is the sparse (doc_id, dim, w) triple form — the
    // layout a feature store actually writes. Scale: the only
    // corpus-sized movement is the token stream into the (doc, dim)
    // count aggregate (map-side combine); the per-doc norm aggregate and
    // its join back run on already-aggregated doc×dim-sized data. The
    // norm is sqrt of an exact integer sum-of-squares, so every weight
    // replays bit-identically in the oracle.
    GraftQuery.sql("q_embed_hashing",
      """WITH tk AS (SELECT doc_id, t.w AS w
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        |        FROM documents), unnest(ws) AS t(w)),
        |c AS (SELECT doc_id,
        |        CAST((md5_number_lower(w) & 2147483647) % 16 AS BIGINT) AS dim,
        |        CAST(COUNT(*) AS BIGINT) AS c
        |      FROM tk GROUP BY 1, 2),
        |n AS (SELECT doc_id, sqrt(CAST(SUM(c * c) AS DOUBLE)) AS nrm
        |      FROM c GROUP BY doc_id)
        |SELECT c.doc_id, c.dim, CAST(c.c AS DOUBLE) / n.nrm AS w
        |FROM c JOIN n USING (doc_id) ORDER BY doc_id, dim""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      import graft.functions.Fingerprints
      val tok = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", explode(
          split(lower(trim($"text")), "\\s+")).as("w"))
      val c = tok.select($"doc_id",
          (Fingerprints.md5Low64($"w").bitwiseAND(0x7fffffffL) % 16)
            .as("dim"))
        .groupBy($"doc_id", $"dim").agg(count(lit(1)).as("c"))
      // norm as a WINDOW over the aggregated counts, not a second
      // aggregate joined back: a join of two aggregates over the same
      // child re-derives the whole token pass per side (observed in the
      // executed plan), while the window re-shuffles only the tiny
      // doc×dim count table
      val win = Window.partitionBy($"doc_id")
      c.withColumn("nrm", sqrt(sum($"c" * $"c").over(win).cast("double")))
        .select($"doc_id", $"dim", ($"c".cast("double") / $"nrm").as("w"))
        .orderBy("doc_id", "dim")
    },
  )
}
