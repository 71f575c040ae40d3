package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}

/** Deduplication for training-data pipelines: exact (hash group-by), n-gram
  * Jaccard (shingle join), MinHash+LSH (shingle → minhash → band → bucket
  * join), and SimHash (bit-vote fingerprint + banded hamming join).
  *
  * Scale notes: the exact and LSH paths shuffle by hash/bucket keys and never
  * materialize the n² pair space — the shape that survives 100 TB. The plain
  * shingle join (q_dedup_ngram_jaccard) is the exact baseline; at cluster
  * scale hot shingles need a frequency cap (drop shingles appearing in > F
  * docs — they only connect non-near-duplicates), which is what MinHash bands
  * replace it with here.
  */
object Dedup {

  import graft.core.Text.toks

  /** Distinct word-3-gram shingle SET per doc: (doc_id, ss: array<string>).
    * This compact form (one row per doc) is what gets cached — several
    * downstream subtrees consume it, and caching the exploded posting list
    * instead made AQE's concurrently-submitted stages serialize on the cache
    * fill (observed 3 parallel 9s jobs for a 2s computation).
    */
  private def shingleSets(docs: DataFrame): DataFrame = {
    // Materialize the token array as a column FIRST: referencing the split()
    // expression inside the trigram lambda re-evaluates it per element access
    // (no common-subexpression elimination inside higher-order functions) —
    // observed 5× slowdown of the shingle pass.
    val t = col("tk")
    val idx = when(size(t) >= 3, sequence(lit(0), size(t) - 3))
      .otherwise(array().cast("array<int>"))
    docs.select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"), array_distinct(
        transform(idx, i => concat_ws(" ", get(t, i), get(t, i + 1), get(t, i + 2))))
        .as("ss"))
  }

  /** Posting list (doc_id, s) from the shingle sets. */
  private def shingles(dsets: DataFrame): DataFrame =
    dsets.select(col("doc_id"), explode(col("ss")).as("s"))

  /** Exact Jaccard over candidate pairs (a < b) that share ≥1 shingle.
    * Pairs are generated WITHIN each shingle's doc-id group (one groupBy
    * shuffle, pairs emitted map-side after it) instead of a self-join —
    * the self-join shuffles the posting list twice and was ~4× slower.
    */
  private def jaccardPairs(dsets: DataFrame): DataFrame = {
    val sh = shingles(dsets)
    val sizes = dsets.select(col("doc_id"), size(col("ss")).as("n"))
    val ds = col("ds")
    val combos = flatten(transform(ds, (x, i) =>
      transform(slice(ds, i + 2, size(ds)),
        y => struct(x.as("a"), y.as("b")))))
    val inter = sh.groupBy(col("s"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .select(explode(combos).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
  }

  /** Exact Jaccard for an explicit (small) candidate-pair set: join each side
    * to the per-doc shingle set, intersect in-memory — never the full pair
    * space. This is the LSH verification step.
    */
  private def jaccardForCandidates(dsets: DataFrame, cands: DataFrame): DataFrame = {
    val docSets = dsets.select(col("doc_id"), array_sort(col("ss")).as("ss"))
    cands
      .join(docSets.select(col("doc_id").as("a"), col("ss").as("sa")), "a")
      .join(docSets.select(col("doc_id").as("b"), col("ss").as("sb")), "b")
      .select(col("a"), col("b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          (size(col("sa")) + size(col("sb")) -
            size(array_intersect(col("sa"), col("sb"))))).as("jaccard"))
  }

  val minhashPerms = 16
  val minhashBands = 4 // 4 rows per band

  val queries: Seq[GraftQuery] = Seq(

    // Exact dedup: hash-groupBy on content digest; keep the smallest doc_id.
    GraftQuery.sql("q_dedup_exact",
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .groupBy(md5($"text"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select($"keep_id", $"n_copies")
        .orderBy("keep_id")
    },

    // The cleaned-corpus output: keep the first copy per content digest via
    // a ranking window — the shape a pipeline actually materializes after
    // dedup decisions.
    GraftQuery.sql("q_dedup_keep_first",
      """SELECT doc_id, n_chars FROM (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      Tables.load(s, dir, "documents")
        .withColumn("rn", row_number().over(
          Window.partitionBy(md5($"text")).orderBy($"doc_id")))
        .filter($"rn" === 1)
        .select($"doc_id", $"n_chars")
        .orderBy("doc_id")
    },

    // Exact n-gram Jaccard near-dup pairs (threshold 0.5 cleanly separates
    // the planted near-duplicates from the ~0.0 noise floor).
    GraftQuery.sql("q_dedup_ngram_jaccard",
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM w, unnest(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS c
        |          FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT a, b, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
        |FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
        |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
        |ORDER BY a, b""".stripMargin) { (s, dir) =>
      // Repartition first (documents arrives as ONE parquet partition, so the
      // shingle pass would run single-threaded), cache the compact per-doc
      // form, and force it ONCE: three downstream subtrees consume it, and
      // without the barrier AQE submits them concurrently — each one then
      // recomputes the unmaterialized cache redundantly (observed 3×8.7s
      // single-task stages for a ~2s computation).
      val dsets = shingleSets(Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)).cache()
      dsets.count()
      jaccardPairs(dsets).filter(col("jaccard") >= 0.5).orderBy("a", "b")
    },

    // MinHash + LSH: per-doc signature = min over shingles of xxhash64(seed_i,
    // shingle) for 16 seeds; 4 bands of 4 rows bucket-joined; candidates then
    // verified with exact Jaccard. Only bucket-mates ever pair up — no n².
    GraftQuery.rowsOnly("q_dedup_minhash") { (s, dir) =>
      import s.implicits._
      val dsets = shingleSets(Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)).cache()
      dsets.count() // materialize before fan-out (see q_dedup_ngram_jaccard)
      val sh = shingles(dsets)
      val sigExprs = (0 until minhashPerms)
        .map(i => min(xxhash64(lit(i), col("s"))).as(s"h$i"))
      // cached: the band self-join would otherwise run this aggregation for
      // both sides of the join
      val sigs = sh.groupBy($"doc_id")
        .agg(sigExprs.head, sigExprs.tail: _*)
        .cache()
      val rowsPerBand = minhashPerms / minhashBands
      // one band row per (doc, band) via explode — a union of N selects would
      // recompute the signature aggregation N times
      val bandArr = array((0 until minhashBands).map { b =>
        val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
        struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
      }: _*)
      val bands = sigs.select($"doc_id", explode(bandArr).as("bb"))
        .select($"doc_id", $"bb.band".as("band"), $"bb.bh".as("bh"))
      val cands = bands.select($"doc_id".as("a"), $"band", $"bh")
        .join(bands.select($"doc_id".as("b"), $"band", $"bh"), Seq("band", "bh"))
        .filter($"a" < $"b").select($"a", $"b").distinct()
      jaccardForCandidates(dsets, cands)
        .filter($"jaccard" >= 0.5).orderBy("a", "b")
    },

    // SimHash: 64-bit fingerprint by per-bit vote over token hashes; banded
    // by 4×16-bit chunks so only chunk-equal pairs are hamming-checked.
    GraftQuery.rowsOnly("q_dedup_simhash") { (s, dir) =>
      import s.implicits._
      val tok = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", explode(toks($"text")).as("w"))
        .select($"doc_id", xxhash64($"w").as("h"))
      val bitVotes = (0 until 64).map(j =>
        sum(when(shiftright($"h", j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
          .as(s"b$j"))
      val sim = tok.groupBy($"doc_id")
        .agg(bitVotes.head, bitVotes.tail: _*)
        .select($"doc_id",
          (0 until 64).map(j =>
            when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
            .reduce(_.bitwiseOR(_)).as("simhash"))
        .cache()
      val chunkArr = array((0 until 4).map(c => struct(lit(c).as("chunk"),
        shiftright($"simhash", c * 16).bitwiseAND(0xffffL).as("ch"))): _*)
      val chunks = sim.select($"doc_id", explode(chunkArr).as("cc"))
        .select($"doc_id", $"cc.chunk".as("chunk"), $"cc.ch".as("ch"))
      val cands = chunks.select($"doc_id".as("a"), $"chunk", $"ch")
        .join(chunks.select($"doc_id".as("b"), $"chunk", $"ch"), Seq("chunk", "ch"))
        .filter($"a" < $"b").select($"a", $"b").distinct()
      cands
        .join(sim.select($"doc_id".as("a"), $"simhash".as("sa")), "a")
        .join(sim.select($"doc_id".as("b"), $"simhash".as("sb")), "b")
        .select($"a", $"b", bit_count($"sa".bitwiseXOR($"sb")).cast("long").as("hamming"))
        .filter($"hamming" <= 6).orderBy("a", "b")
    },
  )
}
