package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{GraftQuery, Tables}
import graft.core.Text.toks
import graft.functions.{ArrayMath, Fingerprints}

/** The END-TO-END curation DAG composed as ONE oracle-gated query — the
  * production-shaped capstone over the already-verified stages: NFC
  * normalize → exact dedup (keep-first) → MinHash+LSH near-dup → quality
  * gate → corpus-trained bigram-LM gate → DSIR domain gate → semantic
  * dedup → temperature mixture → cross-document sequence packing. The
  * output is the per-stage ATTRITION VECTOR — one row per stage with
  * (n_in, n_kept) and an order-insensitive content digest of the kept set
  * (sum of masked md5s — a map-side-combinable aggregate, deliberately NOT
  * a collect-and-sort digest, so the audit row itself scales) — the
  * artifact a production pipeline publishes after every curation run.
  *
  * CASCADE semantics: every stage sees only the previous stage's
  * survivors, and the two trained gates (LM, DSIR) TRAIN on the survivors
  * they score — the strongest composition test the stage set admits
  * (q_pipeline_curate's stages are deliberately independent; these are
  * deliberately sequential).
  *
  * Scale shape: stages never multiply each other's data movement — each
  * stage is its own bounded plan (digest window / shingle groupBy +
  * banded bucket join / gram-keyed and token-keyed train joins /
  * (cid, sign-bucket)-keyed pair space / source-keyed rates / shard-partitioned packing
  * window), stitched by doc_id-keyed semi-joins on cached survivor sets.
  * The per-stage digest is one ordinary aggregate with map-side partials.
  * Plan-guarded in PlanQualitySpec (no cartesian products; survivor sets
  * reused from cache, not recomputed per consumer).
  */
object PipelineFull {

  /** Order-insensitive digest — the shared audit-row convention. */
  private def idsSum(tag: Column): Column = Fingerprints.idsSum(tag)

  /** Sub-bucket mask for the semantic-dedup pair space: 2^p - 1 with
    * p = clamp(floor(log2(n / 2048)), 0, 16) — 0 below 4096 survivors
    * (exhaustive within each of the 16 centroid cells), then one more
    * sign-projection bit per doubling, keeping ~2048 vectors per
    * (cid, sub) cell. Pure integer arithmetic (mirrored as an integer
    * CASE chain in the oracle SQL) — a float log2 at the boundary could
    * round differently across engines and flip every bucket. */
  private[operators] def semSubMask(n: Long): Long =
    if (n < 4096L) 0L
    else {
      val p = math.min(16, 63 - java.lang.Long.numberOfLeadingZeros(n / 2048L))
      (1L << p) - 1L
    }

  /** The oracle's replay of [[semSubMask]]: an integer CASE chain over the
    * survivor count `n` (largest matching power wins). */
  private val semSubMaskSql: String = {
    val whens = (16 to 1 by -1).map(k =>
      s"WHEN n >= ${2048L * (1L << k)} THEN ${(1L << k) - 1}").mkString(" ")
    s"CASE $whens ELSE 0 END"
  }

  /** The sealed survivor sets of cascade stages 1-8 — shared by the
    * attrition query (`q_pipeline_full`, which measures every stage) and
    * the corpus sink (`q_pipeline_sink`, which persists only the final
    * stage-8 set). `keepText` keeps the normalized text through the tail
    * stages: the sink persists it, the attrition query drops it after
    * stage 5 to keep the seals lean. */
  private[operators] final case class DagStages(
      docs: DataFrame, ex: DataFrame, nd: DataFrame, ql: DataFrame,
      lm: DataFrame, dsir: DataFrame, sem: DataFrame, mx: DataFrame)

  private def runStages(s: org.apache.spark.sql.SparkSession, dir: String,
      keepText: Boolean): DagStages = {
    import s.implicits._

    // Each survivor set is SEALED with an eager localCheckpoint: nine
    // stacked stages otherwise accumulate one enormous logical plan that
    // Catalyst re-optimizes per action (measured 120s+ of pure driver
    // time at sf0.01). Truncating lineage per stage keeps every plan
    // stage-local — the Spark analog of materializing each curation
    // stage, which is what a production pipeline does anyway.
    def seal(df: DataFrame): DataFrame = df.localCheckpoint(true)

    val docs = seal(Tables.load(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id", $"source", $"n_chars",
        graft.functions.Normalize.nfc(
          regexp_replace(trim($"text"), "\\s+", " ")).as("norm"))
      .withColumn("tk", toks($"norm")))

    // stage 2: exact dedup keep-first on the NORMALIZED digest
    val ex = seal(docs.withColumn("rn", row_number().over(
        Window.partitionBy(md5($"norm")).orderBy($"doc_id")))
      .filter($"rn" === 1).drop("rn"))

    // stage 3: MinHash+LSH candidates over survivors, exact-Jaccard
    // verified at 0.5, larger id of each pair dropped
    val dsets = Dedup.shingleSets(ex.select($"doc_id", $"norm".as("text")))
      .cache()
    dsets.count()
    val bands = Dedup.bandRows(Dedup.minhashSignatures(dsets))
    val cands = bands.select($"doc_id".as("a"), $"band", $"bh")
      .join(bands.select($"doc_id".as("b"), $"band", $"bh"),
        Seq("band", "bh"))
      .filter($"a" < $"b").select($"a", $"b").distinct()
    // Gate joins hash-build the SKINNY side (r16): the survivor sets
    // carry normalized text + token arrays, and a sort-merge join SORTS
    // those fat rows — measured 532M+297M and 448M+26M of sort spill in
    // the two heaviest seal stages at 81x, the very spill the r15 growth
    // fit flagged. A shuffle-hash join builds a hash table from the
    // doc_id-only gate set and STREAMS the fat side — no fat-row sort at
    // any scale, and the build side stays bounded per partition because
    // it is ids, not documents. NB the hint takes precedence over
    // size-based broadcast selection (hinted strategies are consulted
    // before createJoinWithoutHint, including during AQE re-optimization),
    // so a tiny gate set pays one extra shuffle of the fat side that a
    // broadcast join would have skipped — accepted: at the scales where
    // this pipeline's cost lives the gate sets are NOT reliably
    // broadcast-small, and the hint is what guarantees the fat side can
    // never be sorted (measured: the 27x trio improved 0.89-0.92x under
    // the hint; sf0.01/sf0.1 within noise).
    val dups = Dedup.verified(dsets, cands).select($"b").distinct()
    val nd = seal(ex.join(dups.hint("shuffle_hash"),
      ex("doc_id") === dups("b"), "left_anti"))

    // stage 4: quality gate
    val ql = seal(nd.filter(size($"tk") >= 10))

    // stage 5: bigram-LM gate TRAINED ON the stage-4 survivors
    val lmOk = TextAnalysis.lmScore(ql.select($"doc_id", $"norm".as("text")))
      .filter($"cond_mass" >= 0.0333).select($"doc_id")
    // norm has served its attrition purposes (digest, shingles, LM text);
    // the sink keeps it as the persisted corpus text
    val lmCols =
      Seq($"doc_id", $"source", $"n_chars", $"tk") ++
        (if (keepText) Seq($"norm") else Nil)
    val lm = seal(ql.join(lmOk.hint("shuffle_hash"), "doc_id")
      .select(lmCols: _*))

    // stage 6: DSIR gate trained on the stage-5 survivors. The threshold
    // is CORPUS-RELATIVE (r17): keep docs whose smoothed target/background
    // affinity exceeds the corpus-wide token-mass ratio ΣT/ΣB. An absolute
    // threshold (0.0558, tuned at sf0.01) annihilated every corpus whose
    // count statistics differed — at sf0.1 the per-doc ratio distribution
    // concentrates below it and the gate kept 0 of 3153 docs, which made
    // every downstream stage (and its scale evidence) vacuous. The pivot
    // is the exact integer-sum ratio (SUM of int64 per-doc sums — order-
    // free, ~1.9e11 at 81x, eight orders under int64), so both engines
    // compute bit-identical doubles and the comparison cannot drift.
    val tok = lm.select($"doc_id", ($"source" === "src0").as("is_t"),
      explode($"tk").as("w"))
    val model = tok.groupBy("w").agg(
      sum(when($"is_t", 1L).otherwise(0L)).as("tgt"),
      sum(when($"is_t", 0L).otherwise(1L)).as("bgd"))
    // sealed: consumed by both the pivot aggregate and the gate filter
    val dscore = seal(tok.join(model, "w").groupBy($"doc_id")
      .agg(sum($"tgt").as("st"), sum($"bgd").as("sb")))
    val dpiv = dscore.agg(sum($"st").as("gt"), sum($"sb").as("gb"))
    val dsOk = dscore.crossJoin(broadcast(dpiv))
      .filter(($"st" + 1).cast("double") / ($"sb" + 1) >=
        $"gt".cast("double") / $"gb")
      .select($"doc_id")
    val dsir = seal(lm.join(dsOk.hint("shuffle_hash"), "doc_id"))

    // stage 7: semantic dedup over survivor embeddings (1:1 by id);
    // centroids stay the GLOBAL first-16 vectors — a fixed codebook, so
    // cluster geometry does not drift with upstream attrition.
    //
    // SUB-BUCKETED pair space (r17): with the DSIR gate no longer
    // annihilating at scale, the within-cid pair space is live — and 16
    // fixed cells over n survivors is O(n²/16), the quadratic this stage
    // was masking. Each vector therefore also gets a sign-projection
    // signature (bit i = dot(v, centroid_i) >= 0 — 16 deterministic
    // hyperplanes, no extra data) and pairs are compared only within
    // (cid, signature & mask). The mask width grows stepwise with the
    // MEASURED survivor count (semSubMask: p = floor(log2(n/2048)),
    // integer-exact in both engines — no transcendental at the boundary),
    // so small corpora stay exhaustive-within-cid while large ones keep
    // ~2k vectors per cell — pair work stays ~linear at any scale.
    // Identical embeddings share every sign bit, so exact semantic
    // duplicates are caught at every mask width; banding limits recall
    // only for middling-cosine pairs, the standard LSH trade (the MinHash
    // stage's stance, applied to the embedding space).
    val se = Tables.load(s, dir, "embeddings")
      .repartition(s.sparkContext.defaultParallelism)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = se.filter($"vec_id" < 16).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    // sealed: the pair join consumes it from BOTH sides, and the measured
    // count sizes the sub-bucket mask
    val sen = seal(se.join(dsir.select($"doc_id").hint("shuffle_hash"),
        se("vec_id") === dsir("doc_id"), "left_semi")
      .withColumn("n2", ArrayMath.dot($"v", $"v"))
      .withColumn("cid", array_min(array(cents.map { case (cid, cv) =>
        struct(ArrayMath.l2sq($"v", typedlit(cv)).as("d"),
          lit(cid).as("cid")) }: _*))("cid"))
      .withColumn("sig", cents.zipWithIndex.map { case ((_, cv), i) =>
        when(ArrayMath.dot($"v", typedlit(cv)) >= 0, lit(1L << i))
          .otherwise(lit(0L)) }.reduce(_ + _)))
    val mask = semSubMask(sen.count())
    val senb = sen.withColumn("sub", $"sig".bitwiseAND(lit(mask)))
    val x = senb.select($"cid", $"sub", $"vec_id".as("xa"), $"v".as("va"),
      $"n2".as("na"))
    val y = senb.select($"cid", $"sub", $"vec_id".as("b"), $"v".as("vb"),
      $"n2".as("nb"))
    val sdup = x.join(y, Seq("cid", "sub")).filter($"xa" < $"b")
      .filter((ArrayMath.dot($"va", $"vb") / sqrt($"na" * $"nb")) >= 0.35)
      .select($"b").distinct()
    val sem = seal(dsir.join(sdup.hint("shuffle_hash"),
      dsir("doc_id") === sdup("b"), "left_anti"))

    // stage 8: temperature mixture (alpha = 0.5) from SURVIVOR stats
    val stats = sem.groupBy($"source")
      .agg(sum($"n_chars").cast("long").as("chars"))
    val rates = stats
      .crossJoin(broadcast(stats.agg(max($"chars").as("cmax"))))
      .select($"source", floor(lit(1000) * sqrt($"chars".cast("double")
        / $"cmax")).cast("long").as("rate"))
    val bucket = Fingerprints
      .md5Low64(concat(lit("tmp:"), $"doc_id".cast("string")))
      .bitwiseAND(0x7fffffffL) % 1000
    val mx = seal(sem.join(broadcast(rates), "source")
      .filter(bucket < $"rate"))

    DagStages(docs, ex, nd, ql, lm, dsir, sem, mx)
  }

  /** DuckDB CTE chain replaying cascade stages 1-8 (ends at `mx`, the
    * final survivor set) — shared verbatim by both oracles. The
    * GRAFT_SEM_MASK placeholder is substituted with [[semSubMaskSql]]
    * after stripMargin (a mid-literal splice would escape stripMargin's
    * scope and leave raw margins in the first half of the chain). */
  private val dagCtes: String =
    """nm AS MATERIALIZED (SELECT doc_id, source, n_chars,
        |    nfc_normalize(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |tk0 AS MATERIALIZED (SELECT doc_id, source, n_chars, norm,
        |    regexp_split_to_array(lower(trim(norm)), '\s+') AS tk FROM nm),
        |ex AS MATERIALIZED (SELECT doc_id, source, n_chars, norm, tk FROM (
        |    SELECT tk0.*, row_number() OVER
        |      (PARTITION BY md5(norm) ORDER BY doc_id) AS rn FROM tk0)
        |  WHERE rn = 1),
        |sh AS MATERIALIZED (SELECT DISTINCT doc_id,
        |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
        |  FROM ex, unnest(range(1, len(tk) - 1)) AS t(i) WHERE len(tk) >= 3),
        |sz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS MATERIALIZED (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS c
        |  FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |dup AS MATERIALIZED (SELECT DISTINCT b FROM inter
        |  JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
        |  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
        |nd AS MATERIALIZED (SELECT * FROM ex WHERE doc_id NOT IN (SELECT b FROM dup)),
        |ql AS MATERIALIZED (SELECT * FROM nd WHERE len(tk) >= 10),
        |bgr AS MATERIALIZED (SELECT doc_id, tk[i] || ' ' || tk[i+1] AS bg, tk[i] AS pre
        |  FROM ql, unnest(range(1, len(tk))) AS r(i) WHERE len(tk) >= 2),
        |cb AS MATERIALIZED (SELECT bg, COUNT(*) AS cbg FROM bgr GROUP BY bg),
        |cp AS MATERIALIZED (SELECT pre, COUNT(*) AS cpre FROM bgr GROUP BY pre),
        |lsc AS MATERIALIZED (SELECT b.doc_id, SUM(cb.cbg) AS sum_bg, SUM(cp.cpre) AS sum_pre
        |  FROM bgr b JOIN cb USING (bg) JOIN cp ON b.pre = cp.pre
        |  GROUP BY b.doc_id),
        |lm AS MATERIALIZED (SELECT ql.* FROM ql LEFT JOIN lsc USING (doc_id)
        |  WHERE CASE WHEN lsc.sum_bg IS NULL THEN 0.0
        |        ELSE CAST(lsc.sum_bg AS DOUBLE) / lsc.sum_pre END >= 0.0333),
        |dtk AS MATERIALIZED (SELECT doc_id, source = 'src0' AS is_t, t.w AS w
        |  FROM lm, unnest(tk) AS t(w)),
        |dmd AS MATERIALIZED (SELECT w, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS tgt,
        |    SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS bgd
        |  FROM dtk GROUP BY w),
        |dsc AS MATERIALIZED (SELECT dtk.doc_id, SUM(dmd.tgt) AS st, SUM(dmd.bgd) AS sb
        |  FROM dtk JOIN dmd USING (w) GROUP BY dtk.doc_id),
        |dpv AS MATERIALIZED (SELECT CAST(SUM(st) AS DOUBLE)
        |    / CAST(SUM(sb) AS DOUBLE) AS gr FROM dsc),
        |dsir AS MATERIALIZED (SELECT lm.* FROM lm JOIN dsc USING (doc_id), dpv
        |  WHERE CAST(st + 1 AS DOUBLE) / (sb + 1) >= dpv.gr),
        |se AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |sen AS MATERIALIZED (SELECT vec_id, v, list_reduce(list_transform(v, x -> x * x),
        |    (a, b) -> a + b) AS n2
        |  FROM se WHERE vec_id IN (SELECT doc_id FROM dsir)),
        |sc0 AS MATERIALIZED (SELECT vec_id AS cid, v AS cv FROM se WHERE vec_id < 16),
        |sd AS MATERIALIZED (SELECT sen.vec_id, sc0.cid,
        |    list_reduce(list_transform(range(1, len(sen.v) + 1),
        |      i -> (sen.v[i] - sc0.cv[i]) * (sen.v[i] - sc0.cv[i])),
        |      (a, b) -> a + b) AS d,
        |    list_reduce(list_transform(list_zip(sen.v, sc0.cv),
        |      z -> z[1] * z[2]), (a, b) -> a + b) AS dp
        |  FROM sen, sc0),
        |sa AS MATERIALIZED (SELECT vec_id, cid FROM (SELECT vec_id, cid, row_number()
        |    OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM sd)
        |  WHERE rn = 1),
        |scr AS MATERIALIZED (SELECT cid,
        |    CAST(row_number() OVER (ORDER BY cid) - 1 AS INT) AS r FROM sc0),
        |sbt AS MATERIALIZED (SELECT sd.vec_id, CAST(SUM(CASE WHEN sd.dp >= 0
        |      THEN (CAST(1 AS BIGINT) << scr.r) ELSE 0 END) AS BIGINT) AS sig
        |  FROM sd JOIN scr USING (cid) GROUP BY sd.vec_id),
        |smk AS MATERIALIZED (SELECT CAST(GRAFT_SEM_MASK AS BIGINT) AS mask
        |  FROM (SELECT COUNT(*) AS n FROM sen)),
        |sm AS MATERIALIZED (SELECT sen.vec_id, sen.v, sen.n2, sa.cid,
        |    (sbt.sig & smk.mask) AS sub
        |  FROM sen JOIN sa USING (vec_id) JOIN sbt USING (vec_id), smk),
        |sdup AS MATERIALIZED (SELECT DISTINCT y.vec_id AS b FROM sm x JOIN sm y
        |  ON x.cid = y.cid AND x.sub = y.sub AND x.vec_id < y.vec_id
        |  WHERE list_reduce(list_transform(list_zip(x.v, y.v),
        |      z -> z[1] * z[2]), (u, w) -> u + w) / sqrt(x.n2 * y.n2) >= 0.35),
        |sem AS MATERIALIZED (SELECT * FROM dsir WHERE doc_id NOT IN (SELECT b FROM sdup)),
        |ms AS MATERIALIZED (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars
        |  FROM sem GROUP BY source),
        |mm AS MATERIALIZED (SELECT MAX(chars) AS cmax FROM ms),
        |mr AS MATERIALIZED (SELECT source, CAST(floor(1000 * sqrt(CAST(chars AS DOUBLE)
        |    / cmax)) AS BIGINT) AS rate FROM ms, mm),
        |mx AS MATERIALIZED (SELECT sem.* FROM sem JOIN mr USING (source)
        |  WHERE (md5_number_lower('tmp:' || CAST(doc_id AS VARCHAR))
        |    & 2147483647) % 1000 < mr.rate)""".stripMargin
      .replace("GRAFT_SEM_MASK", semSubMaskSql)

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q_pipeline_full",
      "WITH " + dagCtes + ",\n" +
      """pk AS MATERIALIZED (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok,
        |    CAST((md5_number_lower('pk:' || CAST(doc_id AS VARCHAR))
        |      & 2147483647) % 8 AS BIGINT) AS shard
        |  FROM mx),
        |pc AS MATERIALIZED (SELECT doc_id, shard, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
        |  FROM pk),
        |pb AS MATERIALIZED (SELECT doc_id, shard,
        |    CAST(FLOOR(CAST(cum - n_tok AS DOUBLE) / 512) AS BIGINT) AS bin
        |  FROM pc),
        |dg AS MATERIALIZED (SELECT 1 AS pos, 'normalize' AS stage,
        |    (SELECT COUNT(*) FROM documents) AS n_in, COUNT(*) AS n_kept,
        |    SUM(md5_number_lower(CAST(doc_id AS VARCHAR) || ':' || md5(norm))
        |      & 2147483647) AS ids_sum FROM tk0
        |  UNION ALL SELECT 2, 'exact_dedup', (SELECT COUNT(*) FROM tk0),
        |    COUNT(*), SUM(md5_number_lower(CAST(doc_id AS VARCHAR))
        |      & 2147483647) FROM ex
        |  UNION ALL SELECT 3, 'near_dedup', (SELECT COUNT(*) FROM ex),
        |    COUNT(*), SUM(md5_number_lower(CAST(doc_id AS VARCHAR))
        |      & 2147483647) FROM nd
        |  UNION ALL SELECT 4, 'quality', (SELECT COUNT(*) FROM nd),
        |    COUNT(*), SUM(md5_number_lower(CAST(doc_id AS VARCHAR))
        |      & 2147483647) FROM ql
        |  UNION ALL SELECT 5, 'lm_gate', (SELECT COUNT(*) FROM ql),
        |    COUNT(*), SUM(md5_number_lower(CAST(doc_id AS VARCHAR))
        |      & 2147483647) FROM lm
        |  UNION ALL SELECT 6, 'dsir_gate', (SELECT COUNT(*) FROM lm),
        |    COUNT(*), SUM(md5_number_lower(CAST(doc_id AS VARCHAR))
        |      & 2147483647) FROM dsir
        |  UNION ALL SELECT 7, 'sem_dedup', (SELECT COUNT(*) FROM dsir),
        |    COUNT(*), SUM(md5_number_lower(CAST(doc_id AS VARCHAR))
        |      & 2147483647) FROM sem
        |  UNION ALL SELECT 8, 'mixture', (SELECT COUNT(*) FROM sem),
        |    COUNT(*), SUM(md5_number_lower(CAST(doc_id AS VARCHAR))
        |      & 2147483647) FROM mx
        |  UNION ALL SELECT 9, 'pack', (SELECT COUNT(*) FROM mx),
        |    COUNT(DISTINCT CAST(shard AS VARCHAR) || '/'
        |      || CAST(bin AS VARCHAR)),
        |    SUM(md5_number_lower(CAST(doc_id AS VARCHAR) || ':'
        |      || CAST(shard AS VARCHAR) || ':' || CAST(bin AS VARCHAR))
        |      & 2147483647) FROM pb)
        |SELECT CAST(pos AS BIGINT) AS pos, stage,
        |  CAST(n_in AS BIGINT) AS n_in, CAST(n_kept AS BIGINT) AS n_kept,
        |  CAST(ids_sum AS BIGINT) AS ids_sum
        |FROM dg ORDER BY pos""".stripMargin) { (s, dir) =>
      import s.implicits._
      def seal(df: DataFrame): DataFrame = df.localCheckpoint(true)
      val DagStages(docs, ex, nd, ql, lm, dsir, sem, mx) =
        runStages(s, dir, keepText = false)

      // stage 9: sharded sequence packing (budget 512, 8 shards)
      val pk = mx.select($"doc_id", size($"tk").cast("long").as("n_tok"),
        (Fingerprints.md5Low64(concat(lit("pk:"), $"doc_id".cast("string")))
          .bitwiseAND(0x7fffffffL) % 8).as("shard"))
      val pb = seal(pk.withColumn("cum", sum($"n_tok").over(
          Window.partitionBy($"shard").orderBy($"doc_id")))
        .select($"doc_id", $"shard",
          floor(($"cum" - $"n_tok").cast("double") / 512).as("bin")))

      // the attrition vector: every stage's (n_kept, digest) is one
      // single-row aggregate over its SEALED survivor set — all nine
      // UNIONED into one plan and collected in ONE job (the per-stage
      // bodies already ran during sealing); n_in chains driver-side from
      // the previous stage's count
      def idTag = $"doc_id".cast("string")
      def measured(pos: Long, df: DataFrame, tag: Column): DataFrame =
        df.agg(count(lit(1)).as("n"), idsSum(tag).as("h"))
          .select(lit(pos).as("pos"), $"n", $"h")
      val packTag = concat(idTag, lit(":"), $"shard".cast("string"),
        lit(":"), $"bin".cast("string"))
      val measures = Seq(
        measured(1L, docs, concat(idTag, lit(":"), md5($"norm"))),
        measured(2L, ex, idTag),
        measured(3L, nd, idTag),
        measured(4L, ql, idTag),
        measured(5L, lm, idTag),
        measured(6L, dsir, idTag),
        measured(7L, sem, idTag),
        measured(8L, mx, idTag),
        measured(9L, pb, packTag),
        // rides the same job: the number of packed SEQUENCES
        pb.select($"shard", $"bin").distinct()
          .agg(count(lit(1)).as("n"))
          .select(lit(10L).as("pos"), $"n", lit(null).cast("long").as("h")))
        .reduce(_ unionByName _)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2)))).toMap
      val Seq(mNorm, mEx, mNd, mQl, mLm, mDs, mSem, mMx, mPk) =
        (1L to 9L).map(measures(_))
      val nSeqs = measures(10L)._1
      val nDocs = mNorm._1 // normalize is a transform: n_in == n_kept

      val rows = Seq(
        (1L, "normalize", nDocs, mNorm._1, mNorm._2),
        (2L, "exact_dedup", mNorm._1, mEx._1, mEx._2),
        (3L, "near_dedup", mEx._1, mNd._1, mNd._2),
        (4L, "quality", mNd._1, mQl._1, mQl._2),
        (5L, "lm_gate", mQl._1, mLm._1, mLm._2),
        (6L, "dsir_gate", mLm._1, mDs._1, mDs._2),
        (7L, "sem_dedup", mDs._1, mSem._1, mSem._2),
        (8L, "mixture", mSem._1, mMx._1, mMx._2),
        (9L, "pack", mMx._1, nSeqs, mPk._2))
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("pos", LongType, nullable = false),
        StructField("stage", StringType, nullable = false),
        StructField("n_in", LongType, nullable = false),
        StructField("n_kept", LongType, nullable = false),
        StructField("ids_sum", LongType, nullable = true)))
      s.createDataFrame(
        java.util.Arrays.asList(rows.map(t =>
          org.apache.spark.sql.Row(t._1, t._2, t._3, t._4, t._5)): _*),
        schema).orderBy("pos")
    },

    // WRITE-SIDE CAPSTONE: persist the stage-8 survivor corpus — the
    // artifact a training run actually consumes. Survivors are written
    // partitionBy(source) (directory pruning for per-domain reads) and
    // Z-ordered by (doc_id, n_chars) within files (footer min/max pruning
    // on either dimension), then READ BACK: the query result is the
    // read-back per-source audit (count / token total / id digest), so the
    // oracle proves round-trip parity with the mx survivor set — the same
    // CTE chain, aggregated per source. PlanQualitySpec asserts the
    // read-back predicate becomes a PartitionFilter.
    GraftQuery.sql("q_pipeline_sink",
      "WITH " + dagCtes + "\n" +
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(tk)) AS BIGINT) AS n_tok,
        |  CAST(SUM(md5_number_lower(CAST(doc_id AS VARCHAR)) & 2147483647)
        |    AS BIGINT) AS ids_sum
        |FROM mx GROUP BY source ORDER BY source""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val mx = runStages(s, dir, keepText = true).mx
      Layout.zorderRepartition(
        mx.select($"doc_id", $"source", $"n_chars",
          size($"tk").cast("long").as("n_tok"), $"norm".as("text")),
        $"doc_id", $"n_chars",
        math.max(2, s.sparkContext.defaultParallelism / 4))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("source").parquet(corpusPath(dir))
      // read back with the EXPLICIT corpus schema (a production reader
      // knows it from the catalog): skips inference listing, and an
      // EMPTY survivor corpus (a legitimate gate outcome — e.g. the DSIR
      // threshold can zero a mix) reads as an empty relation instead of
      // failing schema inference on a file-less partitioned directory
      s.read.schema(corpusSchema).parquet(corpusPath(dir))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").as("n_tok"),
          idsSum($"doc_id".cast("string")).as("ids_sum"))
        .orderBy("source")
    }
  )

  private def corpusPath(dir: String): String = {
    val sf = new java.io.File(dir).getName
    new java.io.File(new java.io.File(
      sys.props("java.io.tmpdir"), "graft_sinks"),
      s"pipeline_corpus/$sf").getAbsolutePath
  }

  /** The persisted corpus schema (`source` is the partition column). */
  private val corpusSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_chars", LongType),
      StructField("n_tok", LongType),
      StructField("text", StringType),
      StructField("source", StringType)))
  }

  /** The read-back scan of the persisted survivor corpus with a
    * per-domain predicate — exposed for the PlanQualitySpec directory-
    * pruning guard (run AFTER q_pipeline_sink has written). */
  def corpusReadBack(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    s.read.schema(corpusSchema).parquet(corpusPath(dir))
      .filter(col("source") === "src0")
      .select(col("doc_id"), col("n_tok"))
}
