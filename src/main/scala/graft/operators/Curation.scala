package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}
import graft.functions.Fingerprints

/** Training-data CURATION operators — the decisions a pipeline makes after
  * dedup/quality scoring: which rows enter the mix (stratified sampling),
  * which rows must NOT (benchmark contamination), and which rows are
  * degenerate (intra-document repetition, the Gopher-style rule). All three
  * are deterministic — sampling by cross-engine hash, not RNG — so each has
  * an exact DuckDB oracle.
  *
  * Scale notes: sampling and repetition are MAP-ONLY (one projection, no
  * shuffle — the plan at 100 TB is "scan, filter, write"). Contamination is
  * one semi-join of the corpus' shingle postings against the benchmark's
  * distinct shingle set; the benchmark side is tiny and broadcasts, so the
  * corpus never shuffles.
  */
object Curation {

  import graft.core.Text.toks

  /** Per-mille sampling bucket from the cross-engine md5-low64 hash,
    * masked to 31 bits so the signed (Spark) and unsigned (DuckDB)
    * readings of the low word agree. Salted so the bucket is independent
    * of any other hash-of-doc_id decision in the pipeline. */
  private def bucket1000(c: org.apache.spark.sql.Column) =
    Fingerprints.md5Low64(concat(lit("smp:"), c.cast("string")))
      .bitwiseAND(0x7fffffffL) % 1000

  val queries: Seq[GraftQuery] = Seq(

    // STRATIFIED SAMPLING: per-language rates (the "data mix") decided by
    // a deterministic hash of the id — reproducible across runs, engines,
    // and cluster sizes, unlike RNG sampling. en keeps 50%, every other
    // language 25%. Map-only: the 100 TB plan is scan → filter.
    GraftQuery.sql("q_sample_stratified",
      """SELECT doc_id, lang FROM documents
        |WHERE (md5_number_lower('smp:' || CAST(doc_id AS VARCHAR)) & 2147483647) % 1000
        |      < CASE WHEN lang = 'en' THEN 500 ELSE 250 END
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .filter(bucket1000($"doc_id") <
          when($"lang" === "en", 500).otherwise(250))
        .select($"doc_id", $"lang")
        .orderBy("doc_id")
    },

    // BENCHMARK CONTAMINATION: corpus documents sharing any word-3-gram
    // with a held-out benchmark set (here: doc_id % 97 = 0) must be
    // flagged before training. One pass builds the benchmark's distinct
    // shingle set (tiny — broadcasts); the corpus' shingle postings
    // semi-join it and count DISTINCT shared shingle types per document.
    GraftQuery.sql("q_contamination",
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM w, unnest(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
        |hits AS (SELECT doc_id, COUNT(*) AS n_shared
        |         FROM sh JOIN bench USING (s)
        |         WHERE doc_id % 97 <> 0 GROUP BY doc_id)
        |SELECT doc_id, n_shared FROM hits ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // the dedup family's cached per-doc shingle sets; BOTH sides of the
      // contamination join derive from one materialized pass
      val dsets = Dedup.cachedShingleSets(s, dir)
      val sh = dsets.select($"doc_id", explode($"ss").as("s"))
      val bench = broadcast(
        sh.filter($"doc_id" % 97 === 0).select($"s").distinct())
      sh.filter($"doc_id" % 97 =!= 0)
        .join(bench, "s")
        .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
        .orderBy("doc_id")
    },

    // INTRA-DOCUMENT REPETITION (the Gopher-style quality rule): the
    // fraction of a document's word-3-grams that are repeats of an
    // earlier 3-gram in the same document. Entirely map-side — the
    // per-doc total and distinct counts come from one higher-order-
    // function pass over the token array. The ratio is one int division,
    // bit-identical across engines.
    GraftQuery.sql("q_repetition",
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |        [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |         FOR i IN range(1, len(ws) - 1)] AS gs
        |      FROM w WHERE len(ws) >= 3)
        |SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
        |  CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE) / len(gs) AS dup_ratio,
        |  (CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE) / len(gs)) > 0.2 AS repetitive
        |FROM g ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val t = col("tk")
      // trigrams via zipped SLICES, not an index lambda reading the outer
      // token column: Catalyst may collapse the token projection into the
      // lambda, and an outer-column reference inside a higher-order
      // function re-evaluates its whole expression PER ELEMENT ACCESS
      // (observed 11x: split() recomputed 3x per trigram). The zip form's
      // lambda touches only its own variable, so re-evaluation stays
      // bounded per ROW no matter how projections collapse.
      val zips = arrays_zip(slice(t, lit(1), size(t) - 2),
        slice(t, lit(2), size(t) - 2), slice(t, lit(3), size(t) - 2))
      val gs = col("gs")
      Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", toks($"text").as("tk"))
        .filter(size(t) >= 3)
        .select($"doc_id", transform(zips,
          s3 => concat_ws(" ", s3("0"), s3("1"), s3("2"))).as("gs"))
        .select($"doc_id", size(gs).cast("long").as("n_grams"),
          ((size(gs) - size(array_distinct(gs))).cast("double") / size(gs))
            .as("dup_ratio"),
          (((size(gs) - size(array_distinct(gs))).cast("double") / size(gs))
            > 0.2).as("repetitive"))
        .orderBy("doc_id")
    },

    // SOURCE-LEVEL GATING (the RefinedWeb/C4-style domain policy): a
    // source survives if it is not blocklisted AND its mean document
    // length clears a floor; a DOCUMENT survives if its source does and
    // its own length is at least half the source mean. Two phases: a
    // per-source aggregate (one shuffle over ~|sources| groups — tiny at
    // any corpus size), broadcast back onto the corpus for a MAP-SIDE
    // verdict, then the audit rollup. All comparisons are integer
    // cross-multiplications (n*2*cnt >= total), never a floating average,
    // so the gate is exact in both engines. The corpus itself shuffles
    // only for the final per-source audit counts.
    GraftQuery.sql("q_source_gate",
      """WITH s AS (SELECT source, COUNT(*) AS cnt,
        |            CAST(SUM(n_chars) AS BIGINT) AS total
        |           FROM documents GROUP BY source),
        |ok AS (SELECT * FROM s
        |       WHERE source NOT IN ('src3', 'src7') AND total >= 290 * cnt)
        |SELECT d.source, COUNT(*) AS kept,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
        |FROM documents d JOIN ok ON d.source = ok.source
        |WHERE d.n_chars * 2 * ok.cnt >= ok.total
        |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"source", $"n_chars")
      val stats = docs.groupBy($"source")
        .agg(count(lit(1)).as("cnt"), sum($"n_chars").cast("long").as("total"))
        .filter(!$"source".isin("src3", "src7") && $"total" >= lit(290) * $"cnt")
      docs.join(broadcast(stats), "source")
        .filter($"n_chars" * 2 * $"cnt" >= $"total")
        .groupBy($"source")
        .agg(count(lit(1)).as("kept"),
          sum($"n_chars").cast("long").as("kept_chars"))
        .orderBy("source")
    },

    // DETERMINISTIC EPOCH SHUFFLE: the global training order for one epoch
    // is a total sort by a salted cross-engine hash of the id — every run,
    // engine, and cluster size produces the SAME permutation (unlike RNG
    // shuffles), and epoch 2 is just a different salt. At 100 TB the sort
    // is a range-partitioned exchange (Spark samples the hash's
    // distribution, which is uniform by construction, so partitions
    // balance); a trainer reads the files in partition order. The check
    // pins the head of the permutation.
    GraftQuery.sql("q_epoch_shuffle",
      """SELECT CAST(pos AS BIGINT) AS pos, doc_id FROM (
        |  SELECT doc_id, row_number() OVER (
        |    ORDER BY md5('ep1:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos
        |  FROM documents)
        |WHERE pos <= 40 ORDER BY pos""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", md5(concat(lit("ep1:"), $"doc_id".cast("string")))
          .as("ek"))
        .orderBy($"ek", $"doc_id")
        .limit(40)
        .select((row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"ek", $"doc_id"))).cast("long").as("pos"), $"doc_id")
        .orderBy("pos")
    },

    // DATA-MIX WEIGHTED SAMPLING: each source gets its own keep-rate (the
    // "mixture weights" of a training run — upweight curated sources,
    // downsample the crawl), decided per document by the salted
    // deterministic hash, then audited per source. Map-only until the
    // audit's tiny per-source aggregate; the 100 TB plan is scan → filter
    // → write, with the audit a byproduct. Rates are driver literals the
    // way a mixture config would ship.
    GraftQuery.sql("q_mixture_sample",
      """WITH kept AS (
        |  SELECT source, n_chars FROM documents
        |  WHERE (md5_number_lower('mix:' || CAST(doc_id AS VARCHAR)) & 2147483647) % 1000
        |        < CASE WHEN source IN ('src1', 'src4') THEN 900
        |               WHEN source IN ('src3', 'src7') THEN 100
        |               ELSE 400 END)
        |SELECT source, COUNT(*) AS kept,
        |  CAST(SUM(n_chars) AS BIGINT) AS kept_chars
        |FROM kept GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      import s.implicits._
      val rate = when($"source".isin("src1", "src4"), 900)
        .when($"source".isin("src3", "src7"), 100)
        .otherwise(400)
      Tables.load(s, dir, "documents")
        .filter(Fingerprints.md5Low64(
          concat(lit("mix:"), $"doc_id".cast("string")))
          .bitwiseAND(0x7fffffffL) % 1000 < rate)
        .groupBy($"source")
        .agg(count(lit(1)).as("kept"),
          sum($"n_chars").cast("long").as("kept_chars"))
        .orderBy("source")
    },

    // SPLIT-LEAKAGE AUDIT: the 90/10 train/val split is decided by the
    // salted deterministic hash (reproducible; independent of the sampling
    // and mixture salts), then audited for eval contamination: a val doc
    // whose content digest also appears in train is LEAKED — its loss is
    // memorization, not generalization. One digest projection feeds both
    // sides; the audit is a digest-only left-semi join (16 bytes/doc at
    // 100 TB, broadcast when train's distinct-digest set is small, shuffle
    // otherwise) — document text never moves twice.
    GraftQuery.sql("q_split_leakage",
      """WITH s AS (SELECT doc_id, md5(text) AS dg,
        |    (md5_number_lower('splt:' || CAST(doc_id AS VARCHAR)) & 2147483647) % 100 AS b
        |  FROM documents)
        |SELECT
        |  (SELECT COUNT(*) FROM s WHERE b < 90) AS n_train,
        |  (SELECT COUNT(*) FROM s WHERE b >= 90) AS n_val,
        |  (SELECT COUNT(*) FROM s WHERE b >= 90
        |     AND dg IN (SELECT dg FROM s WHERE b < 90)) AS n_leaked""".stripMargin) { (s, dir) =>
      import s.implicits._
      val split = Tables.load(s, dir, "documents")
        .select($"doc_id", md5($"text").as("dg"),
          (Fingerprints.md5Low64(concat(lit("splt:"), $"doc_id".cast("string")))
            .bitwiseAND(0x7fffffffL) % 100).as("b"))
      val counts = split.agg(
        count(when($"b" < 90, 1)).as("n_train"),
        count(when($"b" >= 90, 1)).as("n_val"))
      val leaked = split.filter($"b" >= 90)
        .join(split.filter($"b" < 90).select($"dg").distinct(),
          Seq("dg"), "left_semi")
        .agg(count(lit(1)).as("n_leaked"))
      counts.crossJoin(leaked)
    },

    // DSIR-STYLE CONTRASTIVE DOMAIN SELECTION — importance-style data
    // selection with a lexical model (the DSIR recipe: score each
    // candidate by target-domain vs background likelihood, keep the high
    // scorers). Target = src0 documents, background = everything else.
    // BOTH unigram models train in ONE token-keyed groupBy (conditional
    // sums split the counts by side); each document then scores by the
    // exact rational affinity (Σ tgt-count + 1)/(Σ bgd-count + 1) over
    // its token occurrences — integer sums, a single division at the
    // edge, so the DuckDB oracle is hash-exact (the Search.scala no-ln
    // contract). Scale: training shuffles (token, partial-count) pairs
    // with map-side combine (vocabulary-sized output); scoring re-derives
    // the map-only token stream and joins it to the model on the token
    // key — AQE broadcasts the model when the vocabulary is small — then
    // one doc_id-keyed aggregate. The pick threshold is the corpus median
    // affinity at the 1-of-20-sources prior.
    GraftQuery.sql("q_dsir_select",
      """WITH tk AS (SELECT doc_id, source = 'src0' AS is_t, t.w AS w
        |  FROM (SELECT doc_id, source,
        |          regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        |        FROM documents), unnest(ws) AS t(w)),
        |md AS (SELECT w,
        |         CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS tgt,
        |         CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS bgd
        |       FROM tk GROUP BY w),
        |sc AS (SELECT tk.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
        |         CAST(SUM(md.tgt) AS BIGINT) AS sum_tgt,
        |         CAST(SUM(md.bgd) AS BIGINT) AS sum_bgd
        |       FROM tk JOIN md USING (w) GROUP BY tk.doc_id)
        |SELECT doc_id, n_tok, sum_tgt, sum_bgd,
        |  CAST(sum_tgt + 1 AS DOUBLE) / (sum_bgd + 1) AS affinity,
        |  CAST(sum_tgt + 1 AS DOUBLE) / (sum_bgd + 1) >= 0.0558 AS pick
        |FROM sc ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val tok = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", ($"source" === "src0").as("is_t"),
          explode(toks($"text")).as("w"))
      val model = tok.groupBy("w").agg(
        sum(when($"is_t", 1L).otherwise(0L)).as("tgt"),
        sum(when($"is_t", 0L).otherwise(1L)).as("bgd"))
      val affinity = ($"sum_tgt" + 1).cast("double") / ($"sum_bgd" + 1)
      tok.join(model, "w")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tok"), sum($"tgt").as("sum_tgt"),
          sum($"bgd").as("sum_bgd"))
        .select($"doc_id", $"n_tok", $"sum_tgt", $"sum_bgd",
          affinity.as("affinity"), (affinity >= 0.0558).as("pick"))
        .orderBy("doc_id")
    },

    // TEMPERATURE-BASED SOURCE MIXING (the mT5/multilingual rebalancing
    // rule at α = 0.5): each source's keep-rate is proportional to the
    // SQUARE ROOT of its share of corpus volume, flattening the
    // head-source dominance a proportional mix would have. The rates are
    // COMPUTED from corpus stats — one source-keyed aggregate (tiny at
    // any corpus size) with the max broadcast back — then the corpus
    // gates map-side by the deterministic md5 bucket against its
    // source's rate (the q_sample_stratified hash discipline, with
    // derived rather than fixed rates). rate = floor(1000·√(chars/max))
    // is one sqrt and one exact power-of-ten scale, so the keep decision
    // replays bit-identically in the oracle.
    GraftQuery.sql("q_temp_mixture",
      """WITH s AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars
        |           FROM documents GROUP BY source),
        |m AS (SELECT MAX(chars) AS cmax FROM s),
        |r AS (SELECT source, chars,
        |        CAST(floor(1000 * sqrt(CAST(chars AS DOUBLE) / cmax))
        |          AS BIGINT) AS rate
        |      FROM s, m),
        |k AS (SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
        |      FROM documents d JOIN r USING (source)
        |      WHERE (md5_number_lower('tmp:' || CAST(d.doc_id AS VARCHAR))
        |             & 2147483647) % 1000 < r.rate
        |      GROUP BY d.source)
        |SELECT r.source, r.chars, r.rate, COALESCE(k.n_kept, 0) AS n_kept
        |FROM r LEFT JOIN k USING (source) ORDER BY source""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"source", $"n_chars")
      val stats = docs.groupBy($"source")
        .agg(sum($"n_chars").cast("long").as("chars"))
      val rates = stats
        .crossJoin(broadcast(stats.agg(max($"chars").as("cmax"))))
        .select($"source", $"chars",
          floor(lit(1000) * sqrt($"chars".cast("double") / $"cmax"))
            .cast("long").as("rate"))
      val bucket = Fingerprints
        .md5Low64(concat(lit("tmp:"), $"doc_id".cast("string")))
        .bitwiseAND(0x7fffffffL) % 1000
      val kept = docs.join(broadcast(rates), "source")
        .filter(bucket < $"rate")
        .groupBy($"source").agg(count(lit(1)).as("n_kept"))
      rates.join(kept, Seq("source"), "left")
        .select($"source", $"chars", $"rate",
          coalesce($"n_kept", lit(0L)).as("n_kept"))
        .orderBy("source")
    },

    // COMPOSED CURATION PASS over the round-10 train-then-score stages:
    // per document, (1) the bigram-LM typicality filter (aggregate
    // conditional-probability mass ≥ the corpus 10th percentile — the
    // perplexity-filter cut, low mass = atypical text), (2) DSIR domain
    // selection
    // (target-affinity ≥ the corpus median), (3) semantic dedup (no
    // smaller-id cluster-mate at cosine ≥ 0.35; embeddings are 1:1 with
    // documents by id). The output is the per-document verdict VECTOR —
    // each stage's decision plus the conjunction — so attrition is
    // attributable per stage, the property a production pipeline audits.
    // Scale: the three stages never multiply — each is its own
    // train-then-score plan (token-keyed / gram-keyed / cid-keyed
    // shuffles) and they meet only in a final doc_id-keyed three-way
    // verdict join (the q_pipeline_clean composition stance).
    GraftQuery.sql("q_pipeline_curate",
      """WITH tkn AS (SELECT doc_id,
        |               regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |             FROM documents),
        |lbg AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg, t[i] AS pre
        |        FROM tkn, unnest(range(1, len(t))) AS r(i) WHERE len(t) >= 2),
        |lcb AS (SELECT bg, COUNT(*) AS cbg FROM lbg GROUP BY bg),
        |lcp AS (SELECT pre, COUNT(*) AS cpre FROM lbg GROUP BY pre),
        |lsc AS (SELECT b.doc_id, SUM(lcb.cbg) AS sum_bg,
        |          SUM(lcp.cpre) AS sum_pre
        |        FROM lbg b JOIN lcb USING (bg) JOIN lcp ON b.pre = lcp.pre
        |        GROUP BY b.doc_id),
        |lm AS (SELECT d.doc_id,
        |         CASE WHEN lsc.sum_bg IS NULL THEN 0.0
        |              ELSE CAST(lsc.sum_bg AS DOUBLE) / lsc.sum_pre
        |              END AS cond_mass
        |       FROM documents d LEFT JOIN lsc USING (doc_id)),
        |dtk AS (SELECT doc_id, source = 'src0' AS is_t, t.w AS w
        |        FROM (SELECT doc_id, source,
        |                regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        |              FROM documents), unnest(ws) AS t(w)),
        |dmd AS (SELECT w,
        |          SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS tgt,
        |          SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS bgd
        |        FROM dtk GROUP BY w),
        |dsc AS (SELECT dtk.doc_id, SUM(dmd.tgt) AS sum_tgt,
        |          SUM(dmd.bgd) AS sum_bgd
        |        FROM dtk JOIN dmd USING (w) GROUP BY dtk.doc_id),
        |ds AS (SELECT doc_id,
        |         CAST(sum_tgt + 1 AS DOUBLE) / (sum_bgd + 1) >= 0.0558 AS pick
        |       FROM dsc),
        |se AS (SELECT vec_id, list_transform(embedding,
        |         x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |sen AS (SELECT vec_id, v, list_reduce(list_transform(v, x -> x * x),
        |          (a, b) -> a + b) AS n2 FROM se),
        |sc0 AS (SELECT vec_id AS cid, v AS cv FROM se WHERE vec_id < 16),
        |sd AS (SELECT sen.vec_id, sc0.cid,
        |         list_reduce(list_transform(range(1, len(sen.v)+1),
        |           i -> (sen.v[i]-sc0.cv[i])*(sen.v[i]-sc0.cv[i])),
        |           (a,b) -> a+b) AS d
        |       FROM sen, sc0),
        |sa AS (SELECT vec_id, cid FROM
        |        (SELECT vec_id, cid, row_number() OVER
        |           (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM sd)
        |       WHERE rn = 1),
        |sm AS (SELECT sen.vec_id, sen.v, sen.n2, sa.cid
        |       FROM sen JOIN sa USING (vec_id)),
        |sdup AS (SELECT y.vec_id AS b FROM sm x JOIN sm y
        |         ON x.cid = y.cid AND x.vec_id < y.vec_id
        |         WHERE list_reduce(list_transform(list_zip(x.v, y.v),
        |                 z -> z[1] * z[2]), (u, w) -> u + w)
        |               / sqrt(x.n2 * y.n2) >= 0.35
        |         GROUP BY y.vec_id),
        |sem AS (SELECT sa.vec_id AS doc_id, sdup.b IS NULL AS keep
        |        FROM sa LEFT JOIN sdup ON sa.vec_id = sdup.b)
        |SELECT lm.doc_id, lm.cond_mass >= 0.0333 AS lm_ok,
        |  ds.pick AS dsir_ok, sem.keep AS sem_ok,
        |  (lm.cond_mass >= 0.0333 AND ds.pick AND sem.keep) AS keep
        |FROM lm JOIN ds USING (doc_id) JOIN sem USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.functions.ArrayMath
      val docs = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
      // stage 1: bigram-LM typicality (TextAnalysis.lmScore — the
      // q_lm_score plan) thresholded into a verdict
      val lm = TextAnalysis.lmScore(docs)
        .select($"doc_id", ($"cond_mass" >= 0.0333).as("lm_ok"))
      // stage 2: DSIR affinity (the q_dsir_select plan)
      val tok = docs.select($"doc_id", ($"source" === "src0").as("is_t"),
        explode(toks($"text")).as("w"))
      val model = tok.groupBy("w").agg(
        sum(when($"is_t", 1L).otherwise(0L)).as("tgt"),
        sum(when($"is_t", 0L).otherwise(1L)).as("bgd"))
      val ds = tok.join(model, "w").groupBy($"doc_id")
        .agg(sum($"tgt").as("sum_tgt"), sum($"bgd").as("sum_bgd"))
        .select($"doc_id", (($"sum_tgt" + 1).cast("double")
          / ($"sum_bgd" + 1) >= 0.0558).as("dsir_ok"))
      // stage 3: semantic dedup keep (the q_semdedup plan; embeddings are
      // 1:1 with documents by id)
      val en = Tables.load(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .withColumn("n2", ArrayMath.dot($"v", $"v"))
      val cents = en.filter($"vec_id" < 16).select($"vec_id", $"v").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
      val assigned = en.withColumn("cid", array_min(array(cents.map {
        case (cid, cv) => struct(ArrayMath.l2sq($"v", typedlit(cv)).as("d"),
          lit(cid).as("cid")) }: _*))("cid"))
      val x = assigned.select($"cid", $"vec_id".as("xa"), $"v".as("va"),
        $"n2".as("na"))
      val y = assigned.select($"cid", $"vec_id".as("b"), $"v".as("vb"),
        $"n2".as("nb"))
      val dup = x.join(y, Seq("cid")).filter($"xa" < $"b")
        .filter((ArrayMath.dot($"va", $"vb") / sqrt($"na" * $"nb")) >= 0.35)
        .select($"b").distinct()
      val sem = assigned.select($"vec_id")
        .join(dup, assigned("vec_id") === dup("b"), "left")
        .select($"vec_id".as("doc_id"), $"b".isNull.as("sem_ok"))
      // verdict join: three doc_id-keyed stage outputs, one conjunction
      lm.join(ds, "doc_id").join(sem, "doc_id")
        .select($"doc_id", $"lm_ok", $"dsir_ok", $"sem_ok",
          ($"lm_ok" && $"dsir_ok" && $"sem_ok").as("keep"))
        .orderBy("doc_id")
    },

    // CORPUS SNAPSHOT DIFF (r12): content-addressed dataset versioning —
    // the audit a training pipeline runs between two corpus versions
    // before retraining. Two snapshots derive deterministically from
    // `documents` (v1 drops doc_id%10==7, v2 drops %10==4, and %10==3
    // docs are EDITED in v2), then the diff is ONE doc_id-keyed
    // full-outer join comparing content digests: added / removed /
    // modified / unchanged, each with a count and an order-insensitive
    // id digest. Scale shape: the join is keyed on doc_id (one shuffle,
    // map-side digests); at 100 TB the two sides are the two snapshot
    // manifests — rows of (id, digest), never the payloads.
    GraftQuery.sql("q_corpus_diff",
      """WITH v1 AS (SELECT doc_id, md5(text) AS d FROM documents
        |  WHERE doc_id % 10 != 7),
        |v2 AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 10 = 3 THEN text || ' edited'
        |        ELSE text END) AS d
        |  FROM documents WHERE doc_id % 10 != 4),
        |j AS (SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        |    CASE WHEN v1.doc_id IS NULL THEN 'added'
        |         WHEN v2.doc_id IS NULL THEN 'removed'
        |         WHEN v1.d != v2.d THEN 'modified'
        |         ELSE 'unchanged' END AS status
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT status, COUNT(*) AS n,
        |  CAST(SUM(md5_number_lower(CAST(doc_id AS VARCHAR))
        |    & 2147483647) AS BIGINT) AS ids_sum
        |FROM j GROUP BY status ORDER BY status""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"text")
      val v1 = docs.filter($"doc_id" % 10 =!= 7)
        .select($"doc_id".as("id1"), md5($"text").as("d1"))
      val v2 = docs.filter($"doc_id" % 10 =!= 4)
        .select($"doc_id".as("id2"),
          md5(when($"doc_id" % 10 === 3, concat($"text", lit(" edited")))
            .otherwise($"text")).as("d2"))
      v1.join(v2, $"id1" === $"id2", "full_outer")
        .select(coalesce($"id1", $"id2").as("doc_id"),
          when($"id1".isNull, "added")
            .when($"id2".isNull, "removed")
            .when($"d1" =!= $"d2", "modified")
            .otherwise("unchanged").as("status"))
        .groupBy($"status")
        .agg(count(lit(1)).as("n"),
          graft.functions.Fingerprints.idsSum($"doc_id".cast("string"))
            .as("ids_sum"))
        .orderBy("status")
    },
  )
}
