package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}

/** Text analysis for training-data pipelines: token counting (whitespace +
  * BPE-ish regex), quality scoring (punctuation/stopword ratios), language ID
  * (marker-token scoring), and document fingerprinting (md5 + rolling hash).
  * Everything is codegen'd Column expressions over `documents`; the DuckDB
  * oracles spell out the identical computation.
  */
object TextAnalysis {

  import graft.core.Text.toks

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** Marker vocabularies for language scoring. The synthetic corpus shares
    * one vocabulary across langs, so these act as a deterministic scoring
    * demo (the machinery, not a trained model): score = marker hits, argmax
    * with fixed tie order.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("table", "row", "query", "fast", "value"),
    "de" -> Seq("spark", "agg", "join", "stream"),
    "es" -> Seq("data", "column", "part", "scan"),
    "fr" -> Seq("filter", "merge", "window", "batch"),
    "zh" -> Seq("key", "hash", "order", "small", "big"))

  private val bpeIsh = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery.sql("q_text_stats",
      s"""SELECT doc_id,
         |  CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '$bpeIsh')) AS BIGINT) AS n_subtokens,
         |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
         |  CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
         |       w -> w IN (${stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE)
         |    / len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS stop_ratio
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val t = toks($"text")
      Tables.load(s, dir, "documents").select(
        $"doc_id",
        size(t).cast("long").as("n_tokens"),
        size(regexp_extract_all(lower($"text"), lit(bpeIsh), lit(0)))
          .cast("long").as("n_subtokens"),
        length(regexp_replace($"text", "[^.,;:!?]", "")).cast("long").as("n_punct"),
        (size(filter(t, w => w.isin(stopwords: _*))).cast("double") / size(t))
          .as("stop_ratio"))
        .orderBy("doc_id")
    },

    GraftQuery.sql("q_lang_id", {
      val scoreCols = langMarkers.map { case (l, ms) =>
        s"""CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
           |  w -> w IN (${ms.map("'" + _ + "'").mkString(",")}))) AS BIGINT) AS s_$l""".stripMargin
      }.mkString(",\n  ")
      val langs = langMarkers.map(_._1)
      val pred = langs.init.map { l =>
        val geAll = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $geAll THEN '$l'"
      }.mkString(" ")
      s"""SELECT doc_id, ${langs.map(l => s"s_$l").mkString(", ")},
         |  CASE $pred ELSE '${langs.last}' END AS pred_lang
         |FROM (SELECT doc_id, $scoreCols FROM documents) ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val t = toks($"text")
      val scored = Tables.load(s, dir, "documents").select(
        ($"doc_id" +: langMarkers.map { case (l, ms) =>
          size(filter(t, w => w.isin(ms: _*))).cast("long").as(s"s_$l")
        }): _*)
      val langs = langMarkers.map(_._1)
      val pred = langs.init.foldRight(lit(langs.last)) { (l, els) =>
        val geAll = langs.filter(_ != l)
          .map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
        when(geAll, lit(l)).otherwise(els)
      }
      scored.withColumn("pred_lang", pred).orderBy("doc_id")
    },

    // QUALITY CLASSIFIER: the decision step of a cleaning pipeline — a
    // fixed-weight linear model over the extracted features (token count,
    // mean word length, stopword ratio, punctuation density), thresholded
    // into keep/drop. Map-only; every arithmetic step is IEEE-exact in a
    // spelled order, so the oracle reproduces score and verdict exactly.
    // (Weights are illustrative constants — the operator demonstrates the
    // feature→score→decision plumbing, not a trained model.)
    GraftQuery.sql("q_quality_score", {
      val ws = "regexp_split_to_array(lower(trim(text)), '\\s+')"
      val sw = stopwords.map("'" + _ + "'").mkString(",")
      s"""WITH f AS (SELECT doc_id,
         |  CAST(len($ws) AS DOUBLE) AS n_tok,
         |  CAST(length(replace(trim(text), ' ', '')) AS DOUBLE) / len($ws) AS mean_len,
         |  CAST(len(list_filter($ws, w -> w IN ($sw))) AS DOUBLE) / len($ws) AS stop_r,
         |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
         |    / length(text) AS punct_r
         |  FROM documents)
         |SELECT doc_id,
         |  ((0.002 * n_tok + 0.3 * mean_len) + 2.0 * stop_r) - 4.0 * punct_r AS score,
         |  (((0.002 * n_tok + 0.3 * mean_len) + 2.0 * stop_r) - 4.0 * punct_r) > 1.5 AS keep
         |FROM f ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val t = toks($"text")
      val f = Tables.load(s, dir, "documents").select($"doc_id",
        size(t).cast("double").as("n_tok"),
        (length(regexp_replace(trim($"text"), " ", "")).cast("double") / size(t))
          .as("mean_len"),
        (size(filter(t, w => w.isin(stopwords: _*))).cast("double") / size(t))
          .as("stop_r"),
        (length(regexp_replace($"text", "[^.,;:!?]", "")).cast("double")
          / length($"text")).as("punct_r"))
      val score = ((lit(0.002) * $"n_tok" + lit(0.3) * $"mean_len")
        + lit(2.0) * $"stop_r") - lit(4.0) * $"punct_r"
      f.select($"doc_id", score.as("score"), (score > 1.5).as("keep"))
        .orderBy("doc_id")
    },

    // Fingerprints: md5, first-8-bytes hex, and an order-sensitive rolling
    // hash folded over the token stream (seeded by the first token's code) —
    // Spark `aggregate` ≡ DuckDB `list_reduce`, both strict left folds.
    GraftQuery.sql("q_fingerprint",
      """SELECT doc_id, md5(text) AS fp_md5,
        |  upper(hex(encode(substr(text, 1, 8)))) AS head_hex,
        |  CAST(list_reduce(
        |    list_transform(regexp_split_to_array(lower(trim(text)), '\s+'),
        |                   w -> unicode(w) * 31 + length(w)),
        |    (a, b) -> (a * 131 + b) % 1000000007) AS BIGINT) AS fp_roll
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val codes = transform(toks($"text"),
        w => (ascii(w) * 31 + length(w)).cast("long"))
      Tables.load(s, dir, "documents").select(
        $"doc_id",
        md5($"text").as("fp_md5"),
        upper(hex(encode(substring($"text", 1, 8), "utf-8"))).as("head_hex"),
        aggregate(slice(codes, lit(2), size(codes) - 1), get(codes, lit(0)),
          (a, b) => (a * 131 + b) % 1000000007L).as("fp_roll"))
        .orderBy("doc_id")
    },

    // CONTEXT-WINDOW CHUNKING — split each document into overlapping
    // token windows (16 tokens, stride 8): the shape every
    // embedding/training pipeline runs before vectorizing long documents.
    // Map-only: window starts come from `sequence` (no shuffle, no UDF),
    // each window is a 1-based array slice; the oracle replays range +
    // list slicing. At 100 TB this parallelizes per document row —
    // repartition the single-file documents table first (TESTDATA note).
    GraftQuery.sql("q_chunk_windows",
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |st AS (SELECT doc_id, ws, UNNEST(range(0, len(ws), 8)) AS start
        |       FROM w)
        |SELECT doc_id, CAST(start / 8 AS BIGINT) AS chunk_id,
        |  array_to_string(ws[start + 1 : start + 16], ' ') AS chunk,
        |  CAST(LEAST(16, len(ws) - start) AS BIGINT) AS n_toks
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val win = 16; val stride = 8
      val t = toks($"text")
      Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", t.as("ws"))
        .select($"doc_id", $"ws", explode(
          sequence(lit(0), size($"ws") - 1, lit(stride))).as("start"))
        .select($"doc_id",
          ($"start" / stride).cast("long").as("chunk_id"),
          concat_ws(" ", slice($"ws", $"start" + 1, lit(win))).as("chunk"),
          least(lit(win), size($"ws") - $"start").cast("long").as("n_toks"))
        .orderBy("doc_id", "chunk_id")
    },

    // SEQUENCE PACKING — assign each chunk to a training bin by its
    // cumulative token offset within the document (budget 64 tokens/bin):
    // the packing step that turns variable-length chunks into fixed-budget
    // training sequences. ONE window shuffle keyed by doc_id (chunk_id is
    // a unique, deterministic order), then map-only arithmetic; DuckDB
    // replays the running sum identically.
    GraftQuery.sql("q_pack_sequences",
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |st AS (SELECT doc_id, ws, UNNEST(range(0, len(ws), 8)) AS start
        |       FROM w),
        |ch AS (SELECT doc_id, CAST(start / 8 AS BIGINT) AS chunk_id,
        |         CAST(LEAST(16, len(ws) - start) AS BIGINT) AS n_toks
        |       FROM st),
        |cum AS (SELECT doc_id, chunk_id, n_toks,
        |          SUM(n_toks) OVER (PARTITION BY doc_id ORDER BY chunk_id)
        |            AS cum_toks FROM ch)
        |SELECT doc_id, chunk_id, n_toks,
        |  CAST(FLOOR(CAST(cum_toks - n_toks AS DOUBLE) / 64) AS BIGINT) AS bin
        |FROM cum ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val stride = 8; val win = 16
      val chunks = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", toks($"text").as("ws"))
        .select($"doc_id", explode(
          sequence(lit(0), size($"ws") - 1, lit(stride))).as("start"),
          size($"ws").as("n"))
        .select($"doc_id", ($"start" / stride).cast("long").as("chunk_id"),
          least(lit(win), $"n" - $"start").cast("long").as("n_toks"))
      val cum = sum($"n_toks").over(
        Window.partitionBy($"doc_id").orderBy($"chunk_id"))
      chunks
        .withColumn("cum_toks", cum)
        .select($"doc_id", $"chunk_id", $"n_toks",
          floor(($"cum_toks" - $"n_toks").cast("double") / 64)
            .as("bin"))
        .orderBy("doc_id", "chunk_id")
    },

    // CROSS-DOCUMENT SEQUENCE PACKING — q_pack_sequences bins chunks
    // WITHIN a document; this packs whole documents INTO fixed
    // token-budget training sequences (budget 512), the concatenation
    // step that turns a curated corpus into pretraining rows. Global
    // first-fit is inherently sequential, so the production shape is
    // SHARDED packing: each document hashes to one of 8 shards
    // (deterministic md5 bucket), and a running token sum within the
    // shard (ordered by doc_id) assigns bins — one hash-partitioned
    // window per shard, fully parallel across shards, identical in both
    // engines. Bin boundaries split documents greedily by cumulative
    // offset (a doc straddling the boundary starts the next bin iff its
    // start offset crossed it), matching the oracle's integer floor.
    GraftQuery.sql("q_pack_corpus",
      """WITH d AS (SELECT doc_id,
        |             CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
        |               AS BIGINT) AS n_tok,
        |             CAST((md5_number_lower('pk:' || CAST(doc_id AS VARCHAR))
        |               & 2147483647) % 8 AS BIGINT) AS shard
        |           FROM documents),
        |c AS (SELECT doc_id, shard, n_tok,
        |        SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id)
        |          AS cum_tok
        |      FROM d)
        |SELECT doc_id, shard, n_tok,
        |  CAST(FLOOR(CAST(cum_tok - n_tok AS DOUBLE) / 512) AS BIGINT) AS bin
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", size(toks($"text")).cast("long").as("n_tok"),
          (graft.functions.Fingerprints
            .md5Low64(concat(lit("pk:"), $"doc_id".cast("string")))
            .bitwiseAND(0x7fffffffL) % 8).as("shard"))
      val cum = sum($"n_tok").over(
        Window.partitionBy($"shard").orderBy($"doc_id"))
      d.withColumn("cum_tok", cum)
        .select($"doc_id", $"shard", $"n_tok",
          floor(($"cum_tok" - $"n_tok").cast("double") / 512).as("bin"))
        .orderBy("doc_id")
    },

    // UNICODE NORMALIZATION — the cleaning step BEFORE any hash-based
    // dedup/shingling: composed vs decomposed accents ("é" vs "e"+U+0301)
    // must hash identically or near-dup detection silently misses. Spark
    // has no NFC builtin; `graft_nfc` is a native codegen expression
    // (functions/Normalize.scala) with an ASCII fast path, and DuckDB's
    // `nfc_normalize` replays it byte-identically. The synthetic corpus is
    // ASCII, so three unicode rows are appended IN the query (same VALUES
    // in both engines) — the decomposed é provably shrinks by one
    // codepoint, the ASCII rows pass through untouched.
    GraftQuery.sql("q_text_normalize",
      "WITH all_docs AS (SELECT doc_id, text FROM documents\n" +
        "  UNION ALL SELECT * FROM (VALUES\n" +
        "    (1000001, 'Café du  Monde'),\n" +
        "    (1000002, 'Ångström\tunits'),\n" +
        "    (1000003, 'ASCII stays identical')) t(doc_id, text)),\n" +
        "norm AS (SELECT doc_id,\n" +
        "    nfc_normalize(regexp_replace(trim(text), '\\s+', ' ', 'g'))\n" +
        "      AS norm FROM all_docs)\n" +
        "SELECT doc_id, norm, CAST(length(norm) AS BIGINT) AS n_chars\n" +
        "FROM norm ORDER BY doc_id") { (s, dir) =>
      import s.implicits._
      val extra = Seq(
        (1000001L, "Café du  Monde"),
        (1000002L, "Ångström\tunits"),
        (1000003L, "ASCII stays identical")).toDF("doc_id", "text")
      Tables.load(s, dir, "documents").select($"doc_id", $"text")
        .union(extra)
        .select($"doc_id", graft.functions.Normalize.nfc(
          regexp_replace(trim($"text"), "\\s+", " ")).as("norm"))
        .select($"doc_id", $"norm", length($"norm").cast("long").as("n_chars"))
        .orderBy("doc_id")
    },

    // CORPUS-TRAINED BIGRAM LM QUALITY SCORING — the CCNet/Gopher-style
    // train-then-score filter: fit an n-gram model ON the corpus, score
    // each document by how typical its bigrams are under it. Scores stay
    // rational (the Search.scala contract — no ln, so every step is an
    // IEEE-exact +,·,/ the oracle replays bit-identically): `cond_mass`
    // is the aggregate conditional-probability mass Σc(w₁w₂)/Σc(w₁·) —
    // the log-free analog of mean conditional likelihood — and `novelty`
    // is the corpus-hapax fraction of the document's bigrams (high =
    // unusual/noisy text, the tail a perplexity filter cuts).
    //   Scale shape: TRAIN is two gram-keyed groupBys with map-side
    // partial aggregation ((gram, partial-count) shuffles — the
    // irreducible cost of corpus statistics, the q_tfidf framing); SCORE
    // re-derives the map-only bigram stream from the scan (at 100 TB
    // recomputing a map-only explode beats materializing a corpus-sized
    // intermediate) and joins it to the model on the gram key — AQE
    // broadcasts the model side when the vocabulary is small, and the
    // final per-document aggregate is one doc_id-keyed shuffle. Tiny-SF
    // runs cache the exploded stream instead of re-scanning (3 consumers,
    // unpersisted in finally).
    GraftQuery.sql("q_lm_score",
      """WITH tkn AS (SELECT doc_id,
        |               regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |             FROM documents),
        |bg AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg, t[i] AS pre
        |       FROM tkn, unnest(range(1, len(t))) AS r(i) WHERE len(t) >= 2),
        |cb AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cbg FROM bg GROUP BY bg),
        |cp AS (SELECT pre, CAST(COUNT(*) AS BIGINT) AS cpre FROM bg GROUP BY pre),
        |sc AS (SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bg,
        |         CAST(SUM(cb.cbg) AS BIGINT) AS sum_bg,
        |         CAST(SUM(cp.cpre) AS BIGINT) AS sum_pre,
        |         CAST(SUM(CASE WHEN cb.cbg = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_hapax
        |       FROM bg b JOIN cb USING (bg) JOIN cp ON b.pre = cp.pre
        |       GROUP BY b.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(sc.n_bg, 0) AS n_bg,
        |  COALESCE(sc.sum_bg, 0) AS sum_bg,
        |  CASE WHEN sc.n_bg IS NULL THEN 0.0
        |       ELSE CAST(sc.sum_bg AS DOUBLE) / sc.sum_pre END AS cond_mass,
        |  CASE WHEN sc.n_bg IS NULL THEN 0.0
        |       ELSE CAST(sc.n_hapax AS DOUBLE) / sc.n_bg END AS novelty
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      lmScore(Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism))
    },

    // BPE-STYLE MERGE TRAINING — two rounds of the iterative vocabulary
    // induction every tokenizer build runs: count adjacent token pairs
    // corpus-wide, pick the argmax pair (count desc, then lexicographic;
    // SELF-pairs excluded so occurrences cannot overlap and the rewrite
    // is position-independent), rewrite every document, repeat on the
    // merged stream. Each round is one (pair, partial-count) shuffle with
    // map-side combine plus a ONE-ROW argmax collect shipped back as a
    // literal — the irreducible shape of global iterative training (the
    // q_ivf_kmeans stance, for tokenizers). The rewrite itself is
    // map-only array surgery. Output pins each doc's before/after token
    // counts, both learned merges, and an md5 fingerprint of the fully
    // merged stream — the oracle replays both rounds in SQL exactly.
    GraftQuery.sql("q_bpe_merges",
      """WITH tk AS (SELECT doc_id,
        |              regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |            FROM documents),
        |p1 AS (SELECT t[i] AS a, t[i+1] AS b, COUNT(*) AS c
        |       FROM tk, unnest(range(1, len(t))) AS r(i)
        |       WHERE t[i] != t[i+1] GROUP BY 1, 2),
        |m1 AS (SELECT a, b FROM p1 ORDER BY c DESC, a, b LIMIT 1),
        |r1 AS (SELECT doc_id,
        |         list_transform(
        |           list_filter(range(1, len(t) + 1),
        |             i -> NOT (i > 1 AND t[i-1] = m1.a AND t[i] = m1.b)),
        |           i -> CASE WHEN i < len(t) AND t[i] = m1.a AND t[i+1] = m1.b
        |                     THEN m1.a || '_' || m1.b ELSE t[i] END) AS t
        |       FROM tk, m1),
        |p2 AS (SELECT t[i] AS a, t[i+1] AS b, COUNT(*) AS c
        |       FROM r1, unnest(range(1, len(t))) AS r(i)
        |       WHERE t[i] != t[i+1] GROUP BY 1, 2),
        |m2 AS (SELECT a, b FROM p2 ORDER BY c DESC, a, b LIMIT 1),
        |r2 AS (SELECT doc_id,
        |         list_transform(
        |           list_filter(range(1, len(t) + 1),
        |             i -> NOT (i > 1 AND t[i-1] = m2.a AND t[i] = m2.b)),
        |           i -> CASE WHEN i < len(t) AND t[i] = m2.a AND t[i+1] = m2.b
        |                     THEN m2.a || '_' || m2.b ELSE t[i] END) AS t
        |       FROM r1, m2)
        |SELECT tk.doc_id, CAST(len(tk.t) AS BIGINT) AS n0,
        |  CAST(len(r2.t) AS BIGINT) AS n2,
        |  (SELECT a || '_' || b FROM m1) AS merge1,
        |  (SELECT a || '_' || b FROM m2) AS merge2,
        |  md5(array_to_string(r2.t, ' ')) AS fp
        |FROM tk JOIN r2 USING (doc_id) ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val tk = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", toks($"text").as("t")).cache()
      // A corpus with no adjacent distinct-token pair (at either round) has
      // no merge to pick; the oracle's empty m1/m2 CTE empties its output,
      // so mirror that with an empty result of the same schema.
      def emptyOut = tk.limit(0).select($"doc_id",
        lit(0L).as("n0"), lit(0L).as("n2"),
        lit("").as("merge1"), lit("").as("merge2"), lit("").as("fp"))
      val (merges, rounds) = trainMerges(tk, 2)
      try {
        merges match {
          case List((a1, b1), (a2, b2)) =>
            // before/after counts + fingerprint in ONE map-side pass: the
            // fully merged stream is bpeApply over the SAME row's tokens
            // (expression-identical to the per-round rewrites, the
            // TextMergeSpec-pinned identity), so the former tk-vs-r2
            // self-join — a shuffle of every token array — is a
            // projection (r17; measured 6.46→4.03 s at 27x)
            val r2t = bpeApply($"t", List((a1, b1), (a2, b2)))
            tk.select($"doc_id", size($"t").cast("long").as("n0"),
                size(r2t).cast("long").as("n2"),
                lit(a1 + "_" + b1).as("merge1"),
                lit(a2 + "_" + b2).as("merge2"),
                md5(concat_ws(" ", r2t)).as("fp"))
              .orderBy("doc_id")
          case _ => emptyOut
        }
      } finally {
        rounds.foreach(_.unpersist(blocking = false))
        tk.unpersist(blocking = false)
      }
    },

    // BPE ENCODE — the APPLY side of tokenizer training (q_bpe_merges is
    // the train side): K=6 merges are trained iteratively (per round: one
    // (pair, partial-count) shuffle with map-side combine + a ONE-ROW
    // argmax collect), then the whole corpus is ENCODED by folding the
    // merge TABLE over each document's token array in a single map-side
    // expression (`bpeApply`) — train once globally, encode anywhere with
    // the merges shipped as a literal, no per-round corpus rewrites at
    // encode time. Applying the ordered merge list to the ORIGINAL stream
    // equals the training rewrites by construction, which is exactly what
    // the oracle pins: it replays all six training rounds in SQL and
    // fingerprints the final stream. Output: per-doc piece counts + md5
    // of the encoded stream, plus the learned merge table as columns.
    GraftQuery.sql("q_bpe_encode", bpeEncodeSql) { (s, dir) =>
      import s.implicits._
      val tk = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", toks($"text").as("t")).cache()
      val (merges, rounds) = trainMerges(tk, bpeEncodeRounds)
      try {
        if (merges.size < bpeEncodeRounds)
          // degenerate corpus (some round had no adjacent distinct pair):
          // the oracle's empty m_k CTE empties its output — mirror it
          tk.limit(0).select($"doc_id", lit(0L).as("n_tok"),
            lit(0L).as("n_pieces"), lit("").as("merges"), lit("").as("fp"))
        else {
          val enc = graft.operators.TextAnalysis.bpeApply($"t", merges)
          tk.select($"doc_id", size($"t").cast("long").as("n_tok"),
              size(enc).cast("long").as("n_pieces"),
              lit(merges.map { case (a, b) => a + "_" + b }
              .mkString(",")).as("merges"),
              md5(concat_ws(" ", enc)).as("fp"))
            .orderBy("doc_id")
        }
      } finally {
        rounds.foreach(_.unpersist(blocking = false))
        tk.unpersist(blocking = false)
      }
    },
  ) :+ bpeDecodeQuery

  /** Train up to `k` BPE merge rounds over a cached token table —
    * shared by q_bpe_merges, q_bpe_encode and q_bpe_decode so all always
    * train the SAME merge table. Returns the (possibly short, if the
    * corpus exhausts) ordered merges plus the cached per-round
    * intermediates for the caller's finally-unpersist.
    *
    * MEASURED (r17): a fused variant that re-derived round k's stream as
    * `bpeApply(t, merges-so-far)` from the base tokens — no per-round
    * cache at all — was built and REFUTED at both bench scales: the
    * Σk re-applications cost more CPU than the cached-array reads save
    * (sf0.1: encode 3.51→4.18 s, decode 3.47→3.93 s; 27x: encode
    * 13.45→16.95 s, decode 15.04→16.02 s; medians, back-to-back legs).
    * Per-round caching stays. The fusion DID win where the round count
    * is 2 and it also deletes a join — see q_bpe_merges' output pass. */
  private def trainMerges(tk: org.apache.spark.sql.DataFrame, k: Int)
      : (List[(String, String)], List[org.apache.spark.sql.DataFrame]) = {
    import tk.sparkSession.implicits._
    val rounds = scala.collection.mutable.ListBuffer.empty[
      org.apache.spark.sql.DataFrame]
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var cur = tk
    var exhausted = false
    while (!exhausted && merges.size < k) {
      topPair(cur) match {
        case Some((a, b)) =>
          merges += ((a, b))
          val nxt = cur.select($"doc_id", mergeOnce($"t", a, b).as("t"))
            .cache()
          rounds += nxt
          cur = nxt
        case None => exhausted = true
      }
    }
    (merges.toList, rounds.toList)
  }

  /** The shared oracle prefix: tokenized corpus + the k training-round
    * CTEs. */
  private def bpeSqlPrefix(k: Int): String =
    """WITH tk AS MATERIALIZED (SELECT doc_id,
      |    regexp_split_to_array(lower(trim(text)), '\s+') AS t
      |  FROM documents),
      |""".stripMargin +
      (1 to k).map(bpeRoundSql).mkString("\n") + "\n"

  /** Training depth of `q_bpe_encode` (and its oracle's round count).
    * A `def`: the `queries` val initializes before any sibling val. */
  private def bpeEncodeRounds = 6

  /** TOKENIZER ROUND-TRIP (r12): decode is the inverse of the merge-table
    * encode — each piece splits back on the merge joiner and the pieces
    * flatten to the original token stream (tokens are alphanumeric, so
    * the '_' joiner never collides). Both engines train the same 6-round
    * merge table, encode, DECODE, and independently assert
    * decode(encode(x)) == x per document — the property a production
    * tokenizer ships with. Decode, like encode, is one map-side
    * codegen'd projection: no join, no shuffle, linear at any corpus
    * size. */
  // a `def` like bpeEncodeRounds: the `queries` val initializes first
  private def bpeDecodeQuery: GraftQuery = {
    val k = bpeEncodeRounds
    GraftQuery.sql("q_bpe_decode",
      bpeSqlPrefix(k) +
        s"""dec AS MATERIALIZED (SELECT doc_id,
        |    flatten(list_transform(r$k.t, p -> string_split(p, '_')))
        |      AS t
        |  FROM r$k)
        |SELECT tk.doc_id, CAST(len(tk.t) AS BIGINT) AS n_tok,
        |  CAST(len(r$k.t) AS BIGINT) AS n_pieces,
        |  md5(array_to_string(dec.t, ' ')) =
        |    md5(array_to_string(tk.t, ' ')) AS round_trip_ok
        |FROM tk JOIN r$k USING (doc_id) JOIN dec USING (doc_id)
        |ORDER BY tk.doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val tk = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", toks($"text").as("t")).cache()
      val (merges, rounds) = trainMerges(tk, k)
      try {
        if (merges.size < k)
          tk.limit(0).select($"doc_id", lit(0L).as("n_tok"),
            lit(0L).as("n_pieces"), lit(false).as("round_trip_ok"))
        else {
          val enc = bpeApply($"t", merges)
          val dec = flatten(transform(enc, p => split(p, "_")))
          tk.select($"doc_id", size($"t").cast("long").as("n_tok"),
              size(enc).cast("long").as("n_pieces"),
              (md5(concat_ws(" ", dec)) === md5(concat_ws(" ", $"t")))
                .as("round_trip_ok"))
            .orderBy("doc_id")
        }
      } finally {
        rounds.foreach(_.unpersist(blocking = false))
        tk.unpersist(blocking = false)
      }
    }
  }

  /** One oracle training round: argmax adjacent distinct pair of the
    * previous stream, rewrite every document. Mirrors q_bpe_merges' m/r
    * CTE pair, generated per round. */
  private def bpeRoundSql(k: Int): String = {
    val prev = if (k == 1) "tk" else s"r${k - 1}"
    s"""m$k AS MATERIALIZED (SELECT a, b FROM (
       |    SELECT t[i] AS a, t[i+1] AS b, COUNT(*) AS c
       |    FROM $prev, unnest(range(1, len(t))) AS r(i)
       |    WHERE t[i] != t[i+1] GROUP BY 1, 2)
       |  ORDER BY c DESC, a, b LIMIT 1),
       |r$k AS MATERIALIZED (SELECT doc_id,
       |    list_transform(
       |      list_filter(range(1, len(t) + 1),
       |        i -> NOT (i > 1 AND t[i-1] = m$k.a AND t[i] = m$k.b)),
       |      i -> CASE WHEN i < len(t) AND t[i] = m$k.a AND t[i+1] = m$k.b
       |           THEN m$k.a || '_' || m$k.b ELSE t[i] END) AS t
       |  FROM $prev, m$k),""".stripMargin
  }

  private def bpeEncodeSql: String =
    bpeSqlPrefix(bpeEncodeRounds) +
      s"""ms AS MATERIALIZED (SELECT ${(1 to bpeEncodeRounds).map(k =>
           s"(SELECT a || '_' || b FROM m$k)").mkString(" || ',' || ")}
      |    AS merges)
      |SELECT tk.doc_id, CAST(len(tk.t) AS BIGINT) AS n_tok,
      |  CAST(len(r$bpeEncodeRounds.t) AS BIGINT) AS n_pieces,
      |  ms.merges AS merges,
      |  md5(array_to_string(r$bpeEncodeRounds.t, ' ')) AS fp
      |FROM tk JOIN r$bpeEncodeRounds USING (doc_id), ms
      |ORDER BY doc_id""".stripMargin

  /** One BPE-style merge applied to a token array: every adjacent (a, b)
    * occurrence rewrites to the joined token. Callers exclude self-pairs
    * (a ≠ b) when choosing the merge, which makes occurrences
    * non-overlapping — drop a position iff its LEFT neighbor starts a
    * match, independent of any other position. */
  private[operators] def mergeOnce(t: Column, a: String, b: String): Column =
    mergeOnceCol(t, lit(a), lit(b))

  /** Column-argument variant — the form `bpeApply`'s merge-table fold
    * needs (the pair arrives as fields of a literal struct, not Scala
    * strings). */
  private[operators] def mergeOnceCol(t: Column, a: Column,
      b: Column): Column = {
    // size-0 guard: sequence(0, -1) DESCENDS in Spark, it is not empty
    val idx = when(size(t) >= 1, sequence(lit(0), size(t) - 1))
      .otherwise(array().cast("array<int>"))
    val kept = filter(idx, i =>
      !((i > lit(0)) && (get(t, i - 1) === a) && (get(t, i) === b)))
    transform(kept, i =>
      when((i < size(t) - 1) && (get(t, i) === a) && (get(t, i + 1) === b),
        concat(a, lit("_"), b)).otherwise(get(t, i)))
  }

  /** APPLY a trained merge table to a token stream: fold the merges in
    * training order over the array, entirely map-side — the production
    * encode path (train once globally, encode anywhere with the merge
    * table shipped as a literal; no per-round corpus rewrite jobs at
    * encode time). Composes built-in higher-order functions only, so the
    * whole K-merge application stays inside codegen. */
  def bpeApply(t: Column, merges: Seq[(String, String)]): Column =
    if (merges.isEmpty) t
    else aggregate(
      array(merges.map { case (a, b) =>
        struct(lit(a).as("a"), lit(b).as("b")) }: _*),
      t, (acc, m) => mergeOnceCol(acc, m("a"), m("b")))

  /** The corpus-argmax adjacent pair (count desc, then lexicographic),
    * self-pairs excluded. ONE-row collect — the iterative-training
    * stance: each BPE round is a global reduction to a single merge
    * decision, shipped back as a literal. */
  private def topPair(toks: DataFrame): Option[(String, String)] = {
    import toks.sparkSession.implicits._
    val idx = when(size($"t") >= 2, sequence(lit(0), size($"t") - 2))
      .otherwise(array().cast("array<int>"))
    toks
      .select(explode(transform(idx, i => struct(
        get($"t", i).as("a"), get($"t", i + 1).as("b")))).as("p"))
      .select($"p.a", $"p.b").filter($"a" =!= $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"a", $"b").limit(1).collect()
      .headOption.map(r => (r.getString(0), r.getString(1)))
  }

  /** Bigram-LM scoring core (see `q_lm_score`): train bigram/prefix
    * counts on `docs` (doc_id, text), score each document by aggregate
    * conditional-probability mass and corpus-hapax fraction. */
  def lmScore(docsRaw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import docsRaw.sparkSession.implicits._
    val docs = docsRaw.select($"doc_id", toks($"text").as("t"))
    val idx = when(size($"t") >= 2, sequence(lit(0), size($"t") - 2))
      .otherwise(array().cast("array<int>"))
    // The gram stream feeds THREE consumers (bigram counts, prefix counts,
    // the scoring join) — materialize it ONCE via an eager localCheckpoint
    // so the stored partitions outlive this call and serve the caller's
    // real collect; lifetime is then plan-tied (the ContextCleaner reclaims
    // the blocks when the plan is GC'd), with no unpersist-before-use and
    // no leaked cache entry.
    val bg = docs
      .select($"doc_id", explode(transform(idx, i => struct(
        concat_ws(" ", get($"t", i), get($"t", i + 1)).as("bg"),
        get($"t", i).as("pre")))).as("g"))
      .select($"doc_id", $"g.bg", $"g.pre")
      .localCheckpoint(true)
    val cb = bg.groupBy("bg").agg(count(lit(1)).as("cbg"))
    val cp = bg.groupBy("pre").agg(count(lit(1)).as("cpre"))
    val sc = bg.join(cb, "bg").join(cp, "pre")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bg"), sum($"cbg").as("sum_bg"),
        sum($"cpre").as("sum_pre"),
        sum(when($"cbg" === 1, 1L).otherwise(0L)).as("n_hapax"))
    docsRaw.select($"doc_id")
      .join(sc, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_bg", lit(0L)).as("n_bg"),
        coalesce($"sum_bg", lit(0L)).as("sum_bg"),
        when($"n_bg".isNull, lit(0.0))
          .otherwise($"sum_bg".cast("double") / $"sum_pre")
          .as("cond_mass"),
        when($"n_bg".isNull, lit(0.0))
          .otherwise($"n_hapax".cast("double") / $"n_bg")
          .as("novelty"))
      .orderBy("doc_id")
  }
}
