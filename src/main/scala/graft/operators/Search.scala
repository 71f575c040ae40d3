package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}

/** Full-text SEARCH over the documents corpus — the retrieval side of a
  * training-data pipeline (mining examples by keyword, scoring relevance,
  * auditing vocabulary). The reference's signature move is turning scans
  * into index lookups (`DictIndexImpl.v:374-389`); these operators are that
  * idea at text scale: a posting-list (inverted) index, conjunctive term
  * search, TF-IDF term weighting, and BM25 ranked retrieval.
  *
  * Scale notes (the 100 TB plan for each):
  *  - `q_inverted_index`: the query-term filter is applied map-side BEFORE
  *    the groupBy, so only postings of the queried terms shuffle — never the
  *    corpus token stream. A standing inverted index is this same plan
  *    without the filter, written bucketed by term.
  *  - `q_search_conjunctive`: pure map-only (`array_intersect` against a
  *    literal query array) — scan → filter → project; zero shuffles. This is
  *    the one-off-query dual of the standing index above.
  *  - `q_tfidf`: document frequencies aggregate with map-side partial
  *    aggregation (one corpus-wide shuffle of (term, partial-count) rows —
  *    the irreducible cost of corpus statistics); the scored-document side is
  *    small and broadcasts into the join against the vocabulary.
  *  - `q_bm25`: per-document term frequencies for literal query terms are
  *    computed by array expressions (no explode); corpus constants (N, df_i,
  *    avgdl) reduce to ONE row that cross-joins back (broadcast); scoring is
  *    map-side. The only corpus shuffle is the final global top-k sort, which
  *    TakeOrderedAndProject keeps at k rows per partition.
  *
  * Floating-point contract with the oracle: scores avoid transcendentals
  * (no ln) — TF-IDF uses the rational weight tf·N/df and BM25 the rational
  * idf' = (N − df + 0.5)/(df + 0.5), both monotone transforms of the
  * textbook ln forms, so rankings agree and every arithmetic step is an
  * IEEE-exact +,·,/ evaluated in the same association order the oracle
  * spells out — the hash comparison is bit-exact, not approximate.
  */
object Search {

  import graft.core.Text.toks

  /** The fixed retrieval query used by the search operators. */
  val queryTerms: Seq[String] = Seq("table", "query", "fast")

  private val wsCte =
    """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents)"""

  private def termList = queryTerms.map("'" + _ + "'").mkString(", ")

  val queries: Seq[GraftQuery] = Seq(

    // Inverted-index postings for the query terms: document frequency and
    // posting-list bounds per term. The term filter runs map-side (an
    // array_intersect against the 3-term literal array), so the shuffle
    // carries only the queried terms' postings.
    GraftQuery.sql("q_inverted_index",
      s"""$wsCte,
         |p AS (SELECT DISTINCT doc_id, t.w AS term FROM w, unnest(ws) AS t(w)
         |      WHERE t.w IN ($termList))
         |SELECT term, COUNT(*) AS df, MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM p GROUP BY term ORDER BY term""".stripMargin) { (s, dir) =>
      import s.implicits._
      val q = array(queryTerms.map(lit): _*)
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          explode(array_intersect(array_distinct(toks($"text")), q)).as("term"))
        .groupBy($"term")
        .agg(count(lit(1)).as("df"), min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy("term")
    },

    // Conjunctive (AND) term search: documents containing every query term.
    // Map-only — scan, array_intersect against the literal query, filter.
    GraftQuery.sql("q_search_conjunctive",
      s"""$wsCte
         |SELECT doc_id FROM w
         |WHERE len(list_intersect(list_distinct(ws), [$termList])) = ${queryTerms.size}
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val q = array(queryTerms.map(lit): _*)
      Tables.load(s, dir, "documents")
        .filter(size(array_intersect(array_distinct(toks($"text")), q))
          === queryTerms.size)
        .select($"doc_id")
        .orderBy("doc_id")
    },

    // TF-IDF top-3 terms for a deterministic document sample (doc_id%100=0),
    // weighted against WHOLE-corpus document frequencies. Weight is the
    // rational tf·N/df (see class doc); ties broken by term.
    GraftQuery.sql("q_tfidf",
      s"""$wsCte,
         |df AS (SELECT t.w AS term, COUNT(DISTINCT doc_id) AS df
         |       FROM w, unnest(ws) AS t(w) GROUP BY t.w),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |tf AS (SELECT doc_id, t.w AS term, COUNT(*) AS tf
         |       FROM w, unnest(ws) AS t(w) WHERE doc_id % 100 = 0 GROUP BY doc_id, t.w),
         |scored AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |             (CAST(tf.tf AS DOUBLE) * n.n) / df.df AS weight
         |           FROM tf JOIN df USING (term) CROSS JOIN n),
         |ranked AS (SELECT *, row_number() OVER
         |             (PARTITION BY doc_id ORDER BY weight DESC, term) AS rk
         |           FROM scored)
         |SELECT doc_id, term, tf, df, weight FROM ranked WHERE rk <= 3
         |ORDER BY doc_id, weight DESC, term""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
      val terms = docs.select($"doc_id", explode(toks($"text")).as("term"))
      // corpus statistics: one shuffle with map-side partial aggregation
      val df = terms.groupBy($"term")
        .agg(count_distinct($"doc_id").as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      // scored sample is tiny → broadcast side of the vocabulary join
      val tf = terms.filter($"doc_id" % 100 === 0)
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val scored = df.join(broadcast(tf), "term").crossJoin(broadcast(n))
        .withColumn("weight", ($"tf".cast("double") * $"n") / $"df")
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy($"doc_id").orderBy($"weight".desc, $"term")))
        .filter($"rk" <= 3)
        .select($"doc_id", $"term", $"tf", $"df", $"weight")
        .orderBy($"doc_id", $"weight".desc, $"term")
    },

    // BM25 ranked retrieval (k1=1.2, b=0.75, rational idf' — see class doc):
    // top-10 documents for the fixed query. Per-doc term frequencies come
    // from array expressions over the token array (map-side, no explode);
    // corpus constants reduce to one broadcast row; the score sums the three
    // per-term contributions in fixed left-to-right order so the oracle's
    // doubles match bit-for-bit.
    GraftQuery.sql("q_bm25", {
      val dfCols = queryTerms.zipWithIndex.map { case (t, i) =>
        s"SUM(CASE WHEN list_contains(ws, '$t') THEN 1 ELSE 0 END) AS df$i"
      }.mkString(", ")
      val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(ws, x -> x = '$t')) AS BIGINT) AS tf$i"
      }.mkString(",\n  ")
      val contrib = queryTerms.indices.map { i =>
        s"""((CAST(n - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)) *
           | ((CAST(tf$i AS DOUBLE) * 2.2) /
           |  (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + (0.75 * dl) / avgdl)))""".stripMargin
      }.mkString(" + ")
      s"""$wsCte,
         |d AS (SELECT doc_id, ws, CAST(len(ws) AS DOUBLE) AS dl FROM w),
         |c AS (SELECT COUNT(*) AS n, $dfCols,
         |        CAST(SUM(CAST(len(ws) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avgdl
         |      FROM w),
         |t AS (SELECT doc_id, dl, $tfCols FROM d),
         |scored AS (SELECT doc_id, $contrib AS score FROM t CROSS JOIN c)
         |SELECT doc_id, score FROM scored WHERE score > 0
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val tk = toks($"text")
      val d = Tables.load(s, dir, "documents")
        .select($"doc_id", tk.as("tk"), size(tk).cast("double").as("dl"))
      // one corpus pass → one row of constants (N, df_i, avgdl); broadcast
      val constCols = (count(lit(1)).as("n") +:
        queryTerms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains($"tk", t), 1L).otherwise(0L)).as(s"df$i")
        }) :+
        (sum(size($"tk").cast("long")).cast("double") / count(lit(1))).as("avgdl")
      val consts = d.agg(constCols.head, constCols.tail: _*)
      val withTf = d.select(
        ($"doc_id" +: $"dl" +: queryTerms.zipWithIndex.map { case (t, i) =>
          size(filter($"tk", x => x === t)).cast("long").as(s"tf$i")
        }): _*)
      val contrib = queryTerms.indices.map { i =>
        ((($"n" - col(s"df$i")).cast("double") + 0.5) / (col(s"df$i").cast("double") + 0.5)) *
          ((col(s"tf$i").cast("double") * 2.2) /
            (col(s"tf$i").cast("double") + lit(1.2) * (lit(0.25) + (lit(0.75) * $"dl") / $"avgdl")))
      }.reduceLeft(_ + _)
      withTf.crossJoin(broadcast(consts))
        .select($"doc_id", contrib.as("score"))
        .filter($"score" > 0)
        .orderBy($"score".desc, $"doc_id")
        .limit(10)
    },

    // Corpus vocabulary heavy hitters: top-20 terms by total frequency.
    // Map-side partial aggregation makes the shuffle vocabulary-sized;
    // TakeOrderedAndProject keeps the sort at 20 rows per partition.
    GraftQuery.sql("q_heavy_hitters",
      s"""$wsCte
         |SELECT t.w AS term, COUNT(*) AS freq FROM w, unnest(ws) AS t(w)
         |GROUP BY t.w ORDER BY freq DESC, term LIMIT 20""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(explode(toks($"text")).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("freq"))
        .orderBy($"freq".desc, $"term")
        .limit(20)
    },

    // OOV / vocabulary-coverage rate: fraction of each document's tokens
    // outside the corpus top-20 vocabulary — the "UNK rate" a tokenizer
    // pipeline tracks. Two passes: the tiny top-k vocabulary (one
    // partial-aggregated shuffle + 20-row collect, same stance as the IVF
    // centroid literals), then a MAP-ONLY projection scoring every doc
    // against the literal vocab array.
    GraftQuery.sql("q_oov_rate",
      s"""$wsCte,
         |top AS (SELECT t.w AS term FROM w, unnest(ws) AS t(w)
         |        GROUP BY t.w ORDER BY COUNT(*) DESC, t.w LIMIT 20),
         |v AS (SELECT list(term) AS vocab FROM top)
         |SELECT doc_id,
         |  CAST(len(list_filter(ws, x -> NOT list_contains(vocab, x))) AS BIGINT) AS n_oov,
         |  CAST(len(list_filter(ws, x -> NOT list_contains(vocab, x))) AS DOUBLE)
         |    / len(ws) AS oov_rate
         |FROM w CROSS JOIN v ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val vocab = docs.select(explode(toks($"text")).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("freq"))
        .orderBy($"freq".desc, $"term").limit(20)
        .collect().map(_.getString(0)).toSeq
      val tk = toks($"text")
      val oov = size(filter(tk, x => !x.isin(vocab: _*)))
      docs.select($"doc_id", oov.cast("long").as("n_oov"),
          (oov.cast("double") / size(tk)).as("oov_rate"))
        .orderBy("doc_id")
    },

    // Vocabulary cardinality: exact distinct count next to the
    // HyperLogLog++ sketch (rsd 2%) the 100 TB plan would use — the sketch
    // is merge-order-insensitive (register-max), so its value is
    // deterministic for a given dataset; the row asserts it lands within
    // ±5% of exact. The oracle states the exact count and the bound.
    GraftQuery.sql("q_approx_distinct",
      s"""$wsCte
         |SELECT CAST(COUNT(DISTINCT t.w) AS BIGINT) AS n_exact, true AS approx_ok
         |FROM w, unnest(ws) AS t(w)""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(explode(toks($"text")).as("term"))
        .agg(count_distinct($"term").as("n_exact"),
          approx_count_distinct($"term", 0.02).as("approx"))
        .select($"n_exact",
          (abs($"approx" - $"n_exact").cast("double") / $"n_exact" < 0.05)
            .as("approx_ok"))
    },

    // COUNT-MIN SKETCH: term-frequency estimation in FIXED memory — the
    // d×w counter grid (3×64 here) is the whole aggregation state no
    // matter the corpus size, so the shuffle after map-side combine is 192
    // rows where an exact vocabulary count shuffles |vocab|. Estimates are
    // biased high only (min over d salted-hash rows), checked here against
    // the exact counts of the top-5 terms. The bucket hash is the
    // cross-engine md5-low64, so DuckDB replays the whole sketch —
    // counters, probe buckets, min — and the row is hash-exact, not a
    // tolerance check. (A production w is 2^16+; 64 buckets at this corpus
    // size exercises real collisions on purpose.)
    GraftQuery.sql("q_countmin",
      s"""$wsCte,
         |tok AS (SELECT t.w AS w FROM w, unnest(ws) AS t(w)),
         |cnt AS (SELECT j, (md5_number_lower('cms' || CAST(j AS VARCHAR) || ':' || w) & 2147483647) % 64 AS b,
         |          COUNT(*) AS c
         |        FROM tok, unnest(range(0, 3)) AS r(j) GROUP BY 1, 2),
         |top AS (SELECT w AS term, COUNT(*) AS freq FROM tok
         |        GROUP BY w ORDER BY freq DESC, term LIMIT 5)
         |SELECT term, freq, CAST(MIN(c) AS BIGINT) AS cms_est
         |FROM top JOIN cnt
         |  ON cnt.b = (md5_number_lower('cms' || CAST(cnt.j AS VARCHAR) || ':' || term) & 2147483647) % 64
         |GROUP BY term, freq ORDER BY term""".stripMargin) { (s, dir) =>
      import s.implicits._
      def bucketOf(term: org.apache.spark.sql.Column, j: Int) =
        graft.functions.Fingerprints.md5Low64(
          concat(lit(s"cms$j:"), term)).bitwiseAND(0x7fffffffL) % 64
      val tok = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(explode(toks($"text")).as("w"))
        .cache()
      tok.count() // force: both subtrees below read the one materialization
      // both aggregates are tiny (192 sketch cells / top-5 terms) — eagerly
      // checkpointing them lets the token cache be dropped in the finally
      // instead of leaking past the query
      val (cnt, top) = try {
        val cnt0 = tok
          .select(explode(array((0 until 3).map(j =>
            struct(lit(j).as("j"), bucketOf($"w", j).as("b"))): _*)).as("jb"))
          .groupBy($"jb.j".as("j"), $"jb.b".as("b"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val top0 = tok.groupBy($"w".as("term")).agg(count(lit(1)).as("freq"))
          .orderBy($"freq".desc, $"term").limit(5)
          .localCheckpoint()
        (cnt0, top0)
      } finally tok.unpersist(blocking = false)
      val probe = top.select($"term", $"freq",
          explode(array((0 until 3).map(j => struct(lit(j).as("j"),
            bucketOf($"term", j).as("b"))): _*)).as("jb"))
        .select($"term", $"freq", $"jb.j".as("j"), $"jb.b".as("b"))
      cnt.join(broadcast(probe), Seq("j", "b"))
        .groupBy($"term", $"freq")
        .agg(min($"c").cast("long").as("cms_est"))
        .orderBy("term")
    },

    // POSITIONAL PHRASE SEARCH — exact-phrase retrieval over a positional
    // posting list: "big order scan" matches only where the three terms
    // are ADJACENT, which term-level conjunctive search cannot express.
    // The term filter applies map-side BEFORE any shuffle, so only the
    // three phrase terms' postings (doc_id, pos) ever leave the scan —
    // the q_inverted_index stance with positions attached. Adjacency is
    // two (doc_id, pos)-keyed equi-joins (pos arithmetic on the join key;
    // never a within-doc product), then one per-doc aggregate. At 100 TB
    // a standing positional index is this same plan's first projection
    // written bucketed by term.
    GraftQuery.sql("q_phrase_search",
      """WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |p AS (SELECT doc_id, i AS pos, ws[i] AS w
        |      FROM w, unnest(range(1, len(ws) + 1)) AS r(i)
        |      WHERE ws[i] IN ('big', 'order', 'scan')),
        |hits AS (SELECT a.doc_id, a.pos
        |         FROM p a
        |         JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |                  AND b.w = 'order'
        |         JOIN p c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
        |                  AND c.w = 'scan'
        |         WHERE a.w = 'big')
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
        |       CAST(MIN(pos) AS BIGINT) AS first_pos
        |FROM hits GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val phrase = Seq("big", "order", "scan")
      val p = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", posexplode(toks($"text")).as(Seq("pos0", "w")))
        .filter($"w".isin(phrase: _*))
        .select($"doc_id", ($"pos0" + 1).cast("long").as("pos"), $"w")
      val a = p.filter($"w" === "big").select($"doc_id", $"pos")
      val b = p.filter($"w" === "order")
        .select($"doc_id", ($"pos" - 1).as("pos"))
      val c = p.filter($"w" === "scan")
        .select($"doc_id", ($"pos" - 2).as("pos"))
      a.join(b, Seq("doc_id", "pos")).join(c, Seq("doc_id", "pos"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_hits"), min($"pos").as("first_pos"))
        .orderBy("doc_id")
    },

    // TWO-STAGE RETRIEVAL (the RAG serving shape): a cheap lexical
    // RECALL stage — BM25 over the whole corpus, top-20 shortlist via
    // TakeOrderedAndProject (k rows per partition, never a full sort) —
    // feeds an expensive semantic PRECISION stage: the 20 survivors
    // rerank by embedding cosine against the query vector (embeddings
    // 1:1 with documents by id; the query vector is a one-row collect
    // shipped as a literal, the Similarity stance). The shortlist
    // BROADCASTS into the embedding join, so the rerank touches 20
    // embedding rows map-side — at 100 TB the expensive model only ever
    // sees what the cheap stage shortlists, which is the entire point of
    // the architecture. Scores stay rational (the no-ln contract): both
    // stages replay bit-exactly in the oracle.
    GraftQuery.sql("q_retrieval_rerank", {
      val dfCols = queryTerms.zipWithIndex.map { case (t, i) =>
        s"SUM(CASE WHEN list_contains(ws, '$t') THEN 1 ELSE 0 END) AS df$i"
      }.mkString(", ")
      val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(ws, x -> x = '$t')) AS BIGINT) AS tf$i"
      }.mkString(",\n  ")
      val contrib = queryTerms.indices.map { i =>
        s"""((CAST(n - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)) *
           | ((CAST(tf$i AS DOUBLE) * 2.2) /
           |  (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + (0.75 * dl) / avgdl)))""".stripMargin
      }.mkString(" + ")
      s"""$wsCte,
         |d AS (SELECT doc_id, ws, CAST(len(ws) AS DOUBLE) AS dl FROM w),
         |c AS (SELECT COUNT(*) AS n, $dfCols,
         |        CAST(SUM(CAST(len(ws) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avgdl
         |      FROM w),
         |t AS (SELECT doc_id, dl, $tfCols FROM d),
         |scored AS (SELECT doc_id, $contrib AS score FROM t CROSS JOIN c),
         |short AS (SELECT doc_id, score FROM scored WHERE score > 0
         |          ORDER BY score DESC, doc_id LIMIT 20),
         |e AS (SELECT vec_id, list_transform(embedding,
         |        x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |en AS (SELECT vec_id, v, list_reduce(list_transform(v, x -> x * x),
         |         (a, b) -> a + b) AS n2 FROM e),
         |qv AS (SELECT v AS qvec, n2 AS qn2 FROM en WHERE vec_id = 7),
         |rr AS (SELECT short.doc_id, short.score AS bm25,
         |         list_reduce(list_transform(list_zip(en.v, qv.qvec),
         |           z -> z[1] * z[2]), (u, w2) -> u + w2)
         |           / sqrt(en.n2 * qv.qn2) AS cosine
         |       FROM short JOIN en ON short.doc_id = en.vec_id CROSS JOIN qv)
         |SELECT doc_id, bm25, cosine,
         |  CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT)
         |    AS rnk
         |FROM rr ORDER BY cosine DESC, doc_id LIMIT 5""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import graft.functions.ArrayMath
      // stage 1: BM25 recall (the q_bm25 plan), top-20 shortlist
      val tk = toks($"text")
      val d = Tables.load(s, dir, "documents")
        .select($"doc_id", tk.as("tk"), size(tk).cast("double").as("dl"))
      val constCols = (count(lit(1)).as("n") +:
        queryTerms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains($"tk", t), 1L).otherwise(0L)).as(s"df$i")
        }) :+
        (sum(size($"tk").cast("long")).cast("double") / count(lit(1)))
          .as("avgdl")
      val consts = d.agg(constCols.head, constCols.tail: _*)
      val withTf = d.select(
        ($"doc_id" +: $"dl" +: queryTerms.zipWithIndex.map { case (t, i) =>
          size(filter($"tk", x => x === t)).cast("long").as(s"tf$i")
        }): _*)
      val contrib = queryTerms.indices.map { i =>
        ((($"n" - col(s"df$i")).cast("double") + 0.5) /
          (col(s"df$i").cast("double") + 0.5)) *
          ((col(s"tf$i").cast("double") * 2.2) /
            (col(s"tf$i").cast("double") +
              lit(1.2) * (lit(0.25) + (lit(0.75) * $"dl") / $"avgdl")))
      }.reduceLeft(_ + _)
      val short = withTf.crossJoin(broadcast(consts))
        .select($"doc_id", contrib.as("bm25"))
        .filter($"bm25" > 0)
        .orderBy($"bm25".desc, $"doc_id")
        .limit(20)
      // stage 2: semantic rerank of the shortlist only
      val en = Tables.load(s, dir, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .withColumn("n2", ArrayMath.dot($"v", $"v"))
      // absent query vector → the oracle's empty qv CTE (CROSS JOIN qv)
      // empties the result; mirror with an empty frame of the same schema
      en.filter($"vec_id" === 7).select($"v", $"n2").collect().headOption
        .fold {
          en.limit(0).select($"vec_id".as("doc_id"), $"n2".as("bm25"),
            $"n2".as("cosine"), lit(0L).as("rnk"))
        } { q =>
          val (qvec, qn2) = (q.getSeq[Double](0), q.getDouble(1))
          en.join(broadcast(short), $"vec_id" === $"doc_id")
            .select($"doc_id", $"bm25",
              (ArrayMath.dot($"v", typedlit(qvec)) / sqrt($"n2" * lit(qn2)))
                .as("cosine"))
            .withColumn("rnk", row_number().over(
              Window.orderBy($"cosine".desc, $"doc_id")).cast("long"))
            .orderBy($"cosine".desc, $"doc_id")
            .limit(5)
        }
    },
  )
}
