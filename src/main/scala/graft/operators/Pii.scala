package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}
import graft.functions.Fingerprints

/** PII detection and redaction — the scrub pass a web-scale training
  * pipeline runs before anything else sees the text (emails, phone
  * numbers, IP addresses → typed placeholder tokens). MAP-ONLY: detection
  * and redaction are projections (codegen'd regexp expressions), so the
  * 100 TB plan is scan → project → write; only the tiny per-source audit
  * aggregate shuffles.
  *
  * The synthetic corpus contains no organic PII, so the queries INJECT a
  * deterministic contact line per document (derived from doc_id) before
  * scrubbing — the patterns, the injection, and the redaction all replay
  * exactly in DuckDB, making the whole scrubber hash-checked rather than
  * rows-only. Patterns stay inside the regex subset Java and RE2 (DuckDB)
  * interpret identically: character classes, bounded repetition,
  * alternation — no backreferences, no lookaround.
  */
object Pii {

  /** Pattern set; each maps to its placeholder. Order matters (emails are
    * scrubbed before IPs so an address inside a mail host is typed EMAIL). */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val PhoneRe = "555-[0-9]{2,4}"

  /** Deterministic injected contact line (pure integer/string ops — both
    * engines render identical text). */
  private def injected(docId: Column, text: Column): Column =
    concat(text, lit(" reach u"), docId.cast("string"),
      lit("@mail.example.org or 10.0."), (docId % 256).cast("string"),
      lit("."), (docId % 100).cast("string"),
      lit(" tel 555-"), ((docId % 90) + 10).cast("string"))

  /** Chained typed redaction. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
        lit(Ipv4Re), lit("<IP>")),
      lit(PhoneRe), lit("<PHONE>"))

  private val injectSql =
    """text || ' reach u' || CAST(doc_id AS VARCHAR) ||
      |'@mail.example.org or 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
      |'.' || CAST(doc_id % 100 AS VARCHAR) ||
      |' tel 555-' || CAST(doc_id % 90 + 10 AS VARCHAR)""".stripMargin

  val queries: Seq[GraftQuery] = Seq(

    // PII scrub audit: per-source document count, per-type match counts,
    // and a content checksum of the REDACTED text (cross-engine md5-low64,
    // 31-bit masked) — so the oracle verifies the rewritten strings
    // byte-for-byte, not just the counts. One projection + one tiny
    // aggregate: nothing but the per-source rollup ever shuffles.
    GraftQuery.sql("q_pii_redact",
      s"""WITH t AS (SELECT doc_id, source, $injectSql AS tx FROM documents),
         |r AS (SELECT source,
         |        len(regexp_extract_all(tx, '$EmailRe')) AS ne,
         |        len(regexp_extract_all(regexp_replace(tx, '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re')) AS ni,
         |        len(regexp_extract_all(tx, '555-[0-9]{2,4}')) AS np,
         |        regexp_replace(regexp_replace(regexp_replace(tx,
         |          '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'),
         |          '555-[0-9]{2,4}', '<PHONE>', 'g') AS red
         |      FROM t)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(ne) AS BIGINT) AS emails,
         |  CAST(SUM(ni) AS BIGINT) AS ips,
         |  CAST(SUM(np) AS BIGINT) AS phones,
         |  CAST(SUM(md5_number_lower(red) & 2147483647) AS BIGINT) AS red_sum
         |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      import s.implicits._
      val t = Tables.load(s, dir, "documents")
        .select($"source", injected($"doc_id", $"text").as("tx"))
      val afterEmail = regexp_replace($"tx", lit(EmailRe), lit("<EMAIL>"))
      t.select($"source",
          size(regexp_extract_all($"tx", lit(EmailRe), lit(0))).as("ne"),
          size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))).as("ni"),
          size(regexp_extract_all($"tx", lit(PhoneRe), lit(0))).as("np"),
          redact($"tx").as("red"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"ne").cast("long").as("emails"),
          sum($"ni").cast("long").as("ips"),
          sum($"np").cast("long").as("phones"),
          sum(Fingerprints.md5Low64($"red").bitwiseAND(0x7fffffffL))
            .cast("long").as("red_sum"))
        .orderBy("source")
    })
}
