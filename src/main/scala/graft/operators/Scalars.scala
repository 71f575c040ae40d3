package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{Fiat2, GraftQuery, Tables}

/** Scalar expression surface of the reference — EAtom/EIf/ELet/unops/binops
  * (SURVEY.md §2.2-2.3) — compiled to codegen'd Column expressions.
  */
object Scalars {

  val queries: Seq[GraftQuery] = Seq(

    // EIf + ELet + ONot/ONeg/OLength(String)/OConcatString/OIntToString/OLess
    // (fiat2/src/fiat2/Interpret.v:33-60,137-202) as one projection.
    GraftQuery.sql("q_scalar_ops",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS bucket,
        |  CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
        |  o_orderstatus || '-' || o_orderpriority AS tag,
        |  -o_custkey AS neg_cust,
        |  NOT (o_totalprice > 100000) AS is_small,
        |  CAST(o_orderkey AS VARCHAR) AS okey_str
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "orders").select(
        $"o_orderkey",
        when($"o_totalprice" > 100000, "big").otherwise("small").as("bucket"),
        length($"o_orderpriority").cast("long").as("prio_len"),
        concat($"o_orderstatus", lit("-"), $"o_orderpriority").as("tag"),
        (-$"o_custkey").as("neg_cust"),
        (!($"o_totalprice" > 100000)).as("is_small"),
        $"o_orderkey".cast("string").as("okey_str"))
        .orderBy("o_orderkey")
    },

    // ODiv/OMod with Coq Z floor semantics incl. negative dividends/divisors
    // (fiat2/src/fiat2/Interpret.v:147,150) — Fiat2.ediv/emod, pure long
    // arithmetic, no UDF. The oracle spells out the same floor formula.
    GraftQuery.sql("q_ediv_emod",
      """SELECT o_orderkey,
        |  CAST((x - (((x % 7) + 7) % 7)) // 7 AS BIGINT) AS d7,
        |  CAST(((x % 7) + 7) % 7 AS BIGINT) AS m7,
        |  CAST((x - (((x % -7) + -7) % -7)) // -7 AS BIGINT) AS dn7,
        |  CAST(((x % -7) + -7) % -7 AS BIGINT) AS mn7
        |FROM (SELECT o_orderkey, o_orderkey - 700 AS x FROM orders)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val x = $"o_orderkey" - 700
      Tables.load(s, dir, "orders").select(
        $"o_orderkey",
        Fiat2.ediv(x, lit(7L)).as("d7"),
        Fiat2.emod(x, lit(7L)).as("m7"),
        Fiat2.ediv(x, lit(-7L)).as("dn7"),
        Fiat2.emod(x, lit(-7L)).as("mn7"))
        .orderBy("o_orderkey")
    },

    // TOption/OSome/EOptMatch (fiat2/src/fiat2/Interpret.v:340-345): build an
    // option with NULLIF, then match on it.
    GraftQuery.sql("q_option_match",
      """SELECT matched, COUNT(*) AS n FROM (
        |  SELECT CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 'none'
        |              ELSE 'some:' || NULLIF(o_orderstatus, 'O') END AS matched
        |  FROM orders) GROUP BY matched ORDER BY matched""".stripMargin) { (s, dir) =>
      import s.implicits._
      val opt = when($"o_orderstatus" === "O", lit(null)).otherwise($"o_orderstatus")
      Tables.load(s, dir, "orders")
        .select(Fiat2.optMatch(opt, lit("none"),
          v => concat(lit("some:"), v)).as("matched"))
        .groupBy("matched").agg(count(lit(1)).as("n"))
        .orderBy("matched")
    },

    // ERecord (name-sorted) + EAccess (fiat2/src/fiat2/Interpret.v:334-339):
    // build a record, project fields back out.
    GraftQuery.sql("q_record_access",
      """SELECT c_custkey AS rec_key, c_name AS rec_name
        |FROM customer ORDER BY rec_key""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "customer")
        .select(Fiat2.record(
          "name" -> $"c_name", "key" -> $"c_custkey", "bal" -> $"c_acctbal")
          .as("rec"))
        .select($"rec"("key").as("rec_key"), $"rec"("name").as("rec_name"))
        .orderBy("rec_key")
    },
  )
}
