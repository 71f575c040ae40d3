package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{GraftQuery, Tables}

/** The reference's remaining index structures (SURVEY.md §2.8) as physical
  * designs: pk index (row-id → row dict, fiat2/src/fiat2/BitmapIndex.v:13-18)
  * and bitmap index (predicate-aligned boolean vector,
  * fiat2/src/fiat2/BitmapIndex.v:331-335). The dict index and materialized
  * sum/min aggregates live in DictIndex/Ivm.
  */
object Indexes {
  private val D = DecimalType(18, 2)

  val queries: Seq[GraftQuery] = Seq(

    // pk index: key the table by its primary key once (one shuffle, cached),
    // then serve point reads — `use_pk_idx_head` (BitmapIndex.v:545) as a
    // keyed cache instead of a rewrite.
    GraftQuery.sql("q_pk_index_lookup",
      """SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price
        |FROM orders WHERE o_orderkey IN (11, 222, 1033)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val idx = DictIndex.build(Tables.load(s, dir, "orders"), "o_orderkey")
      idx.lookupMany(Seq(11L, 222L, 1033L))
        .select($"o_orderkey", $"o_custkey",
          $"o_totalprice".cast("double").as("price"))
        .orderBy("o_orderkey")
    },

    // The reference's AUTOMATIC rewrite at the Catalyst level
    // (plans/KeyedIndexRule — eq_filter_to_lookup as a Rule[LogicalPlan]):
    // after registration, the query below is a PLAIN DataFrame filter —
    // no index API in sight — and the optimizer rule swaps its parquet
    // scan for the keyed in-memory index. Plan-asserted in
    // PlanQualitySpec; the oracle proves the rewrite preserved results.
    GraftQuery.sql("q_rule_index_lookup",
      """SELECT COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders WHERE o_custkey = 17""".stripMargin) { (s, dir) =>
      import s.implicits._
      graft.plans.KeyedIndexRule.register(
        s, Tables.load(s, dir, "orders"), "o_custkey")
      // user code from here on: an ordinary filter over the ordinary table
      Tables.load(s, dir, "orders")
        .filter($"o_custkey" === 17L)
        .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
    },

    // bitmap index: precompute the predicate as a boolean column ONCE
    // (`filter_to_bitmap_lookup_head`, BitmapIndex.v:811-831); subsequent
    // queries aggregate the bitmap instead of re-evaluating the predicate.
    // At parquet scale the same effect comes from dictionary/min-max filters.
    GraftQuery.sql("q_bitmap_index",
      """SELECT l_returnflag, COUNT(*) AS n_flagged,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      import s.implicits._
      val bitmap = Tables.load(s, dir, "lineitem")
        .select($"l_returnflag", $"l_quantity",
          ($"l_returnflag" === "R").as("bit_r"))
        .cache()
      bitmap.filter($"bit_r")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_flagged"),
          sum($"l_quantity".cast(D)).cast("double").as("qty"))
    },

    // §2.1 sink analog of the server's object-language `generate_json`
    // (haskellServer/src/Extracted.hs:2721): rows → compact JSON strings.
    GraftQuery.sql("q_json_sink",
      """SELECT to_json(struct_pack(key := CAST(n_nationkey AS BIGINT), name := n_name)) AS doc
        |FROM nation ORDER BY doc""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "nation")
        .select(to_json(struct($"n_nationkey".cast("long").as("key"),
          $"n_name".as("name"))).as("doc"))
        .orderBy("doc")
    },
  )
}
