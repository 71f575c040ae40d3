package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{Fiat2, GraftQuery, Tables}

/** Collection pipeline operators — EFlatmap / EFlatmap2 / EFold / EDictFold /
  * ESort / EBagOf / ESetOf / OConcat / OCons / ORange / dict ops
  * (SURVEY.md §2.3-2.4). Top-level collections are DataFrames; nested ones are
  * canonical sorted arrays per SURVEY.md §1.5.
  */
object Collections {
  private val D = DecimalType(18, 2)

  val queries: Seq[GraftQuery] = Seq(

    // EFlatmap + ORange (fiat2/src/fiat2/Interpret.v:273-299,80-90): each
    // supplier emits [0, suppkey%5 + 1) rows — SQL LATERAL unnest.
    GraftQuery.sql("q_range_flatmap",
      """SELECT s_suppkey, u AS i
        |FROM supplier, unnest(range(0, (s_suppkey % 5) + 1)) AS t(u)
        |ORDER BY s_suppkey, i""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "supplier")
        .select($"s_suppkey",
          explode(Fiat2.rangeList(lit(0L), ($"s_suppkey" % 5) + 1)).as("i"))
        .orderBy("s_suppkey", "i")
    },

    // OConcat at table level = unionAll (fiat2/src/fiat2/Interpret.v:153-156).
    GraftQuery.sql("q_concat_union",
      """SELECT s_name AS name FROM supplier
        |UNION ALL SELECT c_name FROM customer ORDER BY name""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "supplier").select($"s_name".as("name"))
        .union(Tables.load(s, dir, "customer").select($"c_name"))
        .orderBy("name")
    },

    // OCons on a table = INSERT as union of a 1-row DF
    // (fiat2/src/fiat2/Interpret.v:174-177; SURVEY.md §4.3).
    GraftQuery.sql("q_cons_insert",
      """SELECT CAST(99 AS INTEGER) AS r_regionkey, 'REGION_NEW' AS r_name
        |UNION ALL SELECT r_regionkey, r_name FROM region
        |ORDER BY r_regionkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val one = s.range(1).select(lit(99).cast("int").as("r_regionkey"),
        lit("REGION_NEW").as("r_name"))
      one.union(Tables.load(s, dir, "region")).orderBy("r_regionkey")
    },

    // ESort by universal value order (fiat2/src/fiat2/Interpret.v:351-368):
    // order by every column left-to-right = value_compare on name-sorted rows.
    GraftQuery.sql("q_sort_value_order",
      """SELECT n_name, n_nationkey, n_regionkey FROM nation
        |ORDER BY n_name, n_nationkey, n_regionkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "nation")
        .select($"n_name", $"n_nationkey", $"n_regionkey")
        .orderBy("n_name", "n_nationkey", "n_regionkey")
    },

    // ESetOf = distinct (fiat2/src/fiat2/Interpret.v:491-498).
    GraftQuery.sql("q_setof_distinct",
      "SELECT DISTINCT c_mktsegment AS segment FROM customer ORDER BY segment") { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "customer").select($"c_mktsegment".as("segment"))
        .distinct().orderBy("segment")
    },

    // TBag canonical form = (value, multiplicity) pairs
    // (fiat2/src/fiat2/Interpret.v:112-124) at table level.
    GraftQuery.sql("q_bag_multiplicity",
      """SELECT o_orderstatus AS value, COUNT(*) AS mult
        |FROM orders GROUP BY o_orderstatus ORDER BY value""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "orders").groupBy($"o_orderstatus".as("value"))
        .agg(count(lit(1)).as("mult")).orderBy("value")
    },

    // The reference's NESTED-bag (value, count) encoding (fiat2
    // `list_to_bag`, fiat2/src/fiat2/Interpret.v:112-124), produced by the
    // O(n log n) run-length converter: per region, the bag of nation-name
    // final characters as canonical sorted pairs, serialized to JSON so the
    // exact encoding (order, counts) is what the oracle compares. `pos`
    // additionally RANKS the bags under the reference's `bag_compare` —
    // lexicographic over the (value, count) pairs (fiat2/src/fiat2/
    // Value.v:110-113), the order CanonOrder keys realize engine-side —
    // pinning bag-in-collection sort position against the oracle (r11).
    GraftQuery.sql("q_bag_encoding",
      """WITH c AS (
        |  SELECT n_regionkey AS rk, substr(n_name, -1, 1) AS v, COUNT(*) AS cnt
        |  FROM nation GROUP BY 1, 2),
        |b AS (
        |  SELECT CAST(rk AS BIGINT) AS rk,
        |    list_sort(list(struct_pack(value := v, count := cnt))) AS pairs
        |  FROM c GROUP BY rk)
        |SELECT rk, to_json(pairs) AS bag,
        |  CAST(rank() OVER (ORDER BY pairs) AS BIGINT) AS pos
        |FROM b ORDER BY rk""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      Tables.load(s, dir, "nation")
        .groupBy($"n_regionkey".cast("long").as("rk"))
        .agg(collect_list(substring($"n_name", -1, 1)).as("vs"))
        .select($"rk", Fiat2.bagOfArray($"vs").as("pairs"))
        .select($"rk", to_json($"pairs").as("bag"),
          rank().over(Window.orderBy($"pairs")).cast("long").as("pos"))
        .orderBy("rk")
    },

    // ESort over a COLLECTION OF WORDS sorts UNSIGNED (`value_compare` via
    // `word.ltu`, fiat2/src/fiat2/Value.v:118-119) — the CanonOrder
    // sign-bit key path, oracle-pinned (r11): per order, the lineitems'
    // partkey-derived words (spanning the 2^63 sign boundary) sorted by
    // the LANG-compiled ESort, with positions. The DuckDB oracle realizes
    // unsigned 64-bit order as (w < 0, w): non-negatives ascending first,
    // then negatives ascending (= residues 2^63..2^64-1).
    GraftQuery.sql("q_sort_word_unsigned",
      """WITH w AS (
        |  SELECT l_orderkey AS k,
        |    ((l_partkey % 200000) - 1000) * 35184372088832 AS w
        |  FROM lineitem)
        |SELECT k, w,
        |  CAST(row_number() OVER (PARTITION BY k ORDER BY (w < 0), w) - 1
        |    AS BIGINT) AS pos
        |FROM w ORDER BY k, pos""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.lang.{Compiler, Lang}
      import Lang._
      // the % 200000 residue keeps the 2^45 scaling inside Long at ANY
      // data scale (shifted/regenerated partkeys included) while being the
      // identity at the oracle SFs (partkey <= 20000 there)
      val grouped = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey".as("k"),
          ((($"l_partkey" % 200000) - 1000).cast("long")
            * 35184372088832L).as("w"))
        .groupBy($"k").agg(collect_list($"w").as("xs"))
      // the engine's own ESort over a TList(TWord) value — compiles to the
      // decorate-sort-undecorate unsigned-key form, all inside codegen
      val sorted = Compiler.compile(ESort(LikeList, EVar("xs")),
        Compiler.Env(Map("xs" -> Compiler.CV(col("xs"))), Map.empty, s,
          varTypes = Map("xs" -> TList(TWord)))) match {
        case Compiler.CV(c) => c
        case other => sys.error(s"scalar sort expected, got $other")
      }
      grouped
        .select($"k", posexplode(sorted).as(Seq("pos", "w")))
        .select($"k", $"pos".cast("long").as("pos"), $"w")
        .orderBy("k", "pos")
    },

    // EFold over a nested list (fiat2/src/fiat2/Interpret.v:313-319): per
    // order, fold sum-of-squares over its sorted linenumber list via the
    // codegen'd higher-order `aggregate`.
    GraftQuery.sql("q_fold_sumsq",
      """SELECT l_orderkey, CAST(SUM(CAST(l_linenumber AS BIGINT) * l_linenumber) AS BIGINT) AS sumsq
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_list($"l_linenumber")).as("lines"))
        .select($"l_orderkey",
          aggregate($"lines", lit(0L),
            (acc, x) => acc + x.cast("long") * x).as("sumsq"))
        .orderBy("l_orderkey")
    },

    // EFlatmap2: lockstep zip of two lists (fiat2/src/fiat2/Interpret.v:300-312)
    // — zip quantities with prices (both ordered by linenumber), fold the dot
    // product in exact DECIMAL.
    GraftQuery.sql("q_flatmap2_dot",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS dot
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val byLine = sort_array(collect_list(struct($"l_linenumber".as("i"),
        $"l_quantity".cast(D).as("q"), $"l_extendedprice".cast(D).as("p"))))
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_orderkey").agg(byLine.as("rows"))
        .select($"l_orderkey",
          aggregate(
            zip_with(
              transform($"rows", e => e("q")),
              transform($"rows", e => e("p")),
              (a, b) => a * b),
            lit(0).cast(DecimalType(38, 4)),
            (acc, x) => acc + x).cast("double").as("dot"))
        .orderBy("l_orderkey")
    },

    // TDict as sorted entries + OLookup/OInsert/ODelete/EDictFold
    // (fiat2/src/fiat2/Interpret.v:92-110,194-210,346-350): build a dict of
    // nations per region, delete key 3, re-insert it, look keys up, and fold
    // the entry count.
    GraftQuery.sql("q_dict_ops",
      """SELECT n_regionkey, 'REPLACED' AS lookup3,
        |  MAX(CASE WHEN n_nationkey = 2 THEN n_name END) AS lookup2,
        |  COUNT(*) AS n_entries
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "nation")
        .groupBy($"n_regionkey")
        .agg(sort_array(collect_list(struct(
          $"n_nationkey".cast("long").as("key"), $"n_name".as("value"))))
          .as("dict"))
        .select($"n_regionkey",
          Fiat2.dictLookup(
            Fiat2.dictInsert(Fiat2.dictDelete($"dict", lit(3L)),
              lit(3L), lit("REPLACED")),
            lit(3L)).as("lookup3"),
          Fiat2.dictLookup($"dict", lit(2L)).as("lookup2"),
          Fiat2.dictFold($"dict", lit(0L), (acc, _) => acc + 1).as("n_entries"))
        .orderBy("n_regionkey")
    },
  )
}
