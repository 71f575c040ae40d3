package graft.lang

import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}

/** End-to-end programs written in the `Lang` AST, compiled by `Compiler` /
  * run by `Interp`, proving the language layer against the same DuckDB
  * oracles as the direct DataFrame queries.
  */
object LangQueries {
  import Lang._
  import Compiler._

  val queries: Seq[GraftQuery] = Seq(

    // Ex_Employee (fiat2/src/fiat2/Ex_Employee.v:23-27) as an AST program:
    // join suppliers to nations, project {emp,dept}, sort.
    GraftQuery.sql("q_lang_employee",
      """SELECT s_name AS emp_name, n_name AS dept_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY dept_name, emp_name""".stripMargin) { (s, dir) =>
      val prog = ESort(LikeList, EJoin(LikeBag,
        ELoc("supplier"), ELoc("nation"), "e", "d",
        EBinop(OEq, EAccess(EVar("e"), "s_nationkey"),
          EAccess(EVar("d"), "n_nationkey")),
        ERecord(List(
          "emp_name" -> EAccess(EVar("e"), "s_name"),
          "dept_name" -> EAccess(EVar("d"), "n_name")))))
      val env = Env(Map.empty, Map(
        "supplier" -> Tables.load(s, dir, "supplier"),
        "nation" -> Tables.load(s, dir, "nation")), s)
      compile(prog, env).asInstanceOf[TV].df
    },

    // filter → project → AC-fold sum as an AST program; the filter predicate
    // reaches the parquet scan through the compiled plan.
    GraftQuery.sql("q_lang_agg",
      """SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin) { (s, dir) =>
      val prog = EACFold(AGSum, EProj(LikeBag,
        EFilter(LikeBag, ELoc("lineitem"), "l",
          EBinop(OEq, EAccess(EVar("l"), "l_returnflag"), EAtom(AString("R")))),
        "l", EAccess(EVar("l"), "l_qty")))
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("long").as("l_qty"))
      val env = Env(Map.empty, Map("lineitem" -> li), s)
      compile(prog, env).asInstanceOf[TV].df
        .select(col("value").as("total_qty"))
    },

    // A monad-comprehension program — `c <- customer; n <- nation;
    // check(c.key == n.key); ret {cust, nat}` — exactly what the reference's
    // notation desugars to (nested flatmap/if/cons, Notations.v:144-149).
    // `Rewrites.normalize` RECOGNIZES the join (to_join_head) so the compiled
    // plan is a real equi-join, not a filtered cross product.
    GraftQuery.sql("q_lang_comprehension",
      """SELECT c_name AS cust, n_name AS nat
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY cust, nat""".stripMargin) { (s, dir) =>
      val rowT = TRecord.sorted("cust" -> TString, "nat" -> TString)
      val comp = EFlatmap(LikeBag, ELoc("customer"), "c",
        EFlatmap(LikeBag, ELoc("nation"), "n",
          EIf(EBinop(OEq, EAccess(EVar("c"), "c_nationkey"),
            EAccess(EVar("n"), "n_nationkey")),
            EBinop(OCons, ERecord(List(
              "cust" -> EAccess(EVar("c"), "c_name"),
              "nat" -> EAccess(EVar("n"), "n_name"))),
              EAtom(ANil(rowT))),
            EAtom(ANil(rowT)))))
      val prog = ESort(LikeList, comp)
      // the reference lifecycle (SURVEY.md §3.1): typecheck → optimize →
      // execute. Table types declared as in fiat2's Gstore.
      val storeTypes = Map(
        "customer" -> TBag(TRecord.sorted(
          "c_custkey" -> TInt, "c_name" -> TString, "c_nationkey" -> TInt,
          "c_acctbal" -> TInt, "c_mktsegment" -> TString)),
        "nation" -> TBag(TRecord.sorted(
          "n_nationkey" -> TInt, "n_name" -> TString, "n_regionkey" -> TInt)))
      require(TypeCheck.synthesize(prog, Map.empty, storeTypes) == TList(rowT))
      val env = Env(Map.empty, Map(
        "customer" -> Tables.load(s, dir, "customer"),
        "nation" -> Tables.load(s, dir, "nation")), s)
      compileProgram(prog, env).asInstanceOf[TV].df
    },

    // Self-join THROUGH the language (the Ex_Family/Ex_Triangle shape): both
    // join operands are the same table; the compiler's aliasing resolves the
    // two row variables to distinct sides.
    GraftQuery.sql("q_lang_selfjoin",
      """SELECT n1.n_nationkey AS a, n2.n_nationkey AS b, n1.n_regionkey AS rk
        |FROM nation n1 JOIN nation n2
        |  ON n1.n_regionkey = n2.n_regionkey
        | AND n1.n_nationkey < n2.n_nationkey
        |ORDER BY a, b, rk""".stripMargin) { (s, dir) =>
      val prog = ESort(LikeList, EJoin(LikeBag, ELoc("nation"), ELoc("nation"),
        "x", "y",
        EBinop(OAnd,
          EBinop(OEq, EAccess(EVar("x"), "n_regionkey"),
            EAccess(EVar("y"), "n_regionkey")),
          EBinop(OLess, EAccess(EVar("x"), "n_nationkey"),
            EAccess(EVar("y"), "n_nationkey"))),
        ERecord(List(
          "a" -> EAccess(EVar("x"), "n_nationkey"),
          "b" -> EAccess(EVar("y"), "n_nationkey"),
          "rk" -> EAccess(EVar("x"), "n_regionkey")))))
      val env = Env(Map.empty,
        Map("nation" -> Tables.load(s, dir, "nation")), s)
      compileProgram(prog, env).asInstanceOf[TV].df
    },

    // General EFold over a (small) table: defined on canonical value order;
    // the non-associative step (rolling hash) is exactly what EACFold can't
    // express. The oracle folds the same ordered list with list_reduce.
    GraftQuery.sql("q_lang_fold",
      """SELECT CAST(list_reduce(list(CAST(r_regionkey AS BIGINT) ORDER BY r_regionkey),
        |                        (a, b) -> a * 31 + b) AS BIGINT) AS h
        |FROM region""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      val prog = EFold(ELoc("keys"), EAtom(AInt(0)), "x", "acc",
        EBinop(OPlus, EBinop(OTimes, EVar("acc"), EAtom(AInt(31))), EVar("x")))
      val keys = Tables.load(s, dir, "region")
        .select(col("r_regionkey").cast("long").as("value"))
      val env = Env(Map.empty, Map("keys" -> keys), s)
      val h = compileProgram(prog, env).asInstanceOf[CV].c
      s.range(1).select(h.cast("long").as("h"))
    },

    // Command layer: CLetMut + CForeach + CAssign/OCons — the reference's
    // event-loop idiom (fiat2/src/fiat2/Ex_Orders.v:54): for each key in a
    // literal list, count matching events and cons the result onto an output
    // table.
    GraftQuery.sql("q_lang_command",
      // LEFT JOIN from the key list so a key with zero events still yields a
      // (k, 0) row — matching the CForeach, which emits one record per key
      // unconditionally
      """SELECT CAST(k AS BIGINT) AS k, COUNT(user_id) AS n
        |FROM (VALUES (1), (2), (3)) t(k)
        |LEFT JOIN events ON user_id = k
        |GROUP BY k ORDER BY k""".stripMargin) { (s, dir) =>
      val keys = List(1L, 2L, 3L).foldRight[Expr](EAtom(ANil(TInt))) {
        (k, acc) => EBinop(OCons, EAtom(AInt(k)), acc)
      }
      val countFor = (k: Expr) => EUnop(OLength,
        EFilter(LikeBag, ELoc("events"), "ev",
          EBinop(OEq, EAccess(EVar("ev"), "user_id"), k)))
      val prog = CLetMut(
        EAtom(ANil(TRecord.sorted("k" -> TInt, "n" -> TInt))), "out",
        CSeq(
          CForeach(keys, "kv",
            CAssign("out", EBinop(OCons,
              ERecord(List("k" -> EVar("kv"), "n" -> countFor(EVar("kv")))),
              ELoc("out")))),
          CAssign("result", ELoc("out"))))
      val events = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"))
      val env = Env(Map.empty, Map("events" -> events), s)
      Interp.run(prog, env).store("result").orderBy("k")
    },
  )
}
