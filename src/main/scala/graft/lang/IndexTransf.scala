package graft.lang

import graft.operators.DictIndex

/** AUTOMATIC index introduction — the reference's signature behavior: after
  * `transf_to_idx` (fiat2/src/fiat2/IndexTransf.v:797-803) a table is stored
  * as an index structure and `eq_filter_to_lookup_head`
  * (fiat2/src/fiat2/DictIndexImpl.v:374-389) rewrites a PLAIN
  * `filter(tbl, row.attr == k)` into a dict lookup with no user action.
  *
  * Spark analog: a static pass over the command AST finds tables that are
  * point-filtered on an attribute inside a `CForeach` body (the shape whose
  * repeated scans an index amortizes), and re-represents each such table in
  * the store as a key-hash-partitioned cached DataFrame (`DictIndex.build`).
  * The program text is untouched — the filters now execute against the
  * in-memory keyed index (first iteration fills the cache; every later
  * iteration is a cache-partition point lookup, not a source rescan), which
  * is exactly the amortization trade the reference proves sound.
  */
object IndexTransf {
  import Lang._

  /** Run a command with automatic index introduction. */
  def runIndexed(c: Command, env: Compiler.Env): Compiler.Env =
    Interp.run(c, indexStore(c, env))

  /** Replace every loop-point-filtered store table with its keyed index.
    * One index per table (the reference's composed `compo_idx` — several
    * indexes maintained on one table — would hash-partition by the first
    * attribute and cluster secondaries; here first-attribute-wins). */
  def indexStore(c: Command, env: Compiler.Env): Compiler.Env = {
    val byTable = loopEqFilters(c, inLoop = false).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2))
    byTable.foldLeft(env) { case (acc, (t, attrs)) =>
      acc.store.get(t) match {
        case Some(df) if attrs.headOption.exists(df.columns.contains) =>
          val idx = DictIndex.build(df, attrs.head,
            df.sparkSession.sparkContext.defaultParallelism)
          acc.copy(store = acc.store + (t -> idx.keyed))
        case _ => acc
      }
    }
  }

  /** (table, attr) pairs appearing as `filter(ELoc(table), x => x.attr == k)`
    * with the filter nested inside at least one CForeach body. */
  private def loopEqFilters(c: Command, inLoop: Boolean): Seq[(String, String)] =
    c match {
      case CSkip => Nil
      case CSeq(a, b) => loopEqFilters(a, inLoop) ++ loopEqFilters(b, inLoop)
      case CLet(e, _, b) => eqFilters(e, inLoop) ++ loopEqFilters(b, inLoop)
      case CLetMut(e, _, b) => eqFilters(e, inLoop) ++ loopEqFilters(b, inLoop)
      case CAssign(_, e) => eqFilters(e, inLoop)
      case CIf(e, a, b) =>
        eqFilters(e, inLoop) ++ loopEqFilters(a, inLoop) ++ loopEqFilters(b, inLoop)
      case CForeach(e, _, b) =>
        eqFilters(e, inLoop) ++ loopEqFilters(b, inLoop = true)
    }

  private def eqFilters(e: Expr, inLoop: Boolean): Seq[(String, String)] = {
    val here = e match {
      case EFilter(_, ELoc(t), x, p) if inLoop => eqAttr(x, p).map(t -> _).toSeq
      case _ => Nil
    }
    here ++ children(e).flatMap(eqFilters(_, inLoop))
  }

  /** `x.attr == k` or `k == x.attr`, k not mentioning x (a correlated k
    * would change per row — not a point lookup). */
  private def eqAttr(x: String, p: Expr): Option[String] = p match {
    case EBinop(OEq, EAccess(EVar(`x`), a), k) if !mentions(k, x) => Some(a)
    case EBinop(OEq, k, EAccess(EVar(`x`), a)) if !mentions(k, x) => Some(a)
    case _ => None
  }

  private def mentions(e: Expr, x: String): Boolean =
    e == EVar(x) || children(e).exists(mentions(_, x))

  /** Generic child traversal over the case-class AST (covers ERecord's
    * (name, expr) field list). */
  private def children(e: Expr): Seq[Expr] =
    e.asInstanceOf[Product].productIterator.flatMap {
      case c: Expr => Seq(c)
      case l: List[_] => l.collect {
        case c: Expr => c
        case (_, c: Expr) => c
      }
      case _ => Nil
    }.toSeq
}
