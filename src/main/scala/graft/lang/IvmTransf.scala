package graft.lang

import org.apache.spark.sql.functions._

/** AUTOMATIC incremental aggregate maintenance — the reference's SumAgg
  * materialized-view transform pipeline (`sum_to_agg_lookup_head` +
  * `cons_to_add_head`, fiat2/src/fiat2/SumAgg.v:150-155, wired in
  * fiat2/src/fiat2/PipelineEx.v:31-32): when a loop both INSERTS into a
  * table and READS `sum(attr)` of it, re-reading is O(table) per
  * iteration; the transform re-represents the aggregate as a maintained
  * value updated in O(1) on every insert.
  *
  * Spark analog: the running sum lives in the interpreter's SCALAR store
  * (a constant-folded literal — zero jobs per read); the initial value is
  * one distributed aggregation of the pre-loop table. The program text is
  * rewritten exactly like the reference: each `sum(proj(tbl, a))` read
  * becomes a cell read, each `tbl := cons(r, tbl)` write additionally
  * bumps the cell by `r.a`. The table itself still receives the insert,
  * so non-aggregated reads are untouched.
  */
object IvmTransf {
  import Lang._
  import Compiler._

  /** Run a command with automatic sum-aggregate maintenance. */
  def runIncremental(c: Command, env: Env): Env = {
    val (rewritten, primed) = transform(Rewrites.normalizeCommand(c), env)
    Interp.run(rewritten, primed)
  }

  def cellName(table: String, attr: String): String = s"$table@sum@$attr"

  /** The `sum(proj(tbl, x.attr))` read shape (post-normalize). */
  private object SumRead {
    def unapply(e: Expr): Option[(String, String)] = e match {
      case EACFold(AGSum, EProj(_, ELoc(t), x, EAccess(EVar(x2), a)))
          if x == x2 => Some((t, a))
      case _ => None
    }
  }

  /** Rewrite + prime the scalar store for every (table, attr) that is both
    * sum-read and cons-written inside a loop. */
  def transform(c: Command, env: Env): (Command, Env) = {
    val reads = collectReads(c, inLoop = false).distinct
    val written = consWrittenTables(c, inLoop = false).toSet
    // soundness: only maintain a cell when EVERY write to t is the
    // recognized cons shape and no CLetMut re-binds t — any other write
    // (concat, re-filter, double cons) would leave the cell stale
    val unsafe = unsafeTables(c)
    val maintained = reads.filter { case (t, _) =>
      written.contains(t) && !unsafe.contains(t) && env.store.contains(t) }
    maintained.foldLeft((c, env)) { case ((cmd, acc), (t, a)) =>
      // one distributed aggregation primes the cell (AGSum of empty = 0)
      val init = acc.store(t)
        .agg(coalesce(sum(col(a)), lit(0L)).cast("long")).head().getLong(0)
      val cell = cellName(t, a)
      (rewrite(cmd, t, a, cell),
        acc.copy(scalars = acc.scalars + (cell -> lit(init))))
    }
  }

  private def rewrite(c: Command, t: String, a: String,
      cell: String): Command = {
    def rewriteExpr(e: Expr): Expr = Rewrites.foldExpr(e) {
      case SumRead(`t`, `a`) => ELoc(cell)
      case other => other
    }
    def go(c: Command): Command = c match {
      // the cons write: keep it, and bump the cell by the new row's attr
      // (cons_to_add_head — the O(1) incremental update)
      case CAssign(`t`, w @ EBinop(OCons, r, ELoc(`t`))) =>
        CSeq(CAssign(t, rewriteExpr(w)),
          CAssign(cell, EBinop(OPlus, ELoc(cell), EAccess(r, a))))
      case CSkip => CSkip
      case CSeq(c1, c2) => CSeq(go(c1), go(c2))
      case CLet(e, x, b) => CLet(rewriteExpr(e), x, go(b))
      case CLetMut(e, x, b) => CLetMut(rewriteExpr(e), x, go(b))
      case CAssign(x, e) => CAssign(x, rewriteExpr(e))
      case CIf(e, c1, c2) => CIf(rewriteExpr(e), go(c1), go(c2))
      case CForeach(e, x, b) => CForeach(rewriteExpr(e), x, go(b))
    }
    go(c)
  }

  private def collectReads(c: Command, inLoop: Boolean): Seq[(String, String)] =
    c match {
      case CSkip => Nil
      case CSeq(a, b) => collectReads(a, inLoop) ++ collectReads(b, inLoop)
      case CLet(e, _, b) => readsIn(e, inLoop) ++ collectReads(b, inLoop)
      case CLetMut(e, _, b) => readsIn(e, inLoop) ++ collectReads(b, inLoop)
      case CAssign(_, e) => readsIn(e, inLoop)
      case CIf(e, a, b) => readsIn(e, inLoop) ++
        collectReads(a, inLoop) ++ collectReads(b, inLoop)
      case CForeach(e, _, b) =>
        readsIn(e, inLoop) ++ collectReads(b, inLoop = true)
    }

  private def readsIn(e: Expr, inLoop: Boolean): Seq[(String, String)] =
    if (!inLoop) Nil
    else {
      var found = List.empty[(String, String)]
      Rewrites.foldExpr(e) {
        case s @ SumRead(t, a) => found ::= (t -> a); s
        case other => other
      }
      found.reverse
    }

  /** Tables with a write (or a shadowing CLetMut binder) that is NOT the
    * recognized single-cons shape. The reference's transform carries the
    * same precondition as a wf side-condition (fiat2/src/fiat2/SumAgg.v —
    * `cons_to_add_head` fires only on the insert idiom); here we check it
    * syntactically and leave the program untransformed otherwise. CLet /
    * CForeach binders bind expression variables, not store cells, so they
    * cannot shadow an `ELoc` read and are not collected. */
  private def unsafeTables(c: Command): Set[String] = c match {
    case CSkip => Set.empty
    case CSeq(a, b) => unsafeTables(a) ++ unsafeTables(b)
    case CLet(_, _, b) => unsafeTables(b)
    case CLetMut(_, x, b) => unsafeTables(b) + x
    case CAssign(t, EBinop(OCons, _, ELoc(t2))) if t == t2 => Set.empty
    case CAssign(t, _) => Set(t)
    case CIf(_, a, b) => unsafeTables(a) ++ unsafeTables(b)
    case CForeach(_, _, b) => unsafeTables(b)
  }

  private def consWrittenTables(c: Command, inLoop: Boolean): Seq[String] =
    c match {
      case CSkip => Nil
      case CSeq(a, b) =>
        consWrittenTables(a, inLoop) ++ consWrittenTables(b, inLoop)
      case CLet(_, _, b) => consWrittenTables(b, inLoop)
      case CLetMut(_, _, b) => consWrittenTables(b, inLoop)
      case CAssign(t, EBinop(OCons, _, ELoc(t2))) if t == t2 && inLoop =>
        Seq(t)
      case CAssign(_, _) => Nil
      case CIf(_, a, b) =>
        consWrittenTables(a, inLoop) ++ consWrittenTables(b, inLoop)
      case CForeach(_, _, b) => consWrittenTables(b, inLoop = true)
    }
}
