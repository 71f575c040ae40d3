package graft.lang

/** The reference's column-pruning / operator-fusion rewrite family
  * (fiat2/src/fiat2/Optimize.v): the `cols` used-column analysis (:123-151),
  * `make_record` narrowing (:171-172), projection fusion `proj_proj` (:1409),
  * filter fusion `efilter_efilter` (:1421), σ/Π-into-⋈ interchange
  * (`filter_into_join` :1202, `proj_into_join` :151), and the early-narrowing
  * pushdowns (`proj_pushdown_left/right` :966,:1034, `proj_pushdown_filter`
  * :1088).
  *
  * Catalyst performs the physical equivalents (CollapseProject,
  * CombineFilters, PushDownPredicates, ColumnPruning) on the compiled plan
  * regardless; carrying them at the Lang level is a FIDELITY feature — the
  * reference's optimizer is the system under re-implementation — and it
  * additionally shrinks the AST the downstream static passes (IVM / index
  * recognition) must pattern-match.
  *
  * Fusions need no typing context and strictly decrease the EProj/EFilter
  * node count, so `fuse` terminates. The narrowing pushdowns DO need the
  * row's field set (the reference obtains it from `type_of … (TRecord f1)`
  * premises); `narrow` takes it from the bound store DataFrames' schemas and
  * fires only when the used set is a strict subset — which also makes it
  * idempotent (a second pass sees only the already-narrow projection).
  */
object Pruning {
  import Lang._
  import Rewrites.{foldExpr, freeVars}

  /** Columns of row-variable `x` used by `ex` — `None` means "the whole row
    * escapes" (e.g. `EVar x` in value position). The reference's `cols`
    * (Optimize.v:123-151). */
  def cols(x: String, ex: Expr): Option[List[String]] = {
    def app(o1: Option[List[String]], o2: Option[List[String]]) =
      for (l1 <- o1; l2 <- o2) yield (l1 ++ l2).distinct
    def go(e: Expr): Option[List[String]] = e match {
      case EVar(y) => if (y == x) None else Some(Nil)
      case ELoc(_) | EAtom(_) => Some(Nil)
      case EAccess(EVar(y), f) => if (y == x) Some(List(f)) else Some(Nil)
      case EAccess(r, _) => go(r)
      case EUnop(_, a) => go(a)
      case EBinop(_, a, b) => app(go(a), go(b))
      case ETernop(_, a, b, c) => app(go(a), app(go(b), go(c)))
      case EIf(c, t, f) => app(go(c), app(go(t), go(f)))
      case ELet(a, x1, b) => if (x1 == x) go(a) else app(go(a), go(b))
      case ERecord(fs) =>
        fs.foldRight(Option(List.empty[String])) { case ((_, fe), acc) =>
          app(go(fe), acc)
        }
      case EOptMatch(a, n, x1, s) =>
        if (x1 == x) app(go(a), go(n)) else app(go(a), app(go(n), go(s)))
      case EDictFold(d, z, k, v, acc, s) =>
        if (k == x || v == x || acc == x) app(go(d), go(z))
        else app(go(s), app(go(d), go(z)))
      case ESort(_, l) => go(l)
      case EFilter(_, l, x1, p) => if (x1 == x) go(l) else app(go(l), go(p))
      case EJoin(_, l1, l2, x1, y1, p, r) =>
        if (x1 == x || y1 == x) app(go(l1), go(l2))
        else app(go(r), app(go(p), app(go(l1), go(l2))))
      case EProj(_, l, x1, r) => if (x1 == x) go(l) else app(go(l), go(r))
      case EFlatmap(_, a, x1, b) => if (x1 == x) go(a) else app(go(a), go(b))
      case EFlatmap2(a, b, x1, x2, c) =>
        if (x1 == x || x2 == x) app(go(a), go(b))
        else app(go(c), app(go(a), go(b)))
      case EFold(l, z, x1, x2, s) =>
        if (x1 == x || x2 == x) app(go(l), go(z))
        else app(go(s), app(go(l), go(z)))
      case EACFold(_, a) => go(a)
      case EACIFold(_, a) => go(a)
      case EBagOf(l) => go(l)
      case ESetOf(l) => go(l)
    }
    go(ex)
  }

  /** `{c₁: x.c₁, …}` — the narrowing projection body (Optimize.v:171-172).
    * Fields emitted name-sorted, matching the engine's record convention. */
  def makeRecord(x: String, columns: Seq[String]): ERecord =
    ERecord(columns.distinct.sorted.map(c => c -> (EAccess(EVar(x), c): Expr)).toList)

  /** `proj (proj tb x2 r2) x r` → `proj tb x2 (let x = r2 in r)` when `x2`
    * is not free in `r` (proj_proj, Optimize.v:1409-1419). */
  val projProj: Expr => Expr = {
    case EProj(tag, EProj(_, tb, x2, r2), x, r) if !freeVars(r).contains(x2) =>
      EProj(tag, tb, x2, ELet(r2, x, r))
    case e => e
  }

  /** `filter (filter tb y p2) x p` → `filter tb x ((let y = x in p2) && p)`
    * when `x` is not free in `p2` (efilter_efilter, Optimize.v:1421-1445;
    * conjunct order follows evaluation order: inner filter's predicate ran
    * first). */
  val filterFilter: Expr => Expr = {
    case EFilter(tag, EFilter(_, tb, y, p2), x, p) if !freeVars(p2).contains(x) =>
      EFilter(tag, tb, x, EBinop(OAnd, ELet(EVar(x), y, p2), p))
    case e => e
  }

  /** `filter (join tb1 tb2 x y p r) xf pf` →
    * `join tb1 tb2 x y (p && (let xf = r in pf)) r` when neither join binder
    * is free in `pf` (filter_into_join, Optimize.v:1202-1238). */
  val filterIntoJoin: Expr => Expr = {
    case EFilter(tag, EJoin(_, tb1, tb2, x, y, p, r), xf, pf)
        if !freeVars(pf).contains(x) && !freeVars(pf).contains(y) =>
      EJoin(tag, tb1, tb2, x, y, EBinop(OAnd, p, ELet(r, xf, pf)), r)
    case e => e
  }

  /** `proj (join t1 t2 x y p r) xp rp` →
    * `join t1 t2 x y p (let xp = r in rp)` when neither join binder is free
    * in `rp` (proj_into_join, Optimize.v:151-169). */
  val projIntoJoin: Expr => Expr = {
    case EProj(tag, EJoin(_, t1, t2, x, y, p, r), xp, rp)
        if !freeVars(rp).contains(x) && !freeVars(rp).contains(y) =>
      EJoin(tag, t1, t2, x, y, p, ELet(r, xp, rp))
    case e => e
  }

  private val fuseHeads: Seq[Expr => Expr] =
    Seq(projProj, filterFilter, filterIntoJoin, projIntoJoin)

  /** All fusions, bottom-up to a fixpoint (each strictly decreases the
    * EProj+EFilter node count, so this terminates). */
  def fuse(e: Expr, maxIters: Int = 100): Expr = {
    var cur = e
    var i = 0
    while (i < maxIters) {
      val next = fuseHeads.foldLeft(cur)((acc, h) => foldExpr(acc)(h))
      if (next == cur) return cur
      cur = next
      i += 1
    }
    cur
  }

  def fuseCommand(c: Command): Command = Rewrites.mapExprs(c)(fuse(_))

  /** Fresh binder not free anywhere in `es`. */
  private def fresh(base: String, es: Expr*): String = {
    val used = es.flatMap(freeVars).toSet
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
      .find(n => !used.contains(n)).get
  }

  /** Schema-aware early narrowing: wrap a join input / filter source that is
    * a store-table read in `make_record` projection of just the used columns
    * (proj_pushdown_left/right, Optimize.v:966,:1034;
    * proj_pushdown_filter, :1088). `schema` gives each store table's field
    * set — the `TRecord f1` premise of the theorems. Fires only when the
    * used set is a STRICT subset (so re-application is a no-op) and the
    * consumer's column usage is fully known (`cols` returned Some). */
  def narrow(c: Command, schema: String => Option[Seq[String]]): Command = {
    def narrowSrc(tag: CollectionTag, src: Expr,
        used: Option[List[String]]): Option[Expr] =
      src match {
        // `@`-named cells are engine-introduced physical structures
        // (index components, bitmap cells): a projection between a routed
        // point filter and its keyed cache would rebuild the access path
        // as scan+project — never narrow those
        case ELoc(t) if t.contains("@") => None
        case ELoc(t) =>
          for {
            fields <- schema(t)
            u <- used
            cs = u.distinct
            if cs.nonEmpty && cs.toSet.subsetOf(fields.toSet) &&
              cs.toSet != fields.toSet
          } yield {
            val xp = fresh("xp")
            EProj(tag, ELoc(t), xp, makeRecord(xp, cs))
          }
        // One filter layer between the consumer and the table read (what
        // filter_pushdown_head leaves on a join input): narrow BELOW the
        // filter — proj_pushdown_filter (Optimize.v:1088) — adding the
        // filter predicate's own columns to the used set.
        case EFilter(ftag, ELoc(t), x0, p1) =>
          val all = for (u <- used; pc <- cols(x0, p1)) yield u ++ pc
          narrowSrc(ftag, ELoc(t), all)
            .map(nt => EFilter(ftag, nt, x0, p1))
        case _ => None
      }
    def app2(a: Option[List[String]], b: Option[List[String]]) =
      for (l1 <- a; l2 <- b) yield (l1 ++ l2).distinct
    val head: Expr => Expr = {
      case j @ EJoin(tag, l1, l2, x, y, p, r) =>
        val leftUsed = app2(cols(x, p), cols(x, r))
        val rightUsed = app2(cols(y, p), cols(y, r))
        val nl1 = narrowSrc(tag, l1, leftUsed)
        val nl2 = narrowSrc(tag, l2, rightUsed)
        if (nl1.isEmpty && nl2.isEmpty) j
        else EJoin(tag, nl1.getOrElse(l1), nl2.getOrElse(l2), x, y, p, r)
      case f @ EProj(ptag, EFilter(ftag, tbl, x, p), xp, r) =>
        narrowSrc(ftag, tbl, app2(cols(x, p), cols(xp, r))) match {
          case Some(nt) => EProj(ptag, EFilter(ftag, nt, x, p), xp, r)
          case None => f
        }
      case e => e
    }
    Rewrites.mapExprs(c)(e => foldExpr(e)(head))
  }
}
