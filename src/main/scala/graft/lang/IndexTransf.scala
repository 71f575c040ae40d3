package graft.lang

import graft.operators.{CompoIndex, DictIndex}

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

  /** Run a command with automatic index introduction. Expressions are
    * normalized first so comprehension-written filters (`x <- t; check(p);
    * ret x`) are recognized through their structured EFilter form. */
  def runIndexed(c: Command, env: Compiler.Env): Compiler.Env = {
    val (rewritten, indexed) = transform(Rewrites.normalizeCommand(c), env)
    Interp.run(rewritten, indexed)
  }

  /** With `requireLoop` (the default) only filters under a `CForeach` are
    * indexed — the cost model for AUTO mode; `requireLoop = false` matches
    * the reference's unconditional `transf_to_idx` (used by `Optimize`). */
  def transform(c: Command, env: Compiler.Env): (Command, Compiler.Env) =
    transform(c, env, requireLoop = true)

  /** Store-name a composed-index component under. `@` can't appear in a
    * surface identifier, so components never collide with user tables. */
  def componentName(table: String, attr: String): String = s"$table@$attr"

  /** Introduce indexes for every loop-point-filtered store table.
    *
    * One filtered attribute → the table itself is re-represented as its
    * keyed index (program text untouched). Several filtered attributes →
    * the reference's COMPOSED index (`compo_idx`,
    * fiat2/src/fiat2/IndexTransf.v:20-50): one `CompoIndex` built from a
    * single source scan, each component registered in the store under
    * `componentName`, and — like the reference's `transf_to_idx`
    * substitution — the command is rewritten so each point filter reads
    * the component keyed on ITS attribute.
    */
  def transform(c: Command, env: Compiler.Env,
      requireLoop: Boolean): (Command, Compiler.Env) = {
    val byTable = loopEqFilters(c, inLoop = !requireLoop).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // Composed components are routed to by NAME. A cons-chain insert is
    // maintained: the interpreter updates EVERY component from the one
    // delta (compo_idx_wf, fiat2/src/fiat2/IndexTransf.v:32-50 — "inserts
    // maintain every component"). Any OTHER write shape (concat,
    // re-filter) or a CLetMut re-bind cannot be maintained and would
    // leave routed filters reading a stale snapshot, so those tables are
    // not composed. The single-attribute case needs no such guard: the
    // table entry itself is swapped, and CAssign overwrites that entry.
    val mutated = nonChainMutatedCells(c)
    val dicted = byTable.foldLeft((c, env)) { case ((cmd, acc), (t, attrs0)) =>
      acc.store.get(t) match {
        case Some(df) =>
          val attrs = attrs0.filter(df.columns.contains)
          attrs match {
            case Seq() => (cmd, acc)
            case Seq(a) =>
              val idx = DictIndex.build(df, a) // size-aware partitioning
              // the handle is kept so CAssign cons-inserts maintain the
              // index incrementally (cons_to_insert_head; see Interp)
              (cmd, acc.copy(store = acc.store + (t -> idx.keyed),
                indexes = acc.indexes + (t -> idx)))
            case _ if mutated.contains(t) => (cmd, acc)
            case several =>
              val compo = CompoIndex.build(df, several)
              val entries = several.map(a =>
                componentName(t, a) -> compo.component(a).keyed)
              (routeFilters(cmd, t, several.toSet),
                acc.copy(store = acc.store ++ entries,
                  compoIndexes = acc.compoIndexes + (t -> compo)))
          }
        case None => (cmd, acc)
      }
    }
    val bitmapped = introduceBitmaps(dicted._1, dicted._2)
    transformScoped(bitmapped._1, bitmapped._2, requireLoop)
  }

  /** SCOPED index introduction — the reference applies `transf_to_idx`
    * UNDER each CLetMut (`apply_below_n_letmuts`,
    * fiat2/src/fiat2/OptimizeAnno.v:282-288), re-representing the scoped
    * table itself. A CLetMut-bound table whose body loop-point-filters it
    * gets an index annotation (`Env.indexHints` — the analog of the
    * reference's per-program index_choices, Ex_Orders.v:56-67); Interp
    * builds the physical keyed representation when the cell binds, and
    * the existing CAssign maintenance then covers chain inserts in the
    * body. Several filtered attributes → composed index: the body's point
    * filters are routed to per-attribute component cells here, and Interp
    * binds those cells at CLetMut time.
    *
    * Only UNIQUELY-bound names that don't shadow a store table are
    * annotated — a name bound by two different CLetMuts would make one
    * hint apply to both scopes.
    */
  def transformScoped(c: Command, env: Compiler.Env,
      requireLoop: Boolean): (Command, Compiler.Env) = {
    val counts = letMutBindCounts(c)
    def eligible(n: String) =
      counts.getOrElse(n, 0) == 1 && !env.store.contains(n)
    var hints = Map.empty[String, Seq[String]]
    def go(c: Command, inLoop: Boolean): Command = c match {
      case CSkip => CSkip
      case CSeq(a, b) => CSeq(go(a, inLoop), go(b, inLoop))
      case CLet(e, x, b) => CLet(e, x, go(b, inLoop))
      case CLetMut(e, x, body) =>
        val body2 = go(body, inLoop)
        lazy val attrs = loopEqFilters(body2, inLoop = inLoop || !requireLoop)
          .collect { case (`x`, a) => a }.distinct
        if (!eligible(x)) CLetMut(e, x, body2)
        else attrs match {
          case Seq() => CLetMut(e, x, body2)
          case Seq(a) =>
            hints += (x -> Seq(a)); CLetMut(e, x, body2)
          case several if !nonChainMutatedCells(body2).contains(x) =>
            hints += (x -> several)
            CLetMut(e, x, routeFilters(body2, x, several.toSet))
          case _ => CLetMut(e, x, body2) // non-chain writes: can't compose
        }
      case CAssign(x, e) => CAssign(x, e)
      case CIf(e, a, b) => CIf(e, go(a, inLoop), go(b, inLoop))
      case CForeach(e, x, b) => CForeach(e, x, go(b, inLoop = true))
    }
    val rewritten = go(c, inLoop = !requireLoop)
    (rewritten, env.copy(indexHints = env.indexHints ++ hints))
  }

  private def letMutBindCounts(c: Command): Map[String, Int] = c match {
    case CSkip => Map.empty
    case CSeq(a, b) => merge(letMutBindCounts(a), letMutBindCounts(b))
    case CLet(_, _, b) => letMutBindCounts(b)
    case CLetMut(_, x, b) => merge(Map(x -> 1), letMutBindCounts(b))
    case CAssign(_, _) => Map.empty
    case CIf(_, a, b) => merge(letMutBindCounts(a), letMutBindCounts(b))
    case CForeach(_, _, b) => letMutBindCounts(b)
  }

  private def merge(a: Map[String, Int], b: Map[String, Int]): Map[String, Int] =
    (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0) + b.getOrElse(k, 0))).toMap

  // --- bitmap index (BitmapIndex.v:331-335, :709-831) ---

  /** Canonical binder for keying predicates modulo alpha-renaming. `@` keeps
    * it out of the surface identifier space. */
  private val canonBinder = "@row"

  /** The precomputed-predicate field added to a bitmap-extended table. */
  private val bitField = "@bit"

  /** Constant-predicate loop filters become BITMAP indexes — the
    * reference's other filter structure (`filter_to_bitmap_lookup_head`,
    * fiat2/src/fiat2/BitmapIndex.v:811-831): a boolean vector aligned with
    * the rows, built by evaluating the predicate ONCE, after which every
    * use selects by the precomputed bit instead of re-evaluating.
    *
    * Spark realization: the table is re-materialized with the predicate as
    * an extra boolean column and cached; routed filters test the column
    * (`use_bitmap_head`, BitmapIndex.v:709) and a projection strips it, so
    * the rewritten expression's value is unchanged. Eligible predicates
    * depend on nothing but the row (no loop variables — those are the dict
    * index's shape — and no store reads, which could change between
    * iterations); eligible tables are never written in the command (the
    * reference maintains bitmaps through inserts, cons_to_bitmap_update_head
    * BitmapIndex.v:650-665 — here a write simply downgrades to no bitmap).
    *
    * Bitmaps are LOOP-ONLY in every mode, including the unconditional
    * optimizer pipeline: unlike the dict/compo/scoped transforms — which
    * re-KEY existing data — a bitmap is a new materialized artifact whose
    * build costs exactly one full predicate evaluation, so introducing it
    * for a one-shot filter (e.g. a conjunct the pushdown just exposed on
    * a join input) is a strict loss.
    */
  private def introduceBitmaps(c: Command,
      env: Compiler.Env): (Command, Compiler.Env) = {
    val written = writtenCells(c)
    val cands = loopConstFilters(c, inLoop = false).distinct
      .filterNot { case (t, _) => written.contains(t) }
      .filter { case (t, _) => env.store.contains(t) }
    cands.zipWithIndex.foldLeft((c, env)) {
      case ((cmd, acc), ((t, pCanon), i)) =>
        val cell = s"$t@bitmap$i"
        val df = acc.store(t)
        val fields = df.columns.toList.sorted
        val body = ERecord((fields.map(f =>
          f -> (EAccess(EVar(canonBinder), f): Expr)) :+
          (bitField -> pCanon)).sortBy(_._1))
        val extended = Compiler.compile(
          EProj(LikeBag, ELoc(t), canonBinder, body), acc)
          .asInstanceOf[Compiler.TV].df.cache()
        (routeBitmap(cmd, t, pCanon, cell, fields),
          acc.copy(store = acc.store + (cell -> extended)))
    }
  }

  /** Rewrite every filter of `t` whose predicate is alpha-equal to `pCanon`
    * into bit-test-then-strip over the bitmap cell. */
  private def routeBitmap(c: Command, t: String, pCanon: Expr, cell: String,
      fields: List[String]): Command =
    Rewrites.mapExprs(c)(e => Rewrites.foldExpr(e) {
      case f @ EFilter(tag, SrcLoc(`t`), x, p) =>
        if (Rewrites.rename(p, x, canonBinder).contains(pCanon))
          EProj(tag,
            EFilter(tag, ELoc(cell), x, EAccess(EVar(x), bitField)),
            x, Pruning.makeRecord(x, fields))
        else f
      case other => other
    })

  /** Store cells the command writes at all (bitmaps are not maintained —
    * any write disqualifies, unlike the chain-maintained dict/compo case). */
  private def writtenCells(c: Command): Set[String] = c match {
    case CSkip => Set.empty
    case CSeq(a, b) => writtenCells(a) ++ writtenCells(b)
    case CLet(_, _, b) => writtenCells(b)
    case CLetMut(_, x, b) => writtenCells(b) + x
    case CAssign(x, _) => Set(x)
    case CIf(_, a, b) => writtenCells(a) ++ writtenCells(b)
    case CForeach(_, _, b) => writtenCells(b)
  }

  /** (table, canonical predicate) for loop filters whose predicate uses
    * only the row: not an attr-eq point lookup (the dict index owns those)
    * and free of loop variables and store reads. */
  private def loopConstFilters(c: Command,
      inLoop: Boolean): Seq[(String, Expr)] = c match {
    case CSkip => Nil
    case CSeq(a, b) => loopConstFilters(a, inLoop) ++ loopConstFilters(b, inLoop)
    case CLet(e, _, b) => constFilters(e, inLoop) ++ loopConstFilters(b, inLoop)
    case CLetMut(e, _, b) => constFilters(e, inLoop) ++ loopConstFilters(b, inLoop)
    case CAssign(_, e) => constFilters(e, inLoop)
    case CIf(e, a, b) =>
      constFilters(e, inLoop) ++ loopConstFilters(a, inLoop) ++
        loopConstFilters(b, inLoop)
    case CForeach(e, _, b) =>
      constFilters(e, inLoop) ++ loopConstFilters(b, inLoop = true)
  }

  private def constFilters(e: Expr, inLoop: Boolean): Seq[(String, Expr)] = {
    val here = e match {
      case EFilter(_, SrcLoc(t), x, p)
          if inLoop && eqAttr(x, p).isEmpty &&
            (Rewrites.freeVars(p) - x).isEmpty && !readsStore(p) =>
        Rewrites.rename(p, x, canonBinder).map(t -> _).toSeq
      case _ => Nil
    }
    here ++ children(e).flatMap(constFilters(_, inLoop))
  }

  private def readsStore(e: Expr): Boolean = e match {
    case ELoc(_) => true
    case _ => children(e).exists(readsStore)
  }

  /** Store cells the command re-binds, or assigns with anything OTHER
    * than the maintainable cons-chain insert shape. */
  private def nonChainMutatedCells(c: Command): Set[String] = c match {
    case CSkip => Set.empty
    case CSeq(a, b) => nonChainMutatedCells(a) ++ nonChainMutatedCells(b)
    case CLet(_, _, b) => nonChainMutatedCells(b)
    case CLetMut(_, x, b) => nonChainMutatedCells(b) + x
    case CAssign(x, e) =>
      if (Rewrites.ConsChain.rowsOnto(e, x).isDefined) Set.empty else Set(x)
    case CIf(_, a, b) => nonChainMutatedCells(a) ++ nonChainMutatedCells(b)
    case CForeach(_, _, b) => nonChainMutatedCells(b)
  }

  /** Back-compat store-only view of `transform` (single-attribute tables;
    * composed tables additionally need the command from `transform`). */
  def indexStore(c: Command, env: Compiler.Env): Compiler.Env =
    transform(c, env)._2

  /** A store read in filter-source position — transparent through the
    * `EBagOf` wrappers `CollectionTransf.annotate` introduces (a table IS
    * its bag; `ESetOf` is NOT transparent, dedup changes the rows). */
  private object SrcLoc {
    def unapply(e: Expr): Option[String] = e match {
      case ELoc(t) => Some(t)
      case EBagOf(SrcLoc(t)) => Some(t)
      case _ => None
    }
  }

  /** Point filters on a composed table read the component keyed on their
    * attribute (the reference's `eq_filter_to_lookup` on a record access
    * of the composed index, DictIndexImpl.v:374-389). */
  private def routeFilters(c: Command, t: String,
      attrs: Set[String]): Command =
    Rewrites.mapExprs(c)(e => Rewrites.foldExpr(e) {
      case f @ EFilter(tag, SrcLoc(`t`), x, p) =>
        eqAttr(x, p).filter(attrs.contains) match {
          case Some(a) => EFilter(tag, ELoc(componentName(t, a)), x, p)
          case None => f
        }
      case other => other
    })

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
      case EFilter(_, SrcLoc(t), x, p) if inLoop =>
        eqAttr(x, p).map(t -> _).toSeq
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
