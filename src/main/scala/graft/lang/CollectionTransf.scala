package graft.lang

/** Collection-kind annotation — the reference's CollectionTransf
  * (fiat2/src/fiat2/CollectionTransf.v:6-51): recognize hand-written
  * list-fold idioms as declarative aggregates (`annotate_collection`), and
  * push an introduced `EBagOf`/`ESetOf` conversion down through the
  * relational pipeline beneath it (`bag_of`/`set_of`, applied by
  * `push_down_collection`).
  *
  * Why this matters on Spark: a list pipeline promises element ORDER, which
  * serializes; a bag/set pipeline is orderless — Spark's natural
  * distributed mode — and an `EACFold`/`EACIFold` aggregate compiles to a
  * partial-aggregated `agg(...)` instead of a sequential fold. The
  * annotation is the reference's own proof-backed licence to drop order.
  */
object CollectionTransf {
  import Lang._
  import Rewrites.foldExpr

  /** `annotate_collection` (CollectionTransf.v:6-24) — head patterns:
    *  - sort of a list = bag-sort of its bag (order comes from the sort);
    *  - `fold l 0 (λv acc. v + acc)`            → sum of the bag;
    *  - `length l`                              → count of the bag;
    *  - the fold-with-option running-minimum    → min of the SET;
    *  - `l == []`                               → emptiness test on the bag
    *    (guarded on a concrete element type — an untyped `[]` stays as-is).
    */
  val annotateCollection: Expr => Expr = {
    case ESort(LikeList, l) => ESort(LikeBag, EBagOf(l))
    case e @ EFold(l, EAtom(AInt(0L)), v, acc,
        EBinop(OPlus, EVar(v1), EVar(acc1))) =>
      if (v != acc && v1 == v && acc1 == acc) EACFold(AGSum, EBagOf(l)) else e
    case EUnop(OLength, l) => EACFold(AGCount, EBagOf(l))
    case e @ EFold(l, EAtom(ANone(_)), v0, acc0,
        EOptMatch(EVar(acc1), EUnop(OSome, EVar(v1)), x0,
          EIf(EBinop(OLess, EVar(v2), EVar(x1)),
            EUnop(OSome, EVar(v3)), EVar(acc2)))) =>
      if (Set(v0, acc0, x0).size == 3 &&
          Seq(v1, v2, v3).forall(_ == v0) &&
          Seq(acc1, acc2).forall(_ == acc0) && x1 == x0)
        EACIFold(AGMin, ESetOf(l))
      else e
    case EBinop(OEq, e1, EAtom(ANil(t))) if t != THole =>
      EBinop(OEq, EBagOf(e1), EAtom(AEmptyBag(t)))
    case e => e
  }

  /** `bag_of` (CollectionTransf.v:26-37): reinterpret a list-producing
    * pipeline as bag-producing, recursing through the operators whose bag
    * semantics is the elementwise image of their list semantics. Anything
    * else ends the descent with an explicit `EBagOf`. */
  def bagOf(e: Expr): Expr = e match {
    case EFlatmap(LikeList, e1, x, e2) =>
      EFlatmap(LikeBag, bagOf(e1), x, bagOf(e2))
    case EFilter(LikeList, l, x, p) => EFilter(LikeBag, bagOf(l), x, p)
    case EJoin(LikeList, e1, e2, x, y, p, r) =>
      EJoin(LikeBag, bagOf(e1), bagOf(e2), x, y, p, r)
    case EProj(LikeList, l, x, r) => EProj(LikeBag, bagOf(l), x, r)
    case EBinop(OCons, e1, e2) => EBinop(OBagInsert, bagOf(e2), e1)
    case EIf(c, t, f) => EIf(c, bagOf(t), bagOf(f))
    case other => EBagOf(other)
  }

  /** `set_of` (CollectionTransf.v:38-43). */
  def setOf(e: Expr): Expr = e match {
    case EFlatmap(LikeList, e1, x, e2) =>
      EFlatmap(LikeSet, setOf(e1), x, setOf(e2))
    case EFilter(LikeList, l, x, p) => EFilter(LikeSet, setOf(l), x, p)
    case EJoin(LikeList, e1, e2, x, y, p, r) =>
      EJoin(LikeSet, setOf(e1), setOf(e2), x, y, p, r)
    case EProj(LikeList, l, x, r) => EProj(LikeSet, setOf(l), x, r)
    case EBinop(OCons, e1, e2) => EBinop(OSetInsert, setOf(e2), e1)
    case EIf(c, t, f) => EIf(c, setOf(t), setOf(f))
    case other => ESetOf(other)
  }

  /** `push_down_collection` (CollectionTransf.v:45-51). */
  val pushDownCollection: Expr => Expr = {
    case EBagOf(l) => bagOf(l)
    case ESetOf(l) => setOf(l)
    case e => e
  }

  /** The reference's demo composition
    * (`fold_expr push_down_collection (fold_expr annotate_collection e)`,
    * CollectionTransf.v:55-62): annotate everywhere bottom-up, then push
    * the introduced conversions down through the pipelines. */
  def annotate(e: Expr): Expr =
    foldExpr(foldExpr(e)(annotateCollection))(pushDownCollection)
}
