package graft.lang

/** The reference's WHOLE optimization pipeline as one driver — the analog
  * of `ex_transf` (fiat2/src/fiat2/CombIdxEx.v:55-68,
  * fiat2/src/fiat2/ParamPipelineEx.v:125-166) and the `OptimizeAnno.v`
  * whole-pipeline composition (SURVEY.md §3.1): relational recognition
  * (to_join / to_filter / to_proj), collection-kind annotation
  * (annotate_collection + push_down_collection), then the index-related
  * transforms — incremental sum/min aggregate maintenance (SumAgg / MinAgg)
  * and point-filter index introduction (DictIndexImpl / compo_idx) — in
  * the reference's order.
  *
  * Like the reference (whose transforms carry proofs, not cost models),
  * this driver applies the aggregate/index transforms UNCONDITIONALLY —
  * `requireLoop = false`; the auto-mode entry points (`IvmTransf
  * .runIncremental`, `IndexTransf.runIndexed`) keep the loop-only cost
  * guard. Filter pushdown — `filter_pushdown_transf` in the reference
  * pipeline — is deliberately absent: the compiled plan is declarative and
  * Catalyst's PushDownPredicates does it (plan-asserted in
  * PlanQualitySpec; SURVEY.md §4.2).
  */
object Optimize {
  import Lang._
  import Compiler.Env

  /** Transform a command + prime the environment, without running. */
  def transform(c: Command, env: Env): (Command, Env) = {
    val recognized = Rewrites.normalizeCommand(c)
    val annotated = Rewrites.mapExprs(recognized)(CollectionTransf.annotate)
    // CLetMut-scoped tables first (pure source rewrite, cells as nested
    // scalar bindings), then store-bound tables (cells primed by one
    // aggregation each), then index introduction
    val scoped = IvmTransf.transformScoped(annotated, requireLoop = false)
    val (ivmed, primed) =
      IvmTransf.transform(scoped, env, requireLoop = false)
    val (indexed, idxEnv) =
      IndexTransf.transform(ivmed, primed, requireLoop = false)
    // The reference's Optimize.v column family LAST: proj/filter fusion
    // (proj_proj / efilter_efilter / filter_into_join / proj_into_join)
    // then schema-aware early narrowing (proj_pushdown_left/right/filter)
    // against the store's actual field sets. After the index transforms so
    // the eq-filter shapes those passes pattern-match are still intact.
    val fused = Pruning.fuseCommand(indexed)
    val narrowed = Pruning.narrow(fused,
      t => idxEnv.store.get(t).map(_.columns.toSeq))
    (narrowed, idxEnv)
  }

  /** Optimize then interpret — the reference lifecycle's entry point A
    * (typecheck → optimize → interp_command, SURVEY.md §3.1). */
  def run(c: Command, env: Env): Env = {
    val (cmd, primed) = transform(c, env)
    Interp.run(cmd, primed)
  }
}
