package graft.core

import org.apache.spark.sql.SparkSession

/** Session settings that make post-shuffle partitioning track MEASURED
  * data size instead of a static knob — the difference between a plan
  * that survives a 100x scale-up and one that spills.
  *
  * Root cause (round-16 attribution, `tools/StageMetrics` at 27x/81x):
  * AQE's `coalescePartitions.initialPartitionNum` DEFAULTS TO
  * `spark.sql.shuffle.partitions`, and AQE coalescing can only MERGE
  * map-output buckets, never split them. With shuffle.partitions pinned
  * to the core count, post-shuffle partition count was frozen at every
  * corpus scale: at 81x the doc-pipeline joins carried ~100 MB-on-wire
  * partitions whose text+token rows deserialize ~8x larger, blowing the
  * per-task execution-memory pool — 2.3 GB of sort spill on ONE stage of
  * `q_pipeline_sink` (172 s, cpu/run 0.44). With a high initial count
  * the same stage runs 43 s, zero spill, cpu/run 0.91.
  *
  * The two knobs:
  *   - `initialPartitionNum` high (512): map outputs are written at fine
  *     granularity; AQE then coalesces to the advisory size, so the
  *     FINAL partition count scales with measured shuffle bytes. Small
  *     scales still coalesce down to ~core-count partitions
  *     (`parallelismFirst`, default true), so tiny queries pay nothing.
  *   - advisory size 16 MB (not the 64 MB default): the advisory is
  *     sized on bytes ON WIRE, and this engine's hot shuffles carry
  *     normalized text + token arrays that expand ~8x when deserialized
  *     into sort/join buffers. 16 MB on wire ~ 128 MB in memory — the
  *     conventional task size.
  *
  * On a real cluster the same two settings are what you'd ship: they are
  * data-size-adaptive by construction, so no per-scale retuning.
  */
object ScaleConf {
  val settings: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "512",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16m",
    // Without this, AQE refuses to re-size partitions for any plan
    // materialized into a CACHE (the default keeps cached output
    // partitioning deterministic) — so every `.cache()`d loop input
    // (edge tables, shingle sets) and everything downstream of it runs
    // at the raw initialPartitionNum width: measured 512-task stages per
    // pagerank iteration at sf0.1. This engine derives no correctness
    // from cached partitioning (all keyed work re-shuffles), so let AQE
    // size cached plans too.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning" -> "true",
    // The coalesce floor: with `parallelismFirst` (default true) AQE's
    // target size is clamp(totalBytes/parallelism, minPartitionSize,
    // advisory). The 1 MB default floor collapses sub-4MB caches and
    // checkpoints to 1-2 partitions, SERIALIZING their consumers (a
    // measured 1.2-2x tail across the bench's small-artifact queries);
    // 64 KB keeps every frame above ~256 KB at full core-count
    // parallelism while still letting 7-row lookup frames be 1 task.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "64k")

  /** Apply to a builder (all graft mains route through this).
    * `GRAFT_SCALECONF=off` reverts to stock Spark defaults — the
    * pre-r16 configuration — for controlled A/B attribution. */
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    if (sys.env.get("GRAFT_SCALECONF").contains("off")) b
    else settings.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
