package graft.streaming

import org.apache.spark.sql.SparkSession

/** Stateful streaming queries pin their state partitioning to
  * `spark.sql.shuffle.partitions` at stream START — and every state
  * partition carries per-batch store open/commit overhead (a stream-stream
  * join holds four stores per partition). A bounded demo feed doesn't need
  * the session's batch shuffle width; a production feed sizes this to
  * arrival rate. This scopes the conf to one stream and restores it.
  */
private[streaming] object StreamConf {
  // The conf is session-global: without mutual exclusion two concurrent
  // streaming queries (e.g. served by QueryServer's handler pool) would
  // interleave save/restore and could PERMANENTLY leak the reduced value.
  // The lock prevents that corruption by serializing StreamConf users;
  // a concurrent batch query on the same session still plans with the
  // reduced width for the window's duration (correct results, fewer
  // reducers) — acceptable for these bounded demos.
  private val lock = new Object
  def withStatePartitions[A](s: SparkSession, n: Int)(body: => A): A =
    withConf(s, "spark.sql.shuffle.partitions" -> n.toString)(body)

  /** Scope arbitrary session confs to one streaming query (save/restore
    * under the same lock as withStatePartitions). */
  def withConf[A](s: SparkSession, kv: (String, String)*)(body: => A): A =
    lock.synchronized {
      val prev = kv.map { case (k, _) => k -> s.conf.getOption(k) }
      kv.foreach { case (k, v) => s.conf.set(k, v) }
      try body finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
}
