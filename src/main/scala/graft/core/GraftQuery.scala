package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark query plus (when SQL-expressible) an
  * equivalent DuckDB oracle. The driver hash-compares the two at sf0.01.
  *
  * Column-name contract: every computed column is aliased identically in the
  * Spark plan and the oracle SQL (the driver sorts columns by name before
  * hashing).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def sql(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, Some(oracle))

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def rowsOnly(name: String)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, None)
}
