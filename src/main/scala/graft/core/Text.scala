package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE tokenizer shared by every text operator (dedup shingles, text
  * stats, language scoring, fingerprints) and restated verbatim in their
  * DuckDB oracles (`regexp_split_to_array(lower(trim(text)), '\s+')`).
  * Changing it here desynchronizes the oracles — change both together.
  */
object Text {
  def toks(text: Column): Column = split(lower(trim(text)), "\\s+")
}
