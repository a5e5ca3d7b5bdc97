package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The shared text-quality column expressions. Several operators key
  * decisions on the type-token ratio (t02's quality report, d07's
  * keeper policy, c09's sampling weight) and each must stay
  * byte-identical to its DuckDB oracle rendering — so new call sites
  * use these definitions (TextQueries.tokens delegates here; the few
  * remaining inline copies in c01/jaccardEdges are pinned by their own
  * oracle SQL strings). NULL text yields NULL from every expression
  * here under ANSI Spark 4 semantics, `size()` included (the -1 is
  * the LEGACY non-ANSI behavior, and nothing in this build disables
  * ANSI) — callers that feed possibly-null text still filter it first
  * (c09 does) as belt-and-braces so the null-row universe matches the
  * oracle regardless of session ANSI settings. */
object TextStats {

  /** Whitespace tokenization — the engine-wide convention
    * (`regexp_split_to_array(trim(text), '\s+')` on the oracle side). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Type-token ratio: distinct/total tokens as one int/int double
    * division (engine-exact). */
  def ttr(text: Column): Column = {
    val t = tokens(text)
    size(array_distinct(t)).cast("double") / size(t)
  }

  /** c09's integer sampling weight: 1 + ⌊4·TTR⌋ ∈ 1..5. */
  def qualityWeight(text: Column): Column =
    lit(1) + floor(lit(4.0) * ttr(text)).cast("int")
}
