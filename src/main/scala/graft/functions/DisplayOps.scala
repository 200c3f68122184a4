package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Display-tier scalar functions (reference §2.8 F12/F14/F15, from the UI
  * layer `search_ui/search.py:108-126,172-202`) as pure Column
  * expressions — codegen'd `when/concat` chains, no UDFs, so they ride
  * inside whole-stage codegen when composed into a result projection.
  */
object DisplayOps {

  /** F12: truncate with ellipsis — `text[:maxLen-3] + "..."` when longer
    * than maxLen (`search_ui/search.py:186-199`: 20 for part numbers, 120
    * for descriptions, 15 for mfg parts). */
  def truncateEllipsis(c: Column, maxLen: Int): Column =
    when(length(c) > maxLen, concat(substring(c, 1, maxLen - 3), lit("...")))
      .otherwise(c)

  /** F14: absolute-URL prefixing (`search_ui/search.py:172-178`): empty or
    * null passes through; an `http...` URL is already absolute; a `/path`
    * gets the bare base; anything else gets `base/`. */
  def prefixUrl(c: Column, base: String): Column =
    when(c.isNull || c === "", c)
      .when(c.startsWith("http"), c)
      .when(c.startsWith("/"), concat(lit(base), c))
      .otherwise(concat(lit(base + "/"), c))

  /** F15: score → quality label bucketing (`search_ui/search.py:118-126`). */
  def scoreLabel(c: Column): Column =
    when(c >= 0.8, "Excellent")
      .when(c >= 0.7, "Very Good")
      .when(c >= 0.6, "Good")
      .when(c >= 0.5, "Fair")
      .when(c >= 0.4, "Poor")
      .when(c >= 0.3, "Very Poor")
      .otherwise("No Match")
}
