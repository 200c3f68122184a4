package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Percolation — search turned inside out: SAVED queries are the stored
  * side, incoming documents are probed against them (Elasticsearch's
  * percolate / "saved search alerting"; the reference keeps per-user saved
  * searches client-side in its UI — at corpus scale the alert set lives
  * with the engine).
  *
  * A document fires an alert when it contains EVERY term of that alert
  * (conjunctive match — the alert semantics under which firing is
  * monotone in the doc's token set, so per-micro-batch evaluation in a
  * stream needs no state).
  *
  * Shape at scale: the alert table is the SMALL side (thousands of saved
  * searches) — exploded to (alert_id, term) rows and BROADCAST against
  * the distinct doc-token stream; term matches partial-aggregate per
  * (alert, doc) map-side, and the conjunction closes with one count
  * comparison. Corpus cost: the tokenize pass + ONE shuffle of matched
  * (alert, doc) rows — docs matching nothing (the overwhelming majority)
  * die at the broadcast-join probe.
  */
object Percolate {

  /** (alert_id, idCol) rows: every (saved query, document) pair where the
    * doc contains all of the alert's terms. `alerts(alert_id, terms)`.
    *
    * An alert with a null or empty `terms` array is REJECTED loudly
    * (assert_true): a plain explode would silently drop it — it would
    * never fire and never error — and the other defensible semantics (an
    * empty conjunction matches every document) would turn a misconfigured
    * saved query into a corpus-sized result. A registry entry that can
    * never match is a configuration bug; fail fast. explode_OUTER keeps
    * the empty/null row (term = null) so the assert actually evaluates —
    * non-generator expressions in the same select run in the Project
    * ABOVE the Generate, which a plain explode's zero output rows would
    * never reach. */
  def matches(docs: DataFrame, alerts: DataFrame,
              idCol: String, textCol: String): DataFrame = {
    val at = alerts.select(col("alert_id"),
      when(assert_true(size(col("terms")) > 0,
        concat(lit("Percolate: alert has null/empty terms: "),
          col("alert_id").cast("string"))).isNull,
        size(col("terms"))).as("n_terms"),
      explode_outer(col("terms")).as("term"))
    docs.select(col(idCol),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
      .join(broadcast(at), "term")
      .groupBy(col("alert_id"), col("n_terms"), col(idCol))
      .agg(count(lit(1)).as("hit_terms"))
      .where(col("hit_terms") === col("n_terms"))
      .select(col("alert_id"), col(idCol))
  }
}
