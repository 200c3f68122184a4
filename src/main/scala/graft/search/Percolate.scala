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
    * doc contains all of the alert's terms. `alerts(alert_id, terms)`. */
  def matches(docs: DataFrame, alerts: DataFrame,
              idCol: String, textCol: String): DataFrame = {
    val at = alerts.select(col("alert_id"),
      size(col("terms")).as("n_terms"), explode(col("terms")).as("term"))
    docs.select(col(idCol),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
      .join(broadcast(at), "term")
      .groupBy(col("alert_id"), col("n_terms"), col(idCol))
      .agg(count(lit(1)).as("hit_terms"))
      .where(col("hit_terms") === col("n_terms"))
      .select(col("alert_id"), col(idCol))
  }
}
