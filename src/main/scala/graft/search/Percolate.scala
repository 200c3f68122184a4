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

  /** [[matches]] at corpus-of-alerts scale — the INVERTED-ALERT-INDEX
    * form (how Elasticsearch's percolator actually scales: saved queries
    * are themselves indexed, and a document only evaluates the alerts its
    * terms select). Value-identical to [[matches]]; the plan differs:
    *
    *  1. each alert is keyed by its ANCHOR term — the corpus-rarest of
    *     its terms (min df, term asc; a conjunctive alert can only fire
    *     on docs containing ALL its terms, so probing by the rarest one
    *     loses nothing and minimizes candidates). In production the df
    *     lookup reads the prebuilt Bm25Index termstats artifact; here it
    *     is derived in-plan from the same token stream.
    *  2. candidates come from an EQUI-JOIN of the doc-term stream with
    *     the anchor table (`shuffle_hash` hint — the million-alert table
    *     is no longer broadcastable, which is the point of this variant),
    *  3. the full conjunction closes by joining candidate alerts' term
    *     lists back against the doc-term stream on (doc, term) and
    *     counting — candidate-sized work, since non-candidate docs died
    *     at the anchor probe.
    *
    * An alert containing a term absent from the corpus gets df 0 for it;
    * that term becomes the anchor, selects no candidates, and the alert
    * correctly never fires — no special case needed.
    *
    * `dfLookup`: optional prebuilt (term, df) table — the production
    * path passes the Bm25Index termstats artifact so anchor election
    * costs an alert-vocabulary-sized join instead of a corpus tokenize
    * pass; when absent, df derives in-plan from the same token stream
    * (the oracle-checkable form s25b uses).
    *
    * Lookup staleness: alert terms MISSING from the lookup (a termstats
    * artifact built before an append, or covering a different corpus)
    * fall back to in-plan df over the current token stream — a df=0
    * default would make the unknown term the anchor, and a stale df
    * skews anchor election toward what USED to be rare. The fallback
    * join is sized by the missing-term set (normally empty), so the
    * fresh-lookup fast path keeps its alert-vocabulary-sized cost.
    * Matching itself never depends on the lookup (probe and conjunction
    * run over the live token stream), so a stale lookup can only
    * mis-elect anchors — a performance hazard, not a correctness one;
    * the fallback removes the worst case (df=0 anchor for a term that
    * is now corpus-common). */
  def matchesInverted(docs: DataFrame, alerts: DataFrame,
                      idCol: String, textCol: String,
                      dfLookup: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val at = alerts.select(col("alert_id"),
      when(assert_true(size(col("terms")) > 0,
        concat(lit("Percolate: alert has null/empty terms: "),
          col("alert_id").cast("string"))).isNull,
        size(col("terms"))).as("n_terms"),
      explode_outer(col("terms")).as("term"))
    val dt = docs.select(col(idCol),
      explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
    // df of alert terms only (|alert vocab| rows, not corpus vocab)
    val avocab = at.select(col("term")).distinct()
    val inPlanDf = (vocab: DataFrame) =>
      dt.join(vocab, Seq("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dfreq = dfLookup
      .map { lk =>
        val known = lk.select(col("term"), col("df")).join(avocab, Seq("term"))
        // stale-lookup fallback: terms the artifact doesn't cover get
        // live in-plan df (see scaladoc) — anti-join is missing-set-sized
        val missing = avocab.join(lk.select(col("term")), Seq("term"), "left_anti")
        known.unionByName(inPlanDf(missing))
      }
      .getOrElse(inPlanDf(avocab))
    val wAnchor = Window.partitionBy(col("alert_id"))
      .orderBy(col("df").asc, col("term").asc)
    val anchors = at.join(dfreq, Seq("term"), "left")
      .na.fill(0L, Seq("df"))
      .withColumn("rn", row_number().over(wAnchor))
      .where(col("rn") === 1)
      .select(col("alert_id"), col("term"))
    // anchor probe: equi-join, alerts NOT broadcast (the scale premise)
    val cand = dt.join(anchors.hint("shuffle_hash"), Seq("term"))
      .select(col("alert_id"), col(idCol))
    // conjunction check over candidates only
    cand.join(at.select(col("alert_id"), col("n_terms"), col("term")),
        Seq("alert_id"))
      .join(dt, Seq(idCol, "term"))
      .groupBy(col("alert_id"), col("n_terms"), col(idCol))
      .agg(count(lit(1)).as("hit_terms"))
      .where(col("hit_terms") === col("n_terms"))
      .select(col("alert_id"), col(idCol))
  }

  /** VECTOR percolation — the dense twin of [[matches]]: SAVED query
    * vectors are the stored side, and an incoming document fires an
    * alert when its embedding lands within the alert's own similarity
    * threshold (reverse ANN — "tell me when something close to THIS
    * arrives": near-dup alerts, content-matching subscriptions,
    * competitor monitoring over a doc stream).
    *
    * `alerts(alert_id, avec, threshold)` is the SMALL side — broadcast
    * against the doc vectors, scored with the codegen cosine, closed with
    * one thresh compare. Corpus cost: one scored pass, ZERO shuffles —
    * docs below every threshold die in the filter. Firing is stateless
    * per document (monotone in nothing — just a pure predicate), so the
    * streaming form ([[graft.streaming.DeltaStream.vectorPercolateServe]])
    * needs no state and the union of per-micro-batch results equals the
    * batch run, exactly like the term form. At alert-set scale the same
    * IVF blocking as [[graft.search.Ann.knnGraph]] applies (assign alerts
    * to centroid lists, probe); at the thousands-of-alerts scale the
    * broadcast form is the right plan. Output (alert_id, vec_id, score),
    * deterministic (6 dp rounding, scores ≥ threshold kept). */
  def vectorMatches(docs: DataFrame, alerts: DataFrame): DataFrame =
    docs.crossJoin(broadcast(alerts))
      .select(col("alert_id"), col("vec_id"),
        round(graft.functions.VectorOps.cosineSim(
          col("embedding"), col("avec")), 6).as("score"),
        col("threshold"))
      .where(col("score") >= col("threshold"))
      .select(col("alert_id"), col("vec_id"), col("score"))

  /** [[vectorMatches]] at ALERT-CORPUS scale — the IVF-blocked form: when
    * the alert table itself is corpus-sized (every user saves
    * subscriptions), broadcasting it is no longer a plan. Alerts probe
    * their `nprobe` nearest centroid lists, documents are assigned to
    * their single nearest list, and only (alert, doc) pairs sharing a
    * probed list are scored — the same blocking as [[Ann.knnGraph]]'s
    * candidate join, one SHUFFLE equi-join on cid instead of a broadcast,
    * never alerts × corpus. The block is a candidate filter, so firings
    * are a deterministic SUBSET of the exact form (an alert can miss a
    * doc whose list it didn't probe — the standard IVF recall trade,
    * dialed by `nprobe`; nprobe = |centroids| is exactly
    * [[vectorMatches]]). Deterministic and SQL-replayable as-is — the
    * s29b oracle states the blocked semantics exactly. */
  def vectorMatchesBlocked(docs: DataFrame, alerts: DataFrame,
                           centroids: DataFrame, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = graft.search.Ann.ivfAssign(docs, centroids)
    val w = Window.partitionBy(col("alert_id"))
      .orderBy(col("pscore").desc, col("cid").asc)
    val probes = alerts.crossJoin(broadcast(centroids))
      .select(col("alert_id"), col("avec"), col("threshold"), col("cid"),
        round(graft.functions.VectorOps.cosineSim(
          col("avec"), col("cvec")), 6).as("pscore"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= nprobe)
      .select(col("alert_id"), col("avec"), col("threshold"), col("cid"))
    probes.join(assigned, Seq("cid"))
      .select(col("alert_id"), col("vec_id"),
        round(graft.functions.VectorOps.cosineSim(
          col("embedding"), col("avec")), 6).as("score"),
        col("threshold"))
      .where(col("score") >= col("threshold"))
      .select(col("alert_id"), col("vec_id"), col("score"))
  }

  /** HYBRID percolation — a saved search with BOTH a conjunctive term
    * list and a query vector: the alert fires only on documents that
    * contain every term AND embed within the alert's similarity
    * threshold (the production alerting pattern: the keyword conjunction
    * is the cheap high-precision prefilter, the semantic check confirms).
    * Composed to exploit exactly that: [[matches]] fires the term arm
    * first, and ONLY the fired (alert, doc) pairs join their embeddings
    * and pay the cosine — the vector work is fired-set-sized, never
    * corpus × alerts. `alerts(alert_id, terms, avec, threshold)`;
    * embeddings join `docs` on `idCol` == vec_id (the point-collection
    * contract). Output (alert_id, idCol, score). */
  def hybridMatches(docs: DataFrame, embeddings: DataFrame,
                    alerts: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val fired = matches(docs,
      alerts.select(col("alert_id"), col("terms")), idCol, textCol)
    fired
      .join(embeddings.withColumnRenamed("vec_id", idCol), Seq(idCol))
      .join(broadcast(alerts.select(
        col("alert_id"), col("avec"), col("threshold"))), Seq("alert_id"))
      .select(col("alert_id"), col(idCol),
        round(graft.functions.VectorOps.cosineSim(
          col("embedding"), col("avec")), 6).as("score"),
        col("threshold"))
      .where(col("score") >= col("threshold"))
      .select(col("alert_id"), col(idCol), col("score"))
  }

  /** [[hybridMatches]] at ALERT-CORPUS scale — the composition the
    * million-alert subscription set needs (neither arm broadcasts the
    * alert table): the term conjunction fires through
    * [[matchesInverted]] (anchor-term equi-join — the saved queries are
    * themselves indexed), and the vector confirm turns the join around —
    * the FIRED set (with its doc embeddings attached) broadcasts INTO
    * one pass over the alert table, so the cosine work stays
    * fired-set-sized and the alert table is never shuffled or
    * broadcast. Value-identical to [[hybridMatches]] (the s30b oracle
    * states both arms in SQL); `dfLookup` as in [[matchesInverted]].
    * Output (alert_id, idCol, score). */
  def hybridMatchesInverted(docs: DataFrame, embeddings: DataFrame,
                            alerts: DataFrame, idCol: String,
                            textCol: String,
                            dfLookup: Option[DataFrame] = None): DataFrame = {
    val fired = matchesInverted(docs,
      alerts.select(col("alert_id"), col("terms")), idCol, textCol, dfLookup)
    val firedEmb = fired
      .join(embeddings.withColumnRenamed("vec_id", idCol), Seq(idCol))
    alerts.select(col("alert_id"), col("avec"), col("threshold"))
      .join(broadcast(firedEmb), Seq("alert_id"))
      .select(col("alert_id"), col(idCol),
        round(graft.functions.VectorOps.cosineSim(
          col("embedding"), col("avec")), 6).as("score"),
        col("threshold"))
      .where(col("score") >= col("threshold"))
      .select(col("alert_id"), col(idCol), col("score"))
  }
}
