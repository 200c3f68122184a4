package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashOps

/** Document lifecycle operators (reference §2.10/§2.11: delta import N2,
  * cleanup anti-join S6/J5, versioned upsert N3/Q11, export S8, validation
  * P7).
  *
  * The reference does all of this with per-document point lookups over
  * gRPC (`document_service.py`); here each lifecycle step is a set
  * operation — one distributed join instead of N round-trips — which is
  * the only shape that survives 100 TB:
  *  - change detection = join on id + content-hash inequality
  *  - delete-missing  = left anti join
  *  - latest-version  = ranking window over (id, version)
  */
object Lifecycle {

  /** Content hash per document (J4's `_get_content_hash`,
    * `document_service.py:328-332`): sha256 over the canonical field
    * concatenation. */
  def withContentHash(docs: DataFrame, idCol: String, fields: Seq[String]): DataFrame =
    docs.withColumn("content_hash", HashOps.contentHash(fields.map(col): _*))

  /** Delta-import change detection (J4/N2, `document_service.py:391-421`):
    * classify incoming docs as 'new' (id absent from existing) or
    * 'changed' (content hash differs); unchanged docs are dropped —
    * that's the whole point of delta import. */
  def deltaDetect(existing: DataFrame, incoming: DataFrame, idCol: String,
                  fields: Seq[String]): DataFrame = {
    val e = withContentHash(existing, idCol, fields)
      .select(col(idCol), col("content_hash").as("hash_old"))
    val i = withContentHash(incoming, idCol, fields)
      .select(col(idCol), col("content_hash").as("hash_new"))
    i.join(e, Seq(idCol), "left_outer")
      .withColumn("status",
        when(col("hash_old").isNull, lit("new"))
          .when(col("hash_old") =!= col("hash_new"), lit("changed")))
      .where(col("status").isNotNull)
      .select(col(idCol), col("status"))
      .orderBy(col(idCol))
  }

  /** Cleanup anti-join (S6/J5, `app/core/database.py:204-225`): ids present
    * in the store but absent from a full reload → delete set. */
  def cleanupDeletes(existing: DataFrame, incoming: DataFrame, idCol: String): DataFrame =
    existing.select(col(idCol))
      .join(incoming.select(col(idCol)), Seq(idCol), "left_anti")
      .orderBy(col(idCol))

  /** Latest-version view over an append-only versioned table (N3/Q11,
    * `version_service.py:49-110`): SCD-2-style — rank by version desc per
    * id, keep rank 1. The history collection is simply `rank > 1`. */
  def latestVersions(versioned: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("version").desc)
    versioned.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
  }

  /** Retention vacuum: keep each id's newest `keep` versions, dropping
    * older ones — the housekeeping pass every versioned store runs so
    * history doesn't grow without bound (pair with [[asOfVersion]]:
    * time travel only reaches versions retention has kept). One window
    * per id, same cost class as [[latestVersions]]; the survivors are
    * what a `Store.replaceSnapshot` persists back. */
  def vacuumVersions(versioned: DataFrame, idCol: String, keep: Int): DataFrame = {
    require(keep > 0, s"keep must be positive, got $keep")
    val w = Window.partitionBy(col(idCol)).orderBy(col("version").desc)
    versioned.withColumn("rn", row_number().over(w))
      .where(col("rn") <= keep).drop("rn")
  }

  /** Time-travel read: the table AS OF version `v` — for each id, the
    * newest row whose version is <= v; ids born after v are absent. The
    * snapshot-isolation read every versioned store owes its users
    * (lakehouse `VERSION AS OF`): one window over the version-filtered
    * scan, so at 100 TB the cost is the same as [[latestVersions]] and
    * the predicate prunes whole files wherever the layout sorts or
    * partitions by version. */
  def asOfVersion(versioned: DataFrame, idCol: String, v: Int): DataFrame =
    latestVersions(versioned.where(col("version") <= v), idCol)

  /** History view: every superseded version, with the back-pointer id the
    * reference stores as `"{id}_v{version}"` (`version_service.py:112-134`). */
  def historyVersions(versioned: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("version").desc)
    versioned.withColumn("rn", row_number().over(w))
      .where(col("rn") > 1).drop("rn")
      .withColumn("history_id",
        concat(col(idCol).cast("string"), lit("_v"), col("version").cast("string")))
  }

  /** CDC changelog apply — fold a stream of keyed I/U/D operations into a
    * base snapshot and return the next snapshot (the lakehouse MERGE
    * shape; the reference replays its import log one document at a time,
    * `document_service.py:477-526` — at 100 TB the replay must be a
    * set operation).
    *
    * `changes` carries (key, seqCol, opCol, <payload = base columns>);
    * per key the HIGHEST seq wins (last-writer-wins). The winner election
    * is `max(struct(seq, payload...))` — a partial-aggregated MIN/MAX,
    * not a window, so a hot key (one document updated 10⁶ times in the
    * batch) collapses map-side instead of funneling a partition. Apply is
    * then one full-outer join against the base:
    *
    *  - key only in base            → unchanged base row
    *  - winner op 'D'               → dropped (even if absent from base)
    *  - winner op 'I'/'U' (upsert)  → the winner's payload
    *
    * `seqCol` values must be unique per key (any total order: log offset,
    * commit LSN, file+row position) — required for a deterministic fold,
    * and true of every real changelog. Payload columns must match
    * `base.columns` minus nothing: full-row images (Debezium-style after
    * images), not column deltas.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, idCol: String,
                     seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.toSeq
    require(payload.contains(idCol), s"base must carry $idCol")
    require(!payload.contains(seqCol) && !payload.contains(opCol),
      s"base columns must not collide with $seqCol/$opCol")
    // last-writer-wins election rides ONE partial aggregate: struct
    // ordering is field-by-field, so putting seq first makes max() pick
    // the highest-seq row and carry its op+payload atomically
    val winner = changes
      .groupBy(col(idCol))
      .agg(max(struct((col(seqCol) +: col(opCol) +:
        payload.filterNot(_ == idCol).map(col)): _*)).as("w"))
      .select(col(idCol) +:
        col(s"w.$opCol") +:
        payload.filterNot(_ == idCol).map(c => col(s"w.$c").as(s"__c_$c")): _*)
    base.join(winner, Seq(idCol), "full_outer")
      .where(col(opCol).isNull || col(opCol) =!= "D")
      .select(col(idCol) +: payload.filterNot(_ == idCol).map { c =>
        when(col(opCol).isNotNull, col(s"__c_$c")).otherwise(col(c)).as(c)
      }: _*)
  }

  /** Validation predicate + quarantine split (P7,
    * `document_service.py:166-190`): a doc is valid iff it has an id and a
    * non-empty text field. Returns the full set tagged `is_valid` so both
    * the clean stream and the quarantine stream come from one pass. */
  def validate(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn("is_valid",
      col(idCol).isNotNull && col(textCol).isNotNull && length(col(textCol)) > 0)

  /** Export projection (S8/T6, `document_service.py:528-654`): fixed column
    * order, deterministic sort, optional row cap. */
  def exportShape(docs: DataFrame, cols: Seq[String], orderCol: String,
                  cap: Int): DataFrame = {
    val shaped = docs.select(cols.map(col): _*).orderBy(col(orderCol))
    if (cap > 0) shaped.limit(cap) else shaped
  }

  /** S8 sink: write the export as JSON lines. Key order in each JSON
    * object = column order (the reference's "fixed key order"); the
    * reference's single-array-file shape needs `coalesce(1)` — the
    * default keeps write parallelism for large exports. */
  def exportJson(docs: DataFrame, cols: Seq[String], orderCol: String,
                 cap: Int, path: String, singleFile: Boolean = false): Unit = {
    val shaped = exportShape(docs, cols, orderCol, cap)
    (if (singleFile) shaped.coalesce(1) else shaped)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).json(path)
  }

  /** One row per field of `df`: (field, dtype, null_frac) — the schema
    * half of the reference's field profiling (`list_qdrant_fields.py`
    * inspects live payload fields the same way). All per-field null
    * counts ride ONE aggregation pass (an array of struct aggregates,
    * exploded after the agg) — never one job per column. */
  def schemaProfile(df: DataFrame): DataFrame = {
    val items = df.schema.fields.map { f =>
      struct(lit(f.name).as("field"),
        lit(f.dataType.simpleString).as("dtype"),
        round(avg(when(col(f.name).isNull, 1.0).otherwise(0.0)), 6)
          .as("null_frac"))
    }
    df.agg(array(items.toIndexedSeq: _*).as("p"))
      .select(explode(col("p")).as("f"))
      .select(col("f.field"), col("f.dtype"), col("f.null_frac"))
  }

  /** Schema-drift report between two ingest batches: fields `added` /
    * `removed` / `type_changed` / `kept`, with each side's null fraction
    * (a null-rate jump on a kept field is the upstream-regression signal
    * a type check alone misses). The join is over two field-count-sized
    * profiles — corpus cost is the two profile passes, nothing else. */
  def schemaDrift(a: DataFrame, b: DataFrame): DataFrame = {
    val pa = schemaProfile(a).select(col("field"),
      col("dtype").as("dtype_a"), col("null_frac").as("null_frac_a"))
    val pb = schemaProfile(b).select(col("field"),
      col("dtype").as("dtype_b"), col("null_frac").as("null_frac_b"))
    pa.join(pb, Seq("field"), "full_outer")
      .select(col("field"),
        when(col("dtype_a").isNull, "added")
          .when(col("dtype_b").isNull, "removed")
          .when(col("dtype_a") =!= col("dtype_b"), "type_changed")
          .otherwise("kept").as("status"),
        col("dtype_a"), col("dtype_b"),
        col("null_frac_a"), col("null_frac_b"))
  }
}
