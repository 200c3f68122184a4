package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-stable hashing (reference §2.8 F4/F5).
  *
  * The reference derives point ids with Python's process-salted `hash()`
  * (`/root/reference/app/main.py:137`) — non-reproducible by design. A
  * distributed engine needs stable ids, so we derive them from md5, which
  * every engine (Spark, DuckDB, any oracle) computes identically.
  */
object HashOps {

  /** Stable 60-bit id from a string key: first 15 hex chars of md5.
    * Mirrors `abs(hash(part_number)) % 2**63` (`app/main.py:137`) but
    * deterministic across processes and engines. */
  def stableId(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Stable 32-bit token hash (for MinHash permutations / SimHash bits). */
  def tokenHash32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Content hash for delta-import change detection: sha256 over a
    * canonical field concatenation (reference hashes sorted-key JSON,
    * `app/services/document_service.py:328-332`). `concat_ws` skips
    * nulls in both Spark and the oracle, keeping the canonical form
    * stable under missing fields. */
  def contentHash(cols: Column*): Column =
    sha2(concat_ws("|", cols: _*), 256)
}
