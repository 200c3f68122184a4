package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding merge learning (Sennrich, Haddow & Birch 2016 —
  * the tokenizer-vocabulary induction step of every LLM training
  * pipeline; the reference app tokenizes with a PRE-trained vocabulary,
  * `scripts/indexing.py` model load — learning one is the upstream job).
  *
  * Classic BPE: start from characters (plus a `</w>` end-of-word
  * marker), repeatedly merge the most frequent adjacent symbol pair.
  * Ties break deterministically by (count desc, left asc, right asc),
  * so the learned merge table is bit-identical on any engine.
  *
  * Shape at scale — the Sennrich trick IS the distributed shape: the
  * corpus collapses to a (word, freq) table in ONE shuffle (map-side
  * combined; 100 TB of text is a few million distinct words), and every
  * merge iteration runs over that VOCABULARY-sized table — pair counts
  * are one tiny aggregation, the argmax is a 1-row collect, and the
  * merge itself is a per-row string replace. No iteration ever touches
  * the corpus again; the word-freq base is persisted once and the
  * per-iteration plan stays vocab-sized.
  *
  * Symbol strings ride a control-char separator encoding (U+001F,
  * never in text): symbols joined and bracketed by DOUBLE separators,
  * each merge a literal one-pass replace of `␟L␟␟R␟` with `␟LR␟` —
  * left-to-right non-overlapping exactly like the reference
  * implementation's scan, and expressible identically in any engine
  * (the double-sep layout leaves a boundary char for the NEXT match
  * when occurrences are adjacent, where a single-sep pattern would
  * consume it).
  */
object Bpe {

  private val Sep = "\u001f"
  private val SS = Sep + Sep

  /** Learn `nMerges` BPE merges over the whitespace words of `textCol`.
    * Returns (merge_ord, lsym, rsym, merged, pair_count) — the ordered
    * merge table, the artifact a tokenizer ships. Stops early if the
    * vocabulary runs out of adjacent pairs. */
  def bpeMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    val spark = docs.sparkSession
    val init = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), concat(lit(SS),
        array_join(concat(
          filter(split(col("w"), ""), c => c =!= ""),
          array(lit("</w>"))), SS),
        lit(SS)).as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var cur = init
      val merges = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, String, Long)]
      var exhausted = false
      for (i <- 1 to nMerges if !exhausted) {
        // adjacent pairs of the CURRENT symbols, freq-weighted; the
        // symbol array is a staged attribute so the zip touches it once
        val staged = cur.select(col("freq"),
          filter(split(col("s"), Sep), x => x =!= "").as("a"))
        val top = staged
          .select(col("freq"), explode(zip_with(
            col("a"), slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
            (x, y) => struct(x.as("lsym"), y.as("rsym")))).as("p"))
          .where(col("p.rsym").isNotNull) // zip_with pads the tail
          .groupBy(col("p.lsym").as("lsym"), col("p.rsym").as("rsym"))
          .agg(sum(col("freq")).as("c"))
          .orderBy(col("c").desc, col("lsym").asc, col("rsym").asc)
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val l = top.head.getString(0)
          val r = top.head.getString(1)
          val c = top.head.getLong(2)
          merges += ((i.toLong, l, r, l + r, c))
          cur = cur.withColumn("s", replace(col("s"),
            lit(Sep + l + SS + r + Sep), lit(Sep + l + r + Sep)))
        }
      }
      spark.createDataFrame(merges.toSeq)
        .toDF("merge_ord", "lsym", "rsym", "merged", "pair_count")
    } finally { init.unpersist(blocking = false); () }
  }

  /** Apply a learned merge table to a word: the greedy left-to-right
    * merge sequence, as a Column over the same separator encoding —
    * tokenization with the learned vocab. `merges` must be the ordered
    * (lsym, rsym) list from [[bpeMerges]]. */
  def encodeWord(word: org.apache.spark.sql.Column,
                 merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val init = concat(lit(SS),
      array_join(concat(
        filter(split(word, ""), c => c =!= ""),
        array(lit("</w>"))), SS),
      lit(SS))
    val merged = merges.foldLeft(init) { case (s, (l, r)) =>
      replace(s, lit(Sep + l + SS + r + Sep), lit(Sep + l + r + Sep))
    }
    filter(split(merged, Sep), x => x =!= "")
  }
}
