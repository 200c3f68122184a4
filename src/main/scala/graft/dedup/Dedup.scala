package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashOps, TextOps}

/** Deduplication operators for training-data pipelines (the 100 TB
  * extension the reference never needed — SURVEY §7.1 step 10).
  *
  * Scale design notes:
  *  - exact dedup is one hash-groupBy — a single shuffle on the dedup key;
  *  - MinHash/LSH replaces the quadratic all-pairs comparison with a
  *    band-bucket equi-join: candidates shuffle on band keys only, and the
  *    expensive true-Jaccard check runs on candidates, not on N²;
  *  - blocked Jaccard/cosine joins shuffle on the block key (lang / label),
  *    which is the classic blocking strategy — no cross-partition N².
  * All hash arithmetic is md5-derived int64 (cross-engine deterministic,
  * see HashOps) and stays far below 2^63 — no overflow on any engine.
  */
object Dedup {

  /** Exact dedup on a normalized key: the sorted distinct token set (catches
    * reorderings and repeats, not just byte-identical text). One shuffle.
    * Emits groups with more than one member: (keeper = min id, n_dups). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol),
        array_join(array_sort(array_distinct(TextOps.tokens(col(textCol)))), " ")
          .as("dedup_key"))
      .groupBy(col("dedup_key"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("group_size"))
      .where(col("group_size") > 1)
      .select(col("keeper"), col("group_size"))
      .orderBy(col("keeper"))

  /** Word n-gram shingle sets per doc: (id, blockCol, shingles). */
  private def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                          blockCol: String, n: Int): DataFrame =
    docs.select(col(idCol), col(blockCol),
      TextOps.shingles(TextOps.tokens(col(textCol)), n).as("sh"))
      .where(size(col("sh")) > 0)

  /** All-pairs n-gram Jaccard within a blocking key (lang): pairs with
    * similarity >= threshold. Jaccard is a ratio of small ints — exactly
    * reproducible in any engine, no FP drift. */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   blockCol: String, n: Int, threshold: Double): DataFrame = {
    val s = shingleSets(docs, idCol, textCol, blockCol, n)
    val a = s.select(col(blockCol), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = s.select(col(blockCol), col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq(blockCol))
      .where(col("id_a") < col("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** MinHash parameters: k=16 permutations h_j(x) = (a_j·x + b_j) mod p
    * over 32-bit md5 token hashes; 4 bands × 4 rows. a_j < 2^24 and
    * x < 2^32 keep a_j·x < 2^56 — exact in int64 everywhere. */
  val MinhashPerms = 16
  val MinhashBandRows = 4
  val MinhashPrime = 4294967311L
  def permA(j: Int): Long = 976369L * (j + 1) + 12345L
  def permB(j: Int): Long = 183451L * (j + 1) + 987L

  /** MinHash signatures: (id, j, sig) — one row per permutation. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame = {
    val sh = shingleSets(docs.withColumn("__blk", lit(1)), idCol, textCol, "__blk", n)
      .select(col(idCol), explode(col("sh")).as("shingle"))
      .select(col(idCol), HashOps.tokenHash32(col("shingle")).as("hv"))
    val perms = (0 until MinhashPerms).map { j =>
      struct(lit(j).as("j"), lit(permA(j)).as("a"), lit(permB(j)).as("b"))
    }
    sh.select(col(idCol), col("hv"), explode(array(perms: _*)).as("p"))
      .select(col(idCol), col("p.j").as("j"),
        ((col("p.a") * col("hv") + col("p.b")) % MinhashPrime).as("hj"))
      .groupBy(col(idCol), col("j"))
      .agg(min(col("hj")).as("sig"))
  }

  /** MinHash + LSH near-dup pairs: band-bucket join proposes candidates,
    * true shingle Jaccard >= threshold confirms. Output
    * (id_a, id_b, jaccard), deterministic ordering. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 n: Int, threshold: Double): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, n)
    val bands = sigs
      .withColumn("band_id", (col("j") / MinhashBandRows).cast("int"))
      .groupBy(col(idCol), col("band_id"))
      .agg(array_join(array_sort(collect_list(
        format_string("%02d:%d", col("j"), col("sig")))), ",").as("band"))
    val a = bands.select(col("band_id"), col("band"), col(idCol).as("id_a"))
    val b = bands.select(col("band_id"), col("band"), col(idCol).as("id_b"))
    val cand = a.join(b, Seq("band_id", "band"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()

    val sets = shingleSets(docs.withColumn("__blk", lit(1)), idCol, textCol, "__blk", n)
      .select(col(idCol), col("sh"))
    cand
      .join(sets.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** 32-bit SimHash per document: tf-weighted ±1 vote per bit of the md5
    * token hash; bit set where the vote sum is positive. Pure integer
    * arithmetic — deterministic across engines. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("hv", HashOps.tokenHash32(col("tok")))
    // 32 static vote sums in ONE aggregation: a single shuffle per doc with
    // full map-side partial aggregation (vs exploding 32 bit-rows per token).
    val voteAggs = (0 until 32).map { bi =>
      sum(col("tf") *
        (shiftright(col("hv"), bi).bitwiseAND(lit(1L)) * 2 - 1)).as(s"v$bi")
    }
    val votes = tf.groupBy(col(idCol)).agg(voteAggs.head, voteAggs.tail: _*)
    val assembled = (0 until 32)
      .map(bi => when(col(s"v$bi") > 0, lit(1L << bi)).otherwise(lit(0L)))
      .reduce(_ + _)
    votes.select(col(idCol), assembled.as("simhash")).orderBy(col(idCol))
  }
}
