package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators ([EXT], SURVEY.md §2.11): exact, MinHash+LSH,
  * SimHash, and exact n-gram Jaccard.
  *
  * Design for 100 TB:
  *  - Everything is expressed as explode → shuffle-on-key → aggregate, the
  *    shape that scales linearly with executors. There is no all-pairs
  *    comparison anywhere: candidate generation is always an equi-join on a
  *    bucket key (shingle, LSH band), never a cartesian.
  *  - The hash functions are engine-portable by construction: a 32-bit
  *    integer is derived from the md5 hex prefix (identical in any engine),
  *    then passed through (a·h + b) mod p universal hashing. This makes the
  *    whole family DuckDB-oracle-checkable — rare for MinHash pipelines —
  *    and deterministic across partitionings/retries, which is what makes
  *    a 100 TB dedup run resumable.
  */
object DedupOps {

  /** Mersenne prime 2^31-1; a·h stays far below 2^63 for a ≤ 2^20. */
  val P: Long = 2147483647L

  /** 16 fixed universal-hash parameter pairs (odd multipliers). */
  val Seeds: Seq[(Int, Long, Long)] = Seq(
    (0, 7L, 3L), (1, 11L, 17L), (2, 13L, 29L), (3, 17L, 41L),
    (4, 19L, 53L), (5, 23L, 67L), (6, 29L, 79L), (7, 31L, 97L),
    (8, 37L, 103L), (9, 41L, 113L), (10, 43L, 127L), (11, 47L, 137L),
    (12, 53L, 149L), (13, 59L, 157L), (14, 61L, 167L), (15, 67L, 179L))

  /** LSH banding: 16 minhashes → 4 bands × 4 rows. */
  val NumBands = 4
  val RowsPerBand = 4

  /** Exact dedup: one representative (min doc_id) per distinct text.
    * groupBy-min, not dropDuplicates — dropDuplicates keeps an *arbitrary*
    * row per key, which is nondeterministic across partitionings; min() is
    * reproducible at any scale.
    */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("text"))

  /** Distinct word-level 3-shingles per doc, exploded to (doc_id, shingle)
    * rows. Word shingles (not tokens) because candidate joins on a
    * small-vocabulary corpus would otherwise degenerate: a 31-word vocab
    * gives ~30k distinct 3-shingles vs 31 distinct tokens, keeping the
    * inverted-index buckets small.
    */
  def shingles(documents: DataFrame): DataFrame = {
    val toks = TextOps.tokensOf("text")
    documents
      .select(
        col("doc_id"),
        explode(when(size(toks) >= 3,
          expr(s"array_distinct(transform(sequence(0, size(${shingleToks}) - 3), " +
            s"i -> concat_ws(' ', ${shingleToks}[i], ${shingleToks}[i+1], ${shingleToks}[i+2])))"))
          .otherwise(expr("cast(array() as array<string>)"))).as("shingle"))
  }
  private val shingleToks = s"regexp_extract_all(lower(text), '${TextOps.TokenPattern}', 0)"

  /** Portable 32-bit shingle hash: first 8 md5 hex digits as an integer.
    * `conv` is the Spark spelling; DuckDB casts '0x…' directly.
    */
  private def h32(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  private def seedsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seeds.toDF("hash_idx", "a", "b")
  }

  /** MinHash signatures, long form (doc_id, hash_idx, minhash): explode
    * shingles × broadcast 16 seeds → min over (a·h32+b) mod p per
    * (doc, seed). One shuffle on doc_id; the seeds side is a broadcast of
    * 16 rows, so the fan-out is map-side.
    */
  def minhashSignatures(documents: DataFrame): DataFrame = {
    val sh = shingles(documents).withColumn("hv", h32(col("shingle")))
    sh.join(broadcast(seedsDf(documents.sparkSession)))
      .groupBy(col("doc_id"), col("hash_idx"))
      .agg(min((col("a") * col("hv") + col("b")) % P).as("minhash"))
  }

  /** LSH band keys: the 16 minhashes folded into NumBands keys of
    * RowsPerBand each; docs agreeing on any band key are near-dup
    * candidates. Key = comma-joined minhashes in hash_idx order
    * (deterministic via array_sort on (hash_idx, minhash) structs).
    */
  def lshBands(documents: DataFrame): DataFrame =
    minhashSignatures(documents)
      .withColumn("band", (col("hash_idx") / RowsPerBand).cast(IntegerType))
      .groupBy(col("doc_id"), col("band"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(hash_idx, minhash))), " +
          "x -> cast(x.minhash as string)), ',')").as("band_key"))

  /** Candidate near-dup pairs: self-equi-join on (band, band_key). This is
    * the whole point of LSH at scale — the join key is the bucket, so the
    * shuffle distributes by bucket and no executor ever sees the full
    * corpus. doc_a < doc_b halves the output; DISTINCT collapses pairs
    * that collide in multiple bands.
    */
  def minhashCandidatePairs(documents: DataFrame): DataFrame = {
    val bands = lshBands(documents)
    val b1 = bands.select(col("band"), col("band_key"), col("doc_id").as("doc_a"))
    val b2 = bands.select(col("band"), col("band_key"), col("doc_id").as("doc_b"))
    b1.join(b2, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle —
    * inverted-index join (shuffle on shingle), never all-pairs. Emits pairs
    * with similarity ≥ threshold. At 100 TB the shingle buckets stay small
    * as long as shingle entropy is high (wordcount³); a stop-shingle filter
    * (drop the top-frequency shingles) is the standard skew guard and drops
    * in here as one extra filter.
    */
  def jaccardPairs(documents: DataFrame, threshold: Double): DataFrame = {
    val sh = shingles(documents)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = sh.as("x").join(sh.as("y"), Seq("shingle"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        round(col("common").cast(DoubleType) /
          (col("na") + col("nb") - col("common")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash per document: per (doc, bit) majority vote over shingle
    * hash bits, folded back to one long. Relational formulation (explode
    * 32 bit positions per shingle) so it shuffles by doc and scales out;
    * near-dup detection = hamming distance on the signatures.
    */
  def simhash(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val bits = broadcast((0 until 32).toDF("bit"))
    shingles(documents)
      .withColumn("hv", h32(col("shingle")))
      .join(bits)
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(when(expr("shiftright(hv, bit) & 1") === 1, 1).otherwise(-1)).as("vote"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("vote") > 0, expr("shiftleft(1L, bit)")).otherwise(0L))
        .cast(LongType).as("simhash"))
  }
}
