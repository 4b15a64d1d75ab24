package graft

import org.apache.spark.sql.functions._

/** Stress-corpus generator for the scaling-exponent measurements in
  * SCALE.md: N vocabulary-disjoint shards, each structurally identical to
  * the source `documents` table.
  *
  * Shard k ≥ 1 offsets doc_id by k·10⁶ and suffixes every
  * whitespace-token with the alphanumeric tag `q<k>`. Under the engine's
  * `[a-z0-9]+` tokenizer that is (for clean tokens) a BIJECTIVE token
  * relabeling, so within-shard Jaccard/MinHash/SimHash similarity is
  * exactly preserved — every dup family recurs once per shard — while
  * cross-shard similarity is zero (disjoint vocabularies). Expected
  * output volume (dup pairs, components, survivors) therefore scales
  * exactly ×N, which is what makes runtime exponents attributable to the
  * ENGINE rather than to data-structure drift. Known deviation from a
  * real ×N corpus: no cross-shard near-dups exist, so LSH bucket sizes
  * stay flat instead of creeping — documented next to the measurements.
  *
  * Usage: runMain graft.ScaleDataGen [srcSfDir] [outDir] [copies]
  */
object ScaleDataGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.getOrCreate("graft-scale-gen")
    val docs = graft.sources.Tables.load(spark, src, "documents")
    // Shard stride from the data, not a constant: a fixed 10⁶ would make
    // shard id ranges overlap for any source corpus with doc_id ≥ 10⁶,
    // silently merging shards and corrupting the exact-×N output
    // invariant every SCALE.md exponent relies on.
    val stride = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val shards = (0 until copies).map { k =>
      if (k == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(k * stride))
        .withColumn("text",
          expr(s"array_join(transform(split(text, ' '), t -> concat(t, 'q$k')), ' ')"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    shards.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    spark.stop()
  }
}
