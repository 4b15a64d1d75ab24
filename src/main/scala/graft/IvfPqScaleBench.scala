package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Amortization measurement for the persisted IVF-PQ index (SCALE.md r8
  * "Lesson 2"): on the same corpus, time the inline composed tier
  * (index build + query fused in one plan) against `writeIvfPqIndex`
  * once + `ivfPqTopKFromIndex` per batch — the number that prices the
  * build-once/probe-many trade the index exists for.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_x100 sbt "runMain graft.IvfPqScaleBench"
  */
object IvfPqScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_x100")
    val spark = GraftSession.getOrCreate("graft-ivfpq-xbench")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-amort").toString
    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[amort] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      spark.catalog.clearCache()
    }
    val t0 = System.nanoTime()
    SimilarityOps.writeIvfPqIndex(emb, dir)
    println(f"[amort] build+write index   ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    time("probe-only batch 1") {
      SimilarityOps.ivfPqTopKFromIndex(spark, dir, queries, k = 5) }
    time("probe-only batch 2") {
      SimilarityOps.ivfPqTopKFromIndex(spark, dir, queries, k = 5) }
    time("inline end-to-end") { SimilarityOps.ivfPqTopK(emb, 10, 5) }
    spark.stop()
  }
}
