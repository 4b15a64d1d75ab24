package graft

import org.apache.spark.sql.DataFrame

import graft.operators.SimilarityOps

/** Outlier ladder for the int8 brute tier's ×100 exponent (r8 verdict
  * ask #4): decompose `cosine_topk_int8` into its quantize and score
  * stages and time each in isolation, so the super-linear term gets a
  * NAME (the r7 outlier-ladder method). If full ≈ quantize + score, the
  * plan evaluates the quantizer once per corpus row; if full ≫ quantize
  * + score, the interpreted HOF quantize expression is being re-run per
  * scored pair (projection collapsed above the broadcast join).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_x100 runMain graft.Int8ScaleAudit
  */
object Int8ScaleAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_x100")
    val spark = GraftSession.getOrCreate("graft-int8-audit")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def time(name: String)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm-up
      spark.catalog.clearCache() // Bench parity: each timed run pays the full path
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[int8-audit] $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
    }
    time("quantize_only") { SimilarityOps.quantizeInt8(emb) }
    time("full_query") { SimilarityOps.cosineTopKInt8(emb, 10, 5) }
    // materialized quantized frame: score stage in isolation
    val q = SimilarityOps.quantizeInt8(emb).localCheckpoint()
    time("score_only") { SimilarityOps.topKOverQuantized(q, 10, 5) }
    q.unpersist()
    time("brute_float_ref") { SimilarityOps.cosineTopK(emb, 10, 5) }
    spark.stop()
  }
}
