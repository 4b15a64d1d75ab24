package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Diagnostic main for SCALE.md: recall@5 of the PQ/ADC tier with and
  * without the OPQ-lite rotation (top-4 PCA basis → Householder
  * rotation, one principal direction per subspace), for both seeded and
  * Lloyd-trained codebooks. Ground truth is full-precision brute top-5
  * in the ORIGINAL space (rotation is orthogonal, so rotated-space
  * cosine is the same retrieval problem up to micros quantization).
  *
  * Usage: runMain graft.OpqRecallProbe <sfDir> [lloydIters]
  */
object OpqRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val iters = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = GraftSession.getOrCreate("graft-opq-probe")
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings").persist()
    val rot = SimilarityOps.opqRotate(emb, SimilarityOps.opqRotationVectors(emb))
      .persist()
    val brute = SimilarityOps.cosineTopK(emb, 10, 5)
      .select(col("q_id"), col("vec_id")).persist()
    def recall(hits: org.apache.spark.sql.DataFrame): Double = {
      val h = hits.select(col("q_id"), col("vec_id")).withColumn("hit", lit(1))
      brute.join(h, Seq("q_id", "vec_id"), "left")
        .agg(avg(coalesce(col("hit"), lit(0)).cast("double"))).head().getDouble(0)
    }
    val rows = Seq(
      "seeded"        -> recall(SimilarityOps.pqTopK(emb, 10, 5)),
      "seeded_opq"    -> recall(SimilarityOps.pqTopK(rot, 10, 5)),
      "trained"       -> recall(SimilarityOps.pqTopKWith(emb,
        SimilarityOps.pqTrainCodebooks(emb, iters = iters), 10, 5)),
      "trained_opq"   -> recall(SimilarityOps.pqTopKWith(rot,
        SimilarityOps.pqTrainCodebooks(rot, iters = iters), 10, 5)))
    rows.foreach { case (name, r) =>
      println(f"[opq-recall] sf=$sfDir%s codebook=$name%-12s recall@5=$r%.3f")
    }
    spark.stop()
  }
}
