package graft

import graft.operators.TextOps
import graft.sources.Tables

/** Training-cost measurement for the BPE tiers: the registered
  * `bpe_merges` query reads the persisted artifact (so the suite bench
  * shows the amortized consumer, like every `*_stored` query), and this
  * main times the BUILD — `bpeTrain` end-to-end, corpus word-frequency
  * aggregate included — on the ×N stress corpora behind the SCALE.md
  * ladder.
  *
  * Run: sbt "runMain graft.BpeScaleBench /root/testdata/sf0.1 /tmp/graft_x10 /tmp/graft_x100"
  */
object BpeScaleBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-bpe-xbench")
    for (d <- dirs) {
      val docs = Tables.load(spark, d, "documents")
      def once(): Double = {
        val t0 = System.nanoTime()
        // count() forces the full train including every per-round argmax;
        // the merge frame is K rows, so the materialization cost is the
        // training itself
        TextOps.bpeTrain(docs, rounds = 10).write.format("noop")
          .mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val t = math.min(once(), once())
      val vocab = docs
        .select(org.apache.spark.sql.functions.explode(
          TextOps.tokensOf("text")).as("w"))
        .distinct().count()
      println(f"[bpe-xbench] dir=$d train_s=$t%.2f distinct_words=$vocab")
    }
    spark.stop()
  }
}
