package graft

/** Full-registry execution smoke at the Sf1Ladder's 10× expansion: every
  * registered query runs ONCE against the expanded fixture through the
  * noop-write harness; any exception (ANSI overflow, divide-by-zero on a
  * shape the small SFs never produce, OOM-ish plan explosions) prints as
  * a `[sf1-smoke-fail]` line. The sf1 ladder's two LONG-overflow catches
  * both came from queries that were hash-green at every tested SF — this
  * is the systematic version of that hunt.
  *
  * Usage: runMain graft.Sf1Smoke [startAfterQueryName]
  */
object Sf1Smoke {
  def main(args: Array[String]): Unit = {
    val startAfter = args.headOption
    val spark = GraftSession.getOrCreate("graft-sf1-smoke")
    val sf1 = "/tmp/graft_sf1_ladder"
    Sf1Ladder.expand(spark, "/root/testdata/sf0.1", sf1)
    var failed = 0
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .dropWhile { case (n, _) => startAfter.exists(n <= _) }
    names.foreach { case (name, fn) =>
      System.err.println(s"[sf1-smoke] start $name")
      val t0 = System.nanoTime()
      try {
        fn(spark, sf1).write.format("noop").mode("overwrite").save()
        println(f"[sf1-smoke-ok] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      } catch { case e: Throwable =>
        failed += 1
        println(s"[sf1-smoke-fail] $name: ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ").take(400))
      } finally spark.catalog.clearCache()
    }
    println(s"[sf1-smoke-summary] failed=$failed of ${names.size}")
    spark.stop()
  }
}
