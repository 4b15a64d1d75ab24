package graft

/** Plan auditor: prints `explain("formatted")` for selected (or all)
  * registered queries so scan pushdown, broadcast choices, and codegen
  * coverage can be reviewed — the "is this the plan you'd want at 100 TB"
  * loop from SURVEY.md §4.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate("graft-plan-audit")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n=== $name ===")
          fn(spark, sfDir).explain("formatted")
        case None => println(s"\n=== $name: not registered ===")
      }
    }
    spark.stop()
  }
}
