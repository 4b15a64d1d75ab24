package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.SparkPlan

/** Enumerates registered queries whose PHYSICAL plan contains a
  * WindowExec with an empty partition spec — the single-reducer shape
  * the constant-key idiom exists to avoid. Plans are built at sf0.001
  * and never executed. Prints one line per offender (query, window).
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate("graft-window-audit")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      System.err.println(s"[window-audit-q] $name")
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan
        def walk(p: SparkPlan): Unit = {
          p match {
            case w: WindowExec if w.partitionSpec.isEmpty =>
              bad += 1
              println(s"[global-window] $name :: ${w.windowExpression.mkString(";").take(120)}")
            case _ =>
          }
          p.children.foreach(walk)
          p.subqueries.foreach(walk)
        }
        walk(plan)
      } catch {
        case e: Throwable => println(s"[plan-error] $name: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    println(s"[summary] offenders=$bad")
    spark.stop()
  }
}
