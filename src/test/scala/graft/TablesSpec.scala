package graft

import graft.sources.Tables

/** Typed readers + DDL against the real sf0.001 testdata. */
class TablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("typed Dataset readers: schemas line up with the case classes") {
    val orders = Tables.ordersDs(spark, dir)
    assert(orders.head().o_orderkey >= 0)
    val docs = Tables.documentsDs(spark, dir)
    assert(docs.filter(_.text.nonEmpty).count() > 0)
    val events = Tables.eventsDs(spark, dir)
    val e = events.head()
    assert(e.ts != null && Set("signup", "purchase", "view", "click", "error")(e.event_type))
  }

  test("createRawFinancialTable is idempotent DDL (S7)") {
    Tables.createRawFinancialTable(spark, "tspec_raw")
    Tables.createRawFinancialTable(spark, "tspec_raw") // IF NOT EXISTS: no throw
    val schema = spark.table("tspec_raw").schema
    assert(schema.map(_.name) == Seq("series_id", "observation_date", "value"))
    spark.sql("DROP TABLE tspec_raw")
  }
}
