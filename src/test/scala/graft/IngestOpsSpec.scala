package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.IngestOps

/** Ingest sinks/defaults (SURVEY.md §2.1 S3/S5, §2.7 F5/F8, §2.8 O6). */
class IngestOpsSpec extends SparkSpec {
  import spark.implicits._

  test("raw JSON sink round-trips (S3)") {
    val dir = Files.createTempDirectory("graft-json").toString + "/raw"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    IngestOps.writeRawJson(df, dir)
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    assert(back.columns.sorted.toSeq == Seq("id", "v"))
  }

  test("run-date CSV sink creates a prunable dt partition (S5/F8)") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/raw"
    val df = Seq(("AAPL", 10.0), ("MSFT", 20.0)).toDF("symbol", "value")
    IngestOps.writeRunDateCsv(df, dir, "2024-06-01")
    // partition directory layout carries the run date
    assert(new java.io.File(s"$dir/dt=2024-06-01").exists())
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.columns.contains("dt"))
    assert(back.filter(col("dt") === "2024-06-01").count() == 2)
  }

  test("ingest timestamp default is populated (F5)") {
    val df = IngestOps.withIngestTimestamp(Seq(1, 2).toDF("id"))
    assert(df.filter(col("created_at").isNull).count() == 0)
  }

  test("writeJdbc reaches the JDBC layer (S11) — no endpoint/driver in sandbox") {
    // no warehouse exists here, so success == the options assemble and the
    // call fails inside JDBC driver resolution, not in our plumbing
    val e = intercept[Exception] {
      IngestOps.writeJdbc(Seq((1L, "x")).toDF("id", "v"),
        "jdbc:postgresql://localhost:1/nope", "t", "u", "p", numPartitions = 1)
    }
    val msg = (e.toString + Option(e.getCause).mkString).toLowerCase
    assert(msg.contains("driver") || msg.contains("connect"))
  }

  test("writeJdbc round-trips through embedded Derby (S11): create-on-append, batch insert, re-append") {
    // Derby ships in /opt/spark/jars (the Hive-metastore backend), so the
    // REAL execution path — dialect DDL, batched inserts, connection-capped
    // partitions — runs end-to-end in-memory; only the warehouse brand
    // differs from the reference's Postgres.
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val rows = (1L to 100L).map(i => (i, s"name$i", i * 1.5))
    IngestOps.writeJdbc(rows.toDF("id", "name", "v"), url, "mart_kpis",
      user = "app", password = "app", numPartitions = 4, batchSize = 16)
    def readBack() = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "mart_kpis").load()
    assert(readBack().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet == rows.toSet)
    // append mode: second write adds rows, never recreates
    IngestOps.writeJdbc(rows.take(5).toDF("id", "name", "v"), url, "mart_kpis",
      "app", "app", numPartitions = 1)
    assert(readBack().count() == 105)
  }

  test("appendRunPartition: per-partition overwrite is idempotent (O6)") {
    val table = "ingest_spec_incremental"
    IngestOps.appendRunPartition(Seq((1L, "x")).toDF("id", "v"), table, "2024-06-01")
    IngestOps.appendRunPartition(Seq((2L, "y")).toDF("id", "v"), table, "2024-06-02")
    // re-run of day 1 replaces only that partition
    IngestOps.appendRunPartition(Seq((3L, "z")).toDF("id", "v"), table, "2024-06-01")
    val got = spark.table(table).select("id", "dt").as[(Long, String)].collect().toSet
    assert(got == Set((3L, "2024-06-01"), (2L, "2024-06-02")))
    spark.sql(s"DROP TABLE $table")
  }
}
