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

  test("writeRangeClustered: per-file key ranges are pairwise disjoint (data skipping at rest)") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft-clustered").toString + "/t"
    val df = (1 to 10000).map(i => ((i * 7919) % 10007).toLong -> s"row$i").toDF("k", "v")
    IngestOps.writeRangeClustered(df, path, "k", files = 4)
    val back = spark.read.parquet(path)
    assert(back.count() == 10000, "clustering must not lose rows")
    // group by physical file: min/max of the cluster key per file
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == 4, s"one file per range partition, got ${ranges.length}")
    for (Array((_, hi), (lo2, _)) <- ranges.sliding(2).map(_.toArray))
      assert(hi < lo2, s"file key ranges overlap: $ranges — min/max stats cannot prune")
    // a hash-partitioned write of the same data does NOT have this property
    val hashed = java.nio.file.Files.createTempDirectory("graft-hashed").toString + "/t"
    df.repartition(4, col("k")).write.parquet(hashed)
    val hr = spark.read.parquet(hashed)
      .groupBy(input_file_name()).agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(hr.sliding(2).map(_.toSeq).exists { case Seq((_, hi), (lo2, _)) => hi >= lo2 },
      "control: hash layout should interleave key ranges")
  }

  test("ORC round-trip: the columnar alternative reads back identically (source breadth)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/t"
    val df = (1 to 500).map(i => (i.toLong, s"v$i", i * 1.5)).toDF("id", "v", "x")
    df.write.orc(dir)
    val back = spark.read.orc(dir)
    // nullability widens through any file format; names/types must hold
    assert(back.schema.map(f => (f.name, f.dataType)) == df.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().map(_.toString).sorted.sameElements(
      df.collect().map(_.toString).sorted))
  }

  test("schema evolution: a widened append reads back as the merged schema, old rows null-padded") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v").write.mode("append").parquet(dir)
    // later ingest adds a column — the raw-zone reality appendRunPartition feeds
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "v", "score"))
    val rows = merged.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(r.fieldIndex("score"))) None else Some(r.getDouble(r.fieldIndex("score"))))).toMap
    assert(rows(1L).isEmpty && rows(2L).contains(9.5),
      "pre-evolution rows null-pad the new column")
  }

  test("compactParquet: many small files become few sized ones, data identical, swap atomic") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    // 40 micro-batch-sized appends → 40+ small files
    for (b <- 0 until 40)
      (b * 100 until (b + 1) * 100).map(i => (i.toLong, s"row$i"))
        .toDF("id", "v").repartition(1).write.mode("append").parquet(dir)
    def parquetFiles() = new java.io.File(dir).listFiles
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val before = parquetFiles()
    assert(before >= 40, s"fixture should be fragmented, got $before files")
    val expected = spark.read.parquet(dir).collect().map(_.toString).sorted
    val n = IngestOps.compactParquet(spark, dir, targetFileBytes = 64L * 1024)
    assert(parquetFiles() == n && n < before / 2,
      s"compaction should consolidate: $before -> ${parquetFiles()} (target $n)")
    assert(spark.read.parquet(dir).collect().map(_.toString).sorted.sameElements(expected),
      "compaction must be a pure layout change")
    assert(!new java.io.File(dir + ".compacting").exists && !new java.io.File(dir + ".old").exists,
      "staging and old dirs cleaned up")
  }

  test("interleaveBits: native Morton spread ≡ the 32-term SQL spelling, codegen'd") {
    import org.apache.spark.sql.functions._
    val sqlZ = (0 until 16).flatMap { b =>
      Seq(s"shiftleft(shiftright(a, $b) & 1, ${2 * b})",
          s"shiftleft(shiftright(b, $b) & 1, ${2 * b + 1})")
    }.mkString(" + ")
    // via parquet: a LocalTableScan evaluates driver-side with no codegen
    // stage, which would make the WholeStageCodegen assertion vacuous
    val p = java.nio.file.Files.createTempDirectory("graft-ileave").toString + "/t"
    Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (12345L, 54321L), (40000L, 1L))
      .toDF("a", "b").write.parquet(p)
    val df = spark.read.parquet(p)
      .select(col("a"), col("b"),
        graft.functions.GraftFunctions.interleaveBits(col("a"), col("b")).as("native"),
        expr(sqlZ).as("sql"))
    val rows = df.collect()
    for (r <- rows)
      assert(r.getLong(2) == r.getLong(3),
        s"(${r.getLong(0)}, ${r.getLong(1)}): native ${r.getLong(2)} != sql ${r.getLong(3)}")
    // spot values: interleave(1,0)=1, interleave(0,1)=2, both-max = 2^32-1
    val m = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((1L, 0L)) == 1L && m((0L, 1L)) == 2L && m((65535L, 65535L)) == 0xffffffffL)
    // stays inside whole-stage codegen: the `*(n)` stage marker on the
    // Project is how executedPlan.toString renders a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen span marker:\n$plan")
  }

  test("writeZOrdered: per-file boxes bound BOTH dims — a one-dim slice query prunes files " +
       "where single-column clustering cannot") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // 64x64 grid, one row per cell: both dims uniform and independent
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong, s"$x/$y"))
      .toDF("x", "y", "v")
    IngestOps.writeZOrdered(grid, s"$base/z", "x", "y", files = 16)
    IngestOps.writeRangeClustered(grid, s"$base/xonly", "x", files = 16)
    def boxes(p: String) = spark.read.parquet(p)
      .groupBy(input_file_name())
      .agg(min(col("x")).as("lx"), max(col("x")).as("hx"),
        min(col("y")).as("ly"), max(col("y")).as("hy"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val (zb, xb) = (boxes(s"$base/z"), boxes(s"$base/xonly"))
    assert(zb.length == 16 && xb.length == 16)
    assert(spark.read.parquet(s"$base/z").count() == 64L * 64L)
    // narrow slice in y ONLY (full x range): y in [0, 7]
    def touching(bs: Seq[(Long, Long, Long, Long)]) =
      bs.count { case (_, _, ly, hy) => ly <= 7 && hy >= 0 }
    assert(touching(xb) == 16,
      "x-clustered control: every file spans all of y — nothing prunes on a y slice")
    assert(touching(zb) <= 8,
      s"z-order: y ranges must be bounded per file; got ${touching(zb)}/16 touching")
    // Hilbert sibling: same slice prunes at least as many files, and the
    // total per-file box area never exceeds the Morton layout's
    IngestOps.writeHilbertOrdered(grid, s"$base/h", "x", "y", files = 16)
    val hb2 = boxes(s"$base/h")
    assert(hb2.length == 16)
    assert(spark.read.parquet(s"$base/h").count() == 64L * 64L)
    assert(touching(hb2) <= touching(zb),
      s"hilbert: ${touching(hb2)} touching vs z-order ${touching(zb)}")
    def area(bs: Seq[(Long, Long, Long, Long)]) =
      bs.map { case (lx, hx, ly, hy) => (hx - lx + 1) * (hy - ly + 1) }.sum
    assert(area(hb2) <= area(zb),
      s"hilbert total box area ${area(hb2)} vs z-order ${area(zb)}")
  }

  test("partition-column group-by pushes into the scan (PushedGroupBy): " +
       "per-partition counts come from file listing + footer stats, no " +
       "row reads") {
    val dir = Files.createTempDirectory("graft-gbp").toString + "/t"
    Seq((1L, "O", 10.0), (2L, "F", 20.0), (3L, "O", 30.0), (4L, "P", 5.0))
      .toDF("id", "status", "amount")
      .write.partitionBy("status").parquet(dir)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val q = s2.read.parquet(dir).groupBy(col("status"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedGroupBy: [status]") &&
      plan.contains("PushedAggregation: [COUNT(*)]"),
      s"group-by on the partition column must push into the scan:\n$plan")
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("O" -> 2L, "F" -> 1L, "P" -> 1L),
      "pushed-down aggregation must agree with row-level computation")
  }

  test("readCsvAudited: clean rows parse, malformed rows land with their " +
       "original text in _corrupt; the audit counts both") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-csv-bad").toString
    val csv = Seq(
      "id,amount,name",
      "1,10.5,alpha",
      "2,not_a_number,beta",   // unparseable double
      "3,30.25,gamma",
      "4,,delta"               // missing amount: legal null, NOT corrupt
    ).mkString("\n")
    Files.writeString(java.nio.file.Paths.get(dir, "feed.csv"), csv)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType),
      StructField("name", StringType)))
    val df = IngestOps.readCsvAudited(spark, dir, schema)
    val rows = df.collect().map(r =>
      (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
    // clean rows: parsed values, null _corrupt
    assert(rows.contains((Some(1L), Some(10.5), Some("alpha"), None)))
    assert(rows.contains((Some(4L), None, Some("delta"), None)),
      "a missing field is a legal null, not a corrupt row")
    // the malformed row keeps its ORIGINAL text for quarantine/repair
    val bad = rows.filter(_._4.isDefined)
    assert(bad.length == 1 && bad.head._4.get == "2,not_a_number,beta", bad.mkString)
    val audit = IngestOps.csvLoadAudit(df).head()
    assert((audit.getLong(0), audit.getLong(1), audit.getLong(2)) == ((4L, 3L, 1L)))
    // FAILFAST is the contrast: the same feed kills the load
    intercept[org.apache.spark.SparkException] {
      spark.read.option("header", "true").option("mode", "FAILFAST")
        .schema(schema).csv(dir).collect()
    }
  }
}
