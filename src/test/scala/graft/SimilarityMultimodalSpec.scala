package graft

import org.apache.spark.sql.functions._
import graft.operators.{MultimodalOps, SimilarityOps}

class SimilarityMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
    (2L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),   // duplicate of 0
    (3L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),   // near 0
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 2))  // opposite of 0
    .toDF("vec_id", "embedding", "label")

  test("cosineTopK: duplicate vector ranks first with score 1.0; opposite ranks last") {
    val got = SimilarityOps.cosineTopK(emb, nQueries = 1, k = 4)
      .orderBy("rank").collect()
    assert(got(0).getLong(1) == 2L && got(0).getDouble(2) == 1.0)
    assert(got(1).getLong(1) == 3L)
    assert(got.last.getLong(1) == 4L && got.last.getDouble(2) == -1.0)
  }

  test("lshBucketedTopK: duplicate found within its bucket; never pairs a query with itself") {
    val got = SimilarityOps.lshBucketedTopK(emb, nQueries = 1, k = 4, nBits = 1)
    val rows = got.collect()
    assert(rows.forall(r => r.getLong(1) != r.getLong(0)))
    assert(rows.exists(r => r.getLong(1) == 2L && r.getDouble(2) == 1.0))
  }

  test("ivfTopK: duplicate lands in the same inverted list and is found; deterministic") {
    // nCentroids=2: centroids are vectors 0 and 1; vec 2 (dup of 0) and
    // vec 3 (near 0) assign to centroid 0 — query 0 probing 1 list finds both
    val got = SimilarityOps.ivfTopK(emb, nCentroids = 2, nQueries = 1, k = 3, nProbe = 1)
      .orderBy("rank").collect()
    assert(got(0).getLong(1) == 2L && got(0).getDouble(2) == 1.0)
    assert(got(1).getLong(1) == 3L)
    val again = SimilarityOps.ivfTopK(emb, 2, 1, 3, 1).orderBy("rank").collect()
    assert(got.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("native cosine_sim matches the interpreted HOF fold bit-for-bit") {
    val pairs = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(emb.select(col("vec_id").as("v2"), col("embedding").as("e2")))
    val both = pairs.select(
      graft.functions.GraftFunctions.cosineSim(col("embedding"), col("e2")).as("native"),
      (expr("aggregate(zip_with(embedding, e2, (p, q) -> cast(p as double) * cast(q as double)), cast(0.0 as double), (acc, v) -> acc + v)") /
        (sqrt(expr("aggregate(zip_with(embedding, embedding, (p, q) -> cast(p as double) * cast(q as double)), cast(0.0 as double), (acc, v) -> acc + v)")) *
         sqrt(expr("aggregate(zip_with(e2, e2, (p, q) -> cast(p as double) * cast(q as double)), cast(0.0 as double), (acc, v) -> acc + v)")))).as("hof"))
    assert(both.collect().forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("cosine_sim registered in SQL via GraftExtensions; zero vector → NULL") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)), (Array(0.0f, 0.0f), Array(1.0f, 0.0f)))
      .toDF("a", "b")
    df.createOrReplaceTempView("vv")
    val got = spark.sql("SELECT cosine_sim(a, b) FROM vv ORDER BY a[0] DESC").collect()
    assert(got(0).getDouble(0) == 1.0)
    assert(got(1).isNullAt(0)) // zero norm → NULL, the NULLIF-guard semantics
  }

  test("cosine_sim constant-folds: literal inputs never reach execution") {
    val df = spark.sql(
      "SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)), " +
        "array(cast(1.0 as float), cast(0.0 as float))) AS s")
    // foldable children → ConstantFolding evaluates at plan time
    assert(df.queryExecution.optimizedPlan.toString.contains("1.0"))
    assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("cosine_sim"))
    assert(df.collect()(0).getDouble(0) == 1.0)
  }

  test("payloadMeta: deterministic fake dims derived from byte length") {
    val docs = Seq((1L, "abcd", "en", "s1", 4L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = MultimodalOps.payloadMeta(docs).collect()(0)
    assert(r.getInt(1) == 4)                       // n_bytes of "abcd"
    assert(r.getInt(2) == (4 * 7 + 'a'.toInt) % 1024)
    assert(r.getInt(3) == (4 * 13 + 31) % 768)
  }

  test("decodeFeatures: batched decode preserves row count and is deterministic") {
    val docs = Seq(
      (1L, "hello world", "en", "s1", 11L),
      (2L, "spark engine", "en", "s2", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = MultimodalOps.decodeFeatures(docs).collect().sortBy(_.getLong(0))
    val b = MultimodalOps.decodeFeatures(docs.repartition(3)).collect().sortBy(_.getLong(0))
    assert(a.length == 2)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq) // partition-invariant
  }
}
