package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{DedupOps, RelationalOps}

/** Property-based invariants (SURVEY.md §5.3): results must be independent
  * of physical layout — the property that makes answers trustworthy on a
  * 1000-executor cluster where partitioning is arbitrary. Uses raw
  * ScalaCheck generators with fixed seeds (the scalatest-plus bridge isn't
  * in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("moneySum/moneyAvg invariant under repartition and row order") {
    val priceGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 999999L).map(_ / 100.0))
    for (prices <- samples(priceGen, 5)) {
      val df = prices.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "price")
      def agg(d: org.apache.spark.sql.DataFrame) =
        d.agg(RelationalOps.moneySum(col("price")).as("s"), RelationalOps.moneyAvg(col("price")).as("a"))
          .collect()(0)
      val base = agg(df)
      val shuffled = agg(df.repartition(7).sortWithinPartitions(desc("price")))
      assert(base.getDecimal(0) == shuffled.getDecimal(0))
      assert(base.getDouble(1) == shuffled.getDouble(1))
    }
  }

  test("exactDedup: output has no duplicate texts and is invariant under partitioning") {
    val textGen = Gen.listOfN(5, Gen.oneOf("a b c", "d e f", "g h i")).map(_.mkString(" "))
    for (texts <- samples(Gen.nonEmptyListOf(textGen), 5)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val d1 = DedupOps.exactDedup(df).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val d2 = DedupOps.exactDedup(df.repartition(5)).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(d1 == d2)
      assert(d1.map(_._2).size == d1.size) // one representative per text
    }
  }

  test("prefix-filtered Jaccard equals plain Jaccard on random corpora") {
    val docGen = Gen.chooseNum(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("red", "blue", "green", "fox", "dog", "cat", "run"))
        .map(_.mkString(" ")))
    for (texts <- samples(Gen.listOfN(6, docGen), 4)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def pairs(f: (org.apache.spark.sql.DataFrame, Double) => org.apache.spark.sql.DataFrame) =
        f(df, 0.4).collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(pairs(DedupOps.jaccardPairsPrefix) ==
        pairs((d, t) => DedupOps.jaccardPairs(d, t)))
    }
  }

  test("dupComponents is invariant under pair order and partitioning; labels are fixpoints") {
    val pairGen = Gen.listOfN(8,
      for { a <- Gen.chooseNum(1L, 12L); b <- Gen.chooseNum(1L, 12L) if a != b }
        yield (math.min(a, b), math.max(a, b)))
    for (pairs <- samples(pairGen, 4) if pairs.nonEmpty) {
      val df = pairs.toDF("doc_a", "doc_b")
      def comps(d: org.apache.spark.sql.DataFrame) =
        DedupOps.dupComponents(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val base = comps(df)
      assert(base == comps(df.orderBy(desc("doc_b")).repartition(5)))
      // fixpoint: every component label is itself labeled with itself
      assert(base.forall { case (_, c) => base(c) == c })
    }
  }

  test("asOfJoinBanded equals asOfJoin for any band granularity on random event sets") {
    import graft.operators.RelationalOps
    val evGen = for {
      n <- Gen.chooseNum(5, 25)
      evs <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 4L)
        d <- Gen.chooseNum(0, 300) // days across ~10 months
        s <- Gen.chooseNum(0, 86399)
      } yield (u, new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + d * 86400000L + s * 1000L)))
    } yield evs
    for ((evs, i) <- samples(evGen, 3).zipWithIndex) {
      val left = evs.zipWithIndex.map { case ((u, ts), j) => (j.toLong, u, ts) }
        .toDF("event_id", "user_id", "ts")
      // right side: a sparse subset of the same user/ts space
      val right = evs.take(evs.size / 3).map { case (u, ts) => (u, ts, ts.getTime.toDouble) }
        .toDF("user_id", "ts", "score")
      def res(df: org.apache.spark.sql.DataFrame) =
        df.select("event_id", "asof_score").collect()
          .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      val base = res(RelationalOps.asOfJoin(left, right, Seq("user_id"), "ts", Seq("score")))
      // the equality must hold whatever monotone band the caller picks —
      // coarse (one band swallows everything) through fine (every event
      // its own band); granularity is a pure performance knob
      for (g <- Seq("year", "quarter", "month", "week", "day", "hour")) {
        val banded = res(RelationalOps.asOfJoinBanded(
          left, right, Seq("user_id"), "ts", Seq("score"), c => date_trunc(g, c)))
        assert(banded == base, s"sample $i, band granularity $g")
      }
    }
  }

  test("dupComponentsStar is invariant under pair order and partitioning; labels are fixpoints") {
    val pairGen = Gen.listOfN(10,
      for { a <- Gen.chooseNum(1L, 14L); b <- Gen.chooseNum(1L, 14L) } yield (a, b))
    for (pairs <- samples(pairGen, 3) if pairs.nonEmpty) {
      val df = pairs.toDF("doc_a", "doc_b")
      def comps(d: org.apache.spark.sql.DataFrame) =
        DedupOps.dupComponentsStar(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val base = comps(df)
      assert(base == comps(df.orderBy(desc("doc_b")).repartition(5)))
      assert(base.forall { case (_, c) => base(c) == c })
    }
  }

  test("minhash signatures are permutation-invariant") {
    val docGen = Gen.listOfN(8, Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon")).map(_.mkString(" "))
    for (texts <- samples(Gen.listOfN(4, docGen), 3)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def sig(d: org.apache.spark.sql.DataFrame) =
        DedupOps.minhashSignatures(d).collect()
          .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(sig(df) == sig(df.repartition(3)))
    }
  }

  test("packChunks is invariant under input partitioning and row order") {
    val docGen = Gen.listOfN(30, Gen.oneOf("alpha", "beta", "gamma", "delta")).map(_.mkString(" "))
    for (texts <- samples(Gen.listOfN(6, docGen), 3)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def pack(d: org.apache.spark.sql.DataFrame) =
        graft.operators.TextOps.packChunks(d, seqBudget = 40, shards = 4).collect()
          .map(r => (r.getLong(1), r.getInt(2)) -> (r.getInt(0), r.getLong(4))).toMap
      val base = pack(df)
      assert(base == pack(df.orderBy(desc("doc_id")).repartition(7)))
    }
  }
}
