package graft

import graft.operators.{DedupOps, TextOps}

/** The dup-evidence inline-≡-stored hash gate (r14 verdict task 4): the
  * 16.5 s inline derivation used to run in the bench registry purely as
  * an A/B control for the persisted evidence base. The control now lives
  * here — once per round at sf0.01 — while the registry's bench face is
  * `dup_evidence_stored` (whose DuckDB oracle still replays the FULL
  * inline derivation, so the cross-engine proof is unchanged; this spec
  * adds the within-engine proof that the store ships exactly what the
  * derivation computes, at every budget knob, not just the oracle's).
  */
class DedupOpsEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("dupEvidenceFromBase(dupEvidenceBase) ≡ inline dupEvidence at " +
       "sf0.01, at the shipping budget (24) and the binding budget (2)") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val mpairs = DedupOps.minhashCandidatePairs(docs).localCheckpoint()
    val wpairs = TextOps.winnowOverlapPairs(docs).localCheckpoint()
    val base = DedupOps.dupEvidenceBase(docs, mpairs, wpairs).localCheckpoint()
    for (budget <- Seq(24, 2)) {
      val inline = DedupOps.dupEvidence(docs, mpairs, wpairs,
          maxPairsPerComponent = budget)
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      val stored = DedupOps.dupEvidenceFromBase(base,
          maxPairsPerComponent = budget)
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(inline.length == stored.length,
        s"budget=$budget: inline ${inline.length} rows vs stored ${stored.length}")
      assert(inline.sameElements(stored) ||
             inline.zip(stored).forall { case (a, b) => a == b },
        s"budget=$budget: stored evidence diverges from the inline derivation")
    }
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("dupEvidenceBaseDelta ≡ full rebuild on a fixture that exercises " +
       "df-guard REMOVALS (component split) and bridge MERGES") {
    import graft.operators.DedupOps
    // X family: 50 old docs sharing a 7-token prefix — the prefix's two
    // fully-shared winnow windows give every X pair n_shared = 2, and the
    // shared fingerprints sit at df = 50, EXACTLY the guard ceiling. The
    // 20-token unique suffixes keep minhash minima doc-specific, so the X
    // pairs are winnow-only edges.
    val xDocs = (0L until 50L).map { i =>
      val suffix = (0 until 20).map(k => s"x${i}q$k").mkString(" ")
      (i, s"alpha beta gamma delta epsilon zeta eta $suffix")
    }
    // Y family: 3 old docs identical up to the last token — LSH band
    // collisions (minhash edges), a separate component
    val yDocs = (60L until 63L).map { i =>
      (i, s"quick brown fox jumps over the lazy dog again and again forever y$i")
    }
    // delta: one more X doc (pushes the shared fingerprints to df = 51 —
    // OVER the guard, removing every X winnow edge: a component split into
    // singletons) and one bridge doc carrying both templates (added edges
    // that MERGE what remains with Y)
    val delta = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta " +
        (0 until 20).map(k => s"x100q$k").mkString(" ")),
      (101L, "alpha beta gamma delta epsilon zeta eta " +
        "quick brown fox jumps over the lazy dog again and again forever y101"))
    val mkDocs = (rows: Seq[(Long, String)]) => rows
      .map { case (id, tx) => (id, tx, "en", "t", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val grown = mkDocs(xDocs ++ yDocs ++ delta).localCheckpoint()
    val cutoff = 100L
    val oldDocs = grown.filter($"doc_id" < cutoff)
    val oldBase = DedupOps.dupEvidenceBase(oldDocs,
      DedupOps.minhashCandidatePairs(oldDocs),
      graft.operators.TextOps.winnowOverlapPairs(oldDocs)).localCheckpoint()
    val oldPrints = DedupOps.winnowPrintIndex(oldDocs).localCheckpoint()
    val oldBands = DedupOps.lshBands(oldDocs).localCheckpoint()
    val deltaBase = DedupOps.dupEvidenceBaseDelta(
      oldBase, oldPrints, oldBands, grown, cutoff)
    val rebuilt = DedupOps.dupEvidenceBase(grown,
      DedupOps.minhashCandidatePairs(grown),
      graft.operators.TextOps.winnowOverlapPairs(grown))
    assert(rows(deltaBase) == rows(rebuilt),
      "incremental base must equal the full rebuild row-for-row")
    // the fixture really exercised both change classes
    val st = DedupOps.dupEvidenceStaleness(
      oldBase, oldPrints, oldBands, grown, cutoff).collect()(0)
    assert(st.getAs[Long]("n_removed") > 0L,
      s"expected df-guard removals, got $st")
    assert(st.getAs[Long]("n_added") > 0L, s"expected added pairs, got $st")
  }

  test("dupComponentsLocal ≡ dupComponents (string and long ids: chain, " +
       "triangle, disjoint pairs), and the edge cap fails loudly") {
    import graft.operators.DedupOps
    // a 4-chain (diameter > 1), a triangle, a disjoint pair
    val sPairs = Seq(("b", "c"), ("c", "d"), ("d", "e"), ("x", "y"),
      ("y", "z"), ("x", "z"), ("q", "r")).toDF("doc_a", "doc_b")
    assert(rows(DedupOps.dupComponentsLocal(sPairs)) ==
           rows(DedupOps.dupComponents(sPairs)))
    val lPairs = Seq((2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    assert(rows(DedupOps.dupComponentsLocal(lPairs)) ==
           rows(DedupOps.dupComponents(lPairs)))
    val e = intercept[IllegalArgumentException] {
      DedupOps.dupComponentsLocal(lPairs, maxEdges = 3)
    }
    assert(e.getMessage.contains("broadcast-scale"), e.getMessage)
  }

  test("componentIndexDelta ≡ full dupComponents rebuild: merge fixture " +
       "(a bridge doc joins two old components) and sf0.001 90%+10%") {
    import graft.operators.DedupOps
    // two old near-dup families (identical text up to the last token →
    // band collisions), one delta doc carrying both templates: the
    // bridge merges the two components under the smaller family's min
    val mk = (rows: Seq[(Long, String)]) => rows
      .map { case (id, tx) => (id, tx, "en", "t", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val fam1 = (0L until 3L).map(i =>
      (i, s"quick brown fox jumps over the lazy dog again and again forever f$i"))
    val fam2 = (10L until 13L).map(i =>
      (i, s"pack my box with five dozen liquor jugs every single day always z$i"))
    // near-copies of each family (only the tail token differs → band
    // collisions guaranteed): both old components get contracted and
    // relabeled through the supernode map, and the delta docs enter
    // through the fresh-node path
    val bridge = Seq(
      (100L, "quick brown fox jumps over the lazy dog again and again forever f100"),
      (101L, "pack my box with five dozen liquor jugs every single day always z101"))
    val grown = mk(fam1 ++ fam2 ++ bridge).localCheckpoint()
    val cutoff = 100L
    val oldDocs = grown.filter($"doc_id" < cutoff)
    val oldLabels = DedupOps.dupComponents(
      DedupOps.minhashCandidatePairs(oldDocs)).localCheckpoint()
    val delta = DedupOps.componentIndexDelta(oldLabels,
      DedupOps.lshBands(oldDocs).localCheckpoint(), grown, cutoff)
    val rebuilt = DedupOps.dupComponents(DedupOps.minhashCandidatePairs(grown))
    assert(rows(delta) == rows(rebuilt),
      "incremental component index must equal the full rebuild")
    // the fresh-node + relabel paths really ran: the bridge doc entered
    // the index (band-collided with at least one family, whose old
    // component got contracted through the supernode map)
    assert(delta.filter($"doc_id" === 100L).count() == 1L,
      "fixture expects the bridge doc to join the index")
    // sf0.001, the registry's gate shape
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val n = docs.count(); val cut = n - n / 10
    val od = docs.filter($"doc_id" < cut)
    val d2 = DedupOps.componentIndexDelta(
      DedupOps.dupComponents(DedupOps.minhashCandidatePairs(od)).localCheckpoint(),
      DedupOps.lshBands(od).localCheckpoint(), docs, cut)
    val r2 = DedupOps.dupComponents(DedupOps.minhashCandidatePairs(docs))
    assert(rows(d2) == rows(r2),
      "sf0.001 incremental component index must equal the full rebuild")
  }

  test("dupEvidenceBaseDelta ≡ full rebuild at sf0.001 (90% snapshot + " +
       "10% append, the registry's gate shape)") {
    import graft.operators.DedupOps
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val n = docs.count()
    val cutoff = n - n / 10
    val oldDocs = docs.filter($"doc_id" < cutoff)
    val oldBase = DedupOps.dupEvidenceBase(oldDocs,
      DedupOps.minhashCandidatePairs(oldDocs),
      graft.operators.TextOps.winnowOverlapPairs(oldDocs)).localCheckpoint()
    val deltaBase = DedupOps.dupEvidenceBaseDelta(oldBase,
      DedupOps.winnowPrintIndex(oldDocs).localCheckpoint(),
      DedupOps.lshBands(oldDocs).localCheckpoint(), docs, cutoff)
    val rebuilt = DedupOps.dupEvidenceBase(docs,
      DedupOps.minhashCandidatePairs(docs),
      graft.operators.TextOps.winnowOverlapPairs(docs))
    assert(rows(deltaBase) == rows(rebuilt),
      "incremental base must equal the full rebuild row-for-row")
  }
}
