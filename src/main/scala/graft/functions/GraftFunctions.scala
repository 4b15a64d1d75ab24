package graft.functions

import org.apache.spark.sql.Column

/** Public Column-API surface for the engine's native Catalyst expressions
  * (the implementations live under org.apache.spark.sql.graft to access
  * Spark's private[sql] analysis types).
  */
object GraftFunctions {
  /** Fused, codegen'd cosine similarity over two float-array columns. */
  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.CosineSimilarity(a, b)

  /** Morton/Z-order bit interleave of two 16-bit cell indices (LONG) —
    * the codegen'd clustering key behind `IngestOps.writeZOrdered`.
    */
  def interleaveBits(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.InterleaveBits(a, b)

  /** Fused, codegen'd Euclidean distance — the PQ-encode hot path. */
  def l2Dist(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.EuclideanDistance(a, b)

  /** Codegen'd Jaro–Winkler similarity (DuckDB-bit-exact contract) —
    * the front-weighted second compare signal of the blocked-ER tier.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.JaroWinkler(a, b)

  /** Hilbert-curve index of two 16-bit cell indices (LONG) — the
    * locality-tighter clustering key next to [[interleaveBits]].
    */
  def hilbertIndex(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.HilbertIndex(a, b)
}
