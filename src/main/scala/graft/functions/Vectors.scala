package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` / `array<double>` columns
  * (the `embeddings.embedding` shape). Built on the higher-order
  * functions `zip_with` / `aggregate` — codegen'd, no UDF, no ml.Vector
  * conversion on the hot path.
  */
object Vectors {

  /** Cast an array<float> to array<double> for stable accumulation. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity; null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    val d = norm2(ad) * norm2(bd)
    when(d === 0.0, lit(null)).otherwise(dot(ad, bd) / d)
  }

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane LSH bit signature: sign bits of dot products with
    * `planes` (deterministic pseudo-random planes derived from a seed on
    * the caller side). Returns a compact Long bucket id for up to 63 bits.
    *
    * Delegates to the native `hyperplane_bits` kernel: ALL sign bits in
    * one fused pass over the vector — the per-plane composed form (one
    * cosine kernel per bit) re-reads the vector once per plane, and the
    * HOF dot is never whole-stage-codegen'd at all. A zero-norm or
    * wrong-length vector hashes to the all-zeros bucket (matching the
    * composed form's null-cosine bits). */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    require(planes.size <= 63, "bucket id packs into a signed long")
    graft.plans.VectorExpressions.hyperplaneBits(v, planes)
  }
}
