package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `ArrayType(FloatType)` columns.
  *
  * Two tiers:
  *   - `*Dec` variants accumulate in exact DECIMAL: element products are
  *     float ops (bit-identical across engines), each product is rounded
  *     once to a fixed decimal scale, and decimal addition is exact and
  *     associative — so the result is independent of partitioning and
  *     summation order. Used for oracle-checked results.
  *   - `*Dbl` variants accumulate in double (fastest path, order
  *     dependent in the last bits). Used when raw throughput matters and
  *     approximate ranking is acceptable.
  *
  * All are codegen'd higher-order-function compositions — no UDF, no
  * serialization off the unsafe row.
  */
object VectorFns {

  /** Fixed-point dot product: each element pair is widened to double
    * (exact), multiplied (IEEE, identical everywhere), scaled by 1e9,
    * floored (IEEE, identical) and accumulated as a 64-bit integer —
    * exact, associative, order-independent. This sidesteps BOTH double
    * summation-order drift AND engine-specific float→decimal rounding:
    * every engine produces the same integer. The 1e9 scale factor
    * cancels in the cosine ratio.
    */
  def dotFixed9(a: Column, b: Column): Column =
    // fused codegen expression — bit-identical to the composable
    // aggregate(zip_with(...)) formulation (DotSpec proves it), ~4×
    // faster: one primitive loop, no per-row intermediate array
    graft.expr.FixedDot.fixedDot(a, b)

  /** The composable HOF formulation of [[dotFixed9]] — kept as the
    * reference implementation the fused expression is spec-checked
    * against (and as the fallback if an engine lacks custom
    * expressions).
    */
  def dotFixed9Hof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => floor(x.cast("double") * y.cast("double") * lit(1e9)).cast("long")),
      lit(0L),
      (acc, x) => acc + x)

  /** Fixed-point squared L2 norm (same 1e9 scaling as [[dotFixed9]]). */
  def norm2Fixed9(a: Column): Column = dotFixed9(a, a)

  /** Cosine similarity from fixed-point dot / squared norms: the 1e9
    * scale cancels (dot·1e9 over √(n2a·1e9)·√(n2b·1e9)). All inputs are
    * identical integers in every engine, so the double result is
    * bit-identical too.
    */
  def cosineFrom(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))

  /** Double-precision dot product (throughput path). */
  def dotDbl(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y), lit(0.0), (acc, x) => acc + x)

  /** Deterministic ±1 entry of the Johnson-Lindenstrauss projection
    * matrix: +1 iff the top bit of md5("i_k") is 0 (equivalently, first
    * hex digit < '8') — an engine-portable pseudo-random sign any SQL
    * engine reproduces with its own md5. A ±1 (Rademacher) matrix
    * satisfies the JL lemma like a Gaussian one (Achlioptas 2003) and
    * keeps the arithmetic integer-exact.
    */
  def jlSign(i: Int, k: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${i}_${k}".getBytes("US-ASCII"))
    if ((h(0) & 0x80) == 0) 1 else -1
  }

  /** One Johnson-Lindenstrauss projected coordinate, FIXED-POINT exact:
    * p_k(v) = Σ_i sign(i,k) · floor(v_i · 1e9) — each element is floored
    * once (IEEE, identical everywhere) and accumulated as a 64-bit
    * integer, the [[dotFixed9]] discipline, so every engine lands on the
    * identical value. Row-local (no explode, no shuffle): at 100 TB the
    * projection is a free map stage over the embedding scan, shrinking
    * d-dim vectors to k coordinates BEFORE any LSH/bucketing shuffle —
    * the standard trick for making banded ANN affordable at scale.
    * `dIn` must equal the stored embedding length.
    */
  def jlCoord(emb: Column, dIn: Int, k: Int): Column = {
    val signs = array((0 until dIn).map(i => lit(jlSign(i, k).toLong)): _*)
    aggregate(
      zip_with(emb, signs,
        (x, s) => floor(x.cast("double") * lit(1e9)).cast("long") * s),
      lit(0L), (acc, x) => acc + x)
  }

  /** Axis-aligned hyperplane sign bucket over the first `k` dimensions —
    * a deterministic LSH-style coarse partitioner for bucketed ANN
    * (each vector lands in one of 2^k buckets; search touches only its
    * bucket). Portable: uses only sign tests.
    */
  def signBucket(a: Column, k: Int): Column =
    (0 until k).map(i => when(element_at(a, i + 1) > 0f, 1 << i).otherwise(0))
      .reduce(_ + _)
}
