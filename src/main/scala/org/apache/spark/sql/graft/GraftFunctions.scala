package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog's `bucket` function — what lets the engine REASON about
  * the hidden `bucket[n]` partition transform (the Iceberg idiom): a
  * scan reporting `KeyGroupedPartitioning(bucket(n, col))` resolves the
  * transform through the table catalog's FunctionCatalog, and two
  * tables bucketed the same way storage-partition-join with zero
  * shuffles. The computation is BIT-IDENTICAL to the write-side
  * derivation ([[graft.operators.GraftTable]]'s `xformExpr`:
  * `pmod(hash(col), n)` — catalyst murmur3, seed 42, 32-bit) — a
  * drifting definition would co-locate nothing.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): murmur3(col) mod n — the hidden-partitioning " +
      "bucket transform (write-side derivation parity)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets INT, col), got ${inputType.simpleString}")
    val dt = inputType.fields(1).dataType
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      // SPJ compatibility compares bound functions by canonical name —
      // both sides of a co-bucketed join must agree
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        val v = input.get(1, dt)
        // hash(null) is the seed itself in catalyst's Murmur3 expression
        val h = Murmur3HashFunction.hash(v, dt, 42L).toInt
        Integer.valueOf(((h % n) + n) % n)
      }
    }
  }
}
