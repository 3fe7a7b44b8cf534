package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** `safe_cast` — the reference's universal permissive coercion
  * (reference `server/helper.py:4-27`): every cast failure yields the
  * schema default instead of an error, so a load never aborts on a
  * malformed cell. Re-expressed as pure Column compositions over
  * codegen'd builtins (`try`-casts + `coalesce`) — no UDF, stays inside
  * whole-stage codegen.
  */
object SafeCastFns {

  /** TRY_CAST + COALESCE(default): `safe_cast(val, to, default)`
    * (reference `server/helper.py:24-27`).
    */
  def safeCast(c: Column, to: DataType, default: Column): Column =
    coalesce(c.try_cast(to), default)

  def safeInt(c: Column, default: Int = 0): Column =
    coalesce(c.try_cast("int"), lit(default))

  def safeLong(c: Column, default: Long = 0L): Column =
    coalesce(c.try_cast("long"), lit(default))

  /** Datetime parse with a per-model format string and a default on
    * failure (reference `server/helper.py:7-11`; formats declared at
    * `storage/tablemodels.py:16-17,37-38`, e.g. `dd.MM.yyyy HH:mm:ss`).
    */
  def safeTimestamp(c: Column, fmt: String, default: Column): Column =
    coalesce(try_to_timestamp(c, lit(fmt)), default)

  /** Date parse; reference format `'%d.%m.%Y'` → `dd.MM.yyyy`. */
  def safeDate(c: Column, fmt: String, default: Column): Column =
    coalesce(try_to_timestamp(c, lit(fmt)).cast("date"), default)

  /** Permissive bool: the token set {"yes","true","t","1"}
    * case-insensitively (reference `server/helper.py:13-14`).
    */
  def safeBool(c: Column): Column =
    lower(trim(c)).isin("yes", "true", "t", "1")
}
