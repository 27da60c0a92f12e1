package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.NumericType

/** Guard for the silent numeric-id assumption in the index family
  * (VERDICT r9 #3): the signature/bucket indexes key their segments by
  * `id.cast("long")`, and Spark's cast of a NON-numeric id (a string
  * key, a uuid) yields null instead of failing — the semi-join then
  * drops every row and the index silently stays empty, i.e. dedup
  * quietly stops deduping. Fail loudly at the operator boundary
  * instead.
  */
object Ids {

  /** Require `idCol` to be of numeric type (castable to long without
    * nulling out). `where` names the calling operator in the message.
    */
  def requireNumericId(df: DataFrame, idCol: String, where: String): Unit = {
    val field = df.schema.fields.find(_.name == idCol).getOrElse(
      throw new IllegalArgumentException(
        s"$where: id column '$idCol' not found in ${df.schema.fieldNames.mkString(", ")}"))
    require(field.dataType.isInstanceOf[NumericType],
      s"$where: id column '$idCol' must be numeric (got ${field.dataType.sql}) — " +
        "a non-numeric id casts to null and silently empties the index; " +
        "derive a numeric key first (e.g. xxhash64(id))")
  }
}
