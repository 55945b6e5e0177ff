package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for every left row, the latest right row of
  * the same key with `rightTime <= leftTime` — the training-data staple for
  * joining features/labels without leakage.
  *
  * Spark has no native as-of join; rather than an O(|L|·|R|) theta join +
  * rank, this is the *union-merge* formulation: tag both sides, sort each
  * key's rows by (time, side) once, and carry the last-seen right values
  * forward with an ordered window. One shuffle on the key, one sort — the
  * same cost envelope as a sort-merge join, and it scales to skewed keys
  * the way a range join cannot. At equal timestamps the right row sorts
  * first (side 0 < 1), giving inclusive `<=` semantics, identical to SQL
  * `ASOF JOIN ... ON l.t >= r.t`.
  *
  * Right columns (minus key/time) must not collide with left column names —
  * pre-rename on the caller side.
  */
object AsofJoin {

  /** Can Spark sort values of this type? Mirrors the engine's ordering rule
    * (atomic, null, and recursively-orderable struct/array types sort; map,
    * interval, variant do not) without depending on the internal Catalyst
    * `RowOrdering.isOrderable`, which has moved between Spark versions.
    * Stated over public `DataType`s only — a type this misses merely loses
    * the equal-timestamp tiebreak, never correctness.
    */
  private[operators] def isOrderable(
      dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case NullType | BooleanType | ByteType | ShortType | IntegerType |
          LongType | FloatType | DoubleType | StringType | BinaryType |
          DateType | TimestampType | TimestampNTZType => true
      case _: DecimalType => true
      case s: StructType => s.fields.forall(f => isOrderable(f.dataType))
      case a: ArrayType => isOrderable(a.elementType)
      case udt: UserDefinedType[_] => isOrderable(udt.sqlType)
      case _ => false // MapType, CalendarIntervalType, variant, ...
    }
  }

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      inner: Boolean = true): DataFrame = {
    val rightVals = right.columns.filter(c => c != key && c != rightTime).toSeq
    val leftStruct = struct(left.columns.toSeq.map(col): _*)

    // carry the right row as ONE struct so the match is always a single
    // real right row — per-column carry would stitch values from different
    // rows whenever a right column is legitimately null
    val rPart = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      struct(col(rightTime).as("__rt") +: rightVals.map(col): _*).as("__r"))
    val lPart = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      leftStruct.as("__l"),
      lit(null).cast(rPart.schema("__r").dataType).as("__r"))
    val rWithL = rPart.select(
      col("__k"), col("__t"), col("__side"),
      lit(null).cast(lPart.schema("__l").dataType).as("__l"), col("__r"))

    // Deterministic when several right rows share (key, time): tiebreak on
    // the carried struct itself, giving a total order over distinct right
    // rows (exact duplicates are indistinguishable, so any pick is the same
    // row). Skipped only if a right column is unorderable (e.g. map).
    val rOrderable = isOrderable(rPart.schema("__r").dataType)
    val ord =
      if (rOrderable) Seq(col("__t"), col("__side"), col("__r"))
      else Seq(col("__t"), col("__side"))
    val w = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lPart.unionByName(rWithL)
      .select(col("__side"), col("__l"),
        last(col("__r"), ignoreNulls = true).over(w).as("__r"))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: col("__r.__rt").as(s"asof_$rightTime") +:
        rightVals.map(c => col(s"__r.$c").as(c)): _*)
    if (inner) carried.filter(col(s"asof_$rightTime").isNotNull) else carried
  }
}
