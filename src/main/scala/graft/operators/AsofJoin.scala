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

  /** Nearest-event join (pandas `merge_asof direction='nearest'`): for
    * every left row, the right row of the same key MINIMIZING
    * |rightTime − leftTime|, either direction. Two [[asofJoin]] passes —
    * backward as-is, forward as a backward pass over NEGATED times (the
    * classic reduction; this is why both time columns must be integral,
    * e.g. epoch micros) — then a per-row winner pick. Ties at equal
    * distance take the backward (earlier) match; within a direction the
    * as-of carried-struct tiebreak applies. Same cost envelope as two
    * as-of joins: two key shuffles + sorts, nothing quadratic.
    *
    * Output: all left columns + `nearest_<rightTime>` + signed
    * `delta_<rightTime>` (right − left; ≤ 0 means the match precedes) +
    * the right value columns (null-filled when the key has no right rows).
    */
  def nearestJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String): DataFrame = {
    val rightVals = right.columns.filter(c => c != key && c != rightTime).toSeq
    val bRight = right.select(col(key) +: col(rightTime).cast("long")
      .as("__bt") +: rightVals.map(c => col(c).as(s"__b_$c")): _*)
    val pass1 = asofJoin(left, bRight, key, leftTime, "__bt", inner = false)
    val fRight = right.select(col(key) +: (-col(rightTime).cast("long"))
      .as("__ft") +: rightVals.map(c => col(c).as(s"__f_$c")): _*)
    val withNeg = pass1.withColumn("__nlt", -col(leftTime).cast("long"))
    val pass2 = asofJoin(withNeg, fRight, key, "__nlt", "__ft",
      inner = false)
    val db = col(leftTime).cast("long") - col("asof___bt")
    val df = -col("asof___ft") - col(leftTime).cast("long")
    val takeB = col("asof___bt").isNotNull &&
      (col("asof___ft").isNull || db <= df)
    val picked = left.columns.toSeq.map(col) ++ Seq(
      when(takeB, col("asof___bt")).otherwise(-col("asof___ft"))
        .as(s"nearest_$rightTime"),
      when(takeB, -db).otherwise(df).as(s"delta_$rightTime")) ++
      rightVals.map(c =>
        when(takeB, col(s"__b_$c")).otherwise(col(s"__f_$c")).as(c))
    pass2.select(picked: _*)
  }
}
