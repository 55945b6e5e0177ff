package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the missing half of
  * partitioning at 100 TB. Range-partitioning a table clusters ONE key;
  * a selective predicate on any other column still reads every file.
  * Z-ordering (bit-interleaved Morton codes — the Delta/Iceberg `OPTIMIZE
  * ZORDER BY` shape, Morton '66) range-partitions on a key whose bit
  * positions alternate between dimensions, so every written file covers a
  * small HYPER-RECTANGLE of the value space: each file's parquet min/max
  * footer stats are then tight in EVERY participating column, and a
  * conjunctive box predicate prunes row groups in all dimensions at once
  * (pushed-filter stats skipping — no index structure, no extra pass at
  * read time).
  *
  * Quantization is by bit-truncation against driver-computed global
  * bounds: `q = (x - lo) >> max(0, bitLength(hi - lo) - bits)`, exact
  * integer arithmetic at any magnitude (no double rounding at 2^53+, which
  * a multiply/divide scale would hit), replayable verbatim by the DuckDB
  * oracle (`length(bin(range))`). The bounds aggregate is ONE row to the
  * driver — the same bounded-collect class as the codebook read-backs.
  * The zkey itself is a pure codegen'd expression chain (shifts/and/or),
  * evaluated scan-side; the only shuffle in [[zorderWrite]] is the range
  * exchange every clustered write pays anyway.
  */
object Layout {

  /** Bit-interleave two already-quantized `bits`-bit non-negative columns
    * into a Morton z-value: x's bit b lands at position 2b+1, y's at 2b.
    * Literal shift amounts — the whole chain stays inside whole-stage
    * codegen. `bits` ≤ 31 keeps the result within a signed long. */
  def interleaveBits(qx: Column, qy: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "interleave needs 1..31 bits per dimension")
    (0 until bits).map { b =>
      shiftleft(shiftright(qx, b).bitwiseAND(lit(1L)), 2 * b + 1)
        .bitwiseOR(shiftleft(shiftright(qy, b).bitwiseAND(lit(1L)), 2 * b))
    }.reduce(_.bitwiseOR(_))
  }

  /** Exact bit length of a non-negative long (0 → 0 bits, mirroring the
    * oracle's `length(bin(x))` = 1 only through the shared max(0, …-bits)
    * clamp, where both yield shift 0). */
  private def bitLength(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** Add a `zkey` Morton code over two integral columns. Bounds are
    * computed once (1-row aggregate to the driver) so the per-row
    * expression is all-literal shifts; rows where either column is null
    * get a null zkey (they sort last and cluster together — the layout
    * equivalent of a null partition). */
  def zorderKey(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 16): DataFrame = {
    val b = df.agg(
      min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    if (b.isNullAt(0) || b.isNullAt(2)) // all-null dimension: degenerate layout
      return df.withColumn("zkey", lit(null).cast("long"))
    val (xlo, xhi, ylo, yhi) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val sx = math.max(0, bitLength(xhi - xlo) - bits)
    val sy = math.max(0, bitLength(yhi - ylo) - bits)
    val qx = shiftright(col(xCol).cast("long") - lit(xlo), sx)
    val qy = shiftright(col(yCol).cast("long") - lit(ylo), sy)
    df.withColumn("zkey", interleaveBits(qx, qy, bits))
  }

  /** Write `df` parquet clustered by the z-order of (xCol, yCol):
    * range-partition into `numFiles` z-ranges, sort within each, drop the
    * key (it is derivable; persisting it would change the schema
    * contract). Each output file then spans a bounded rectangle of
    * (x, y), so box predicates on EITHER OR BOTH columns prune row groups
    * via ordinary parquet stats — LayoutSpec measures the scan-row
    * reduction against an unclustered copy of the same rows. */
  def zorderWrite(
      df: DataFrame,
      xCol: String,
      yCol: String,
      path: String,
      numFiles: Int,
      bits: Int = 16): Unit = {
    zorderKey(df, xCol, yCol, bits)
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .drop("zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
