package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** As-of (temporal) join: for each left row, attach the payload of the
  * latest right row whose timestamp is <= the left row's timestamp
  * (`backward`, the default), or the earliest right row with timestamp >=
  * the left's (`forward`), matched within the same key group and optionally
  * within a tolerance window.
  *
  * The reference engine has no as-of join (its event analyses run per-key
  * window SQL by hand); this is the standard time-series primitive a
  * training-data / experiment pipeline needs (impression→conversion
  * attribution, last-touch covariates for CUPED, feature as-of snapshot).
  *
  * 100 TB shape — ONE shuffle, no inequality join: a naive
  * `JOIN ON r.key = l.key AND r.ts <= l.ts` plans a per-key nested loop
  * (O(L·R) per key) plus an argmax re-aggregation. Instead both sides are
  * union-tagged (right = side 0, left = side 1), shuffled ONCE by key, and
  * sorted per key by (ts, side); `last(payload, ignoreNulls)` carries the
  * most recent right payload forward onto each left row in a single window
  * pass — O((L+R) log(L+R)) per partition, and the left columns ride the
  * same pass inside a struct so no join-back is needed. Ties at equal
  * timestamps: right sorts before left, so an exactly-simultaneous right
  * row IS visible to the left row (<= semantics). Multiple right rows at
  * the same (key, ts) are broken by `tieBreak` (pass a unique right id for
  * determinism).
  *
  * Null semantics: right rows with a null key or null ts are dropped (they
  * can never match deterministically); left rows always survive
  * (left-outer), with a null payload when the key or ts is null or no right
  * row qualifies. Spark windows group null keys together, so without the
  * drop a null-key left row would silently "match" null-key right rows —
  * the same trap fixed in caliper matching and exactDedup.
  */
object AsofJoin {

  /** @param keyCols   join key column names, present on both sides
    * @param leftTs    left timestamp column (numeric ticks; see
    *                  `tsUnitPerSecond`)
    * @param rightTs   right timestamp column
    * @param payload   right columns to carry onto left rows
    * @param prefix    prefix for the attached columns; the right match's
    *                  timestamp lands as `<prefix>ts` (double ticks)
    * @param direction "backward" (latest right <= left) or "forward"
    *                  (earliest right >= left)
    * @param toleranceSeconds match only within this many seconds (None = ∞)
    * @param tieBreak  deterministic order among right rows sharing a (key,
    *                  ts) — e.g. a unique event id; later wins for backward
    * @param tsUnitPerSecond ticks per second of the ts columns (1e9 for the
    *                  epoch-nanos the driver's parquet read produces)
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String],
           prefix: String = "asof_", direction: String = "backward",
           toleranceSeconds: Option[Double] = None,
           tieBreak: Option[Column] = None,
           tsUnitPerSecond: Double = 1e9): DataFrame = {
    require(keyCols.nonEmpty, "asof join needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val outCols = (prefix + "ts") +: payload.map(prefix + _)
    require(!outCols.exists(left.columns.contains),
      s"left already has a ${outCols.filter(left.columns.contains).mkString(",")} column; pick another prefix")
    val backward = direction == "backward"
    // Signed ticks: forward as-of is backward as-of on negated time. Ticks
    // stay in their NATIVE numeric type — epoch nanos exceed double's 2^53
    // mantissa, so a double cast would quantize timestamps to ~256 ns and
    // non-deterministically flip sub-microsecond orderings.
    def signed(c: Column): Column = if (backward) c else -c
    val lt = signed(col(leftTs))
    val rt = signed(col(rightTs))

    val payType = StructType(StructField("__ts", right.schema(rightTs).dataType) +:
      payload.map(c => right.schema(c).copy(name = c)))
    // Tie-break stays in its NATIVE numeric type for the same reason the
    // ticks do — a 64-bit unique id above 2^53 would quantize under a double
    // cast and break ties nondeterministically. The left side's placeholder
    // never affects ordering (left rows sort after right via __side), so a
    // null of the same type suffices.
    val tieCol = tieBreak.getOrElse(lit(0))
    val tieType = right.select(tieCol).schema.head.dataType
    val leftType = StructType(left.schema.fields)
    val payStruct = struct(
      (col(rightTs).as("__ts") +: payload.map(c => col(c).as(c))): _*)

    val r = right
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTs).isNotNull)
      .select(keyCols.map(col) ++ Seq(
        rt.as("__t"), lit(0).as("__side"),
        signed(tieCol).as("__tie"),
        payStruct.as("__pay"),
        lit(null).cast(leftType).as("__l")): _*)
    val l = left.select(keyCols.map(col) ++ Seq(
      lt.as("__t"), lit(1).as("__side"), lit(null).cast(tieType).as("__tie"),
      lit(null).cast(payType).as("__pay"),
      struct(left.columns.map(col): _*).as("__l")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withinTol = toleranceSeconds match {
      case Some(tol) =>
        // gap in real seconds is direction-independent under signed ticks;
        // tick subtraction stays in the native type, only the final divide
        // goes floating
        (col("__t") - signed(col("__m.__ts"))).cast("double") /
          tsUnitPerSecond <= tol
      case None => lit(true)
    }
    val matchable = keyCols.map(col(_).isNotNull).reduce(_ && _) &&
      col("__t").isNotNull
    val m = when(matchable && col("__m").isNotNull && withinTol, col("__m"))

    carried.select(
      left.columns.map(c => col("__l").getField(c).as(c)) ++
        (m.getField("__ts").as(prefix + "ts") +:
          payload.map(c => m.getField(c).as(prefix + c))): _*)
  }
}
