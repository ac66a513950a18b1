package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark's join zoo lacks natively.
  *
  * For every left row, attach the payload of the single right row with the
  * same key and the greatest right-time `<=` the left row's time (DuckDB
  * `ASOF JOIN` semantics, left-outer flavor: unmatched left rows survive
  * with a NULL payload).
  *
  * The naive relational encoding — a `>=` theta-join plus a per-left-row
  * max — explodes into a range cross-product (every left row pairs with
  * ALL earlier right rows before the reduction), which at 100 TB is a
  * shuffle measured in multiples of the input. This implementation is the
  * scalable union-tag form instead: tag both sides, union them, and run one
  * `last(payload, ignoreNulls)` window over (key, time). Cost is a single
  * hash-partition exchange on the key plus a per-partition sort — identical
  * to the shuffle a plain sort-merge equi-join would pay, with zero row
  * amplification. Skewed keys behave exactly like a skewed groupBy and get
  * the same medicine (AQE skew handling / salting upstream).
  *
  * Tie semantics: a right row at exactly the left row's time DOES match
  * (`>=`), enforced by sorting right-before-left within equal times. Right
  * rows that duplicate (key, time) are resolved arbitrarily by DuckDB's
  * ASOF; callers wanting deterministic output should pre-reduce the right
  * side to one row per (key, time).
  */
object AsOfJoin {

  /** @param left      probe side; all its columns pass through
    * @param right     build side; every column except `key`/`rightTime`
    *                  becomes a (nullable) payload column on the output
    * @param key       equi-join column name, present on both sides
    * @param leftTime  left ordering column (must be right-comparable)
    * @param rightTime right ordering column
    */
  def backward(left: DataFrame, right: DataFrame,
               key: String, leftTime: String, rightTime: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == key || c == rightTime).toSeq
    val leftCols = left.columns.toSeq
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    val collisions = leftCols.toSet & payloadCols.toSet
    require(collisions.isEmpty,
      s"left columns collide with right payload columns: ${collisions.mkString(", ")} — " +
        "rename one side or the output would carry ambiguous duplicate names")

    // SQL join semantics: a NULL key never equi-matches and a NULL time
    // never satisfies `>=`, so such right rows can match nothing — prune
    // them at the scan. (Window.partitionBy would otherwise group NULL keys
    // into one partition and hand NULL-keyed left rows a bogus match; a
    // NULL-time right row would sort nulls-first and back-fill everything.)
    val matchableRight = right.filter(col(key).isNotNull && col(rightTime).isNotNull)

    // A whole-row struct per side, so a single ignoreNulls window expression
    // carries the match: the struct from a right row is non-null even when
    // individual payload fields are NULL, so legitimate NULL payload values
    // never make `last` skip back to an older right row.
    val payStruct = struct(payloadCols.map(col): _*)
    val payType = right.select(payStruct.as("p")).schema("p").dataType
    val leftStruct = struct(leftCols.map(col): _*)
    val leftType = left.select(leftStruct.as("l")).schema("l").dataType

    val taggedRight = matchableRight.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(1).as("__isR"),
      payStruct.as("__pay"), lit(null).cast(leftType).as("__row"))
    val taggedLeft = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(0).as("__isR"),
      lit(null).cast(payType).as("__pay"), leftStruct.as("__row"))

    // Right sorts before left at equal times (__isR desc) => `>=` matching.
    // A left row with a NULL time sorts first (nulls-first asc) and so sees
    // no right rows — the same no-match DuckDB ASOF produces.
    val w = Window.partitionBy("__k").orderBy(col("__t").asc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__isR") === 0)
      .select(leftCols.map(c => col(s"__row.$c").as(c)) ++
        payloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
