package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row whose
  * timestamp is at or before the left row's timestamp, per key.
  *
  * Spark has no native ASOF operator; the naive form is a range
  * theta-join (quadratic per key) or a windowed subquery per probe.
  * This is the scalable union-window form: tag both sides, union,
  * ONE window over (key, ts) carrying the right side's values forward
  * with `last_value(ignoreNulls)`, keep the left rows — a single
  * exchange on the key, cost linear in |L| + |R|, no join explosion
  * regardless of key skew.
  *
  * The right side must be unique per (key, ts) — pre-aggregate it (the
  * caller knows which reducer is right); ties at the same instant
  * resolve right-before-left, so a right row AT the left timestamp is
  * visible (inclusive as-of, matching e.g. DuckDB's ASOF `>=`).
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightValueCols.forall(!leftCols.contains(_)),
      s"right value columns ${rightValueCols.mkString(",")} collide with left columns")
    require(right.columns.contains(tsCol) && right.columns.contains(keyCol),
      s"right side must carry '$keyCol' and '$tsCol' under the same names")
    // carry the matched right row as ONE struct: a per-column
    // last(ignoreNulls) would skip a NULL inside the latest right row
    // and leak an older row's value (or stitch columns from different
    // rows) — the struct is null exactly on left rows, so the window
    // picks the latest right ROW atomically, null fields included
    val rvType = org.apache.spark.sql.types.StructType(
      rightValueCols.map(v => right.schema(v).copy(nullable = true)))
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val r = leftCols.filterNot(Seq(keyCol, tsCol).contains)
      .foldLeft(right
        .select((Seq(keyCol, tsCol)).map(col) :+
          struct(rightValueCols.map(col): _*).as("__rv"): _*)
        .withColumn("__side", lit(0))) {
        (df, v) => df.withColumn(v, lit(null).cast(left.schema(v).dataType))
      }
    val ordered = Seq("__rv", "__side")
    val unioned = l.select((leftCols ++ ordered).map(col): _*)
      .union(r.select((leftCols ++ ordered).map(col): _*))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = unioned
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    rightValueCols
      .foldLeft(picked)((df, v) => df.withColumn(v, col("__rv").getField(v)))
      .drop("__rv", "__side")
  }
}
