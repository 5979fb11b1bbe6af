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
    val l = rightValueCols.foldLeft(left.withColumn("__side", lit(1))) {
      (df, v) => df.withColumn(v, lit(null).cast(right.schema(v).dataType))
    }
    val r = leftCols.filterNot((Seq(keyCol, tsCol) ++ rightValueCols).contains)
      .foldLeft(right.select((Seq(keyCol, tsCol) ++ rightValueCols).map(col): _*)
        .withColumn("__side", lit(0))) {
        (df, v) => df.withColumn(v, lit(null).cast(left.schema(v).dataType))
      }
    val unioned = l.select((leftCols ++ rightValueCols :+ "__side").map(col): _*)
      .union(r.select((leftCols ++ rightValueCols :+ "__side").map(col): _*))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightValueCols
      .foldLeft(unioned) { (df, v) =>
        df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
      }
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
