package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Shuffle audit shared by the one-off sweep main and the standing
  * [[graft.queries.ShuffleBaselineSpec]] gate.
  *
  * Exchange COUNT is treated as the plan-shape fingerprint: bytes drift
  * with fixture evolution, but a query growing or losing a shuffle
  * exchange is a structural plan change that should fail a test, not
  * wait for judge archaeology over BENCH shuffle_bytes.
  *
  * Counting is STATIC (no job runs): with AQE disabled the physical
  * preparation rules — including ReuseExchangeAndSubquery — produce the
  * final plan at planning time, so a broken self-join exchange reuse
  * (e.g. the asymmetric alias projection that silently doubled d09's
  * pipeline in r8) shows up as one more ShuffleExchangeExec without
  * executing anything. Under AQE the initial plan carries no reuse
  * information (stage dedup happens at runtime), which is why the sweep
  * pins the non-adaptive plan instead.
  */
object ShuffleSweep {

  /** Distinct shuffle exchanges in the final non-AQE physical plan.
    * Reused exchanges are left unentered: flatten then visits each
    * original exchange exactly once, so a plain count is the distinct
    * count. Call inside [[withStaticPlans]]. */
  def staticExchanges(df: DataFrame): Int =
    graft.plans.PlanWalk.flatten(df.queryExecution.executedPlan,
        intoReusedExchange = false)
      .count(_.isInstanceOf[ShuffleExchangeExec])

  /** Run `f` with AQE off so executedPlan is final (reuse applied) at
    * planning time. Must wrap query CONSTRUCTION too, not just the plan
    * access — eager driver-side work inside construction plans under
    * the session conf of the moment. */
  def withStaticPlans[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, old)
  }

  /** Sweep every SparkEntry query at `sf`: static exchange count, then
    * (when `execute`) one full run to read shuffleBytesWritten the way
    * Bench does. Returns (name, exchanges, bytes, error). */
  def sweep(spark: SparkSession, sf: String, execute: Boolean)
      : Seq[(String, Int, Long, Option[String])] =
    withStaticPlans(spark) {
      SparkEntry.queries.keys.toSeq.sorted.map { name =>
        try {
          val df = SparkEntry.queries(name)(spark, sf)
          val ex = staticExchanges(df)
          val bytes = if (!execute) -1L else {
            df.queryExecution.executedPlan.execute()
              .foreachPartition(
                (_: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => ())
            graft.plans.PlanWalk.flatten(df.queryExecution.executedPlan,
                intoReusedExchange = false)
              .collect { case s: ShuffleExchangeExec =>
                s.metrics.get("shuffleBytesWritten") }
              .flatten.distinctBy(_.id).map(_.value).sum
          }
          (name, ex, bytes, None)
        } catch { case e: Throwable =>
          (name, -1, -1L, Some(e.toString.take(200)))
        }
      }
    }

  /** One-off main: prints per-query lines; with `--write PATH` also
    * dumps the machine-readable baseline consumed by
    * ShuffleBaselineSpec. Regenerate after a DELIBERATE plan change:
    *   sbt 'Test/runMain graft.ShuffleSweep /root/testdata/sf0.01 --write SHUFFLE_BASELINE.json'
    */
  def main(args: Array[String]): Unit = {
    val sf = args.filterNot(_.startsWith("--"))
      .headOption.getOrElse("/root/testdata/sf0.01")
    val out: Option[String] = args.toSeq.sliding(2)
      .collectFirst { case Seq("--write", p) => p }
    val rows = sweep(TestSpark.spark, sf, execute = true)
    rows.foreach {
      case (name, ex, bytes, None) =>
        println(f"SWEEP $name%-28s exchanges=$ex%2d bytes=$bytes%10d")
      case (name, _, _, Some(err)) =>
        println(s"SWEEP $name ERROR $err")
    }
    out.foreach { path =>
      val errs = rows.collect { case (n, _, _, Some(e)) => s"$n: $e" }
      require(errs.isEmpty, s"refusing to write baseline with errors:\n${errs.mkString("\n")}")
      val body = rows.map { case (n, ex, bytes, _) =>
        s"""    "$n": {"exchanges": $ex, "bytes": $bytes}""" }
        .mkString(",\n")
      val json = s"""{\n  "sf": "$sf",\n  "queries": {\n$body\n  }\n}\n"""
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        json.getBytes("UTF-8"))
      println(s"SWEEP baseline written to $path")
    }
  }
}
