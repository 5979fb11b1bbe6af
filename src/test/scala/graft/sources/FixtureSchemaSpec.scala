package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the PHYSICAL types the engine assumes for every fixture table.
  *
  * The driver regenerates /root/testdata out-of-band; in r11 it silently
  * flipped events.ts from INT64 nanoseconds to timestamp[us], which broke
  * two query plans deep inside window/unix_millis expressions. This spec
  * exists so the NEXT fixture-format drift fails red in one obvious
  * place, with a message naming the normalization point to update.
  *
  * events.ts is special-cased: any form [[Tables.normalizeTs]] handles is
  * acceptable (that is the contract — the reader canonicalizes), and the
  * normalized output must be session-local TimestampType. Every other
  * column is pinned exactly: nothing else in the engine normalizes, so
  * any drift there needs an explicit decision.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def fields(name: String): Map[String, DataType] =
    Tables.table(spark, sf, name).schema.fields
      .map(f => f.name -> f.dataType).toMap

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  expected.foreach { case (tableName, cols) =>
    test(s"$tableName physical schema matches what the engine assumes") {
      val actual = fields(tableName)
      cols.foreach { case (colName, tpe) =>
        val got = actual.getOrElse(colName, fail(
          s"$tableName.$colName missing from the fixture — the driver " +
            "regenerated /root/testdata with a different schema; audit " +
            "every consumer of this table before re-pinning here"))
        assert(got == tpe,
          s"$tableName.$colName drifted: fixture now reads as $got, the " +
            s"engine assumes $tpe. If deliberate, re-pin here and audit " +
            "consumers; timestamp columns may also need a normalization " +
            "point like Tables.normalizeTs.")
      }
    }
  }

  test("events.ts physical form is one Tables.normalizeTs handles") {
    val raw = Tables.table(spark, sf, "events").schema("ts").dataType
    assert(Seq(LongType, TimestampNTZType, TimestampType).contains(raw),
      s"events.ts arrived as $raw — the fixture format drifted again " +
        "(ns-int64 in r1-r10, timestamp[us] since r11). Teach " +
        "graft.sources.Tables.normalizeTs the new form; every ts " +
        "consumer goes through it.")
  }

  test("events non-ts columns are pinned exactly") {
    val actual = fields("events")
    Seq("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType).foreach { case (c, t) =>
      assert(actual.get(c).contains(t),
        s"events.$c drifted to ${actual.get(c)} (engine assumes $t)")
    }
  }

  test("Tables.events normalizes ts to session-local TimestampType") {
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType,
      "Tables.normalizeTs must canonicalize every physical ts form to " +
        "TimestampType — windows, unix_millis and watermarks depend on it")
  }

  test("events (user_id, ms-truncated ts) is unique — the w04 replay contract") {
    // w04's streaming replay hash-matches the one-shot batch oracles
    // BECAUSE no two events share (user_id, ts@ms): the vault loaders'
    // (HKEY, LOAD_DATE) cross-batch anti-join then drops exactly the
    // redelivered rows. A fixture regeneration that introduces such a
    // collision makes the satellite result order-dependent across
    // micro-batches — w04 would need a deterministic in-batch
    // tie-break before re-pinning here.
    import org.apache.spark.sql.functions._
    val dups = Tables.events(spark, sf)
      .groupBy(col("user_id"), date_trunc("MILLISECOND", col("ts")))
      .count().filter(col("count") > 1).count()
    assert(dups == 0L,
      s"$dups (user_id, ts@ms) collisions in events — w04's streaming " +
        "replay is only batch-equivalent when the pair is unique")
  }

  test("embeddings are 64-dimensional (the engine's Dim constant)") {
    // every ANN operator, codebook split (Dim/PqM), hyperplane set and
    // oracle literal assumes 64 components — a fixture regeneration at
    // a different dim must fail HERE, not deep inside a PQ slice
    val dims = Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("embedding")).as("d"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(dims == Seq(64),
      s"embeddings.embedding drifted to dims $dims — the engine (and " +
        "queries/VectorOps.Dim) assume 64; audit every ANN operator " +
        "and oracle before re-pinning")
  }
}
