package graft.vault

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Core scalar helpers shared across the vault.
  *
  * Reference: DataVaultFunctions (DataVaultShared.py:11-38).
  */
object Dv {

  /** Hash key / hash diff: `md5(concat_ws(',', cols...))`.
    *
    * `concat_ws` SKIPS NULLS — this null-folding is observable behavior in
    * the reference (DataVaultShared.py:11-19): key tuples differing only in
    * null-vs-absent collide. Preserved deliberately.
    */
  def hash(cols: Seq[Column]): Column = md5(concat_ws(",", cols: _*))
  def hashNames(names: Seq[String]): Column = hash(names.map(col))

  /** ISO-8601 string → timestamp (DataVaultShared.py:30-38). */
  def parseTimestamp(c: Column): Column = to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** Open-interval sentinel: the reference uses Python `datetime.max`
    * (BusinessVault.py:100). Spark timestamps are µs-precision, so the
    * equivalent in-range literal is 9999-12-31 23:59:59.999999 UTC. */
  val maxTimestamp: Column = to_timestamp(lit("9999-12-31 23:59:59.999999"))
  val maxTimestampSql: String = "9999-12-31 23:59:59.999999"
}
