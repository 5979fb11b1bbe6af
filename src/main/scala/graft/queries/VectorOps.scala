package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  * Dot products are computed as a sequential left-fold in DOUBLE
  * precision (zip_with + aggregate — whole-stage-codegen'd, no UDF), so
  * the DuckDB oracle's list_dot_product over DOUBLE[] sums the same 64
  * products in the same order. Ranks are totally ordered by
  * (similarity DESC, neighbor id ASC) so last-bit float noise cannot
  * change the output; scores themselves are not emitted.
  *
  * Scale path: brute force is O(Q·N) with the query side broadcast —
  * right for small Q. The IVF variant buckets vectors by nearest
  * centroid and probes one bucket, cutting the candidate set by the
  * centroid count; at 100 TB the assignment is one narrow pass and the
  * probe is an equi-join on centroid id.
  */
object VectorOps {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** embeddings with double vector + L2 norm. */
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  private val K = 5
  private val NQ = 10 // query vectors: vec_id < NQ

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-k: broadcast the query side, rank per query.
    "e01_knn_brute" -> ((s, d) => {
      val base = emb(s, d)
      val q = base.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
      base.join(broadcast(q), col("vec_id") =!= col("qid"))
        .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("qid"), col("vec_id").as("neighbor_id"), col("rank"))
    }),

    // IVF-style ANN: every vec_id % 50 == 0 vector is a centroid; assign
    // each vector to its max-cosine centroid, then probe only the query's
    // bucket. Exercises the partition-then-probe shape that scales.
    "e02_knn_ivf" -> ((s, d) => {
      val base = emb(s, d)
      val cent = base.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      val wAssign = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid").asc)
      val assigned = base.join(broadcast(cent))
        .withColumn("csim", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .withColumn("arn", row_number().over(wAssign))
        .filter(col("arn") === 1)
        .select(col("vec_id"), col("cid"), col("v"), col("nrm"))
      val q = assigned.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("qid"), col("cid").as("qcid"),
          col("v").as("qv"), col("nrm").as("qn"))
      val wRank = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
      assigned.join(broadcast(q), col("cid") === col("qcid") && col("vec_id") =!= col("qid"))
        .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= K)
        .select(col("qid"), col("vec_id").as("neighbor_id"), col("rank"))
    })
  )

  private val vSql = "list_transform(embedding, x -> x::DOUBLE)"

  def oracleSql: Map[String, String] = Map(
    "e01_knn_brute" ->
      s"""WITH e AS (SELECT vec_id, $vSql AS v,
           sqrt(list_dot_product($vSql, $vSql)) AS nrm FROM embeddings),
         q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM e WHERE vec_id < $NQ),
         sims AS (SELECT q.qid, e.vec_id,
           list_dot_product(e.v, q.qv) / (e.nrm * q.qn) AS sim
           FROM e JOIN q ON e.vec_id <> q.qid),
         ranked AS (SELECT qid, vec_id, row_number()
           OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rank FROM sims)
         SELECT qid, vec_id AS neighbor_id, rank FROM ranked WHERE rank <= $K""",
    "e02_knn_ivf" ->
      s"""WITH e AS (SELECT vec_id, $vSql AS v,
           sqrt(list_dot_product($vSql, $vSql)) AS nrm FROM embeddings),
         c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e WHERE vec_id % 50 = 0),
         assigned AS (SELECT vec_id, cid, v, nrm FROM (
           SELECT e.vec_id, c.cid, e.v, e.nrm, row_number()
             OVER (PARTITION BY e.vec_id
                   ORDER BY list_dot_product(e.v, c.cv) / (e.nrm * c.cn) DESC, c.cid ASC) AS arn
           FROM e CROSS JOIN c) WHERE arn = 1),
         q AS (SELECT vec_id AS qid, cid AS qcid, v AS qv, nrm AS qn
           FROM assigned WHERE vec_id < $NQ),
         sims AS (SELECT q.qid, a.vec_id,
           list_dot_product(a.v, q.qv) / (a.nrm * q.qn) AS sim
           FROM assigned a JOIN q ON a.cid = q.qcid AND a.vec_id <> q.qid),
         ranked AS (SELECT qid, vec_id, row_number()
           OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rank FROM sims)
         SELECT qid, vec_id AS neighbor_id, rank FROM ranked WHERE rank <= $K"""
  )
}
