package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Dot products run through `graft_dot`, a native Catalyst expression
  * (graft.functions.DotProductFloat) that compiles to a primitive loop
  * inside whole-stage codegen: each float widens to double, accumulation
  * is a sequential left fold — bit-identical to the interpreted
  * higher-order-function form it replaces, several times faster.
  * Ranking always carries a total tiebreak (similarity DESC, id ASC).
  * Brute force broadcasts the query side (right for small Q at any
  * corpus size); the IVF variant assigns vectors to max-cosine centroids
  * once, then probes a single bucket via an equi-join on centroid id —
  * the candidate set shrinks by the centroid count, which is the path
  * to 100 TB corpora.
  */
object Similarity {

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** (id, v: float[], nrm) projection of an embedding frame. */
  def withNorm(df: DataFrame, idCol: String, embeddingCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol), col(embeddingCol).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  /** Brute-force cosine top-k of `queries` against `base`; both must be
    * withNorm projections keyed by `idCol`. Output: (qid, neighbor, rank). */
  def knnBrute(base: DataFrame, queries: DataFrame, idCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col(idCol).asc)
    base.join(broadcast(q), col(idCol) =!= col("qid"))
      .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol).as("neighbor_id"), col("rank"))
  }

  /** Assign every vector to its max-cosine centroid (ties: lowest id).
    *
    * ZERO-shuffle since r8: centroids are configuration-sized by
    * contract (the IVF codebook, like PQ's — `maxCentroids` enforces
    * it, mirroring `pqTrainSampled.maxCodewords`), so they collect once
    * in id order and ride into `graft_argmax_cos`, one looped-codegen
    * node per row whose tie/NaN ordering is bit-identical to the
    * row_number-over-(csim DESC, cid ASC) form. The index→cid mapping
    * re-enters as a broadcast join (no corpus exchange). The previous
    * cross-join+window form pushed corpus × C rows — every vector
    * duplicated per centroid — through a hash exchange just to keep the
    * argmax; at 100 TB with thousands of centroids that exchange IS the
    * index-build cost.
    *
    * Contract deltas vs the window form, all in the degenerate corner:
    * a row whose vector is null, has a null element, or mismatches the
    * centroid dimensionality is DROPPED (the window form kept it,
    * assigned to an arbitrary lowest-id centroid — an assignment with
    * no meaning); and `base` must be unique per `idCol` (the withNorm
    * projection is — the window form would have collapsed duplicate
    * ids to one arbitrary row instead). */
  def assignToCentroids(base: DataFrame, centroids: DataFrame, idCol: String,
      maxCentroids: Int = 4096): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    graft.functions.GraftFunctions.register(base.sparkSession)
    val spark = base.sparkSession
    val rows = DriverBounded.collectCapped(
      centroids.select(col(idCol), col("v"), col("nrm")).orderBy(col(idCol)),
      maxCentroids,
      s"assignToCentroids: centroid set exceeds maxCentroids $maxCentroids " +
        "— centroids are configuration, not data; cap the input " +
        "(cf. pqTrainSampled.maxCodewords) or raise the bound deliberately")
    require(rows.nonEmpty, "assignToCentroids: empty centroid set")
    val vecs = rows.map(_.getSeq[Float](1).toSeq).toSeq
    val norms = rows.map(_.getDouble(2)).toSeq
    val idField = centroids.schema(idCol)
    val indexDf = spark.createDataFrame(
      java.util.Arrays.asList(rows.zipWithIndex.map {
        case (r, i) => Row(i, r.get(0)) }: _*),
      StructType(Seq(StructField("__ci", IntegerType, nullable = false),
        StructField("__cid", idField.dataType, idField.nullable))))
    base.withColumn("__ci", call_function("graft_argmax_cos",
        col("v"), col("nrm"), typedlit(vecs), typedlit(norms)))
      .join(broadcast(indexDf), Seq("__ci"))
      .select(col(idCol), col("__cid").as("cid"), col("v"), col("nrm"))
  }

  /** Each query's `probes` highest-cosine centroid buckets as probe
    * rows — [[assignToCentroids]] generalized for multi-probe serving
    * (the [[knnIvfMultiProbe]] recall lever on the EXTERNAL path):
    * `probes` = 1 takes the zero-shuffle argmax verbatim; above it,
    * each query fans out to one row per probed bucket via a broadcast
    * centroid join and a per-query (psim DESC, cid ASC) window — Q × C
    * candidate rows, both configuration-bounded, so the expansion
    * never touches the corpus. Output shape matches assignToCentroids
    * (idCol, cid, v, nrm), one row per (query, probed bucket). Same
    * tie order as the by-id multi-probe; same degenerate-corner
    * contract as assignToCentroids for P = 1 (null/mismatched vectors
    * drop — the external probes' width guard refuses them earlier
    * anyway). */
  private def assignProbeBuckets(queries: DataFrame, centroids: DataFrame,
      idCol: String, probes: Int): DataFrame =
    if (probes <= 1) assignToCentroids(queries, centroids, idCol)
    else {
      val cent = centroids.select(col(idCol).as("__pcid"),
        col("v").as("__cv"), col("nrm").as("__cn"))
      val wp = Window.partitionBy(col(idCol))
        .orderBy(col("__psim").desc, col("__pcid").asc)
      queries.select(col(idCol), col("v"), col("nrm"))
        .join(broadcast(cent))
        .withColumn("__psim",
          dot(col("v"), col("__cv")) / (col("nrm") * col("__cn")))
        .withColumn("__prn", row_number().over(wp))
        .filter(col("__prn") <= probes)
        .select(col(idCol), col("__pcid").as("cid"), col("v"), col("nrm"))
    }

  /** A fitted spherical-k-means model: the final per-vector assignment
    * (same shape as [[assignToCentroids]] output, with `cid` = 0-based
    * centroid index, so it composes directly with [[buildIvfIndex]] /
    * [[knnIvf]]), plus the trained centroids and their norms. */
  case class KMeansModel(assignment: DataFrame,
      centroids: Seq[Array[Float]], norms: Seq[Double])

  /** Spherical k-means (Lloyd) — the training step that produces the
    * IVF centroid codebook: seed with the `k` vectors of smallest
    * `md5(id)` (hash order decorrelates the seeds from ingestion order
    * — the k lowest IDs of a real corpus are one crawl slice, the worst
    * Lloyd seeding — while staying deterministic and exactly
    * reproducible by an external oracle), then `iters` rounds of
    * {max-cosine assignment, mean update}, returning the assignment
    * under the final centroids.
    *
    * Built for reproducibility at scale: the centroid update
    * accumulates vectors QUANTIZED to `quantScale`-ths as longs, so the
    * distributed per-cluster sum is exact integer arithmetic — the
    * result is bit-identical under any partitioning, task order, or
    * engine (floating-point sums commute only approximately; long sums
    * commute exactly). Each new centroid dimension is then one double
    * division, cast to float — a deterministic derivation an external
    * oracle reproduces exactly. Empty clusters keep their previous
    * centroid.
    *
    * Scale shape: per round, one ZERO-shuffle narrow pass (the
    * configuration-sized centroids ride into `graft_argmax_cos` as
    * literals, cf. [[assignToCentroids]]) plus one k-row aggregate
    * whose map-side combine reduces each task to k×(dim+1) longs; the
    * driver holds k×dim floats between rounds ([[DriverBounded]]).
    * Rows whose vector is null or mismatches `dim` are dropped (the
    * argmax contract). `base` must be a [[withNorm]] projection.
    *
    * Overflow headroom: the per-cluster sums are 64-bit — under
    * `spark.sql.ansi.enabled=false` an overflowing long sum WRAPS
    * silently into a corrupt centroid, and an external oracle that
    * widens (DuckDB sums BIGINT into HUGEINT) diverges without any
    * error. So every update round also aggregates the max |quantized
    * component| per cluster and fails with sizing guidance when
    * maxAbs × clusterSize could exceed Long.MaxValue (the conservative
    * bound |Σterms| ≤ n·max|term| — enforced even when the actual
    * mixed-sign sum happened to fit). Practical sizing: quantScale ×
    * max|v_i| × rows-per-cluster must stay below 2^63 — at the default
    * 1000 with unit-normalized embeddings that allows ~9×10^15 rows per
    * cluster before the guard even engages. */
  def kmeansFit(base: DataFrame, idCol: String, k: Int, iters: Int,
      dim: Int, quantScale: Int = 1000, maxK: Int = 4096): KMeansModel = {
    require(k > 0 && k <= maxK, s"kmeansFit: k must be in [1, $maxK], got $k")
    require(iters >= 1, s"kmeansFit: iters must be >= 1, got $iters")
    require(dim > 0 && quantScale > 0,
      s"kmeansFit: dim and quantScale must be positive, got $dim, $quantScale")
    graft.functions.GraftFunctions.register(base.sparkSession)

    // sqrt(sum x_i^2) via the same left-to-right widening double fold
    // graft_dot and DuckDB's list_dot_product use — norms must be
    // bit-identical to what an oracle computes from the same floats
    def normOf(c: Array[Float]): Double =
      math.sqrt(c.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    def assignIdx(cvs: Seq[Array[Float]], cns: Seq[Double]) =
      call_function("graft_argmax_cos", col("v"), col("nrm"),
        typedlit(cvs.map(_.toSeq)), typedlit(cns))

    var cvs: Seq[Array[Float]] = kmeansSeeds(base, idCol, k, dim)
    require(cvs.nonEmpty, "kmeansFit: no usable seed vectors " +
      s"(null-free vectors of dimension $dim)")
    var cns: Seq[Double] = cvs.map(normOf)

    // exact update accumulators: round(v_i * quantScale) as long.
    // Half-way products DO occur (0.0625f * 1000 = 62.5 exactly); the
    // engines agree because BOTH round halves away from zero (Spark
    // round = HALF_UP, DuckDB round = C round) — an oracle ported to an
    // engine with banker's rounding would diverge here
    val sumExprs = (1 to dim).map(i => sum(expr(
      s"cast(round(cast(element_at(v, $i) as double) * $quantScale) as bigint)"))
      .as(s"s$i"))
    // overflow sentry: max |quantized component| per cluster, so the
    // driver can prove |Σterms| <= cnt * maxAbs fits in 64 bits — a
    // wrapped long sum would otherwise corrupt the centroid silently.
    // Measured in the DOUBLE domain, BEFORE the bigint cast: a
    // component already past long range clamps to Long.MinValue at the
    // (non-ANSI) cast, and abs(Long.MinValue) wraps NEGATIVE — a
    // long-domain max would never see it and the guard would pass the
    // exact corruption it exists to catch. The double magnitude is
    // exact where it matters (below 2^53) and errs loud above; a NaN
    // component poisons the max and fails the require, also loud
    val maxAbsExpr = max(expr(
      s"array_max(transform(v, x -> abs(round(cast(x as double) * $quantScale))))"))
      .as("max_abs_q")
    for (_ <- 1 to iters) {
      val byCluster = DriverBounded.collectCapped(
        base.withColumn("__ci", assignIdx(cvs, cns))
          .filter(col("__ci").isNotNull)
          .groupBy("__ci")
          .agg(count(lit(1)).as("cnt"), maxAbsExpr +: sumExprs: _*),
        cvs.length,
        "kmeansFit: more clusters than centroids in the update aggregate")
      val updates = byCluster.map { r =>
        val cnt = r.getLong(1)
        val maxAbsQ = r.getDouble(2)
        require(maxAbsQ <= (Long.MaxValue / cnt).toDouble,
          s"kmeansFit: quantized-accumulator headroom exceeded in cluster " +
            s"${r.getInt(0)} (max |component| x quantScale = $maxAbsQ over " +
            s"$cnt rows risks 64-bit overflow); lower quantScale or the " +
            "component magnitudes")
        r.getInt(0) -> Array.tabulate(dim)(d =>
          (r.getLong(d + 3).toDouble / (quantScale.toDouble * cnt)).toFloat)
      }.toMap
      cvs = cvs.zipWithIndex.map { case (old, j) => updates.getOrElse(j, old) }
      cns = cvs.map(normOf)
    }
    KMeansModel(
      base.withColumn("cid", assignIdx(cvs, cns))
        .filter(col("cid").isNotNull)
        .select(col(idCol), col("cid"), col("v"), col("nrm")),
      cvs, cns)
  }

  /** The kmeansFit seed set: the `k` vectors of smallest
    * `(md5(cast(id as string)), id)` (fewer if the corpus is smaller),
    * under the same drop contract as assignment — null vectors, null
    * elements, and dim mismatches never seed. Hash order makes the
    * seeds a deterministic pseudo-random corpus sample; both engines
    * hash the decimal string form of the id, so an external oracle
    * orders by `md5(id::VARCHAR)` and selects identical rows. */
  def kmeansSeeds(base: DataFrame, idCol: String, k: Int,
      dim: Int): Seq[Array[Float]] =
    DriverBounded.takeFirst(
        base.select(col(idCol), col("v"))
          .filter(col("v").isNotNull && size(col("v")) === dim &&
            expr("forall(v, x -> x is not null)"))
          .orderBy(md5(col(idCol).cast("string")), col(idCol)), k)
      .map(_.getSeq[Float](1).toArray).toSeq

  /** Johnson-Lindenstrauss random projection: reduce an embedding to
    * `outDim` dimensions via deterministic ±1 hyperplanes scaled by
    * 1/sqrt(outDim) — the standard cheap pre-reduction before ANN when
    * the raw dimensionality dominates scan cost (projected vectors are
    * outDim/dim of the bytes; JL keeps pairwise distances within
    * (1±eps) for outDim = O(log n / eps^2)). FULLY NARROW: outDim
    * codegen'd `graft_dot` folds per row against literal weights
    * ([[hyperplaneWeights]] — md5-derived, so an external oracle
    * inlines identical constants), zero exchanges at any scale.
    *
    * `base` must be a [[withNorm]] projection with vectors of length
    * `dim`: a mismatched row fails the job loudly (a codegen'd value
    * guard — the projection itself would null it silently). Output:
    * (idCol, rp: array<float>), rp(j) = float(dot(v, w_j)/sqrt(outDim))
    * — float, so the result feeds [[withNorm]] and the whole ANN stack
    * directly and the byte ratio really is outDim/dim.
    *
    * The projection is ONE looped-codegen node (`graft_matvec`): the
    * earlier unrolled form — outDim separate dot folds — crossed
    * Janino's 64 KB method ceiling near outDim ≈ 224 and silently fell
    * back to interpreted execution (measured; SCALING.md), so like PQ's
    * encode this loops over a referenced float[][] and stays in
    * whole-stage codegen at ANY (dim, outDim). Arithmetic is unchanged:
    * per plane one widening left-fold dot, one double division, one
    * float cast. */
  def randomProject(base: DataFrame, idCol: String, outDim: Int,
      dim: Int): DataFrame = {
    require(outDim > 0 && dim > 0,
      s"randomProject: outDim and dim must be positive, got $outDim, $dim")
    graft.functions.GraftFunctions.register(base.sparkSession)
    val s = math.sqrt(outDim.toDouble)
    val planes = hyperplaneWeights(outDim, dim)
    val projected = call_function("graft_matvec",
      col("v"), typedlit(planes.map(_.toSeq)), lit(s))
    base.select(col(idCol),
      when(size(col("v")) === dim, projected)
        .otherwise(raise_error(concat(
          lit(s"randomProject: vector of length "), size(col("v")).cast("string"),
          lit(s" does not match dim $dim"))))
        .as("rp"))
  }

  /** Deterministic ±1 random-hyperplane weights for sign-LSH: plane `p`
    * dimension `i` weighs +1 when the first byte of md5("p,i") is below
    * 0x80. The derivation is pure and engine-independent, so an external
    * oracle can inline the identical constants. */
  def hyperplaneWeights(nPlanes: Int, dim: Int): Seq[Array[Float]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { p =>
      (0 until dim).map { i =>
        val h = md.digest(s"$p,$i".getBytes("UTF-8")) // digest() leaves md reset
        if ((h(0) & 0xff) < 0x80) 1.0f else -1.0f
      }.toArray
    }
  }

  /** Random-hyperplane (sign) LSH bucketing — the alternative blocker to
    * [[assignToCentroids]]: bucket id = the sign-bit string of the
    * vector against each hyperplane. Same output shape (`cid` column),
    * so [[knnIvf]] and [[nearDupPairs]] probe LSH buckets unchanged.
    * One narrow codegen'd pass, no shuffle, no training step — vs IVF's
    * broadcast-assign — at the cost of recall tuned only by the plane
    * count. */
  def assignLshBuckets(base: DataFrame, idCol: String,
      weights: Seq[Array[Float]]): DataFrame = {
    val bits = weights.map(w =>
      when(dot(col("v"), typedlit(w.toSeq)) > 0d, "1").otherwise("0"))
    base.select(col(idCol), concat(bits: _*).as("cid"), col("v"), col("nrm"))
  }

  /** Embedding-cosine near-duplicate pairs inside centroid blocks:
    * after assignToCentroids, only same-bucket pairs are compared — the
    * blocked shape that avoids the all-pairs join at corpus scale.
    * SYMMETRIC alias projections (one select of the same shape per
    * side): the two block-key exchanges canonicalize identically, so
    * the assignment pipeline runs once and the other join side is a
    * ReusedExchange — measured; an asymmetric raw-frame-vs-renamed
    * join re-runs it. No join-strategy hint: the default sort-merge
    * join sort-spills a skewed centroid block where a forced hash
    * build would OOM, and reuse holds without it. */
  def nearDupPairs(assigned: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val a = assigned.select(col(idCol).as("a_id"), col("cid").as("a_cid"),
      col("v").as("av"), col("nrm").as("an"))
    val b = assigned.select(col(idCol).as("b_id"), col("cid").as("b_cid"),
      col("v").as("bv"), col("nrm").as("bn"))
    a.join(b, col("a_cid") === col("b_cid") && col("a_id") < col("b_id"))
      .withColumn("sim", dot(col("av"), col("bv")) / (col("an") * col("bn")))
      .filter(col("sim") > threshold)
      .select(col("a_id"), col("b_id"))
  }

  /** Drop `table` and clear a MANAGED location orphaned by a previous
    * session (fresh metastore over a persistent warehouse dir blocks
    * CREATE otherwise), so index builds are safely re-runnable.
    *
    * Only directories the warehouse manages are ever deleted: when the
    * table exists, its actual catalog location is used (and left alone
    * for EXTERNAL tables — that data is not ours); only when the table
    * is absent from the metastore is the DEFAULT managed path cleared,
    * which is exactly the orphaned-directory case. */
  private[graft] def dropTableAndLocation(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    import org.apache.spark.sql.catalyst.catalog.CatalogTableType
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val db = ident.database.getOrElse(spark.catalog.currentDatabase)
    val toClear: Option[org.apache.hadoop.fs.Path] =
      if (spark.catalog.tableExists(table)) {
        val meta = spark.sessionState.catalog.getTableMetadata(ident)
        // managed data may survive the DROP when the metastore was
        // recreated mid-session; external locations are never touched
        if (meta.tableType == CatalogTableType.MANAGED)
          Some(new org.apache.hadoop.fs.Path(meta.location))
        else None
      } else Some(new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getDatabaseMetadata(db).locationUri.toString,
        ident.table))
    spark.sql(s"DROP TABLE IF EXISTS $table")
    toClear.foreach { loc =>
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    // every rebuild routes through this drop: the dropped table's
    // serving-identity cache entries die with it
    invalidateServingIdentity(table)
  }

  /** Serving-guard table properties, stamped at build/append time so
    * external probes read index identity from CATALOG METADATA (one
    * driver call, no Spark job) instead of paying a scheduler
    * round-trip per guard — the high-QPS serving shape. A table built
    * before the properties existed still probes correctly: every
    * reader keeps a distributed fallback. */
  private[graft] val DimProp = "graft.dim"
  private[graft] val PrefixDimsProp = "graft.prefix_dims"
  private[graft] val CodebookProp = "graft.codebook_md5"
  private[graft] val PqMProp = "graft.pq_m"

  /** One graft serving property off the catalog — a driver-side
    * metadata read, never a Spark job. */
  private[graft] def tableProp(spark: org.apache.spark.sql.SparkSession,
      table: String, key: String): Option[String] =
    spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
      .properties.get(key)

  /** Stamp graft serving metadata onto `table`. Idempotent; appends
    * never clear TBLPROPERTIES, and [[Dedup.compactKeyedTable]]'s
    * staging swap copies `graft.*` keys across, so a stamp survives
    * the table's whole maintenance lifecycle. */
  private[graft] def stampTableProps(spark: org.apache.spark.sql.SparkSession,
      table: String, props: Map[String, String]): Unit = {
    require(props.nonEmpty && props.forall { case (k, v) =>
      k.startsWith("graft.") && !v.contains("'") })
    val kvs = props.map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES ($kvs)")
    ()
  }

  /** Canonical identity of a centroid codebook: md5 over the id-ordered
    * (id, exact float bits) serialization, plus the codebook's single
    * vector width. The fingerprint is what makes "the codebook is part
    * of the index's identity" ENFORCEABLE: build/append stamp it as a
    * table property, and a later append or serving probe handing a
    * different codebook — retrained, truncated, or simply the wrong
    * variable — fails loudly instead of silently scanning the wrong
    * buckets. Float bits (not decimal rendering) so two codebooks
    * differing below print precision still differ here. */
  private[graft] def codebookFingerprint(centroids: DataFrame,
      idCol: String, maxCentroids: Int = 4096): (String, Int) = {
    servingIdentityDerivations.incrementAndGet()
    val rows = DriverBounded.collectCapped(
      centroids.select(col(idCol), col("v")).orderBy(col(idCol)),
      maxCentroids,
      s"codebookFingerprint: centroid set exceeds maxCentroids " +
        s"$maxCentroids — centroids are configuration, not data")
    require(rows.nonEmpty, "codebookFingerprint: empty centroid set")
    val widths = rows.map { r =>
      require(!r.isNullAt(1),
        s"codebookFingerprint: centroid ${r.get(0)} has a null vector")
      r.getSeq[Float](1).length
    }.distinct
    require(widths.length == 1,
      s"codebookFingerprint: centroids carry mixed vector widths " +
        s"${widths.sorted.mkString(",")} — not one codebook")
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      md.update(String.valueOf(r.get(0)).getBytes("UTF-8"))
      md.update(':'.toByte)
      r.getSeq[Float](1).foreach { x =>
        val bits = java.lang.Float.floatToIntBits(x)
        md.update(Array[Byte]((bits >>> 24).toByte, (bits >>> 16).toByte,
          (bits >>> 8).toByte, bits.toByte))
      }
      md.update(';'.toByte)
    }
    (md.digest().map("%02x".format(_)).mkString, widths.head)
  }

  // ---- Serving-identity session cache (guide §1.2; VERDICT r21 #2).
  // A serving loop hands the SAME codebook frame to every external
  // probe, and the per-probe identity work — fingerprinting the handed
  // centroids (one bounded driver job) and reloading a PQ index's
  // persisted codebooks (another) — re-derives values that cannot
  // change between index-maintenance events. Cache both, keyed so a
  // hit is provably the same question: the fingerprint by (table,
  // canonicalized centroid plan), RE-VALIDATED against the table's
  // stamped fingerprint at every hit (a rebuild under a retrained
  // codebook re-stamps, so stale entries fail the validation and
  // recompute); the PQ codebooks by table, invalidated by every
  // build/drop/compact under the engine's one shared lock. Appends
  // need no invalidation: their own fingerprint guard refuses a
  // drifted codebook, so a stamp-validated hit stays exact across
  // them. The residual assumption is the codebook-identity contract
  // itself — a centroid frame handed to a probe is deterministic
  // between maintenance events (retraining is a rebuild, which
  // re-stamps and invalidates).

  private val servingFingerprints =
    scala.collection.mutable.Map.empty[
      (String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
      (String, Int)]
  private val servingCodebooks =
    scala.collection.mutable.Map.empty[String, Seq[Seq[Array[Float]]]]
  private val ServingCacheCap = 256

  /** Count of serving-identity DERIVATIONS actually run (fingerprint
    * collects + codebook-table reads) — the observable the cache spec
    * pins: a repeat probe must not move it. */
  private[graft] val servingIdentityDerivations =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** Drop `table`'s serving-identity entries — called by every
    * build/drop/compact path, under the shared engine lock. */
  private[graft] def invalidateServingIdentity(table: String): Unit =
    Dedup.withBandLock {
      servingFingerprints.filterInPlace { case ((t, _), _) => t != table }
      servingCodebooks.remove(table)
      ()
    }

  /** [[codebookFingerprint]] behind the serving cache: a hit — same
    * table, same canonicalized centroid plan, stamped fingerprint
    * unchanged (or table unstamped) — runs ZERO Spark jobs
    * (spec-pinned); a miss computes, stores, and returns. */
  private def cachedCodebookFingerprint(
      spark: org.apache.spark.sql.SparkSession, table: String,
      centroids: DataFrame, idCol: String): (String, Int) = {
    val plan = centroids.queryExecution.analyzed.canonicalized
    val stamped = tableProp(spark, table, CodebookProp)
    Dedup.withBandLock(servingFingerprints.get((table, plan)))
      .filter { case (fp, _) => stamped.forall(_ == fp) }
      .getOrElse {
        val computed = codebookFingerprint(centroids, idCol)
        Dedup.withBandLock {
          if (servingFingerprints.size >= ServingCacheCap)
            servingFingerprints.clear()
          servingFingerprints((table, plan)) = computed
        }
        computed
      }
  }

  /** [[loadPqCodebooks]] behind the serving cache (by table; dropped
    * on build/drop/compact): the second probe of a session pays no
    * codebook-table read. */
  private def cachedPqCodebooks(
      spark: org.apache.spark.sql.SparkSession,
      table: String): Seq[Seq[Array[Float]]] =
    Dedup.withBandLock(servingCodebooks.get(table)).getOrElse {
      val cbs = loadPqCodebooks(spark, table)
      Dedup.withBandLock {
        if (servingCodebooks.size >= ServingCacheCap)
          servingCodebooks.clear()
        servingCodebooks(table) = cbs
      }
      cbs
    }

  /** One bounded job guarding BOTH serving-batch bounds — the query
    * count (the probe side broadcasts, so it must stay
    * configuration-sized) and every query's vector width (a
    * wrong-width external query nulls its similarities and silently
    * returns arbitrary "neighbors") — where the probes used to pay two
    * driver jobs. Reads at most maxQ+1 (width-mismatch) booleans. */
  private def requireServingBatch(queries: DataFrame, maxQ: Int,
      dim: Int, countMsg: => String, dimMsg: => String): Unit = {
    val bad = queries
      .select(coalesce(size(col("v")) =!= dim, lit(false)).as("bad"))
      .limit(maxQ + 1).collect()
    require(bad.length <= maxQ, countMsg)
    require(!bad.exists(_.getBoolean(0)), dimMsg)
  }

  /** The vector width stored in a table's serving properties, falling
    * back to a null-safe one-row scan for tables stamped before the
    * property existed (0 when the table is empty of usable vectors —
    * callers decide whether that is loud). */
  private[graft] def storedDim(spark: org.apache.spark.sql.SparkSession,
      table: String, vecCol: String): Int =
    tableProp(spark, table, DimProp).map(_.toInt).getOrElse {
      spark.table(table).select(size(col(vecCol)))
        .filter(col(vecCol).isNotNull).limit(1).collect()
        .headOption.map(_.getInt(0)).getOrElse(0)
    }

  /** Persist centroid assignments as a catalog table bucketed by
    * centroid id — the 100 TB serving shape: probes become scans of one
    * bucket with no shuffle on the corpus side. Stamps the vector width
    * as a serving property ([[DimProp]]); the codebook fingerprint is
    * stamped by the first [[appendToIvfIndex]]/verified by
    * [[probeIvfIndexExternal]] (they receive the centroids; this build
    * sees only the assignment). */
  def buildIvfIndex(assigned: DataFrame, table: String, buckets: Int = 32): Unit = {
    val spark = assigned.sparkSession
    dropTableAndLocation(spark, table)
    // a rebuilt index starts with no pending deletes: a stale tombstone
    // would silently hide rebuilt rows from every probe
    dropTableAndLocation(spark, Dedup.tombstoneTable(table))
    // task-aligned to buckets (same hash family): one file per bucket
    // instead of one per (task x bucket) — see RawVault.writeTable
    assigned.repartition(buckets, col("cid")).write
      .bucketBy(buckets, "cid")
      .mode("overwrite")
      .saveAsTable(table)
    spark.catalog.refreshTable(table)
    // stamp the width once at build (one tiny job against the table
    // just written) so every later serving probe reads it off the
    // catalog instead of scheduling a job per call
    val dim = spark.table(table).select(size(col("v")))
      .filter(col("v").isNotNull).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    if (dim > 0) stampTableProps(spark, table, Map(DimProp -> dim.toString))
  }

  /** Probe a persisted IVF index for one query vector set drawn FROM
    * the index (query-by-id: `queryIds` selects index rows). External
    * vectors — the serving path — go through
    * [[probeIvfIndexExternal]]. */
  def probeIvfIndex(spark: org.apache.spark.sql.SparkSession, table: String,
      queryIds: Column, idCol: String, k: Int): DataFrame =
    // tombstoned rows are absent — as candidates AND as by-id queries
    knnIvf(liveRows(spark, table, spark.table(table), idCol),
      queryIds, idCol, k)

  /** Probe a persisted IVF index with EXTERNAL query vectors — the
    * serving path: the queries are not (or need not be) in the index.
    * `queries` is any [[withNorm]] projection keyed by `idCol`; each
    * query is assigned to its max-cosine centroid against the SAME
    * fixed codebook the index was built with (pass a different one and
    * the probe silently scans the wrong buckets — the codebook is part
    * of the index's identity, exactly like [[appendToIvfIndex]]), then
    * ranked against that bucket's members only. `probes` > 1 scans each
    * query's that-many highest-cosine buckets instead — the
    * [[knnIvfMultiProbe]] recall lever served externally (e16): the
    * probe side grows to Q × probes rows and the pruned scan to the
    * union of probed buckets, both still configuration-bounded.
    *
    * Scale shape: the assignment is the zero-shuffle argmax, the probe
    * side is broadcast, and the index scan BUCKET-PRUNES to the
    * queries' centroid buckets — the probed cid set is collected
    * (provably configuration-bounded: at most the codebook size, the
    * maxCentroids contract) and re-enters the plan as literals, so
    * probe cost is proportional to the PROBED buckets, never the
    * index (the probeBandIndex device: compiled inside the conf
    * window, `SelectedBucketsCount` asserted at compile time and on
    * the executed plan, and the Q×k verdict rows eagerly checkpointed
    * so derived plans never re-read the index). An index row whose id
    * equals a query id is excluded from that query's candidates (the
    * knnIvf self-exclusion contract — it makes re-sending a
    * known-corpus vector return its true neighbors, not itself); keep
    * external id spaces disjoint from the corpus's. */
  def probeIvfIndexExternal(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, centroids: DataFrame,
      idCol: String, k: Int, maxQueries: Int = 1 << 20,
      probes: Int = 1): DataFrame = {
    require(probes >= 1, s"probeIvfIndexExternal: probes must be >= 1, got $probes")
    DriverBounded.labeled(spark, s"probeIvfIndexExternal:$table") {
    Dedup.requireKeyBucketedTable(spark, table, "cid",
      "probeIvfIndexExternal")
    // the serving batch is broadcast as the probe side and its cid set
    // becomes pruning literals — both bounded by contract, so an
    // oversized batch fails with direction, not with a broadcast
    // OOM mid-job (the probeVectorStoreExternal bound, same shape);
    // the broadcast probe frame is Q x probes rows (each carrying the
    // query vector) — the enforced bound scales with nprobe, like the
    // PQ sibling. Enforced together with the width guard in ONE
    // bounded job (requireServingBatch) below, after the widths are
    // known.
    val maxQueriesAtProbes = math.max(1, maxQueries / probes)
    // codebook identity guard: the centroids handed to a probe MUST be
    // the codebook the index was built/appended with — a different one
    // assigns queries to buckets the corpus was never partitioned by,
    // and the probe silently scans the wrong buckets. The fingerprint
    // collect also yields the codebook's width, closing the remaining
    // silent corner: a query that matches the INDEX width but not the
    // CENTROIDS' would be dropped by assignToCentroids and return no
    // rows with no error. Cached per (table, centroid plan) — a
    // serving loop's repeat probes run zero fingerprint jobs.
    val (fp, centDim) = cachedCodebookFingerprint(spark, table,
      centroids, idCol)
    tableProp(spark, table, CodebookProp).foreach { stamped =>
      require(stamped == fp,
        s"probeIvfIndexExternal: the centroid codebook passed to this " +
          s"probe (md5 $fp) is not the one $table was built with " +
          s"(md5 $stamped) — the codebook is part of the index's " +
          "identity; probing with another would scan the wrong buckets")
    }
    // loud dim guards: width off the catalog stamp (no job) when
    // present, one null-safe row otherwise; an EMPTY unstamped index
    // has no width to validate against and refuses rather than
    // returning silently-empty verdicts for any query width
    val idxDim = storedDim(spark, table, "v")
    require(idxDim > 0,
      s"probeIvfIndexExternal: $table is empty and carries no " +
        s"$DimProp property — no index width to validate serving " +
        "queries against; build or append before probing")
    require(centDim == idxDim,
      s"probeIvfIndexExternal: the centroid codebook's width " +
        s"($centDim) differs from the index's ($idxDim) — not the " +
        "codebook this index was partitioned by")
    // one bounded job enforcing the batch bound AND the width guard (a
    // wrong-width external query would null every similarity — both
    // its centroid assignment and its in-bucket ranking — and silently
    // return arbitrary "neighbors"); refuse before the probe job runs
    requireServingBatch(queries, maxQueriesAtProbes, idxDim,
      s"probeIvfIndexExternal: more than $maxQueriesAtProbes external " +
        s"queries in one probe at probes=$probes (the probe side " +
        "broadcasts and its centroid set becomes planning-time " +
        "literals); split the serving batch or " +
        "raise maxQueries deliberately",
      s"probeIvfIndexExternal: an external query's vector width " +
        s"differs from the index's ($idxDim) — its similarities would " +
        "all be null and the returned neighbors meaningless; encode " +
        "serving queries with the index's embedding dimension")
    // persisted: two consumers (the cid collect and the probe join) —
    // the pruned buckets must be exactly the buckets the join's
    // probe rows were assigned to, so the assignment runs once
    val q = assignProbeBuckets(queries, centroids, idCol, probes)
      .select(col(idCol).as("qid"), col("cid").as("qcid"),
        col("v").as("qv"), col("nrm").as("qn")).persist()
    try {
      val cids = DriverBounded.collectCapped(
        q.select(col("qcid")).distinct(), 1 << 16,
        "probeIvfIndexExternal: probed centroid set exceeds 2^16 — " +
          "the codebook is configuration-sized by the maxCentroids " +
          "contract, so this is not a buildIvfIndex codebook")
        .map(_.get(0)).toSeq
      if (cids.isEmpty)
        // no queries: nothing to probe, empty verdicts
        knnProbe(spark.table(table).limit(0), q, idCol, k)
          .localCheckpoint(true)
      else
        // pending deletes excluded ABOVE the pruned scan, BEFORE
        // ranking — next-best candidates refill the top-k
        Dedup.compileAndPinBucketedScan(spark,
          knnProbe(liveRows(spark, table,
            spark.table(table).filter(col("cid").isin(cids: _*)), idCol),
            q, idCol, k),
          table, reliable = false, "probeIvfIndexExternal")
    } finally { q.unpersist(blocking = false); () }
    }
  }

  /** Incrementally extend a persisted [[buildIvfIndex]] table with new
    * vectors — the streaming half of index maintenance (wire a
    * readStream through `CdcStream.foreachBatchLoader(s)(b =>
    * appendToIvfIndex(b, …))`). Each batch (a [[withNorm]] projection)
    * is assigned against the index's FIXED centroid codebook — the
    * geometry never drifts mid-stream; retraining is a batch
    * [[buildIvfIndex]] rebuild — anti-joined on (cid, id) against the
    * current table so micro-batch replays are idempotent (at-least-once
    * delivery → exactly-once table effect, the vault loaders'
    * contract), and appended task-aligned with the existing bucket
    * layout.
    *
    * Scale shape: the centroid assignment is the zero-shuffle argmax,
    * and the idempotence check is POINT LOOKUPS, not a corpus join —
    * the micro-batch's (cid, id) pairs are bounded (`maxBatchIds`,
    * loud fail past it), so they re-enter the plan as literals: the
    * index scan bucket-prunes to the batch's cids
    * (SelectedBucketsCount, plan-pinned) with the id filter pushed to
    * parquet, and the anti-join broadcasts batch-sized sides. A plain
    * (cid, id) anti-join against the table is NOT this shape — the
    * planner re-shuffles the whole index on the composite key (its
    * hash(cid) buckets don't co-partition a (cid, id) join, even with
    * subset co-partitioning allowed — measured both ways), which at
    * 100 TB is a corpus shuffle per micro-batch. */
  def appendToIvfIndex(batch: DataFrame, table: String,
      centroids: DataFrame, idCol: String, buckets: Int = 32,
      maxBatchIds: Int = 1 << 20): Unit = {
    val spark = batch.sparkSession
    // codebook identity: the first append stamps the codebook's
    // fingerprint (build cannot — it sees only the assignment); every
    // later append and serving probe must hand the SAME codebook, or
    // the index's geometry would drift mid-stream — new rows
    // partitioned by one set of centroids, probes pruned by another
    val (fp, centDim) = codebookFingerprint(centroids, idCol)
    tableProp(spark, table, CodebookProp) match {
      case Some(stamped) =>
        require(stamped == fp,
          s"appendToIvfIndex: the centroid codebook passed to this " +
            s"append (md5 $fp) is not the one $table is partitioned " +
            s"by (md5 $stamped) — appending under a different codebook " +
            "drifts the index geometry mid-stream; retraining is a " +
            "batch buildIvfIndex rebuild")
      case None =>
        stampTableProps(spark, table, Map(CodebookProp -> fp,
          DimProp -> centDim.toString))
    }
    // and the codebook's width must be the index's: a narrower
    // codebook would assign (and admit) narrower batch vectors into a
    // wider index, poisoning every later probe's similarities
    val idxDim = storedDim(spark, table, "v")
    require(idxDim == 0 || idxDim == centDim,
      s"appendToIvfIndex: the centroid codebook's width ($centDim) " +
        s"differs from the index's ($idxDim) — batch rows admitted " +
        "under it would carry the wrong vector width")
    requireNotTombstoned(spark, table, batch, idCol, "appendToIvfIndex")
    val (fresh, release) = freshIndexRows(batch, table, centroids, idCol,
      maxBatchIds)
    try {
      // plan the append with the auto-bucketed-scan heuristic OFF:
      // DisableUnnecessaryBucketedScan keeps a bucketed scan only for
      // its output DISTRIBUTION, and nothing above the point-lookup
      // anti-join needs one — so under the default heuristic the
      // In(cid) bucket pruning is discarded with the bucketed scan and
      // the check reads every bucket (measured). Here the bucket
      // layout's value IS the pruning; one task per selected bucket is
      // exactly the right execution for a point lookup. The conf flip
      // is session-global and serializes on the engine's ONE shared
      // conf lock (Dedup.withAutoBucketedScanOff): a serving probe's
      // compile window (probeIvfIndexExternal →
      // compileAndPinBucketedScan) concurrent with this append can
      // then never interleave save/flip/restore on the same key —
      // which would spuriously fail the probe's pruning assert or
      // leave the heuristic flipped session-wide.
      Dedup.withAutoBucketedScanOff(spark) {
        fresh.repartition(buckets, col("cid")).write
          .bucketBy(buckets, "cid")
          .mode("append")
          .saveAsTable(table)
      }
    } finally release()
    spark.catalog.refreshTable(table)
  }

  /** Fold a [[buildIvfIndex]] table back to one file per bucket —
    * the third grain of the compaction story (band index, keyed side
    * table, IVF index): every [[appendToIvfIndex]] delivery writes
    * its own task-aligned file set, so after N deliveries a probe's
    * bucket scan opens N files per bucket and probe cost degrades
    * linearly in DELIVERIES, not data. The index is cid-bucketed with
    * MANY rows per cid (a partition of the corpus, not a keyed map),
    * which the shared rewrite core does not care about: the rewrite
    * is row-neutral identity, zero-shuffle (the forced bucketed scan
    * claims the table's own partitioning, so each task reads one
    * bucket's file sets and writes its one replacement file), swapped
    * in via the never-zero-copies backup dance, idempotent, and
    * self-healing at every band/keyed/IVF entry point. Single-writer,
    * like every graft maintenance pass: run it BETWEEN deliveries
    * (the w07 gate does, mid-stream), never concurrent with one. */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit =
    Dedup.compactIdKeyedTable(spark, table, "cid")

  /** [[appendToIvfIndex]]'s idempotence join, exposed for plan pinning:
    * batch rows not yet in the index, via bucket-pruned point lookups
    * (the knnPqRefineIndexed pattern — the batch's keys become
    * planning-time literals, bounded and loud-failing at
    * `maxBatchIds`). Returns the frame plus an unpersist handle (the
    * release-handle pattern): the assigned batch is persisted because
    * it has two consumers — the key collect and the append's anti-join
    * — and the cache both runs the batch pipeline once and guarantees
    * the keys the collect saw are the rows the join filters (a
    * re-execution of a non-deterministic batch source could otherwise
    * yield rows whose keys were never collected, which would slip past
    * the point lookups and append as duplicates). */
  private[graft] def freshIndexRows(batch: DataFrame, table: String,
      centroids: DataFrame, idCol: String,
      maxBatchIds: Int = 1 << 20): (DataFrame, () => Unit) = {
    // one row per id WITHIN the batch too: an at-least-once source can
    // redeliver a row inside a single micro-batch, and the table
    // anti-join below cannot see rows that are not in the table yet.
    // dropDuplicates picks one row per id — exact for redelivered
    // copies (identical rows); a stream carrying multiple VERSIONS of
    // an id per batch must resolve latest-wins upstream, same as the
    // assignToCentroids unique-id contract
    val assigned = assignToCentroids(
      batch.dropDuplicates(Seq(idCol)), centroids, idCol).persist()
    val keys = DriverBounded.collectCapped(
      assigned.select(col(idCol), col("cid")), maxBatchIds,
      s"appendToIvfIndex: micro-batch exceeds maxBatchIds $maxBatchIds " +
        "(the batch's keys become planning-time point-lookup literals); " +
        "split the batch or raise the bound deliberately")
    val ids = keys.map(_.get(0)).toSeq
    val cids = keys.map(_.get(1)).distinct.toSeq
    val existing = batch.sparkSession.table(table)
      .filter(col("cid").isin(cids: _*) && col(idCol).isin(ids: _*))
      .select(col(idCol), col("cid"))
    val fresh = assigned
      .join(existing, Seq("cid", idCol), "left_anti")
      .select(col(idCol), col("cid"), col("v"), col("nrm"))
    (fresh, () => { assigned.unpersist(blocking = false); () })
  }

  /** IVF-style ANN: probe only the query vector's centroid bucket. */
  /** Matryoshka-style two-stage ANN (the published MRL retrieval
    * pattern): shortlist by cosine over the FIRST `prefixDims`
    * dimensions — MRL-trained embeddings front-load information, so a
    * 16-of-64 prefix preserves most of the ordering at a quarter of
    * the dot-product cost — then exact full-dimension rerank of each
    * query's `shortlist` best. The structural sibling of
    * [[knnIvfPq]]'s shortlist→refine, with dimension truncation
    * instead of product quantization as the cheap stage.
    *
    * Plan shape: one corpus × broadcast-query join, one per-query
    * shortlist window, and the rerank window REUSES the shortlist's
    * qid partitioning — no second corpus exchange. At production
    * scale the truncated vectors live as their own narrow column so
    * the stage-1 scan reads prefixDims floats per row, not the full
    * vector — that is [[knnMatryoshkaIndexed]] over a
    * [[buildVectorStore]] layout with persisted prefix columns; here
    * the slice rides the same frame, which keeps the ad-hoc plan one
    * scan without changing the shape. */
  def knnMatryoshka(base: DataFrame, queryIds: Column, idCol: String,
      k: Int, prefixDims: Int, shortlist: Int): DataFrame = {
    require(prefixDims >= 1, s"prefixDims must be >= 1, got $prefixDims")
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) or the rerank truncates")
    val b = base
      .withColumn("vt", slice(col("v"), 1, prefixDims))
      .withColumn("nt", sqrt(dot(col("vt"), col("vt"))))
    val q = b.filter(queryIds).select(col(idCol).as("qid"),
      col("v").as("qv"), col("nrm").as("qn"),
      col("vt").as("qvt"), col("nt").as("qnt"))
    val wS = Window.partitionBy("qid").orderBy(col("tsim").desc, col(idCol).asc)
    val wK = Window.partitionBy("qid").orderBy(col("sim").desc, col(idCol).asc)
    b.join(broadcast(q), col(idCol) =!= col("qid"))
      .withColumn("tsim", dot(col("vt"), col("qvt")) / (col("nt") * col("qnt")))
      .withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= shortlist)
      .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol).as("neighbor_id"), col("rank"))
  }

  def knnIvf(assigned: DataFrame, queryIds: Column, idCol: String, k: Int): DataFrame = {
    val q = assigned.filter(queryIds)
      .select(col(idCol).as("qid"), col("cid").as("qcid"),
        col("v").as("qv"), col("nrm").as("qn"))
    knnProbe(assigned, q, idCol, k)
  }

  /** Shared probe tail: rank every (query bucket-probe × bucket member)
    * candidate, keep top-k per query. `probes` columns: (qid, qcid, qv,
    * qn) — one row per bucket a query wants scanned; a corpus vector
    * lives in exactly one bucket, so multi-probe never duplicates a
    * candidate. The probe side is Q×P rows — broadcast at any corpus
    * size. */
  private def knnProbe(assigned: DataFrame, probes: DataFrame,
      idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col(idCol).asc)
    assigned.join(broadcast(probes), col("cid") === col("qcid") && col(idCol) =!= col("qid"))
      .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol).as("neighbor_id"), col("rank"))
  }

  /** Hamming-distance<=1 probe set of a sign-LSH bucket id: the bucket
    * itself plus each single-bit flip (nPlanes+1 buckets). Fixes the
    * boundary-recall gap of single-probe LSH — a query whose own bucket
    * holds fewer than k candidates still fills its top-k from adjacent
    * buckets. */
  def lshProbeBuckets(cid: Column, nPlanes: Int): Column =
    array((cid +: (0 until nPlanes).map { i =>
      val bit = substring(cid, i + 1, 1)
      concat(substring(cid, 1, i),
        when(bit === "1", lit("0")).otherwise(lit("1")),
        substring(cid, i + 2, nPlanes - i - 1))
    }): _*)

  /** Multi-probe ANN over sign-LSH buckets: each query scans its own
    * bucket plus every Hamming-1 neighbor bucket. */
  def knnLshMultiProbe(bucketed: DataFrame, queryIds: Column, idCol: String,
      k: Int, nPlanes: Int): DataFrame = {
    val q = bucketed.filter(queryIds)
      .select(col(idCol).as("qid"),
        explode(lshProbeBuckets(col("cid"), nPlanes)).as("qcid"),
        col("v").as("qv"), col("nrm").as("qn"))
    knnProbe(bucketed, q, idCol, k)
  }

  /** Product-quantization codebooks: M subspaces, codewords taken from
    * a deterministic sample of the corpus (collected sorted by id — the
    * sample is configuration-sized, codewords × dims floats, never the
    * corpus). `maxCodewords` caps K with a deterministic id-ordered
    * limit (a TakeOrderedAndProject, not a full sort), so a sample
    * predicate that happens to be corpus-proportional still yields a
    * fixed-size codebook — K multiplies both the collect and the
    * O(N·K·dim) encode, so it must be configuration, not data. No
    * k-means: sampled codebooks trade quantization error for a
    * train-free, fully deterministic build; the encode/ADC machinery is
    * unchanged if a trained codebook is substituted. */
  def pqTrainSampled(sample: DataFrame, idCol: String, m: Int,
      maxCodewords: Int = 256): Seq[Seq[Array[Float]]] = {
    require(maxCodewords > 0, s"maxCodewords must be positive, got $maxCodewords")
    val vecs = DriverBounded.takeFirst(
        sample.select(col(idCol), col("v")).orderBy(col(idCol)), maxCodewords)
      .map(_.getSeq[Float](1).toArray)
    require(vecs.nonEmpty, "PQ sample is empty")
    assert(vecs.length <= maxCodewords)
    val dim = vecs.head.length
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val sub = dim / m
    (0 until m).map(mi => vecs.toSeq.map(_.slice(mi * sub, mi * sub + sub)))
  }

  /** PQ encode: per subspace the 0-based index of the squared-L2
    * nearest codeword (ties: lowest index). The |v|² term is constant
    * per subspace, so the argmin scores are `|c|² − 2·v·c` with |c|²
    * a driver-side constant. Output: (idCol, v, pq_code: array<int>) —
    * at corpus scale only (id, pq_code) needs persisting: M bytes-ish
    * per vector instead of dim floats. */
  def pqEncode(base: DataFrame, idCol: String, codebooks: Seq[Seq[Array[Float]]]): DataFrame = {
    graft.functions.GraftFunctions.register(base.sparkSession)
    val sub = codebooks.head.head.length
    // graft_pq_argmin (one looped codegen node per subspace) instead of
    // an unrolled K-codeword struct array: the unrolled tree falls out
    // of whole-stage codegen past ~100 codewords (Janino method limits)
    val codeCols = codebooks.zipWithIndex.map { case (cws, mi) =>
      call_function("graft_pq_argmin",
        slice(col("v"), mi * sub + 1, sub),
        typedlit(cws.map(_.toSeq)))
    }
    // withColumn: blocking keys (e.g. an IVF `cid`) ride along untouched
    base.withColumn("pq_code", array(codeCols: _*))
  }

  /** Query-side ADC table: qtab[m][k] = q_sub[m]·codeword[m][k] — one
    * looped graft_pq_table node (the unrolled M×K dot tree breaks
    * codegen past ~100 codewords, see PqQueryTableFloat). */
  private def pqQueryTable(qv: Column, codebooks: Seq[Seq[Array[Float]]]): Column =
    call_function("graft_pq_table", qv, typedlit(codebooks.map(_.map(_.toSeq))))

  /** Approximate q·x from the broadcast table and a row's codes. */
  private def pqApproxSim(m: Int): Column =
    (0 until m).map(mi =>
        element_at(element_at(col("qtab"), mi + 1),
          element_at(col("pq_code"), mi + 1) + 1))
      .reduce(_ + _)

  /** PQ ADC top-k: approximate q·x = Σ_m qtab[m][code[m]] where
    * qtab[m][k] = q_sub[m]·codeword[m][k] — the query-side table is
    * Q×M×K doubles computed once and broadcast; the corpus side reads
    * only the M-byte codes. Ranks carry the total (sim DESC, id ASC)
    * tiebreak like every other kNN here. */
  /** Shared ADC rank tail for the PQ variants. */
  private def pqRank(encoded: DataFrame, q: DataFrame, idCol: String,
      m: Int, k: Int, joinCond: Column): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("approx_sim").desc, col(idCol).asc)
    encoded.join(broadcast(q), joinCond && col(idCol) =!= col("qid"))
      .withColumn("approx_sim", pqApproxSim(m))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol).as("neighbor_id"), col("rank"))
  }

  def knnPq(encoded: DataFrame, queries: DataFrame, idCol: String,
      codebooks: Seq[Seq[Array[Float]]], k: Int): DataFrame =
    pqRank(encoded,
      queries.select(col(idCol).as("qid"),
        pqQueryTable(col("v"), codebooks).as("qtab")),
      idCol, codebooks.size, k, lit(true))

  /** IVF-PQ: probe only the query's centroid bucket AND rank by ADC
    * codes — the two scale levers composed: the probe cuts candidates
    * by the centroid count, the codes cut bytes-per-candidate to M
    * ints. `encodedAssigned` = pqEncode over an assignToCentroids
    * frame (pqEncode keeps `cid`); queries must carry their `cid`. */
  def knnIvfPq(encodedAssigned: DataFrame, queries: DataFrame, idCol: String,
      codebooks: Seq[Seq[Array[Float]]], k: Int): DataFrame =
    pqRank(encodedAssigned,
      queries.select(col(idCol).as("qid"), col("cid").as("qcid"),
        pqQueryTable(col("v"), codebooks).as("qtab")),
      idCol, codebooks.size, k, col("cid") === col("qcid"))

  /** Persist a [[withNorm]] projection as a catalog table bucketed and
    * sorted by id — the point-lookup layout for two-stage retrieval:
    * an In(id) probe from a shortlist prunes to the matching buckets at
    * planning time (SelectedBucketsCount in the scan) and never
    * shuffles or fully scans the store. Counterpart of
    * [[buildIvfIndex]] for the full-vector side. */
  def buildVectorStore(base: DataFrame, idCol: String, table: String,
      buckets: Int = 32, prefixDims: Int = 0): Unit = {
    dropTableAndLocation(base.sparkSession, table)
    // a rebuilt store starts with no pending deletes (see buildIvfIndex)
    dropTableAndLocation(base.sparkSession, Dedup.tombstoneTable(table))
    // Matryoshka serving layout: the first prefixDims dims and their
    // norm persist as their OWN narrow columns, so a prefix-shortlist
    // scan reads prefixDims floats per row off parquet (column
    // pruning) instead of the full vector — the at-scale shape the
    // knnMatryoshka scaladoc describes, now on disk
    val projected = if (prefixDims > 0) {
      graft.functions.GraftFunctions.register(base.sparkSession)
      base.withColumn("vt", slice(col("v"), 1, prefixDims))
        .withColumn("nt", sqrt(dot(col("vt"), col("vt"))))
    } else base
    // task-aligned to buckets: one sorted file per bucket, so the
    // In(id) point lookups prune to single files — see RawVault.writeTable
    projected.repartition(buckets, col(idCol)).write
      .bucketBy(buckets, idCol)
      .sortBy(idCol)
      .mode("overwrite")
      .saveAsTable(table)
    val spark = base.sparkSession
    spark.catalog.refreshTable(table)
    // serving stamps: the full width (one tiny job at build time) and
    // the prefix width (a build parameter — no job at all), so
    // probeVectorStoreExternal's guards are catalog reads per call
    val dim = spark.table(table).select(size(col("v")))
      .filter(col("v").isNotNull).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    val props: Map[String, String] =
      (if (dim > 0) Map(DimProp -> dim.toString)
       else Map.empty[String, String]) ++
      (if (prefixDims > 0) Map(PrefixDimsProp -> prefixDims.toString)
       else Map.empty[String, String])
    if (props.nonEmpty) stampTableProps(spark, table, props)
  }

  /** Incrementally extend a persisted [[buildVectorStore]] table with
    * new vectors — the store's streaming half, completing the
    * append/probe/compact lifecycle the band index, keyed tables, and
    * IVF index already have (wire a readStream through
    * `CdcStream.foreachBatchLoader(s)(b => appendToVectorStore(…))`).
    * Each batch (a [[withNorm]] projection keyed by `idCol`)
    * recomputes the store's persisted prefix columns at the STORE's
    * own stamped width — read from the catalog ([[PrefixDimsProp]]),
    * so a batch can never mis-slice against a store built with a
    * different `prefixDims` — is anti-joined on id against the
    * current table so micro-batch replays are idempotent
    * (at-least-once delivery → exactly-once table effect), and
    * appends task-aligned AND bucket-sorted with the existing layout.
    *
    * Scale shape (the [[appendToIvfIndex]] device at the id grain):
    * the idempotence check is bucket-pruned POINT LOOKUPS — the
    * batch's ids are bounded (`maxBatchIds`, loud fail past it) and
    * re-enter the plan as literals, so the store scan opens only the
    * batch's buckets (SelectedBucketsCount, plan-pinned) with the id
    * filter pushed to parquet, and the anti-join broadcasts
    * batch-sized sides — per-delivery cost is O(batch) at any store
    * size. Batch vectors must match the store's stamped width
    * ([[DimProp]]): a mismatched row would null every similarity it
    * later appears in, so the append refuses loudly up front. */
  def appendToVectorStore(batch: DataFrame, table: String, idCol: String,
      maxBatchIds: Int = 1 << 20): Unit = {
    val spark = batch.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val buckets = Dedup.requireKeyBucketedTable(spark, table, idCol,
      "appendToVectorStore")
    requireNotTombstoned(spark, table, batch, idCol, "appendToVectorStore")
    val dim = storedDim(spark, table, "v")
    if (dim > 0) {
      val bad = batch.filter(size(col("v")) =!= dim).limit(1).collect()
      require(bad.isEmpty,
        s"appendToVectorStore: a batch vector's width differs from the " +
          s"store's ($dim) — an appended wrong-width row would null " +
          "every similarity it later appears in; encode the batch with " +
          "the store's embedding dimension")
    }
    val prefixDims = tableProp(spark, table, PrefixDimsProp).map(_.toInt)
      .getOrElse {
        // a store built before the stamp existed: one null-safe row
        if (spark.table(table).columns.contains("vt"))
          spark.table(table).select(size(col("vt")))
            .filter(col("vt").isNotNull).limit(1).collect()
            .headOption.map(_.getInt(0)).getOrElse(0)
        else 0
      }
    require(prefixDims > 0 || !spark.table(table).columns.contains("vt"),
      s"appendToVectorStore: $table has prefix columns but no " +
        s"readable prefix width (empty store without a $PrefixDimsProp " +
        "stamp) — rebuild with buildVectorStore to stamp it")
    // one row per id within the batch (an at-least-once source can
    // redeliver inside a single micro-batch; multiple VERSIONS of an
    // id must resolve latest-wins upstream — the freshIndexRows
    // contract), persisted: two consumers (the id collect and the
    // append's anti-join) and the collected literals must be exactly
    // the rows the join filters
    val projected0 = batch.dropDuplicates(Seq(idCol))
    val projected = (if (prefixDims > 0)
        projected0.withColumn("vt", slice(col("v"), 1, prefixDims))
          .withColumn("nt", sqrt(dot(col("vt"), col("vt"))))
      else projected0).persist()
    try {
      val ids = DriverBounded.collectCapped(
        projected.select(col(idCol)), maxBatchIds,
        s"appendToVectorStore: micro-batch exceeds maxBatchIds " +
          s"$maxBatchIds (the batch's ids become planning-time " +
          "point-lookup literals); split the batch or raise the bound " +
          "deliberately")
        .map(_.get(0)).toSeq
      require(!ids.contains(null),
        s"appendToVectorStore: null $idCol in the batch — the " +
          "idempotence anti-join never matches null, so a null-keyed " +
          "row would re-append on every redelivery; filter or " +
          "key-derive upstream")
      if (ids.nonEmpty) {
        val existing = Dedup.compileAndPinBucketedScan(spark,
          spark.table(table).filter(col(idCol).isin(ids: _*))
            .select(col(idCol)),
          table, reliable = false, "appendToVectorStore")
        val fresh = projected.join(existing, Seq(idCol), "left_anti")
          .select(spark.table(table).columns.map(col).toIndexedSeq: _*)
        Dedup.withAutoBucketedScanOff(spark) {
          fresh.repartition(buckets, col(idCol)).write
            .bucketBy(buckets, idCol)
            .sortBy(idCol)
            .mode("append")
            .saveAsTable(table)
        }
        spark.catalog.refreshTable(table)
      }
    } finally { projected.unpersist(blocking = false); () }
  }

  /** Fold a [[buildVectorStore]] table back to one sorted file per
    * bucket — the fourth and final grain of the compaction story
    * (band index, keyed table, IVF index, vector store): every
    * [[appendToVectorStore]] delivery writes its own task-aligned
    * file set, so after N deliveries an In(id) point lookup opens N
    * files per probed bucket and rerank cost degrades linearly in
    * DELIVERIES, not data. The shared zero-shuffle rewrite core
    * preserves the store's within-bucket SORT spec and its graft.*
    * serving stamps across the staging swap (both read from the live
    * catalog), keeps the never-zero-copies backup dance, and is
    * idempotent and self-healing at every entry point. Single-writer:
    * run it BETWEEN deliveries (the w15 gate does, mid-stream), never
    * concurrent with one. */
  def compactVectorStore(spark: org.apache.spark.sql.SparkSession,
      table: String, idCol: String): Unit =
    Dedup.compactIdKeyedTable(spark, table, idCol)

  /** [[knnMatryoshkaIndexed]]'s stage 1 as a frame, factored so the
    * plan pin can assert the store scan reads (id, vt, nt) ONLY —
    * the persisted-prefix layout's whole point. */
  private[operators] def matryoshkaShortlistFrame(store: DataFrame,
      q: DataFrame, idCol: String, shortlist: Int): DataFrame = {
    val narrow = store.select(col(idCol), col("vt"), col("nt"))
    val wS = Window.partitionBy("qid").orderBy(col("tsim").desc, col(idCol).asc)
    narrow.join(broadcast(q.select("qid", "qvt", "qnt")),
        col(idCol) =!= col("qid"))
      .withColumn("tsim", dot(col("vt"), col("qvt")) / (col("nt") * col("qnt")))
      .withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= shortlist)
      .select(col("qid"), col(idCol).as("neighbor_id"))
  }

  /** Two-stage Matryoshka retrieval against a [[buildVectorStore]]
    * table built with `prefixDims`: the shortlist stage scans ONLY the
    * persisted (id, vt, nt) columns — prefixDims floats per row, the
    * column pruning [[knnMatryoshka]]'s same-frame slice cannot give —
    * and the exact full-dimension rerank re-fetches the shortlist's
    * full vectors as In(id) point lookups that bucket-prune at
    * planning time (the [[knnPqRefineIndexed]] serving shape, with
    * dimension truncation instead of PQ as the cheap stage). Results
    * are row-identical to [[knnMatryoshka]] on the same frame: same
    * prefix-cosine shortlist, same tiebreaks, same exact rerank.
    *
    * The Q×shortlist driver hop is the serving contract (candidate
    * ids must become planning-time literals) and is BOUNDED by
    * `maxCandidates`, failing fast past it. */
  def knnMatryoshkaIndexed(spark: org.apache.spark.sql.SparkSession,
      table: String, queryIds: Column, idCol: String, k: Int,
      shortlist: Int, maxCandidates: Int = 1 << 20): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) or the rerank truncates")
    graft.functions.GraftFunctions.register(spark)
    // tombstoned rows are absent — as shortlist candidates AND as
    // by-id queries (excluded before ranking, so live next-best
    // candidates refill the shortlist)
    val store = liveRows(spark, table, spark.table(table), idCol)
    require(store.columns.contains("vt") && store.columns.contains("nt"),
      s"knnMatryoshkaIndexed: $table has no persisted prefix columns — " +
        "build the store with buildVectorStore(..., prefixDims = d)")
    val maxQueries = maxCandidates / shortlist
    require(maxQueries > 0,
      s"knnMatryoshkaIndexed: shortlist $shortlist exceeds maxCandidates " +
        s"$maxCandidates — even one query would overflow the candidate " +
        "bound (a driver-side collect + In-literal predicate); raise " +
        "maxCandidates deliberately or use knnMatryoshka for large shortlists")
    val q = store.filter(queryIds).select(col(idCol).as("qid"),
      col("v").as("qv"), col("nrm").as("qn"),
      col("vt").as("qvt"), col("nt").as("qnt"))
    require(!DriverBounded.exceeds(q, maxQueries),
      s"knnMatryoshkaIndexed: more than $maxQueries queries x $shortlist " +
        s"shortlist exceeds maxCandidates $maxCandidates (a driver-side " +
        "collect + In-literal predicate); raise maxCandidates deliberately " +
        "or use the lazy knnMatryoshka for large batches")
    matryoshkaShortlistRerank(spark, store, q, idCol, k, shortlist,
      maxCandidates, "knnMatryoshkaIndexed")
  }

  /** The shared two-stage tail of [[knnMatryoshkaIndexed]] and
    * [[probeVectorStoreExternal]]: prefix-cosine shortlist over the
    * store's narrow (id, vt, nt) columns, Q×shortlist candidate hop
    * (bounded, the serving contract), exact full-dimension rerank over
    * In(id) point lookups that bucket-prune at planning time. `q`
    * carries (qid, qv, qn, qvt, qnt) — from the store itself (the id
    * form) or from an external frame (the serving form). */
  private def matryoshkaShortlistRerank(
      spark: org.apache.spark.sql.SparkSession, store: DataFrame,
      q: DataFrame, idCol: String, k: Int, shortlist: Int,
      maxCandidates: Int, context: String): DataFrame = {
    val cands = matryoshkaShortlistFrame(store, q, idCol, shortlist)
    val candRows = DriverBounded.collectCapped(cands, maxCandidates,
      s"$context: candidate pairs exceed maxCandidates $maxCandidates")
    val ids = candRows.map(_.get(1)).distinct.toSeq
    val candsDf = spark.createDataFrame(
      java.util.Arrays.asList(candRows: _*), cands.schema)
    val fetched = store.filter(col(idCol).isin(ids: _*))
      .select(col(idCol).as("neighbor_id"), col("v").as("bv"), col("nrm").as("bn"))
    val wK = Window.partitionBy("qid").orderBy(col("xsim").desc, col("neighbor_id").asc)
    fetched.join(broadcast(candsDf), "neighbor_id")
      .join(broadcast(q.select(col("qid"), col("qv"), col("qn"))), "qid")
      .withColumn("xsim", dot(col("bv"), col("qv")) / (col("bn") * col("qn")))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select(col("qid"), col("neighbor_id"), col("rank"))
  }

  /** Two-stage Matryoshka retrieval with EXTERNAL query vectors — the
    * serving path for a [[buildVectorStore]] table with persisted
    * prefix columns: the queries (any [[withNorm]] projection keyed by
    * `idCol` — a query encoder's output, not store rows) are sliced to
    * the STORE's own prefix width at probe time, prefix-cosine
    * shortlisted against the narrow (id, vt, nt) scan, and exactly
    * reranked over bucket-pruned In(id) point lookups — identical
    * plan shape and bounds to [[knnMatryoshkaIndexed]], with the
    * query side arriving from outside. The prefix width is read from
    * the store itself (one limit(1) row), so a store built with a
    * different `prefixDims` cannot silently mis-slice the queries. A
    * store row whose id equals a query id is excluded from that
    * query's candidates (the shortlist's self-exclusion contract);
    * keep external id spaces disjoint from the store's. */
  def probeVectorStoreExternal(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, idCol: String, k: Int,
      shortlist: Int, maxCandidates: Int = 1 << 20): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) or the rerank truncates")
    graft.functions.GraftFunctions.register(spark)
    // pending deletes excluded before the shortlist ranks (liveRows) —
    // a deleted row can neither surface nor occupy a shortlist slot
    val store = liveRows(spark, table, spark.table(table), idCol)
    require(store.columns.contains("vt") && store.columns.contains("nt"),
      s"probeVectorStoreExternal: $table has no persisted prefix " +
        "columns — build the store with buildVectorStore(..., " +
        "prefixDims = d)")
    // prefix and full widths off the catalog stamps (no job) when
    // present — the serving fast path; one null-safe row otherwise
    // (a store built before the properties existed)
    val stampedPrefix = tableProp(spark, table, PrefixDimsProp).map(_.toInt)
    val stampedDim = tableProp(spark, table, DimProp).map(_.toInt)
    val head =
      if (stampedPrefix.isDefined && stampedDim.isDefined) Array.empty[org.apache.spark.sql.Row]
      else store.select(size(col("vt")), size(col("v")))
        .filter(col("vt").isNotNull && col("v").isNotNull)
        .limit(1).collect()
    val prefixDims = stampedPrefix
      .orElse(head.headOption.map(_.getInt(0))).getOrElse(0)
    require(prefixDims > 0,
      s"probeVectorStoreExternal: $table is empty and carries no " +
        s"$PrefixDimsProp property — no prefix width to slice external " +
        "queries to")
    val storeDim = stampedDim
      .orElse(head.headOption.map(_.getInt(1))).getOrElse(0)
    require(storeDim > 0,
      s"probeVectorStoreExternal: $table is empty and carries no " +
        s"$DimProp property — no store width to validate serving " +
        "queries against")
    val maxQueries = maxCandidates / shortlist
    require(maxQueries > 0,
      s"probeVectorStoreExternal: shortlist $shortlist exceeds " +
        s"maxCandidates $maxCandidates — even one query would overflow " +
        "the candidate bound; raise maxCandidates deliberately")
    // one bounded job enforcing the batch bound AND the width guard:
    // graft_dot yields NULL on mismatched lengths (the engine-wide
    // zip_with convention — benign for a few bad CORPUS rows, which
    // sink below every real similarity), but an external query of the
    // wrong width would null EVERY candidate's similarity and silently
    // return arbitrary "neighbors" ranked by tiebreak
    requireServingBatch(queries, maxQueries, storeDim,
      s"probeVectorStoreExternal: more than $maxQueries queries x " +
        s"$shortlist shortlist exceeds maxCandidates $maxCandidates; " +
        "raise maxCandidates deliberately or split the serving batch",
      s"probeVectorStoreExternal: an external query's vector width " +
        s"differs from the store's ($storeDim) — its similarities " +
        "would all be null and the returned neighbors meaningless; " +
        "encode serving queries with the store's embedding dimension")
    val q = queries
      .withColumn("qvt", slice(col("v"), 1, prefixDims))
      .select(col(idCol).as("qid"), col("v").as("qv"),
        col("nrm").as("qn"), col("qvt"),
        sqrt(dot(col("qvt"), col("qvt"))).as("qnt"))
    matryoshkaShortlistRerank(spark, store, q, idCol, k, shortlist,
      maxCandidates, "probeVectorStoreExternal")
  }

  /** Two-stage retrieval against a persisted [[buildVectorStore]]
    * table: PQ ADC shortlist → exact cosine re-rank over point lookups.
    * Stage 1 scans only the M-int codes and materializes the
    * Q×shortlist (qid, neighbor) pairs — query-sized by contract, so
    * the driver hop is the serving shape, not a corpus collect. The
    * candidate ids then re-enter the plan as an In(id) predicate, so
    * the stage-2 store scan bucket-prunes at planning time and pushes
    * the id filter to parquet: full vectors are read for the shortlist
    * only, the store is never shuffled, and the only hash exchange is
    * the per-query top-k window. This is the shape [[knnPqRefine]]
    * cannot reach lazily (its stage-2 equi-join must scan the store).
    *
    * The Q×shortlist driver hop is the serving contract (candidate ids
    * must become planning-time literals for bucket pruning), so it is
    * BOUNDED: at most `maxCandidates` (qid, neighbor) pairs may
    * materialize — a large batch of queries must fail fast here with a
    * clear message, not OOM the driver mid-collect or plan a
    * million-literal In(). Batches beyond the bound belong on
    * [[knnPqRefine]], whose lazy stage-2 join scans the store instead. */
  def knnPqRefineIndexed(vecTable: String, encoded: DataFrame,
      queries: DataFrame, idCol: String, codebooks: Seq[Seq[Array[Float]]],
      shortlist: Int, k: Int, maxCandidates: Int = 1 << 20): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    // bounded probe, not a full count: scanning one row past the
    // query-count cap proves the violation at O(cap) cost, so rejecting
    // a billion-row query frame does not first require scanning it
    val maxQueries = maxCandidates / shortlist
    require(maxQueries > 0,
      s"knnPqRefineIndexed: shortlist $shortlist exceeds maxCandidates " +
        s"$maxCandidates — even one query would overflow the candidate " +
        "bound (a driver-side collect + In-literal predicate); raise " +
        "maxCandidates deliberately or use knnPqRefine for large shortlists")
    require(!DriverBounded.exceeds(queries, maxQueries),
      s"knnPqRefineIndexed: more than $maxQueries queries x $shortlist " +
        s"shortlist exceeds maxCandidates $maxCandidates (a driver-side " +
        "collect + In-literal predicate); raise maxCandidates deliberately " +
        "or use knnPqRefine for large batches")
    val spark = encoded.sparkSession
    // the store's pending deletes excluded from the ADC shortlist
    // itself (stage 1, before ranking), so live next-best candidates
    // refill the shortlist and stage 2 never fetches a deleted row
    val cands = knnPq(liveRows(spark, vecTable, encoded, idCol),
        queries, idCol, codebooks, shortlist)
      .select(col("qid"), col("neighbor_id"))
    // the query-count guard above already bounds this to maxCandidates;
    // the capped collect re-asserts it at the hop itself
    val candRows = DriverBounded.collectCapped(cands, maxCandidates,
      s"knnPqRefineIndexed: candidate pairs exceed maxCandidates $maxCandidates")
    val ids = candRows.map(_.get(1)).distinct.toSeq
    val candsDf = spark.createDataFrame(
      java.util.Arrays.asList(candRows: _*), cands.schema)
    val fetched = spark.table(vecTable)
      .filter(col(idCol).isin(ids: _*))
      .select(col(idCol).as("neighbor_id"), col("v").as("bv"), col("nrm").as("bn"))
    val q = queries.select(col(idCol).as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("qid").orderBy(col("xsim").desc, col("neighbor_id").asc)
    fetched.join(broadcast(candsDf), "neighbor_id")
      .join(broadcast(q), "qid")
      .withColumn("xsim", dot(col("bv"), col("qv")) / (col("bn") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("neighbor_id"), col("rank"))
  }

  /** The side table holding a [[buildPqIndex]] index's PQ codebooks. */
  private[graft] def pqCodebookTable(table: String): String =
    table + "__codebook"

  /** Persist a PQ-encoded, centroid-assigned corpus as the SERVING
    * index pair — the memory-light production ANN layout made
    * persistent (the per-run [[pqEncode]]/[[knnIvfPq]] path rebuilds
    * codebooks and codes on every call): `table` holds (idCol, cid,
    * pq_code) bucketed by cid — M ints per vector instead of dim
    * floats, and probes bucket-prune to the queries' centroid set —
    * and `table__codebook` holds the config-sized PQ codebooks as
    * (m, k, cw) rows, so a serving probe reconstructs the EXACT
    * quantizer from the catalog with the training corpus nowhere in
    * sight. The centroid codebook's fingerprint is stamped as a table
    * property ([[CodebookProp]]) — it is not persisted as data (it
    * arrives with every probe), so the stamp is what makes handing a
    * different one loud. `encodedAssigned` = [[pqEncode]] over an
    * [[assignToCentroids]] frame; `centroids` the codebook it was
    * assigned with. */
  def buildPqIndex(encodedAssigned: DataFrame, idCol: String,
      table: String, codebooks: Seq[Seq[Array[Float]]],
      centroids: DataFrame, buckets: Int = 32): Unit = {
    val spark = encodedAssigned.sparkSession
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "buildPqIndex: empty PQ codebooks")
    dropTableAndLocation(spark, table)
    dropTableAndLocation(spark, pqCodebookTable(table))
    // a rebuilt index starts with no pending deletes (see buildIvfIndex)
    dropTableAndLocation(spark, Dedup.tombstoneTable(table))
    encodedAssigned.select(col(idCol), col("cid"), col("pq_code"))
      .repartition(buckets, col("cid")).write
      .bucketBy(buckets, "cid")
      .mode("overwrite")
      .saveAsTable(table)
    spark.catalog.refreshTable(table)
    import spark.implicits._
    val cbRows = for {
      (cws, m) <- codebooks.zipWithIndex
      (cw, k) <- cws.zipWithIndex
    } yield (m, k, cw.toSeq)
    cbRows.toDF("m", "k", "cw").coalesce(1).write
      .mode("overwrite").saveAsTable(pqCodebookTable(table))
    val (fp, centDim) = codebookFingerprint(centroids, idCol)
    val dim = codebooks.size * codebooks.head.head.length
    require(centDim == dim,
      s"buildPqIndex: the centroid codebook's width ($centDim) differs " +
        s"from the PQ codebooks' reconstruction width ($dim) — not the " +
        "geometry this index encodes")
    stampTableProps(spark, table, Map(
      DimProp -> dim.toString,
      PqMProp -> codebooks.size.toString,
      CodebookProp -> fp))
  }

  /** Reconstruct a [[buildPqIndex]] index's persisted PQ codebooks —
    * the config-sized driver read a serving probe pays per call
    * (M × K rows; cache at the caller for a high-QPS loop). Validates
    * the (m, k) grid is dense and the subspace widths uniform, so a
    * hand-edited codebook table fails loudly instead of mis-decoding
    * every ADC score. */
  private[graft] def loadPqCodebooks(
      spark: org.apache.spark.sql.SparkSession,
      table: String): Seq[Seq[Array[Float]]] = {
    servingIdentityDerivations.incrementAndGet()
    val cbt = pqCodebookTable(table)
    val rows = DriverBounded.collectCapped(
      spark.table(cbt).select(col("m"), col("k"), col("cw"))
        .orderBy(col("m"), col("k")),
      1 << 20,
      s"loadPqCodebooks: $cbt exceeds 2^20 rows — PQ codebooks are " +
        "configuration-sized (M x K) by the pqTrainSampled contract")
    require(rows.nonEmpty, s"loadPqCodebooks: $cbt is empty — not a " +
      "buildPqIndex product")
    val m = rows.map(_.getInt(0)).max + 1
    val grouped = rows.groupBy(_.getInt(0))
    val cbs = (0 until m).map { mi =>
      val g = grouped.getOrElse(mi, Array.empty[org.apache.spark.sql.Row])
        .sortBy(_.getInt(1))
      require(g.nonEmpty && g.map(_.getInt(1)).toSeq == (0 until g.length),
        s"loadPqCodebooks: $cbt subspace $mi has a sparse codeword " +
          "grid — not a buildPqIndex product")
      g.map(_.getSeq[Float](2).toArray).toSeq
    }
    val widths = cbs.flatMap(_.map(_.length)).distinct
    require(widths.length == 1,
      s"loadPqCodebooks: $cbt carries mixed subspace widths " +
        s"${widths.sorted.mkString(",")}")
    require(cbs.map(_.length).distinct.length == 1,
      s"loadPqCodebooks: $cbt carries mixed codeword counts per subspace")
    cbs
  }

  /** Probe a persisted [[buildPqIndex]] serving index with EXTERNAL
    * query vectors — the e13/e14 serving device applied to the IVF-PQ
    * family: each query is assigned to its max-cosine centroid against
    * the index's fingerprint-verified codebook, its ADC table is
    * computed from the PERSISTED PQ codebooks (the exact quantizer the
    * codes were written with — reconstructed from the catalog, no
    * training corpus involved), and the codes scan BUCKET-PRUNES to
    * the queries' centroid set (SelectedBucketsCount asserted at
    * compile time and on the executed plan, verdicts checkpointed).
    * Probe cost ∝ probed buckets × M ints per candidate — both scale
    * levers, served. Approximate by construction (PQ ADC ranking);
    * ranks carry the total (approx_sim DESC, id ASC) tiebreak. An
    * index row whose id equals a query id is excluded (the knnIvfPq
    * self-exclusion contract); keep external id spaces disjoint.
    *
    * `probes` is the nprobe recall lever on this serving path — the
    * [[probeIvfIndexExternal]] multi-probe device applied to the PQ
    * family: each serving query fans out to its `probes`
    * highest-cosine centroid buckets ([[assignProbeBuckets]], a
    * broadcast-centroid window over Q×C rows, both
    * configuration-bounded), the pruned codes scan widens to the
    * union of probed buckets, and each query's ADC table rides its
    * probe rows (the broadcast grows to Q×P×M×K doubles — size
    * `maxQueries` accordingly). A candidate's codes live in exactly
    * one bucket, so no candidate can pair with a query twice and the
    * rank window needs no dedup. `probes = 1` keeps the max-cosine
    * argmax assignment verbatim (spec-pinned bit-equal); `probes` =
    * codebook size degrades to brute ADC over the whole index. */
  def probePqIndexExternal(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, centroids: DataFrame,
      idCol: String, k: Int, maxQueries: Int = 1 << 20,
      probes: Int = 1): DataFrame = {
    require(probes >= 1,
      s"probePqIndexExternal: probes must be >= 1, got $probes")
    DriverBounded.labeled(spark, s"probePqIndexExternal:$table") {
    Dedup.requireKeyBucketedTable(spark, table, "cid",
      "probePqIndexExternal")
    // the broadcast probe frame is Q x probes rows, EACH carrying an
    // M x K-double ADC table — the enforced bound must scale with
    // nprobe or a caller inside maxQueries could still blow the
    // broadcast at high `probes` (enforced together with the width
    // guard in ONE bounded job below)
    val maxQueriesAtProbes = math.max(1, maxQueries / probes)
    // serving-identity reads behind the session cache: the second
    // probe of a session pays neither the codebook-table read nor the
    // fingerprint job (spec-pinned)
    val codebooks = cachedPqCodebooks(spark, table)
    val m = codebooks.size
    val dim = m * codebooks.head.head.length
    val (fp, centDim) = cachedCodebookFingerprint(spark, table,
      centroids, idCol)
    tableProp(spark, table, CodebookProp).foreach { stamped =>
      require(stamped == fp,
        s"probePqIndexExternal: the centroid codebook passed to this " +
          s"probe (md5 $fp) is not the one $table was built with " +
          s"(md5 $stamped) — probing with another would scan the wrong " +
          "buckets")
    }
    require(centDim == dim,
      s"probePqIndexExternal: the centroid codebook's width ($centDim) " +
        s"differs from the index's PQ reconstruction width ($dim) — " +
        "not this index's geometry")
    requireServingBatch(queries, maxQueriesAtProbes, dim,
      s"probePqIndexExternal: more than $maxQueriesAtProbes external " +
        s"queries in one probe at probes=$probes (the ADC-table probe " +
        "side broadcasts at Q x probes x M x K doubles and its " +
        "centroid set becomes planning-time literals); " +
        "split the serving batch or raise maxQueries deliberately",
      s"probePqIndexExternal: an external query's vector width differs " +
        s"from the index's ($dim) — its ADC table would be meaningless; " +
        "encode serving queries with the index's embedding dimension")
    // persisted: two consumers (the cid collect and the probe join) —
    // the pruned buckets must be exactly the buckets the probe rows
    // were assigned to
    val q = assignProbeBuckets(queries, centroids, idCol, probes)
      .select(col(idCol).as("qid"), col("cid").as("qcid"),
        pqQueryTable(col("v"), codebooks).as("qtab")).persist()
    try {
      val cids = DriverBounded.collectCapped(
        q.select(col("qcid")).distinct(), 1 << 16,
        "probePqIndexExternal: probed centroid set exceeds 2^16 — " +
          "the codebook is configuration-sized by the maxCentroids " +
          "contract, so this is not a buildPqIndex codebook")
        .map(_.get(0)).toSeq
      if (cids.isEmpty)
        pqRank(spark.table(table).limit(0), q, idCol, m, k,
          col("cid") === col("qcid")).localCheckpoint(true)
      else
        // pending deletes excluded ABOVE the pruned scan, BEFORE the
        // ADC ranking — next-best candidates refill the top-k
        Dedup.compileAndPinBucketedScan(spark,
          pqRank(liveRows(spark, table,
            spark.table(table).filter(col("cid").isin(cids: _*)), idCol),
            q, idCol, m, k, col("cid") === col("qcid")),
          table, reliable = false, "probePqIndexExternal")
    } finally { q.unpersist(blocking = false); () }
    }
  }

  /** Incrementally extend a persisted [[buildPqIndex]] codes table
    * with new vectors — the PQ family's streaming half, so ALL FOUR
    * persisted index grains (band, keyed/store, IVF, PQ) carry the
    * full build/append/probe/compact lifecycle. Each batch (a
    * [[withNorm]] projection) is assigned against the index's
    * fingerprint-verified centroid codebook and ENCODED WITH THE
    * PERSISTED PQ CODEBOOKS ([[loadPqCodebooks]] — the quantizer is
    * part of the index's identity and never drifts mid-stream;
    * retraining either codebook is a batch [[buildPqIndex]] rebuild),
    * anti-joined on (cid, id) against the current codes so replays
    * are idempotent, and appended task-aligned with the existing
    * bucket layout. Scale shape: the [[appendToIvfIndex]] device —
    * zero-shuffle argmax assignment, narrow codegen'd encode,
    * point-lookup idempotence (batch keys as bounded literals, the
    * codes scan bucket-pruned inside the append's conf window),
    * batch-sized broadcast anti-join — O(batch) at any index size. */
  def appendToPqIndex(batch: DataFrame, table: String,
      centroids: DataFrame, idCol: String,
      maxBatchIds: Int = 1 << 20): Unit = {
    val spark = batch.sparkSession
    val buckets = Dedup.requireKeyBucketedTable(spark, table, "cid",
      "appendToPqIndex")
    requireNotTombstoned(spark, table, batch, idCol, "appendToPqIndex")
    val codebooks = loadPqCodebooks(spark, table)
    val dim = codebooks.size * codebooks.head.head.length
    val (fp, centDim) = codebookFingerprint(centroids, idCol)
    tableProp(spark, table, CodebookProp) match {
      case Some(stamped) =>
        require(stamped == fp,
          s"appendToPqIndex: the centroid codebook passed to this " +
            s"append (md5 $fp) is not the one $table is partitioned " +
            s"by (md5 $stamped) — appending under a different codebook " +
            "drifts the index geometry mid-stream; retraining is a " +
            "batch buildPqIndex rebuild")
      case None =>
        // a pre-stamp table (buildPqIndex always stamps; this is the
        // appendToIvfIndex convention for hand-migrated tables)
        stampTableProps(spark, table, Map(CodebookProp -> fp,
          DimProp -> dim.toString, PqMProp -> codebooks.size.toString))
    }
    require(centDim == dim,
      s"appendToPqIndex: the centroid codebook's width ($centDim) " +
        s"differs from the index's PQ reconstruction width ($dim) — " +
        "not this index's geometry")
    val bad = batch.filter(size(col("v")) =!= dim).limit(1).collect()
    require(bad.isEmpty,
      s"appendToPqIndex: a batch vector's width differs from the " +
        s"index's ($dim) — its codes would be meaningless; encode the " +
        "batch with the index's embedding dimension")
    // one row per id within the batch (the freshIndexRows contract),
    // persisted: two consumers — the key collect and the anti-join
    val encoded = pqEncode(
      assignToCentroids(batch.dropDuplicates(Seq(idCol)), centroids,
        idCol), idCol, codebooks)
      .select(col(idCol), col("cid"), col("pq_code")).persist()
    try {
      val keys = DriverBounded.collectCapped(
        encoded.select(col(idCol), col("cid")), maxBatchIds,
        s"appendToPqIndex: micro-batch exceeds maxBatchIds $maxBatchIds " +
          "(the batch's keys become planning-time point-lookup " +
          "literals); split the batch or raise the bound deliberately")
      if (keys.nonEmpty) {
        val ids = keys.map(_.get(0)).toSeq
        val cids = keys.map(_.get(1)).distinct.toSeq
        // the idempotence lookup compiles inside the conf window AND
        // asserts SelectedBucketsCount on the compiled and executed
        // plans (the appendToVectorStore device) — if the layout or
        // the conf window ever drifts, the append fails loudly here
        // instead of silently degrading to a full codes scan per
        // micro-batch
        val existing = Dedup.compileAndPinBucketedScan(spark,
          spark.table(table)
            .filter(col("cid").isin(cids: _*) && col(idCol).isin(ids: _*))
            .select(col(idCol), col("cid")),
          table, reliable = false, "appendToPqIndex")
        val fresh = encoded.join(existing, Seq("cid", idCol), "left_anti")
          .select(col(idCol), col("cid"), col("pq_code"))
        Dedup.withAutoBucketedScanOff(spark) {
          fresh.repartition(buckets, col("cid")).write
            .bucketBy(buckets, "cid")
            .mode("append")
            .saveAsTable(table)
        }
        spark.catalog.refreshTable(table)
      }
    } finally { encoded.unpersist(blocking = false); () }
  }

  /** Fold a [[buildPqIndex]] codes table back to one file per bucket —
    * [[compactIvfIndex]] for the PQ grain, same shared rewrite core
    * (zero-shuffle, metadata-preserving, backup dance, self-healing).
    * The `__codebook` side table never compacts (one file by
    * construction). Single-writer; run between deliveries (the w16
    * gate does, mid-stream). */
  def compactPqIndex(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit =
    Dedup.compactIdKeyedTable(spark, table, "cid")

  /** Logically DELETE ids from a persisted vector index — takedowns
    * (copyright, PII, opt-out) without rewriting the index: the ids
    * land in a tiny tombstone side table (`table__tombstones`, its one
    * column named `idCol` so later passes are self-describing); every
    * probe excludes tombstoned rows BEFORE ranking (a broadcast
    * anti-join over the pruned scan — next-best candidates refill the
    * top-k, deleted rows can never occupy shortlist slots), and the
    * family's compact physically APPLIES the pending deletes and
    * truncates the side table (the Lucene/RocksDB delete shape: mark
    * now, reclaim at merge). Works uniformly on all three vector
    * families (IVF index, vector store, PQ codes — `idCol` keyed,
    * bucketed tables) and composes with the band index's own
    * supersede tombstones, which ride the same side-table name and
    * compact apply.
    *
    * Contract and bounds: idempotent (ids are distinct-ed and
    * anti-joined against pending tombstones — re-deleting is a no-op);
    * deleting an id not in the index is allowed (it guards the id
    * against a racing append); a tombstoned id REFUSES to re-append
    * until a compact applies the delete (the append's idempotence
    * anti-join would otherwise silently resurrect the OLD row: the
    * physical row still exists, so the new version would be absorbed
    * and the deleted value would serve again). Pending tombstones are
    * broadcast into every probe, so they must stay configuration-
    * sized: the delete refuses loudly past `maxPendingDeletes` —
    * compact to apply and clear. Serialized with compaction under the
    * engine's one maintenance lock (a tombstone landing between a
    * compact's read and its truncate would be wiped unapplied).
    * Crash mid-append: partial tombstones are visible, the retry's
    * anti-join completes the set — at-least-once delivery, exactly-
    * once table effect, like every graft maintenance pass. */
  def deleteFromIndex(spark: org.apache.spark.sql.SparkSession,
      table: String, ids: DataFrame, idCol: String,
      maxPendingDeletes: Int = 1 << 20): Unit = {
    require(spark.catalog.tableExists(table),
      s"deleteFromIndex: $table does not exist")
    val tomb = Dedup.tombstoneTable(table)
    Dedup.withBandLock {
      val del = ids.select(col(idCol)).distinct()
      require(del.filter(col(idCol).isNull).limit(1).collect().isEmpty,
        s"deleteFromIndex: null $idCol in the delete set — the probe " +
          "exclusion anti-join never matches null, so a null tombstone " +
          "would silently delete nothing; filter upstream")
      // the tombstone table's stored id-column name is authoritative
      // (stamped by the FIRST delete; the side table is
      // self-describing) — read it once and rename consistently, so a
      // caller whose idCol differs from the stored name still
      // anti-joins, unions and appends against the right column
      // instead of dying on an AnalysisException at the union
      val tombExists = spark.catalog.tableExists(tomb)
      val storedId =
        if (tombExists) spark.table(tomb).columns.head else idCol
      val fresh =
        if (tombExists)
          del.join(spark.table(tomb).select(col(storedId).as(idCol)),
            Seq(idCol), "left_anti")
        else del
      val pendingAfter =
        if (tombExists)
          spark.table(tomb).select(col(storedId).as(idCol)).union(fresh)
        else fresh
      require(!DriverBounded.exceeds(pendingAfter, maxPendingDeletes),
        s"deleteFromIndex: pending deletes for $table would exceed " +
          s"$maxPendingDeletes — tombstones broadcast into every probe, " +
          "so they must stay configuration-sized; run the family's " +
          "compact to apply and clear them, or raise maxPendingDeletes " +
          "deliberately")
      // one tiny file per delete call, folded away at the next compact
      fresh.select(col(idCol).as(storedId))
        .coalesce(1).write.mode("append").saveAsTable(tomb)
      spark.catalog.refreshTable(tomb)
    }
  }

  /** Ids logically deleted from `table` but not yet physically
    * applied — the pending tombstone set, empty if none. */
  def pendingDeletes(spark: org.apache.spark.sql.SparkSession,
      table: String, idCol: String): DataFrame = {
    val tomb = Dedup.tombstoneTable(table)
    if (spark.catalog.tableExists(tomb)) {
      val t = spark.table(tomb)
      t.select(col(t.columns.head).as(idCol))
    } else if (spark.catalog.tableExists(table) &&
        spark.table(table).columns.contains(idCol))
      // derive the empty frame from the index's own id column so its
      // TYPE always matches — a hard-coded LongType empty frame
      // miscasts (or refuses to union) against a string-keyed index
      spark.table(table).select(col(idCol)).limit(0)
    else
      spark.range(0).select(col("id").as(idCol)).limit(0)
  }

  /** `df` minus `table`'s tombstoned rows — the probe-side exclusion:
    * a broadcast anti-join (pending deletes are configuration-bounded
    * by the delete path) applied BEFORE any ranking, so deleted rows
    * neither surface nor displace live candidates from a top-k or a
    * shortlist. No tombstone table → `df` unchanged (one catalog
    * call, no job). */
  private[operators] def liveRows(spark: org.apache.spark.sql.SparkSession,
      table: String, df: DataFrame, idCol: String): DataFrame = {
    val tomb = Dedup.tombstoneTable(table)
    if (!spark.catalog.tableExists(tomb)) df
    else {
      val t = spark.table(tomb)
      df.join(broadcast(t.select(col(t.columns.head).as(idCol))),
        Seq(idCol), "left_anti")
    }
  }

  /** Loud re-append guard: a tombstoned id cannot re-enter the index
    * until its delete is physically applied — the append's idempotence
    * anti-join sees the still-present physical row, would absorb the
    * new version, and the DELETED value would silently serve again.
    * One tiny lookup per append, only when a tombstone table exists. */
  private[operators] def requireNotTombstoned(
      spark: org.apache.spark.sql.SparkSession,
      table: String, batch: DataFrame, idCol: String,
      context: String): Unit = {
    val tomb = Dedup.tombstoneTable(table)
    if (spark.catalog.tableExists(tomb)) {
      val t = spark.table(tomb)
      val hit = batch.select(col(idCol))
        .join(broadcast(t.select(col(t.columns.head).as(idCol))),
          Seq(idCol), "left_semi")
        .limit(1).collect()
      require(hit.isEmpty,
        s"$context: batch $idCol '${hit.headOption.map(_.get(0)).orNull}' " +
          s"is tombstoned in $table — a deleted id cannot re-enter until " +
          "the delete is physically applied (the idempotence anti-join " +
          "would silently resurrect the old row); run the family's " +
          "compact first")
    }
  }

  /** Two-stage retrieval: PQ ADC shortlist → exact cosine re-rank — the
    * standard serving shape at corpus scale. Stage 1 scans only the
    * M-int codes and keeps `shortlist` candidates per query; stage 2
    * re-fetches full vectors for those Q×shortlist ids with a lazy
    * equi-join against `base` — which must SCAN the vector store, so
    * this form is for unindexed/ad-hoc corpora only. With a persisted
    * [[buildVectorStore]] layout use [[knnPqRefineIndexed]], whose
    * stage-2 fetch bucket-prunes to point lookups. Recall ≈ brute force
    * whenever the true top-k survives the shortlist. */
  def knnPqRefine(encoded: DataFrame, base: DataFrame, queries: DataFrame,
      idCol: String, codebooks: Seq[Seq[Array[Float]]],
      shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val cands = knnPq(encoded, queries, idCol, codebooks, shortlist)
      .select(col("qid"), col("neighbor_id"))
    val b = base.select(col(idCol).as("neighbor_id"),
      col("v").as("bv"), col("nrm").as("bn"))
    val q = queries.select(col(idCol).as("qid"),
      col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("qid").orderBy(col("xsim").desc, col("neighbor_id").asc)
    cands.join(b, "neighbor_id").join(broadcast(q), "qid")
      .withColumn("xsim", dot(col("bv"), col("qv")) / (col("bn") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("neighbor_id"), col("rank"))
  }

  /** Multi-probe IVF ANN: each query scans its `probes` highest-cosine
    * centroid buckets (ties: lowest centroid id) instead of only the
    * nearest one. `centroids` is a withNorm projection keyed by idCol. */
  def knnIvfMultiProbe(assigned: DataFrame, centroids: DataFrame,
      queryIds: Column, idCol: String, k: Int, probes: Int): DataFrame = {
    val cent = centroids.select(col(idCol).as("pcid"),
      col("v").as("cv"), col("nrm").as("cn"))
    val wp = Window.partitionBy("qid").orderBy(col("psim").desc, col("pcid").asc)
    val q = assigned.filter(queryIds)
      .select(col(idCol).as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      .join(broadcast(cent))
      .withColumn("psim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= probes)
      .select(col("qid"), col("pcid").as("qcid"), col("qv"), col("qn"))
    knnProbe(assigned, q, idCol, k)
  }
}
