package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.functions.GraftExpressions

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Two paths, as a production pipeline would ship them:
  *  - brute-force cosine top-k: the correctness baseline. Oracle-exact
  *    by quantizing floats to integers (×1000, round) so the dot
  *    product and norms are exact integer arithmetic in both Spark and
  *    DuckDB — no float-summation-order hazards.
  *  - LSH-bucketed ANN (random hyperplane signs): the 100 TB path. The
  *    cross product is confined to hash buckets; recall vs brute force
  *    is asserted in LlmOpsSpec rather than an SQL oracle.
  *
  * The float fast path (`CosineSimFloat`, codegen'd) powers the
  * benchmark variant; the quantized path powers the oracle queries.
  */
object Similarity {

  /** Integer-quantized vectors: q = round(x * 1000), exact in BIGINT. */
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(spark, Tables.embeddings(spark, dir)).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("q"))
      .withColumn("nrm", expr("aggregate(q, 0L, (acc, v) -> acc + v * v)"))

  // codegen'd fused loop (DotProductLong) — same integer math as
  // aggregate(zip_with(...)), minus the per-pair array materialization
  private def dotCol = GraftExpressions.dotLong(col("qa"), col("qb"))

  /** Brute-force cosine top-k for the first `nQueries` vectors. */
  def annTopK(spark: SparkSession, dir: String, nQueries: Int = 32, k: Int = 5): DataFrame = {
    val v = quantized(spark, dir)
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qa"), col("nrm").as("na"))
    val c = v.select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("nrm").as("nb"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dotCol)
      .withColumn("sim", col("dot").cast(DoubleType) /
        (sqrt(col("na").cast(DoubleType)) * sqrt(col("nb").cast(DoubleType))))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** All pairs above a cosine threshold (embedding near-dup detection). */
  def nearDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    val v = quantized(spark, dir)
    val a = v.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("dot", dotCol)
      .withColumn("sim", col("dot").cast(DoubleType) /
        (sqrt(col("na").cast(DoubleType)) * sqrt(col("nb").cast(DoubleType))))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("sim"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val NumTables = 8
  val PlanesPerTable = 6

  /** Deterministic pseudo-random hyperplanes: component j of plane p is
    * a hash-derived value in [-1, 1). Same construction at any scale. */
  private def planeComponent(p: Int, j: Int): Double = {
    val h = Fnv(s"plane_${p}_$j")
    (h & 0xffffffffL).toDouble / 0x80000000L.toDouble - 1.0
  }
  private def Fnv(s: String): Long = graft.functions.Fnv1a64.hash(s.getBytes("UTF-8"))

  /** Multi-table LSH signatures: `NumTables` independent bucket keys,
    * each the sign pattern of `PlanesPerTable` random hyperplanes.
    * More tables → higher recall; fewer planes/table → bigger buckets.
    * (A single-table variant has poor recall for top-k: a true
    * neighbor flipping any one sign bit is lost.) All tables×planes
    * dot products run in one fused codegen pass (HyperplaneBuckets). */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame = {
    val planes = Array.tabulate(NumTables * PlanesPerTable, 64)((p, j) => planeComponent(p, j))
    val e = Tables.spread(spark, Tables.embeddings(spark, dir))
    val withB = e.select(col("vec_id"), col("embedding"),
      GraftExpressions.hyperplaneBuckets(col("embedding"), planes, PlanesPerTable).as("b"))
    val tableCols = (0 until NumTables).map(t => col("b").getItem(t).as(s"bucket_$t"))
    withB.select(col("vec_id") +: col("embedding") +: tableCols: _*)
  }

  /** ANN via multi-table LSH: a pair is a candidate when it collides
    * in ANY table; exact cosine (codegen'd float path) runs on
    * candidates only — a 100 TB-safe path (no full cross product). */
  def annLsh(spark: SparkSession, dir: String, nQueries: Int = 32, k: Int = 5): DataFrame = {
    val sig = lshBuckets(spark, dir)
    val buckets = (0 until NumTables).map { t =>
      sig.select(lit(t).as("t"), col(s"bucket_$t").as("bucket"),
        col("vec_id"), col("embedding"))
    }.reduce(_ unionByName _)
    val q = buckets.filter(col("vec_id") < nQueries)
      .select(col("t"), col("bucket"), col("vec_id").as("query_id"), col("embedding").as("ea"))
    val c = buckets.select(col("t"), col("bucket"), col("vec_id").as("neighbor_id"),
      col("embedding").as("eb"))
    q.join(c, Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", GraftExpressions.cosineSim(col("ea"), col("eb")))
      .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("sim")).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))
  }

  val NumCentroids = 16
  val NProbe = 4
  val KMeansIters = 3

  /** Distributed k-means for the IVF coarse quantizer: deterministic
    * init (first `NumCentroids` vectors), then Lloyd iterations.
    * Assignment is a doc-local argmax over the O(C·dims) centroid
    * constant (`NearestCentroidsFloat`, codegen'd) — a pure projection
    * with ZERO shuffle; the only shuffle per iteration is the C×dims
    * mean recompute (posexplode + partial-agg groupBy). Centroids are
    * collected to the driver each iteration — C×dims scalars, the same
    * move MLlib's KMeans makes — which also truncates the lineage: the
    * old DataFrame-chained version re-ran every previous Lloyd
    * iteration on each downstream action. At 100 TB each iteration is
    * one scan + one small aggregation. */
  def kmeansModel(spark: SparkSession, dir: String,
                  iters: Int = KMeansIters): (Array[Int], Array[Array[Float]]) = {
    val e = Tables.spread(spark, Tables.embeddings(spark, dir)).select(col("vec_id"), col("embedding"))
    var model = collectModel(e.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").cast("int").as("centroid_id"), col("embedding").as("ce")))
    // empty table (or no vec_id < NumCentroids) → empty model; callers
    // short-circuit rather than constructing NearestCentroidsFloat
    if (model._1.isEmpty) return model
    (0 until iters).foreach { _ =>
      val assigned = e.withColumn("centroid_id",
        GraftExpressions.nearestCentroidsFloat(col("embedding"), model._1, model._2, 1).getItem(0))
      // mean vector per cell: posexplode + groupBy(cell, dim) + re-assemble
      val dims = assigned
        .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("centroid_id"), col("dim"))
        .agg(avg(col("x")).as("m"))
      model = collectModel(dims
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("centroid_id"),
          expr("transform(dm, s -> CAST(s.m AS FLOAT))").as("ce")))
    }
    model
  }

  /** (centroid_id asc, centroid vector) — ids ascending so the
    * expression's tie-break (lower index) matches `ORDER BY csim DESC,
    * centroid_id`. */
  private def collectModel(df: DataFrame): (Array[Int], Array[Array[Float]]) = {
    val rows = df.orderBy(col("centroid_id")).collect()
    (rows.map(_.getInt(0)), rows.map(_.getSeq[Float](1).toArray))
  }

  /** Doc-local top-1 cell assignment — a pure projection over the
    * centroid constant (no Exchange, no Window; asserted in
    * LlmOpsSpec's plan-shape test). */
  private[graft] def ivfAssign(e: DataFrame, ids: Array[Int],
                               cents: Array[Array[Float]]): DataFrame =
    e.withColumn("centroid_id",
      GraftExpressions.nearestCentroidsFloat(col("embedding"), ids, cents, 1).getItem(0))

  /** Centroid model as a DataFrame, for inspection / downstream reuse. */
  def kmeansCentroids(spark: SparkSession, dir: String,
                      iters: Int = KMeansIters): DataFrame = {
    val (ids, cents) = kmeansModel(spark, dir, iters)
    import spark.implicits._
    ids.zip(cents.map(_.toSeq)).toSeq.toDF("centroid_id", "ce")
  }

  /** IVF-style ANN: database vectors are assigned to their nearest
    * coarse centroid; a query probes its `NProbe` nearest centroid
    * cells. Assignment and probe selection are doc-local projections
    * over the centroid constant (no Exchange, no Window — asserted in
    * LlmOpsSpec); the only joins are confined to probed cells — the
    * FAISS-IVF shape, Spark-first. */
  def annIvf(spark: SparkSession, dir: String, nQueries: Int = 32, k: Int = 5): DataFrame = {
    val e = Tables.spread(spark, Tables.embeddings(spark, dir))
    val (ids, cents) = kmeansModel(spark, dir)
    if (ids.isEmpty)
      // empty embeddings table: degrade to the empty result the old
      // window-based path produced, not a constructor require failure
      return e.sparkSession.emptyDataFrame
        .select(lit(0L).as("query_id"), lit(0).as("rk"),
          lit(0L).as("neighbor_id"), lit(0.0).as("sim"))
    val db = ivfAssign(e, ids, cents)
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"), col("embedding").as("eb"))
    val probes = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("ea"),
        explode(GraftExpressions.nearestCentroidsFloat(
          col("embedding"), ids, cents, NProbe)).as("centroid_id"))
    probes.join(db, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", GraftExpressions.cosineSim(col("ea"), col("eb")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Float fast path (codegen'd CosineSimFloat) — the bench variant of
    * annTopK; sims differ from the quantized oracle in the last ulps,
    * so it ships rows-only. */
  def annTopKFloat(spark: SparkSession, dir: String, nQueries: Int = 32, k: Int = 5): DataFrame = {
    val e = Tables.spread(spark, Tables.embeddings(spark, dir))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("ea"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", GraftExpressions.cosineSim(col("ea"), col("eb")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ann_topk" -> ((s, d) => annTopK(s, d)),
    "sim_neardup_pairs" -> ((s, d) => nearDupPairs(s, d)),
    "sim_ann_lsh" -> ((s, d) => annLsh(s, d)),
    "sim_ann_ivf" -> ((s, d) => annIvf(s, d)),
    "sim_ann_topk_float" -> ((s, d) => annTopKFloat(s, d)))

  private val quantCte =
    """qv AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |  FROM embeddings
      |), qn AS (
      |  SELECT vec_id, q,
      |    CAST(list_sum([q[i] * q[i] FOR i IN range(1, len(q) + 1)]) AS BIGINT) AS nrm
      |  FROM qv
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "sim_ann_topk" -> (s"WITH $quantCte\n" +
      """, scored AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(CAST(list_sum([a.q[i] * b.q[i] FOR i IN range(1, len(a.q) + 1)]) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS sim
        |  FROM qn a JOIN qn b ON a.vec_id < 32 AND a.vec_id <> b.vec_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
        |  FROM scored
        |)
        |SELECT query_id, rk, neighbor_id, sim FROM ranked WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin),
    "sim_neardup_pairs" -> (s"WITH $quantCte\n" +
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  CAST(CAST(list_sum([a.q[i] * b.q[i] FOR i IN range(1, len(a.q) + 1)]) AS BIGINT) AS DOUBLE)
        |    / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS sim
        |FROM qn a JOIN qn b ON a.vec_id < b.vec_id
        |WHERE CAST(CAST(list_sum([a.q[i] * b.q[i] FOR i IN range(1, len(a.q) + 1)]) AS BIGINT) AS DOUBLE)
        |    / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) >= 0.3
        |ORDER BY vec_a, vec_b""".stripMargin))
}
