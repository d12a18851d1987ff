package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) similarity search — the coarse-quantization scale
  * path complementing sign-LSH: assign every vector to its nearest
  * centroid (one broadcast join, no shuffle of the corpus), build the
  * centroid→vectors inverted lists, and answer top-k by scanning only the
  * query's `nprobe` nearest lists.
  *
  * Centroids are the first k corpus vectors, k = [[AnnParams.nCentroids]]
  * ≈ √(n/4) — deterministic, oracle-reproducible, and √-law balanced
  * (fixed k would make each probe scan O(n/k) = O(n)). A production
  * build would k-means-refine them; the plan shape (broadcast centroids,
  * partition-by-list search) is identical either way, which is what
  * matters at 100 TB: the corpus is hash-partitioned by cluster_id once,
  * and a query touches nprobe partitions instead of all of them.
  *
  * Scaling note (measured in the 10× experiment, SCALE.md): the
  * ASSIGNMENT step is O(n·√n) with the adaptive centroid count — the
  * one deliberately superlinear stage here. At real scale cap the
  * centroid count or assign hierarchically (coarse centroids first,
  * then fine within the coarse cell) — same broadcast-join shape,
  * applied twice.
  */
object Ivf {

  val nProbe = 4

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def centroids(spark: SparkSession, dir: String): DataFrame =
    Similarity.normalized(spark, dir)
      .filter(col("vec_id") <
        AnnParams.nCentroids(AnnParams.corpusSize(spark, dir)))
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"),
        col("norm").as("cnorm"))

  /** (vec_id, centroid_id): nearest centroid by cosine, ties → lower id. */
  def assignments(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "ivf_assignments", dir) {
      val e = Similarity.normalized(spark, dir)
      val c = broadcast(centroids(spark, dir))
      val cos = (dot(col("v"), col("cv")) / (col("norm") * col("cnorm")))
        .cast("decimal(10,6)")
      e.crossJoin(c)
        .select(col("vec_id"), col("centroid_id"), cos.as("cos"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("cos").desc, col("centroid_id"))))
        .filter(col("rk") === 1)
        .select("vec_id", "centroid_id")
    }

  /** Inverted-list sizes — the probe-cost profile. */
  def listStats(spark: SparkSession, dir: String): DataFrame =
    assignments(spark, dir).groupBy("centroid_id")
      .agg(count(lit(1)).as("n_vectors"))

  /** Top-k over the query's nprobe nearest inverted lists. */
  def topK(spark: SparkSession, dir: String, k: Int = 10,
           queryMod: Int = 50): DataFrame = {
    val e = Similarity.normalized(spark, dir).join(assignments(spark, dir), "vec_id")
    val c = broadcast(centroids(spark, dir))
    val q = e.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))

    // nprobe nearest centroids per query
    val qcos = (dot(col("qv"), col("cv")) / (col("qn") * col("cnorm")))
      .cast("decimal(10,6)")
    val probes = q.crossJoin(c)
      .select(col("query_id"), col("qv"), col("qn"), col("centroid_id"), qcos.as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("centroid_id"))))
      .filter(col("rk") <= nProbe)
      .select("query_id", "qv", "qn", "centroid_id")

    // search only vectors in the probed lists
    val cos = (dot(col("qv"), col("v")) / (col("qn") * col("norm")))
      .cast("decimal(10,6)")
    probes.join(e, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cosine_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  // ---------- DuckDB oracles ----------

  val centroidsCte: String =
    s"""${AnnParams.nCentroidsSql}, ivf_centroids AS (
       |  SELECT vec_id AS centroid_id, v AS cv, norm AS cnorm
       |  FROM emb WHERE vec_id < (SELECT nc FROM ivf_params)
       |), ivf_assign AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT e.vec_id, c.centroid_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             CAST(list_dot_product(e.v, c.cv) / (e.norm * c.cnorm) AS DECIMAL(10,6)) DESC,
       |             c.centroid_id) AS rk
       |    FROM emb e CROSS JOIN ivf_centroids c
       |  ) WHERE rk = 1
       |)""".stripMargin

  val assignmentsSql: String =
    s"WITH ${Similarity.normCte}, $centroidsCte SELECT vec_id, centroid_id FROM ivf_assign"

  val listStatsSql: String =
    s"""WITH ${Similarity.normCte}, $centroidsCte
       |SELECT centroid_id, count(*) AS n_vectors FROM ivf_assign GROUP BY 1""".stripMargin

  def topKSql(k: Int = 10, queryMod: Int = 50): String =
    s"""WITH ${Similarity.normCte}, $centroidsCte, ea AS (
       |  SELECT e.*, a.centroid_id FROM emb e JOIN ivf_assign a USING (vec_id)
       |), q AS (
       |  SELECT vec_id AS query_id, v AS qv, norm AS qn
       |  FROM ea WHERE vec_id % $queryMod = 0
       |), probes AS (
       |  SELECT query_id, qv, qn, centroid_id FROM (
       |    SELECT q.query_id, q.qv, q.qn, c.centroid_id,
       |           row_number() OVER (PARTITION BY q.query_id ORDER BY
       |             CAST(list_dot_product(q.qv, c.cv) / (q.qn * c.cnorm) AS DECIMAL(10,6)) DESC,
       |             c.centroid_id) AS rk
       |    FROM q CROSS JOIN ivf_centroids c
       |  ) WHERE rk <= $nProbe
       |), scored AS (
       |  SELECT p.query_id, e.vec_id AS neighbor_id,
       |         CAST(list_dot_product(p.qv, e.v) / (p.qn * e.norm) AS DECIMAL(10,6)) AS cosine_sim
       |  FROM probes p JOIN ea e USING (centroid_id)
       |  WHERE e.vec_id != p.query_id
       |)
       |SELECT query_id, neighbor_id, CAST(cosine_sim AS DOUBLE) AS cosine_sim, rank FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin
}
