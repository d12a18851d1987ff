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

  /** (vec_id, centroid_id): hierarchical two-level assignment — nearest
    * COARSE centroid first (the √k lowest-id centroids), then the
    * nearest fine centroid within that coarse cell. Cuts the one
    * superlinear stage from O(n·k) to O(n·√k) comparisons (measured in
    * SCALE.md's 10× experiment); every coarse centroid is itself a fine
    * centroid and self-assigns (cosine 1.0 wins), so no cell is empty.
    * Ties → lower id at both levels, so the assignment stays
    * deterministic and the oracle mirrors it exactly.
    */
  def assignments(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "ivf_assignments", dir) {
      val nc = AnnParams.nCentroids(AnnParams.corpusSize(spark, dir))
      val coarseN = math.max(1, math.floor(math.sqrt(nc.toDouble)).toLong)
      val e = Similarity.normalized(spark, dir)
      val c = centroids(spark, dir)
      val coarse = broadcast(c.filter(col("centroid_id") < coarseN)
        .select(col("centroid_id").as("coarse_id"),
          col("cv").as("gv"), col("cnorm").as("gnorm")))

      def nearestCoarse(in: DataFrame, vCol: String, nCol: String, keep: Seq[String]) = {
        val cos = (dot(col(vCol), col("gv")) / (col(nCol) * col("gnorm")))
          .cast("decimal(10,6)")
        in.crossJoin(coarse)
          .select(keep.map(col) :+ col("coarse_id") :+ cos.as("gcos"): _*)
          .withColumn("rk", row_number().over(
            Window.partitionBy(keep.head, keep.tail: _*)
              .orderBy(col("gcos").desc, col("coarse_id"))))
          .filter(col("rk") === 1)
          .select(keep.map(col) :+ col("coarse_id"): _*)
      }

      // fine centroid → its coarse cell (self-assigns when it IS coarse)
      val cellOf = broadcast(
        nearestCoarse(c, "cv", "cnorm", Seq("centroid_id", "cv", "cnorm")))
      // vector → coarse cell → nearest fine centroid within the cell
      val vecCell = nearestCoarse(e, "v", "norm", Seq("vec_id", "v", "norm"))
      val cos = (dot(col("v"), col("cv")) / (col("norm") * col("cnorm")))
        .cast("decimal(10,6)")
      vecCell.join(cellOf, "coarse_id")
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
       |), ivf_coarse AS (
       |  SELECT centroid_id AS coarse_id, cv AS gv, cnorm AS gnorm
       |  FROM ivf_centroids
       |  WHERE centroid_id < GREATEST(1, CAST(floor(sqrt(CAST((SELECT nc FROM ivf_params) AS DOUBLE))) AS BIGINT))
       |), ivf_cell_of AS (
       |  SELECT centroid_id, cv, cnorm, coarse_id FROM (
       |    SELECT f.centroid_id, f.cv, f.cnorm, g.coarse_id,
       |           row_number() OVER (PARTITION BY f.centroid_id ORDER BY
       |             CAST(list_dot_product(f.cv, g.gv) / (f.cnorm * g.gnorm) AS DECIMAL(10,6)) DESC,
       |             g.coarse_id) AS rk
       |    FROM ivf_centroids f CROSS JOIN ivf_coarse g
       |  ) WHERE rk = 1
       |), ivf_vec_cell AS (
       |  SELECT vec_id, v, norm, coarse_id FROM (
       |    SELECT e.vec_id, e.v, e.norm, g.coarse_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             CAST(list_dot_product(e.v, g.gv) / (e.norm * g.gnorm) AS DECIMAL(10,6)) DESC,
       |             g.coarse_id) AS rk
       |    FROM emb e CROSS JOIN ivf_coarse g
       |  ) WHERE rk = 1
       |), ivf_assign AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT vc.vec_id, co.centroid_id,
       |           row_number() OVER (PARTITION BY vc.vec_id ORDER BY
       |             CAST(list_dot_product(vc.v, co.cv) / (vc.norm * co.cnorm) AS DECIMAL(10,6)) DESC,
       |             co.centroid_id) AS rk
       |    FROM ivf_vec_cell vc JOIN ivf_cell_of co USING (coarse_id)
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
