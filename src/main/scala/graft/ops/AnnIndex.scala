package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.AtomicPublish

/** Persisted, servable ANN index — the round that turns the retrieval
  * stack from "rebuilt every session" into a search SYSTEM: the IVF
  * centroids, inverted lists, residual-PQ codebooks, codes, and the raw
  * vector store are written ONCE as a versioned parquet artifact set
  * (committed with [[AtomicPublish]]'s atomic-marker protocol, so a
  * crashed rebuild can never expose half an index), and every later
  * session answers queries by LOADING the artifacts — no document scan,
  * no featurize pass, no k-means, no codebook training.
  *
  * The serve path reuses [[Pq.ivfPqFrom]] — the exact ADC chain of
  * `ivfpq_topk_derived` parameterized by index frames — so the served
  * result is hash-identical to the in-session build and both check
  * against the same DuckDB oracle (which recomputes everything from
  * `documents`, proving the persisted artifacts are the true index of
  * THIS corpus, not a stale one). AnnIndexSpec asserts the serve plan's
  * file scans touch only the index directory.
  *
  * At 100 TB this is the difference between a demo and a vector store:
  * the index build is a scheduled pipeline (hours, amortized), serving
  * is probes against √-law centroid tables + code lists; incremental
  * maintenance between rebuilds is [[Ivf.appendReport]]'s frozen-
  * centroid assignment, and a rebuild publishes the next version behind
  * the same atomic pointer readers are already resolving.
  */
object AnnIndex {

  /** Serving parameters — pinned to the `ivfpq_topk_derived` contract
    * so serve is oracle-checked against the same SQL.
    */
  val k = 10
  val shortlist = 100
  val queryMod = 200

  private val artifacts =
    Seq("vectors", "centroids", "assignments", "codebooks", "codes")

  // "2": artifact-format version — the grid6 sweep changed persisted
  // column types (DECIMAL(10,6) → DOUBLE); a fresh family orphans
  // pre-sweep artifacts instead of serving them through new code
  def baseFor(dir: String): String =
    graft.io.FsUtil.stateDir("annindex2", dir)

  /** Build the full index for `dir`'s derived-text corpus and commit it
    * as the next version; returns the committed version id. Every
    * artifact is computed by the SAME builders the in-session queries
    * use, so content equals the memoized index bit-for-bit.
    */
  /** SHA-256-free raw snapshot (path|len|mtime) of the source table the
    * whole index derives from — committed with the version so a serve
    * can detect that the data under an unchanged path changed.
    */
  private def sourceSnapshot(spark: SparkSession, dir: String): String =
    graft.io.ResultCache.inputSnapshot(graft.Tables.documents(spark, dir))

  def build(spark: SparkSession, dir: String): Long = {
    val c = Featurize.corpus
    val n = AnnParams.corpusSizeOf(spark, dir, c)
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    AtomicPublish.publish(spark, baseFor(dir), Seq(
      "vectors" -> c.normalizedOf(spark, dir),
      "centroids" -> Ivf.centroids(spark, dir, c),
      // the inverted file rides a RANGE layout on its list key: each
      // parquet file covers a disjoint centroid_id range, so a probe-set
      // IN filter through the graft-artifact source prunes whole files
      // (footer min/max) — a probe reads only its lists, never the index
      "assignments" -> Ivf.assignments(spark, dir, c)
        .repartitionByRange(8, col("centroid_id"))
        .sortWithinPartitions("centroid_id"),
      "codebooks" -> Pq.residualCodebooks(spark, dir, c),
      "codes" -> Pq.residualCodes(spark, dir, c),
      // the knob the serve path needs WITHOUT re-counting the corpus,
      // plus the source snapshot that makes staleness detectable
      "meta" -> Seq((n, AnnParams.nProbe(n), sourceSnapshot(spark, dir)))
        .toDF("n", "n_probe", "snapshot")))
  }

  /** Rebuild unless a committed version exists AND its recorded source
    * snapshot still matches the files on disk — a compaction or
    * re-ingest under the same path invalidates the index structurally
    * instead of serving stale neighbors.
    */
  private[ops] def ensureBuilt(spark: SparkSession, dir: String): Unit = {
    val base = baseFor(dir)
    val current = AtomicPublish.exists(spark, base) && {
      val meta = AtomicPublish.read(spark, base, "meta")
      meta.columns.contains("snapshot") &&
        meta.select("snapshot").head().getString(0) ==
          sourceSnapshot(spark, dir)
    }
    if (!current) { build(spark, dir); () }
  }

  /** Registered `ann_index_build`: (re)build + per-artifact row counts
    * read back FROM the committed version — the oracle recomputes each
    * count from `documents` and the knob formulas, so a build that
    * dropped or duplicated index rows diverges.
    */
  def buildReport(spark: SparkSession, dir: String): DataFrame = {
    graft.Memo(spark, "ann_index_build", dir, "ann_index_build") {
      build(spark, dir)
      val base = baseFor(dir)
      import spark.implicits._
      artifacts.map { a =>
        a -> AtomicPublish.read(spark, base, a).count()
      }.toDF("artifact", "n_rows")
    }
  }

  /** Registered `ann_index_serve`: top-k answered ENTIRELY from the
    * persisted artifacts (builds first only if no version exists —
    * normally the committed index is simply loaded). Hash-equal to
    * `ivfpq_topk_derived`.
    */
  def serve(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "ann_index_serve", dir, "ann_index_serve") {
      ensureBuilt(spark, dir)
      servePlan(spark, dir)
    }

  /** Registered `ann_topk_derived`: the plain-IVF top-k on the derived
    * corpus answered from the PERSISTED index artifacts — vectors,
    * centroids and assignments loaded through the DSv2 source, built
    * only when absent or stale. The query now measures the SERVE path
    * (probes against √-law tables), not an inline featurize + k-means
    * rebuild of the whole index (93× at the 10× fixture when the
    * rebuild was billed to this query; the build is `ann_index_build`'s
    * cost, amortized like any production index pipeline).
    */
  def topKDerived(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "ann_topk_derived", dir, "ann_topk_derived") {
      ensureBuilt(spark, dir)
      val nProbe = artifact(spark, dir, "meta").head().getInt(1)
      Ivf.topKFrom(
        artifact(spark, dir, "vectors"),
        artifact(spark, dir, "centroids"),
        artifact(spark, dir, "assignments"),
        nProbe, k = k, queryMod = queryMod)
    }

  /** DataSourceV2 read of one committed artifact — the catalog-table
    * path ([[graft.sources.GraftArtifactSource]]): pointer-resolved
    * snapshot, column pruning, and footer-stats filter pushdown.
    */
  def artifact(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.format("graft-artifact")
      .option("base", baseFor(dir)).option("dataset", name).load()

  /** The serve DataFrame with NO build fallback and NO memo — the spec
    * uses this to assert the plan's scans touch only the index. Every
    * artifact is read through the DSv2 source.
    */
  private[graft] def servePlan(spark: SparkSession, dir: String): DataFrame = {
    val nProbe = artifact(spark, dir, "meta").head().getInt(1)
    Pq.ivfPqFrom(
      artifact(spark, dir, "vectors"),
      artifact(spark, dir, "centroids"),
      artifact(spark, dir, "assignments"),
      artifact(spark, dir, "codebooks"),
      artifact(spark, dir, "codes"),
      nProbe, k, shortlist, queryMod)
  }

  // ---------- DuckDB oracles ----------

  /** Artifact counts recomputed through the SAME oracle CTE chain the
    * search oracles replay (a Lloyd round can retire a centroid or a
    * codeword whose list comes up empty, so the counts are properties
    * of the trained index, not closed-form knob arithmetic).
    */
  def buildReportSql: String =
    s"""WITH ${Featurize.corpus.embCte}, ${Ivf.centroidsCteFor("documents")},
       |${Pq.residualCodesCte},
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv FROM emb)
       |SELECT 'vectors' AS artifact, nv AS n_rows FROM n
       |UNION ALL SELECT 'centroids',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ivf_centroids)
       |UNION ALL SELECT 'assignments',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ivf_assign)
       |UNION ALL SELECT 'codebooks',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM pqr_cb)
       |UNION ALL SELECT 'codes',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM pqr_codes)""".stripMargin

  /** Serve must equal the full from-source recompute — the
    * `ivfpq_topk_derived` oracle verbatim.
    */
  def serveSql: String =
    Pq.ivfPqSqlFor(k, shortlist, queryMod, Featurize.corpus.embCte, "documents")
}
