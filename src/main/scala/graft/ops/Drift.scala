package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** Distribution-drift detection — Population Stability Index between
  * the first and second half of the event-time range, per value bin:
  * the monitoring check a production pipeline runs before trusting new
  * data against the distribution it was calibrated on (PSI is the
  * standard credit-scoring/ML-monitoring statistic; > 0.2 conventionally
  * flags actionable drift).
  *
  * The period split is the integer-microsecond midpoint of the observed
  * range (deterministic in both engines — no wall clock); bins are a
  * fixed 10-bucket grid over the value domain with clamped edges, laid
  * down as a generated spine so empty bins appear with smoothed zero
  * counts rather than vanishing. Counts are add-half smoothed
  * (`(c + 0.5)/(n + 5)`) so the log term is defined for empty bins.
  *
  * Scale shape: one 2-row min/max aggregate, one map-side-combined
  * (period, bin) count — 20 groups — broadcast-joined to the 10-row
  * spine; everything after the count is constant-size work. No shuffle
  * touches row-level data beyond the one counting aggregate.
  */
object Drift {

  /** Per-bin PSI report: counts, smoothed shares, and the PSI
    * contribution `(p2 − p1)·ln(p2/p1)` on the 6-dp decimal grid.
    */
  def psi(spark: SparkSession, dir: String,
          binWidth: Double = 50.0, nBins: Int = 10): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("us"), col("value"))
    val mid = ev.agg(((min("us") + max("us")) / lit(2L)).cast("long").as("mid_us"))
    val binned = ev.crossJoin(Bcast.ifBounded(mid, Bcast.OneRow))
      .select(
        when(col("us") < col("mid_us"), lit("p1")).otherwise(lit("p2")).as("period"),
        least(lit(nBins - 1), greatest(lit(0),
          floor(col("value") / binWidth).cast("int"))).as("bin"))
      .groupBy("period", "bin").agg(count(lit(1)).as("cnt"))
    val spine = spark.range(nBins).select(col("id").cast("int").as("bin"))
    def side(p: String, n: String): DataFrame = spine
      .join(binned.filter(col("period") === p).select("bin", "cnt"), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("cnt"), lit(0L)).as(n))
    val joined = side("p1", "n1").join(side("p2", "n2"), "bin")
      .crossJoin(Bcast.ifBounded(
        binned.agg(
          sum(when(col("period") === "p1", col("cnt")).otherwise(0L)).as("t1"),
          sum(when(col("period") === "p2", col("cnt")).otherwise(0L)).as("t2")),
        Bcast.OneRow))
    val p1 = (col("n1").cast("double") + 0.5) / (col("t1").cast("double") + 0.5 * nBins)
    val p2 = (col("n2").cast("double") + 0.5) / (col("t2").cast("double") + 0.5 * nBins)
    joined.select(
      col("bin"), col("n1"), col("n2"),
      p1.cast("decimal(18,6)").as("share_p1"),
      p2.cast("decimal(18,6)").as("share_p2"),
      ((p2 - p1) * log(p2 / p1)).cast("decimal(18,6)").as("psi_contrib"))
  }

  def psiSql(binWidth: Double = 50.0, nBins: Int = 10): String =
    s"""WITH ev AS (
       |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events
       |), mid AS (
       |  SELECT (MIN(us) + MAX(us)) // 2 AS mid_us FROM ev
       |), binned AS (
       |  SELECT CASE WHEN ev.us < mid.mid_us THEN 'p1' ELSE 'p2' END AS period,
       |         LEAST(${nBins - 1}, GREATEST(0,
       |           CAST(FLOOR(value / $binWidth) AS INT))) AS bin,
       |         COUNT(*) AS cnt
       |  FROM ev, mid GROUP BY 1, 2
       |), spine AS (
       |  SELECT CAST(unnest(generate_series(0, ${nBins - 1})) AS INT) AS bin
       |), s1 AS (
       |  SELECT spine.bin, CAST(COALESCE(b.cnt, 0) AS BIGINT) AS n1
       |  FROM spine LEFT JOIN (SELECT bin, cnt FROM binned WHERE period = 'p1') b USING (bin)
       |), s2 AS (
       |  SELECT spine.bin, CAST(COALESCE(b.cnt, 0) AS BIGINT) AS n2
       |  FROM spine LEFT JOIN (SELECT bin, cnt FROM binned WHERE period = 'p2') b USING (bin)
       |), tot AS (
       |  SELECT CAST(SUM(CASE WHEN period = 'p1' THEN cnt ELSE 0 END) AS BIGINT) AS t1,
       |         CAST(SUM(CASE WHEN period = 'p2' THEN cnt ELSE 0 END) AS BIGINT) AS t2
       |  FROM binned
       |), sh AS (
       |  SELECT s1.bin, s1.n1, s2.n2,
       |         (CAST(s1.n1 AS DOUBLE) + 0.5) / (CAST(tot.t1 AS DOUBLE) + ${0.5 * nBins}) AS p1,
       |         (CAST(s2.n2 AS DOUBLE) + 0.5) / (CAST(tot.t2 AS DOUBLE) + ${0.5 * nBins}) AS p2
       |  FROM s1 JOIN s2 USING (bin), tot
       |)
       |SELECT bin, n1, n2,
       |       CAST(CAST(p1 AS DECIMAL(18,6)) AS DOUBLE) AS share_p1,
       |       CAST(CAST(p2 AS DECIMAL(18,6)) AS DOUBLE) AS share_p2,
       |       CAST(CAST((p2 - p1) * ln(p2 / p1) AS DECIMAL(18,6)) AS DOUBLE) AS psi_contrib
       |FROM sh""".stripMargin

  /** Embedding-centroid drift — the vector-space twin of [[psi]] and the
    * shingle drift: per source, the cosine between the SUMMED raw
    * feature vectors of the two corpus halves (`doc_id mod 2`, the
    * house halving rule). A topic/template shift in what a source
    * publishes moves its mean direction even when surface token stats
    * hold still — this is the check an embedding-based curation stack
    * runs between crawl snapshots before trusting its ANN calibration.
    *
    * Determinism: the summed vectors are sums of the featurizer's ±1
    * signed gram counts — exact integers in doubles, so the aggregation
    * is order-free and the one division+sqrt at the edge is
    * bit-identical in both engines (the [[Featurize]] property, used
    * here WITHOUT unit-normalizing per doc first, precisely because
    * per-doc division would reintroduce order-dependent float sums).
    *
    * Scale: vectors stay unexploded until the per-(source, half, pos)
    * aggregate, which map-side combines to sources × 2 × dim rows;
    * everything after is metadata-size. One shuffle.
    */
  def embDrift(spark: SparkSession, dir: String): DataFrame = {
    val dim = Featurize.dim
    val j = Featurize.vectors(spark, dir)
      .join(Tables.documents(spark, dir)
        .select(col("doc_id").as("vec_id"), col("source")), "vec_id")
      .select(col("source"), pmod(col("vec_id"), lit(2)).as("half"), col("v"))
    val sums = j.select(col("source"), col("half"), posexplode(col("v")))
      .groupBy("source", "half", "pos").agg(sum("col").as("f"))
    val paired = sums.groupBy("source", "pos").agg(
      sum(when(col("half") === 0, col("f")).otherwise(0.0)).as("f0"),
      sum(when(col("half") === 1, col("f")).otherwise(0.0)).as("f1"))
    val geom = paired.groupBy("source").agg(
      sum(col("f0") * col("f1")).as("dp"),
      sum(col("f0") * col("f0")).as("n0"),
      sum(col("f1") * col("f1")).as("n1"))
    val counts = j.groupBy("source").agg(
      sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_docs_h0"),
      sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_docs_h1"))
    geom.join(counts, "source").select(
      col("source"), col("n_docs_h0"), col("n_docs_h1"),
      (col("dp") / when(col("n0") * col("n1") === 0.0, lit(null))
        .otherwise(sqrt(col("n0") * col("n1")))).as("centroid_cosine"))
  }

  def embDriftSql: String = {
    val dim = Featurize.dim
    s"""WITH ${Featurize.embCteAs("femb")},
       |j AS (
       |  SELECT f.vec_id, d.source, f.vec_id % 2 AS half, f.v
       |  FROM femb f JOIN documents d ON d.doc_id = f.vec_id
       |), sums AS (
       |  SELECT source, half, i.i AS pos,
       |         SUM(v[CAST(i.i AS INT) + 1]) AS f
       |  FROM j CROSS JOIN range(0, $dim) i(i)
       |  GROUP BY 1, 2, 3
       |), paired AS (
       |  SELECT source, pos,
       |         SUM(CASE WHEN half = 0 THEN f ELSE 0 END) AS f0,
       |         SUM(CASE WHEN half = 1 THEN f ELSE 0 END) AS f1
       |  FROM sums GROUP BY 1, 2
       |), geom AS (
       |  SELECT source, SUM(f0 * f1) AS dp,
       |         SUM(f0 * f0) AS n0, SUM(f1 * f1) AS n1
       |  FROM paired GROUP BY 1
       |), counts AS (
       |  SELECT source,
       |         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_h0,
       |         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_h1
       |  FROM j GROUP BY 1
       |)
       |SELECT g.source, c.n_docs_h0, c.n_docs_h1,
       |       g.dp / NULLIF(sqrt(g.n0 * g.n1), 0) AS centroid_cosine
       |FROM geom g JOIN counts c USING (source)""".stripMargin
  }
}
