package graft

import org.apache.spark.sql.functions._
import graft.ops.{AnnParams, Ivf, Recall}

/** Retrieval-quality assertions for the similarity stack: the approximate
  * paths must not only compute what they claim (the oracle proves that)
  * but RETRIEVE well — measured against the brute-force ground truth.
  * Runs at sf0.1, the scale the driver benches at (sf0.001 has a single
  * query vector — too few for a recall number to mean anything).
  *
  * Measured by IvfTune at sf0.1 (n=2000, nc=23, np=18): seeds (rounds=0)
  * max/mean 3.00, recall 0.890; rounds=1 → 2.43 / 0.910; rounds=2 →
  * 2.32 / 0.948. The ≥0.9 bar genuinely needs the refinement.
  */
class IvfSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.1"

  private def overall(method: String): Double =
    Recall.atK(spark, sf01)
      .filter(col("query_id") === -1 && col("method") === method)
      .select("recall").head().getDouble(0)

  test("IVF recall@10 >= 0.9 at the AnnParams probe fraction") {
    assert(overall("ivf") >= 0.9)
  }

  test("multiprobe recall@10 >= 0.25 (isotropic-corpus radius-2 bound)") {
    // ~P(<=2 of 8 sign bits flip) at per-plane agreement p~0.6; see the
    // honesty note on Similarity.multiprobeTopK — this corpus is LSH's
    // worst case, and Ivf.topK is the >=0.9 path for it
    assert(overall("multiprobe") >= 0.25)
  }

  test("k-means refinement balances inverted lists vs raw seeds") {
    def maxOverMean(assign: org.apache.spark.sql.DataFrame): Double = {
      val r = assign.groupBy("centroid_id").agg(count(lit(1)).as("n"))
        .agg(max("n").cast("double").as("mx"),
          avg(col("n").cast("double")).as("mean")).head()
      r.getDouble(0) / r.getDouble(1)
    }
    val seedRatio = maxOverMean(Ivf.seedAssignments(spark, sf01))
    val refinedRatio = maxOverMean(Ivf.assignments(spark, sf01))
    assert(refinedRatio < seedRatio,
      s"refined max/mean $refinedRatio should beat seeds $seedRatio")
  }

  test("filtered search: pre-filter semantics, admissible neighbors only") {
    val exact = graft.ops.Similarity.filteredTopK(spark, sf01).cache()
    val lab = Tables.embeddings(spark, sf01)
      .select(col("vec_id"), col("label").as("true_label"))
    // every returned neighbor satisfies the predicate (its own label ==
    // the query's) — the defining property of pre-filter search
    assert(exact.join(lab, exact("neighbor_id") === lab("vec_id"))
      .filter(col("true_label") =!= col("label")).count() === 0)
    // filtering changed the answer: the admissible top-k is NOT just the
    // unfiltered top-k with misses dropped (rank 1 differs somewhere)
    val unf = graft.ops.Similarity.bruteForceTopK(spark, sf01)
      .filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id").as("unf_top1"))
    val top1 = exact.filter(col("rank") === 1)
      .join(unf, "query_id")
    assert(top1.filter(col("neighbor_id") =!= col("unf_top1")).count() > 0)
    // the IVF-probed path agrees with exact filtered search on rank-1
    // for most queries (recall within the probed lists)
    val ivfF = Ivf.filteredTopK(spark, sf01).filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id").as("ivf_top1"))
    val joined = exact.filter(col("rank") === 1).join(ivfF, "query_id").cache()
    val agree = joined.filter(col("neighbor_id") === col("ivf_top1")).count()
    assert(agree.toDouble / joined.count() >= 0.8,
      s"filtered IVF top-1 agreement ${agree.toDouble / joined.count()}")
  }

  test("index append: every batch vector lands in exactly one frozen list") {
    val rep = Ivf.appendReport(spark, sf01).cache()
    val batchSize = Tables.embeddings(spark, sf01)
      .filter(col("vec_id") % 10 === 7).count()
    // conservation: the appended counts sum to the batch size (each new
    // vector assigned to exactly one existing centroid, none lost)
    assert(rep.agg(sum("n_new")).head().getLong(0) === batchSize)
    // the base index is intact: base counts sum to the base corpus size
    val baseSize = Tables.embeddings(spark, sf01)
      .filter(col("vec_id") % 10 =!= 7).count()
    assert(rep.agg(sum("n_base")).head().getLong(0) === baseSize)
    // arithmetic consistency of the report
    assert(rep.filter(col("n_after") =!= col("n_base") + col("n_new")).count() === 0)
  }

  test("matryoshka: recall in [0,1] and wider prefixes retain more") {
    val m = Recall.matryoshka(spark, sf01).cache()
    assert(m.filter(col("recall") < 0 || col("recall") > 1).count() === 0)
    def overall(method: String): Double =
      m.filter(col("query_id") === -1 && col("method") === method)
        .select("recall").head().getDouble(0)
    assert(overall("dim_32") > overall("dim_8"),
      s"dim_32 ${overall("dim_32")} should beat dim_8 ${overall("dim_8")}")
  }

  test("nProbe formula tracks the centroid count") {
    assert(AnnParams.nProbe(500) === (3 * AnnParams.nCentroids(500) + 3) / 4)
    // probed fraction stays ~3/4 as the corpus grows
    val n = 1000000L
    val frac = AnnParams.nProbe(n).toDouble / AnnParams.nCentroids(n)
    assert(frac >= 0.74 && frac <= 0.76)
  }

  test("persisted append: frozen centroids, idempotent cross-session fold") {
    import org.apache.spark.sql.functions._
    val base = graft.io.FsUtil.stateDir("ivfinc2", sf0001)
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val r = graft.ops.Ivf.appendCommit(spark, sf0001).cache()
    // identical growth to the in-session append path
    val want = graft.ops.Ivf.appendReport(spark, sf0001).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val got = r.collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(got === want)
    r.unpersist()
    // both versions retained; centroids identical across them (frozen)
    assert(graft.io.AtomicPublish.versions(spark, base) === Seq(0L, 1L))
    val c0 = graft.io.AtomicPublish
      .readVersion(spark, base, "centroids", 0L).count()
    val c1 = graft.io.AtomicPublish
      .readVersion(spark, base, "centroids", 1L).count()
    assert(c0 === c1 && c0 > 0)
    // assignment growth across versions equals the arriving batch size
    val a0 = graft.io.AtomicPublish
      .readVersion(spark, base, "assignments", 0L).count()
    val a1 = graft.io.AtomicPublish
      .readVersion(spark, base, "assignments", 1L).count()
    val batch = graft.ops.Similarity.normalized(spark, sf0001)
      .filter(col("vec_id") % 10 === 7).count()
    assert(a1 - a0 === batch)
    // a SECOND session (memo dropped) re-folds idempotently: the version
    // advances, the report and the committed row count do not change
    graft.Memo.dropFamily("ivf_append_persisted")
    val got2 = graft.ops.Ivf.appendCommit(spark, sf0001).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(got2 === want, "re-running a session must not double the batch")
    assert(graft.io.AtomicPublish.versions(spark, base) === Seq(1L, 2L))
    assert(graft.io.AtomicPublish.read(spark, base, "assignments").count()
      === a1)
  }
}
