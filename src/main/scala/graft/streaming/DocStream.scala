package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming governance: the per-source data card maintained by a
  * `foreachBatch` fold over ARRIVING document batches — the streaming
  * twin of [[graft.ops.Profile.corpusProfileIncremental]], proving the
  * mergeable-state design survives Structured Streaming's delivery
  * model (micro-batches, at-least-once foreachBatch, restarts), not
  * just a planned two-way split.
  *
  * Each micro-batch is projected through the SAME per-doc expressions
  * as the batch card ([[graft.ops.Profile.partialOf]]) and folded into
  * versioned (fingerprint, source, lang)-grain state with the
  * `v<batchId>` + `_committed`-rename protocol of
  * [[EventStream.upsertBatch]] — a replayed batch is skipped, a crash
  * between the two writes re-attempts the same fold, so each batch
  * lands exactly once. The registered check streams the corpus as two
  * batches (even-id docs, then odd-id docs — a delivery and its
  * follow-up), replays the final batch to prove idempotence, and rolls
  * the final state up to the card. The oracle is the full-recompute
  * profile SQL: the streaming path must be invisible in the result.
  *
  * Scale shape per batch: one batch scan + a state-sized keyed merge
  * (shuffle on the 16-byte fingerprint grain) — the corpus is never
  * rescanned; a duplicate arriving in a later delivery still flips the
  * dup count because the fingerprint grain persists in state.
  */
object DocStream {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  private val splitDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Split `documents.parquet` into two single-file deliveries (even ids
    * then odd ids; mtimes t, t+60 s so the file source orders them),
    * once per dir per JVM. Bounded harness work: two filtered writes.
    */
  private[graft] def deliveries(spark: SparkSession, dir: String): String =
    splitDirs.getOrElseUpdate(dir, {
      val docs = graft.Tables.documents(spark, dir)
      val base = java.nio.file.Files
        .createTempDirectory("graft_doc_stream").toFile
      base.deleteOnExit()
      val basePath = new org.apache.hadoop.fs.Path(base.getAbsolutePath)
      val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def writeOne(df: DataFrame, name: String, mtime: Long): Unit = {
        val stage = new org.apache.hadoop.fs.Path(basePath, name + ".stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = fs.listStatus(stage).map(_.getPath)
          .find(_.getName.startsWith("part-"))
          .getOrElse(sys.error(s"no part file under $stage"))
        val out = new org.apache.hadoop.fs.Path(basePath, name)
        fs.rename(part, out)
        fs.delete(stage, true)
        fs.setTimes(out, mtime, -1)
      }
      val t0 = System.currentTimeMillis()
      writeOne(docs.filter(pmod(col("doc_id"), lit(2)) === 0), "a_even.parquet", t0)
      writeOne(docs.filter(pmod(col("doc_id"), lit(2)) === 1), "b_odd.parquet", t0 + 60000)
      // The even-before-odd delivery order (which the dedup survivor rule
      // and its oracle encode) is carried ONLY by these mtimes; fail fast
      // on a filesystem that ignores setTimes instead of letting the
      // survivor rule silently flip to path order.
      val mA = fs.getFileStatus(new org.apache.hadoop.fs.Path(basePath, "a_even.parquet")).getModificationTime
      val mB = fs.getFileStatus(new org.apache.hadoop.fs.Path(basePath, "b_odd.parquet")).getModificationTime
      require(mA < mB,
        s"filesystem ignored setTimes (a=$mA, b=$mB); delivery order would be undefined")
      base.getAbsolutePath
    })

  /** Fold one micro-batch of documents into the versioned profile state
    * under `base` — commit protocol in [[VersionedState]]
    * (version write, then `_committed` swap by rename; replays with
    * batchId ≤ committed are skipped).
    */
  private[graft] def profileBatch(spark: SparkSession,
                                  base: org.apache.hadoop.fs.Path,
                                  batch: DataFrame, batchId: Long): Unit =
    VersionedState.fold(spark, base, batchId) { prev =>
      val delta = graft.ops.Profile.partialOf(batch)
      prev.fold(delta)(graft.ops.Profile.mergeState(_, delta))
    }

  /** Fold one micro-batch into the seen-fingerprint dedup state: the
    * batch's min-doc_id per fingerprint, anti-joined against the state
    * (a fingerprint seen in an EARLIER batch keeps its earlier
    * survivor), unioned in. Commit protocol in [[VersionedState]], same as
    * [[profileBatch]].
    */
  private[graft] def dedupBatch(spark: SparkSession,
                                base: org.apache.hadoop.fs.Path,
                                batch: DataFrame, batchId: Long): Unit =
    VersionedState.fold(spark, base, batchId) { prev =>
      val bmin = batch.select(col("doc_id"),
        md5(graft.ops.TextMetrics.normalized(col("text"))).as("fingerprint"))
        .groupBy("fingerprint").agg(min("doc_id").as("keep_doc"))
      prev.fold(bmin)(p =>
        p.unionByName(bmin.join(p, Seq("fingerprint"), "left_anti")))
    }

  // ---------- streaming NEAR-dedup: probe the LSH index per batch ----------

  /** Read a committed versioned state, None before the first commit. */
  private def stateDf(spark: SparkSession,
                      base: org.apache.hadoop.fs.Path): Option[DataFrame] = {
    val last = VersionedState.committed(spark, base)
    if (last < 0) None
    else Some(spark.read.parquet(
      new org.apache.hadoop.fs.Path(base, s"v$last").toString))
  }

  /** Fold one micro-batch through the streaming near-dedup: the batch's
    * docs are shingled → minhashed → banded, PROBED against the
    * accumulated LSH band index (earlier batches only), candidates are
    * verified by exact Jaccard against the accumulated shingle store,
    * and matches ≥ `threshold` append to the matches state; then the
    * batch's bands and shingles fold into the index/store states.
    *
    * Three versioned states under `base` (`index`, `shingles`,
    * `matches`), each batchId-idempotent via [[VersionedState]]. Every
    * state row carries `since_batch`, and the probe reads only rows
    * with `since_batch < batchId` — so a crash BETWEEN the three folds
    * replays to the identical result regardless of which folds had
    * committed (the batch's own rows, if already folded, are invisible
    * to its replayed probe). Per batch the cost is O(batch shingles +
    * probed bucket occupancy + verified candidate sliver) — the corpus
    * is never rescanned, exactly the [[graft.ops.Dedup.incrementalNearDups]]
    * cost model with the memoized index replaced by streamed state.
    */
  private[graft] def nearDupBatch(spark: SparkSession,
                                  base: org.apache.hadoop.fs.Path,
                                  batch: DataFrame, batchId: Long,
                                  threshold: Double = 0.5): Unit = {
    import graft.ops.Dedup
    val indexBase = new org.apache.hadoop.fs.Path(base, "index")
    val shBase = new org.apache.hadoop.fs.Path(base, "shingles")
    val matchBase = new org.apache.hadoop.fs.Path(base, "matches")
    // batch-derived artifacts (lineage-local, no state dependency)
    val batchSh = Dedup.shinglesFrom(batch)
    val batchBands = Dedup.bandsFrom(Dedup.minhashFrom(batchSh))

    VersionedState.fold(spark, matchBase, batchId) { prevMatches =>
      val earlier = col("since_batch") < batchId
      val prevIdx = stateDf(spark, indexBase).map(_.filter(earlier))
      val prevSh = stateDf(spark, shBase).map(_.filter(earlier))
      val fresh = (prevIdx, prevSh) match {
        case (Some(idx), Some(sh)) =>
          val pairs = batchBands.select(col("band"), col("band_key"),
              col("doc_id").as("doc_a"))
            .join(idx.select(col("band"), col("band_key"),
              col("doc_id").as("doc_b")), Seq("band", "band_key"))
            .select("doc_a", "doc_b").distinct()
          Dedup.verifiedJaccardFrom(
            batchSh.unionByName(sh.select("doc_id", "shingle")), pairs)
            .filter(col("jaccard") >= threshold)
            .select(col("doc_a").as("new_doc"), col("doc_b").as("corpus_doc"),
              col("jaccard").cast("double").as("jaccard"))
        case _ => // first batch: nothing to probe
          batchSh.limit(0).select(col("doc_id").as("new_doc"),
            col("doc_id").as("corpus_doc"), lit(0.0).as("jaccard"))
      }
      prevMatches.fold(fresh)(_.unionByName(fresh))
    }
    VersionedState.fold(spark, indexBase, batchId) { prev =>
      val add = batchBands.withColumn("since_batch", lit(batchId))
      prev.fold(add)(_.unionByName(add))
    }
    VersionedState.fold(spark, shBase, batchId) { prev =>
      val add = batchSh.withColumn("since_batch", lit(batchId))
      prev.fold(add)(_.unionByName(add))
    }
  }

  /** Streaming near-dedup — the composition a continuous ingest actually
    * runs: per arriving delivery, probe the accumulated LSH band index,
    * exact-verify candidates, keep the EARLIER delivery's doc as the
    * corpus survivor (matches are oriented new → corpus). The registered
    * check streams the even-id docs then the odd-id docs (one file per
    * trigger), replays the final batch (states must not move), and
    * returns the accumulated matches. The oracle is the batch near-dup
    * relation restricted to pairs straddling the two deliveries,
    * oriented odd (arrived second) → even (arrived first) — the
    * streaming machinery must be invisible in the result.
    */
  def nearDupsCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_neardups", dir, "stream_neardups") {
      import org.apache.spark.sql.streaming.Trigger
      val in = deliveries(spark, dir)
      val tmpBase = java.nio.file.Files
        .createTempDirectory("graft_stream_neardup").toFile
      tmpBase.deleteOnExit()
      val base = new org.apache.hadoop.fs.Path(tmpBase.getAbsolutePath, "state")
      val ck = new org.apache.hadoop.fs.Path(tmpBase.getAbsolutePath, "ck")
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(base)
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          nearDupBatch(spark, base, batch, batchId)
        }
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val matchBase = new org.apache.hadoop.fs.Path(base, "matches")
      val lastId = VersionedState.committed(spark, matchBase)
      // replay the final delivery: every state's marker must hold still
      val lastFile = fs.listStatus(new org.apache.hadoop.fs.Path(in))
        .sortBy(_.getModificationTime).last.getPath
      nearDupBatch(spark, base,
        spark.read.schema(schema).parquet(lastFile.toString), lastId)
      require(VersionedState.committed(spark, matchBase) == lastId,
        "replayed batch mutated the matches state")
      spark.read.parquet(
        new org.apache.hadoop.fs.Path(matchBase, s"v$lastId").toString)
    }

  /** The batch near-dup relation restricted to delivery-straddling
    * pairs, oriented second-delivery → first-delivery (same shape as
    * [[graft.ops.Dedup.incrementalSql]] with parity as the membership).
    */
  val nearDupsCheckSql: String =
    s"""WITH nd AS (
       |${graft.ops.Dedup.nearDupsSql(0.5)}
       |)
       |SELECT CASE WHEN doc_a % 2 = 1 THEN doc_a ELSE doc_b END AS new_doc,
       |       CASE WHEN doc_a % 2 = 1 THEN doc_b ELSE doc_a END AS corpus_doc,
       |       CAST(jaccard AS DOUBLE) AS jaccard
       |FROM nd
       |WHERE (doc_a % 2) <> (doc_b % 2)""".stripMargin

  /** Streaming cross-batch exact dedup — continuous-ingestion dedup as a
    * production pipeline runs it: per arriving delivery, new fingerprints
    * claim a survivor (the batch's min doc_id); fingerprints already in
    * state keep their earlier survivor, so a duplicate arriving in a
    * later delivery is dropped against state, not against a corpus
    * rescan. Spark's built-in `dropDuplicates` on an unbounded stream
    * would hold every key in executor state forever with no event-time
    * bound; this externalized fingerprint table IS that state, mergeable
    * and restart-safe via the commit protocol. The oracle replays the
    * arrival rule in SQL: survivor = min even-half doc_id when the
    * fingerprint has an even-half copy (delivery 1), else min odd-half
    * doc_id. Per batch: one map-side-combined min per fingerprint + one
    * state-sized anti-join — O(batch + state), never O(corpus²).
    */
  def dedupCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_dedup_docs", dir, "stream_dedup_docs") {
      import org.apache.spark.sql.streaming.Trigger
      val in = deliveries(spark, dir)
      val tmpBase = java.nio.file.Files
        .createTempDirectory("graft_stream_docdedup").toFile
      tmpBase.deleteOnExit()
      val state = new org.apache.hadoop.fs.Path(tmpBase.getAbsolutePath, "state")
      val ck = new org.apache.hadoop.fs.Path(tmpBase.getAbsolutePath, "ck")
      val fs = state.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(state)
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          dedupBatch(spark, state, batch, batchId)
        }
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val lastId = {
        val s = fs.open(new org.apache.hadoop.fs.Path(state, "_committed"))
        try s.readLong() finally s.close()
      }
      spark.read
        .parquet(new org.apache.hadoop.fs.Path(state, s"v$lastId").toString)
    }

  val dedupCheckSql: String =
    """WITH fp AS (
      |  SELECT doc_id,
      |         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
      |  FROM documents
      |), ev AS (
      |  SELECT fingerprint, MIN(doc_id) AS keep FROM fp WHERE doc_id % 2 = 0 GROUP BY 1
      |), od AS (
      |  SELECT fingerprint, MIN(doc_id) AS keep FROM fp WHERE doc_id % 2 = 1 GROUP BY 1
      |)
      |SELECT f.fingerprint, COALESCE(e.keep, o.keep) AS keep_doc
      |FROM (SELECT DISTINCT fingerprint FROM fp) f
      |LEFT JOIN ev e USING (fingerprint)
      |LEFT JOIN od o USING (fingerprint)""".stripMargin

  /** The registered check: stream the two deliveries one file per
    * trigger through the fold, replay the last batch (the committed
    * marker must not move), and roll the final state up to the card.
    */
  def profileCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_profile", dir, "stream_profile") {
      import org.apache.spark.sql.streaming.Trigger
      val in = deliveries(spark, dir)
      val tmpBase = java.nio.file.Files
        .createTempDirectory("graft_stream_profile").toFile
      tmpBase.deleteOnExit()
      val state = new org.apache.hadoop.fs.Path(tmpBase.getAbsolutePath, "state")
      val ck = new org.apache.hadoop.fs.Path(tmpBase.getAbsolutePath, "ck")
      val fs = state.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(state)
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          profileBatch(spark, state, batch, batchId)
        }
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      def committed(): Long = {
        val s = fs.open(new org.apache.hadoop.fs.Path(state, "_committed"))
        try s.readLong() finally s.close()
      }
      val lastId = committed()
      val versions = fs.listStatus(state).count(_.getPath.getName.startsWith("v"))
      val lastFile = fs.listStatus(new org.apache.hadoop.fs.Path(in))
        .sortBy(_.getModificationTime).last.getPath
      profileBatch(spark, state,
        spark.read.schema(schema).parquet(lastFile.toString), lastId)
      require(committed() == lastId &&
        fs.listStatus(state).count(_.getPath.getName.startsWith("v")) == versions,
        "replayed batch mutated the profile state")
      graft.ops.Profile.cardFromState(
        spark.read.parquet(new org.apache.hadoop.fs.Path(state, s"v$lastId").toString))
    }
}
