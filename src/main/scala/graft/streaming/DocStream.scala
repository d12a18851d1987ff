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
