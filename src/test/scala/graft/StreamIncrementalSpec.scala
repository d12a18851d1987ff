package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Multi-micro-batch watermark proofs: the incremental harnesses must
  * demonstrate watermark semantics, not merely equal the batch result —
  * late rows dropped (day-old clicks arriving in the third micro-batch)
  * and trailing windows withheld (not yet finalized at end of input).
  */
class StreamIncrementalSpec extends SparkSpec {

  test("profile fold recovers across query restarts on one checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    val docs = Tables.documents(spark, sf0001)
    val base = java.nio.file.Files.createTempDirectory("doc_restart").toFile
    val fs = new org.apache.hadoop.fs.Path(base.getAbsolutePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new org.apache.hadoop.fs.Path(base.getAbsolutePath, "in")
    val state = new org.apache.hadoop.fs.Path(base.getAbsolutePath, "state")
    val ck = new org.apache.hadoop.fs.Path(base.getAbsolutePath, "ck")
    fs.mkdirs(in); fs.mkdirs(state)
    def deliver(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = new org.apache.hadoop.fs.Path(base.getAbsolutePath, name + ".stage")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = fs.listStatus(stage).map(_.getPath)
        .find(_.getName.startsWith("part-")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(in, name))
      fs.delete(stage, true)
    }
    def lifetime(): Unit = {
      val q = spark.readStream.schema(graft.streaming.DocStream.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          graft.streaming.DocStream.profileBatch(spark, state, batch, batchId)
        }
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def committed(): Long = {
      val s = fs.open(new org.apache.hadoop.fs.Path(state, "_committed"))
      try s.readLong() finally s.close()
    }
    // lifetime 1 sees only the first delivery, then "crashes"
    deliver(docs.filter(pmod(col("doc_id"), lit(2)) === 0), "a_even.parquet")
    lifetime()
    val afterFirst = committed()
    // the second delivery arrives; a NEW query on the same checkpoint
    // must skip the processed file and fold only the new one
    deliver(docs.filter(pmod(col("doc_id"), lit(2)) === 1), "b_odd.parquet")
    lifetime()
    assert(committed() > afterFirst, "restart did not fold the new delivery")
    // a third lifetime with no new input must not move the state
    val settled = committed()
    lifetime()
    assert(committed() === settled, "empty restart mutated the state")
    // the recovered card equals the batch recompute exactly
    val card = graft.ops.Profile.cardFromState(
      spark.read.parquet(new org.apache.hadoop.fs.Path(state, s"v$settled").toString))
    val full = graft.ops.Profile.corpusProfile(spark, sf0001)
    assert(card.exceptAll(full).count() === 0)
    assert(full.exceptAll(card).count() === 0)
  }

  test("versioned state recovers a missing commit marker and prunes old versions") {
    import graft.streaming.VersionedState
    val base = new org.apache.hadoop.fs.Path(
      java.nio.file.Files.createTempDirectory("vstate").toString)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    VersionedState.fold(spark, base, 0L) { _ => spark.range(3).toDF("id") }
    VersionedState.fold(spark, base, 1L) { prev =>
      prev.get.union(spark.range(3, 5).toDF("id"))
    }
    assert(VersionedState.committed(spark, base) === 1L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(base, "v0")),
      "superseded version was not pruned")
    // simulate the legacy crash window: marker lost after v1 completed
    fs.delete(new org.apache.hadoop.fs.Path(base, "_committed"), false)
    assert(VersionedState.committed(spark, base) === 1L,
      "missing marker must recover from the completed v-dir, not restart at -1")
    // a replayed batch is still skipped after recovery (no data loss, no refold)
    VersionedState.fold(spark, base, 1L) { _ =>
      fail("replayed batch must be skipped")
    }
    assert(spark.read.parquet(
      new org.apache.hadoop.fs.Path(base, "v1").toString).count() === 5)
  }

  test("incremental hourly rollup drops late rows and withholds open windows") {
    val inc = EventStream.hourlyIncrementalCheck(spark, sf0001)
    val full = Tables.events(spark, sf0001)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n_events"))

    // at least one trailing window withheld: the full rollup has groups
    // past the final watermark that the incremental run never emitted
    val maxEnd = full.agg(max("window_end")).head().getTimestamp(0)
    assert(inc.filter(col("window_end") === maxEnd).count() === 0,
      "the window containing the max event time can never be finalized")
    assert(inc.count() < full.count())

    // at least one late row dropped: some emitted (window, type) group
    // has FEWER events than the full rollup — the late click sample is
    // missing from finalized windows, not merely deferred
    val fewer = inc.as("i")
      .join(full.as("f"), Seq("window_start", "event_type"))
      .filter(col("i.n_events") < col("f.n_events"))
    assert(fewer.count() > 0, "no window lost its late rows")

    // and nothing was invented: every emitted group is ≤ its batch twin
    val more = inc.as("i")
      .join(full.as("f"), Seq("window_start", "event_type"), "left")
      .filter(col("f.n_events").isNull || col("i.n_events") > col("f.n_events"))
    assert(more.count() === 0)
  }

  test("upsert sink merges the late batch and equals the whole-input aggregate") {
    val got = EventStream.upsertCheck(spark, sf0001)
    val expected = Tables.events(spark, sf0001)
      .groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total_value"))
    // the upsert sink is late-tolerant: unlike the append-mode rollup it
    // must NOT lose the late file's rows — exact equality with batch
    assert(got.count() === expected.count())
    val diverged = got.as("g").join(expected.as("e"), Seq("user_id"), "full_outer")
      .filter(col("g.n_events") =!= col("e.n_events") ||
        col("g.total_value") =!= col("e.total_value") ||
        col("g.n_events").isNull || col("e.n_events").isNull)
    assert(diverged.count() === 0)
  }

  test("incremental stream-stream join drops at least one late-click pair") {
    val inc = EventStream.joinIncrementalCheck(spark, sf0001)
    val full = EventStream.joinCheck(spark, sf0001)
    val incClicks = inc.agg(sum("n_clicks")).head().getLong(0)
    val fullClicks = full.agg(sum("n_clicks")).head().getLong(0)
    assert(incClicks < fullClicks,
      s"no pair was dropped (incremental $incClicks vs full $fullClicks)")
    // dropped pairs only ever REMOVE clicks from a purchase, never add
    val more = inc.as("i")
      .join(full.as("f"), Seq("purchase_id"), "left")
      .filter(col("f.n_clicks").isNull || col("i.n_clicks") > col("f.n_clicks"))
    assert(more.count() === 0)
  }
}
