package graft

import org.apache.spark.sql.functions._
import graft.ops.{EventsOps, Multimodal}
import graft.streaming.EventStream

class EventsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionization: per-user sessions cover all events, gaps respected") {
    val sessions = EventsOps.sessions(spark, sf0001).cache()
    val events = Tables.events(spark, sf0001).count()
    assert(sessions.agg(sum("n_events")).head().getLong(0) === events)
    // session bounds ordered
    assert(sessions.filter(col("session_end") < col("session_start")).count() === 0)
    // no session spans a >30min internal gap: a session's span per event
    // is bounded loosely — spot-check that session count > user count
    // (gaps actually split) and every session_seq starts at 1
    assert(sessions.groupBy("user_id").agg(min("session_seq").as("m"))
      .filter(col("m") =!= 1).count() === 0)
  }

  test("moving average equals an independently recomputed trailing mean") {
    val ma = EventsOps.movingAvg(spark, sf0001)
      .select(col("event_type"), col("event_date").cast("string"), col("n"), col("ma7"))
      .as[(String, String, Long, Double)].collect()
    assert(ma.nonEmpty)
    // recompute the ROWS-framed trailing mean per type in plain Scala
    val byType = ma.groupBy(_._1)
    byType.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, _, _, got), i) =>
        val window = sorted.slice(math.max(0, i - 6), i + 1).map(_._3)
        val want = window.sum.toDouble / window.length.toDouble
        assert(got === want)
      }
    }
  }

  test("EWMA equals a driver-side sequential recompute, exactly") {
    val got = EventsOps.ewma(spark, sf0001)
      .select(col("event_type"), col("event_date").cast("string"), col("ewma"))
      .as[(String, String, Double)].collect()
    assert(got.nonEmpty)
    val daily = Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("c"))
      .select(col("event_type"), col("d").cast("string"), col("c"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (t, rows) =>
        t -> rows.map(r => r._2 -> r._3).sortBy(_._1)
      }
    got.groupBy(_._1).foreach { case (t, rows) =>
      val hist = daily(t)
      rows.foreach { case (_, d, e) =>
        val dDate = java.time.LocalDate.parse(d)
        // the same arithmetic, sequentially: integer cents x 2^-k
        val terms = hist.filter { case (hd, _) =>
          val h = java.time.LocalDate.parse(hd)
          !h.isAfter(dDate) &&
            h.isAfter(dDate.minusDays(28))
        }.map { case (hd, c) =>
          val k = java.time.temporal.ChronoUnit.DAYS
            .between(java.time.LocalDate.parse(hd), dDate) + 1
          (c.toDouble * math.pow(2.0, -k.toDouble),
            math.pow(2.0, -k.toDouble))
        }
        val want = terms.map(_._1).sum / terms.map(_._2).sum / 100.0
        assert(e === want, s"EWMA mismatch at ($t, $d)")
      }
    }
  }

  test("gap-fill: dense spine, observed hours intact, gaps carry last value") {
    val g = EventsOps.gapFill(spark, sf0001).cache()
    // dense spine: per type, row count == span between bounds (hours)
    val spans = g.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        ((unix_micros(max("event_hour")) - unix_micros(min("event_hour")))
          / lit(3600000000L) + 1).as("span"))
    assert(spans.filter(col("n") =!= col("span")).count() === 0)
    // real gaps exist at this grain, and every gap is zero-count
    assert(g.filter(col("is_gap")).count() > 0)
    assert(g.filter(col("is_gap") && col("n_events") =!= 0).count() === 0)
    // forward fill: recompute per type in plain Scala
    val rows = g.select(col("event_type"), col("event_hour").cast("long"),
        col("is_gap"), col("value_ffill"))
      .as[(String, Long, Boolean, Option[Double])].collect()
    rows.groupBy(_._1).foreach { case (_, tr) =>
      var last: Option[Double] = None
      tr.sortBy(_._2).foreach { case (_, _, gap, v) =>
        if (!gap) last = v
        assert(v === last) // gap rows must equal the last observation
      }
    }
  }

  test("coverage: island union equals a brute-force interval sweep") {
    val hold = 300000000L
    val got = EventsOps.coverage(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect()
    val byUser = ev.groupBy(_._1)
    assert(got.keySet === byUser.keySet)
    byUser.foreach { case (u, rows) =>
      val iv = rows.map(_._2).sorted.map(s => (s, s + hold))
      // brute-force union sweep
      var islands = 0L
      var covered = 0L
      var curS = 0L
      var curE = Long.MinValue
      iv.foreach { case (s, e) =>
        if (s > curE) {
          if (curE != Long.MinValue) covered += curE - curS
          islands += 1; curS = s; curE = e
        } else curE = math.max(curE, e)
      }
      covered += curE - curS
      val (nIv, nIsl, cov) = got(u)
      assert(nIv === iv.length.toLong)
      assert(nIsl === islands)
      assert(cov === covered)
    }
  }

  test("streaming hourly rollup matches the batch daily totals") {
    // file-source streams watch a directory; stage the table as one
    // arriving file (micro-batch ingestion)
    val dir = java.nio.file.Files.createTempDirectory("stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    EventStream.runToMemory(spark, dir.toString, "stream_hourly").stop()
    val streamed = spark.table("stream_hourly")
    val batchTotal = Tables.events(spark, sf0001).count()
    assert(streamed.agg(sum("n_events")).head().getLong(0) === batchTotal)
    // window starts align to the hour
    assert(streamed.filter(minute(col("window_start")) =!= 0).count() === 0)
    // cross-check one bucket against a batch computation
    val batchBucket = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val joined = streamed.join(batchBucket,
      streamed("window_start") === batchBucket("h") &&
        streamed("event_type") === batchBucket("event_type"))
    assert(joined.filter(col("n_events") =!= col("n")).count() === 0)
    assert(joined.count() === streamed.count())
  }

  test("stateful streaming sessionization agrees with the batch formulation") {
    val dir = java.nio.file.Files.createTempDirectory("stream_sessions")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    EventStream.sessionizeToMemory(spark, dir.toString, "stream_sessions").stop()
    val streamed = spark.table("stream_sessions")
    val batch = EventsOps.sessions(spark, sf0001).cache()

    // append mode emits only CLOSED sessions (watermark at end-of-stream
    // leaves each user's final session open) — so streamed sessions must
    // be a subset of batch sessions, matched on (user, start, end, count)
    val streamedKeys = streamed
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
    val batchKeys = batch
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
    assert(streamedKeys.count() > 0)
    assert(streamedKeys.exceptAll(batchKeys).count() === 0,
      "every closed streaming session must exist identically in batch")
    // and the closed set should be nearly all of them (one open per user)
    val users = batch.select("user_id").distinct().count()
    assert(streamedKeys.count() >= batch.count() - users)
  }

  test("streaming dedup drops within-watermark duplicate event_ids") {
    val dir = java.nio.file.Files.createTempDirectory("stream_dedup")
    // stage the file twice → every event_id arrives (at least) twice
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"), dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"), dir.resolve("b.parquet"))
    val q = EventStream.dedupStream(spark, dir.toString).writeStream
      .format("memory").queryName("stream_dedup").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("stream_dedup")
    val distinctIds = Tables.events(spark, sf0001).count()
    assert(got.count() === distinctIds)
    assert(got.select("event_id").distinct().count() === distinctIds)
  }

  test("stream-static join enriches events with the batch tier dim") {
    val dir = java.nio.file.Files.createTempDirectory("stream_enrich")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"), dir.resolve("events.parquet"))
    val tiers = EventsOps.topUsers(spark, sf0001, k = 5)
      .select(col("user_id"), lit("high").as("tier"))
    val q = EventStream.enriched(spark, dir.toString, tiers).writeStream
      .format("memory").queryName("stream_enriched").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("stream_enriched")
    assert(got.count() === Tables.events(spark, sf0001).count())
    // exactly the top-5 users' events are 'high', everyone else 'standard'
    val topIds = tiers.select("user_id").as[Long].collect().toSet
    assert(got.filter(col("tier") === "high")
      .select("user_id").distinct().as[Long].collect().toSet === topIds)
    assert(got.filter(col("tier").isNull).count() === 0)
  }

  test("stream-stream join emits exactly the batch click→purchase pairs") {
    val got = EventStream.joinCheck(spark, sf0001)
    val ev = Tables.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("click_ts"), col("value"))
    val batch = p.join(c,
        col("user_id") === col("cu") &&
          col("click_ts") < col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .groupBy("purchase_id", "user_id", "purchase_ts")
      .agg(count(lit(1)).as("n_clicks"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .as("click_value"))
    assert(got.count() > 0)
    assert(got.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(got).count() === 0)
  }

  test("KMV sketch: exact below k, bounded error above it") {
    // sf0.01: 150 global users (> k=64) exercises the estimator branch;
    // the merge property itself is proven by the oracle twin, whose 'all'
    // row ranks ALL hashes while the Spark side merges day sketches
    val rows = graft.ops.Sketch.kmvDistinctUsers(spark, "/root/testdata/sf0.01")
      .collect()
    val all = rows.find(_.getString(0) == "all").get
    assert(all.getLong(1) === 150L)
    assert(all.getDouble(2) !== 150.0) // the estimator branch, not exact
    // |rel_err| within ~3x the KMV standard error 1/sqrt(k-2)
    assert(math.abs(all.getDouble(3)) < 0.4)
    // scopes under k report exactly (sketch holds the whole set)
    rows.filter(_.getLong(1) < 64).foreach { r =>
      assert(r.getDouble(2) === r.getLong(1).toDouble)
      assert(r.getDouble(3) === 0.0)
    }
  }

  test("theta set algebra: sketch-only union/intersection track the exact sets") {
    val rows = graft.ops.Sketch.kmvSetOps(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue(), r.getDecimal(3).doubleValue())).toMap
    // exact columns obey set algebra: |A∪B| = |A| + |B| − |A∩B|
    assert(rows("union")._1 ===
      rows("purchase")._1 + rows("click")._1 - rows("intersection")._1)
    // the fixture's user-day sets overlap partially — all four nonempty,
    // intersection strictly smaller than either input
    assert(rows("intersection")._1 > 0)
    assert(rows("intersection")._1 < math.min(rows("purchase")._1, rows("click")._1))
    // every estimate lands within a loose multiple of the k=64 KMV RSE
    rows.values.foreach { case (_, _, rel) => assert(math.abs(rel) < 0.5) }
  }

  test("HLL sketch: within bound, merge-consistent, raw regime at high cardinality") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Sketch.hllDistinctUsers(spark, "/root/testdata/sf0.01")
    // every scope (30 days + 'all') inside the 3-sigma band
    assert(rows.count() === 31)
    assert(rows.filter(!col("within_bound")).count() === 0)
    // partitioning invariance: content-hash registers + algebraic max
    val dayKeys = Tables.events(spark, "/root/testdata/sf0.01")
      .select(to_date(col("ts")).as("event_date"), col("user_id"))
    val rep = graft.ops.Sketch.hllOf(dayKeys.repartition(7))
    assert(rows.exceptAll(rep).count() === 0 && rep.exceptAll(rows).count() === 0)
    // high-cardinality synthetic frame exercises the RAW harmonic-mean
    // branch (n = 5000 >> 2.5m = 640) and its error bound
    val big = spark.range(5000)
      .select(lit(java.sql.Date.valueOf("2024-01-01")).as("event_date"),
        col("id").as("user_id"))
    val raw = graft.ops.Sketch.hllOf(big)
      .filter(col("scope") === "all").collect().head
    assert(raw.getAs[String]("mode") === "raw")
    assert(raw.getAs[Boolean]("within_bound"))
  }

  test("quantile sketch: rank error within the provable bound, state compressed") {
    import org.apache.spark.sql.functions._
    // sf0.01: ~67 rows per (type, day) > k=16, so the summary genuinely
    // compresses (step ≈ 5) and the error bound genuinely binds
    val q = graft.ops.Sketch.quantileSketch(spark, "/root/testdata/sf0.01")
    assert(q.count() === 15) // 5 types × 3 quantiles
    assert(q.filter(col("rank_err") > col("err_bound")).count() === 0,
      "merged estimate strayed outside the provable rank-error bound")
    // the bound is a small fraction of n — the sketch is useful, not vacuous
    assert(q.filter(col("err_bound") * 10 > col("n")).count() === 0)
    // the estimate is always a real data value (an order statistic)
    assert(q.filter(col("rank_hi") <= col("rank_lo")).count() === 0)
  }

  test("count-min sketch: never under-counts, bound holds, merge == global") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Sketch.cmsUserCounts(spark, "/root/testdata/sf0.01")
      .cache()
    assert(rows.count() > 0)
    // the structural invariant: CMS estimates are always >= truth
    assert(rows.filter(!col("never_under")).count() === 0)
    // the epsilon*N overcount bound (deterministic given the md5 hash)
    assert(rows.filter(!col("within_bound")).count() === 0)
    // partitioning invariance: content hash + algebraic counter sums
    val dayKeys = Tables.events(spark, "/root/testdata/sf0.01")
      .select(to_date(col("ts")).as("event_date"), col("user_id"))
    val rep = graft.ops.Sketch.cmsOf(dayKeys.repartition(7))
    assert(rows.exceptAll(rep).count() === 0 && rep.exceptAll(rows).count() === 0)
    // merge correctness: collapsing the dates to one pseudo-day (a direct
    // global build) yields the same point estimates as the per-day merge
    val collapsed = graft.ops.Sketch.cmsOf(
      dayKeys.withColumn("event_date", lit(java.sql.Date.valueOf("2024-01-01"))))
    assert(rows.exceptAll(collapsed).count() === 0 &&
      collapsed.exceptAll(rows).count() === 0)
  }

  test("trajectories: ordered assembly conserves events and matches sessions") {
    import org.apache.spark.sql.functions._
    val tr = EventsOps.trajectories(spark, sf0001).cache()
    // every event lands in exactly one trajectory
    assert(tr.agg(sum("n_events")).head().getLong(0) ===
      Tables.events(spark, sf0001).count())
    // the sequence length equals the session's event count
    assert(tr.filter(size(split(col("trajectory"), " ")) =!= col("n_events"))
      .count() === 0)
    // (user, session) grain identical to the sessions rollup
    val sess = EventsOps.sessions(spark, sf0001).select("user_id", "session_seq")
    assert(tr.select("user_id", "session_seq").exceptAll(sess).count() === 0 &&
      sess.exceptAll(tr.select("user_id", "session_seq")).count() === 0)
    // ordering is deterministic under repartitioning
    val again = EventsOps.trajectories(spark, sf0001)
    assert(tr.exceptAll(again).count() === 0)
  }

  test("cdc apply: latest wins, tombstones drop keys, changes conserve") {
    import org.apache.spark.sql.functions._
    val state = EventsOps.cdcApply(spark, sf0001).cache()
    val ev = Tables.events(spark, sf0001)
    // surviving keys = users whose LAST event (ts, event_id order) is
    // not an error — recomputed via the window formulation
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val last = ev.withColumn("rk", row_number().over(byUser))
      .filter(col("rk") === 1)
    val expectedSurvivors = last.filter(col("event_type") =!= "error")
      .select("user_id")
    assert(state.select("user_id").exceptAll(expectedSurvivors).count() === 0 &&
      expectedSurvivors.exceptAll(state.select("user_id")).count() === 0)
    // tombstoned keys really are absent
    val tombstoned = last.filter(col("event_type") === "error").count()
    assert(tombstoned > 0, "fixture produced no tombstoned users")
    // n_changes sums to the change-log rows for surviving users
    val expectedChanges = ev.join(expectedSurvivors.distinct(), "user_id").count()
    assert(state.agg(sum("n_changes")).head().getLong(0) === expectedChanges)
  }

  test("streaming cdc fold equals the batch apply exactly") {
    val streamed = graft.streaming.EventStream.cdcStreamCheck(spark, sf0001)
    val batch = EventsOps.cdcApply(spark, sf0001)
    assert(streamed.exceptAll(batch).count() === 0 &&
      batch.exceptAll(streamed).count() === 0,
      "stream-folded CDC state diverged from the batch apply")
  }

  test("streaming hll register fold equals the batch sketch exactly") {
    val streamed = graft.streaming.EventStream.hllStreamCheck(spark, sf0001)
    val batch = graft.ops.Sketch.hllDistinctUsers(spark, sf0001)
    assert(streamed.exceptAll(batch).count() === 0 &&
      batch.exceptAll(streamed).count() === 0,
      "stream-folded registers diverged from the batch sketch")
  }

  test("dashboard text rendering includes all five sections") {
    val out = graft.dq.Dashboard.render(spark, sf0001)
    assert(out.contains("Total checks:"))
    assert(out.contains("Progress: ["))
    assert(out.contains("By check type:"))
    assert(out.contains("Daily trend:"))
    assert(out.contains("Critical issues:"))
    // type table carries the four non-summary check types
    Seq("correctness", "completeness", "consistency", "uniqueness", "validity")
      .foreach(t => assert(out.contains(t), s"missing $t"))
  }

  test("BMP decode recovers the planted pattern from the actual bytes") {
    // in-JVM planted truth, independent of the SQL oracle: encode one
    // image, decode it with ImageIO, and compare EVERY pixel to Pattern
    for (id <- Seq(0L, 7L, 123L, 499L)) {
      val img = Multimodal.Bmp.decode(Multimodal.Bmp.encode(id))
      assert(img.getWidth === Multimodal.Pattern.width(id))
      assert(img.getHeight === Multimodal.Pattern.height(id))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xFF) === Multimodal.Pattern.r(x, y, id))
        assert(((rgb >> 8) & 0xFF) === Multimodal.Pattern.g(x, y, id))
        assert((rgb & 0xFF) === Multimodal.Pattern.b(x, y, id))
      }
    }
  }

  test("image stats come from decoded pixels, one row per media id") {
    val stats = Multimodal.imageStats(spark, sf0001).cache()
    assert(stats.count() === Tables.documents(spark, sf0001).count())
    // mean is exactly sum / (w*h) and bounded to a channel's range
    assert(stats.filter(
      col("r_mean") =!= col("r_sum").cast("double") / (col("width") * col("height"))
    ).count() === 0)
    assert(stats.filter(col("r_mean") < 0 || col("r_mean") > 255).count() === 0)
    // spot-check one row against a direct in-JVM decode
    val row = stats.filter(col("media_id") === 42L).head()
    val img = Multimodal.Bmp.decode(Multimodal.Bmp.encode(42L))
    var rs = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      rs += (img.getRGB(x, y) >> 16) & 0xFF
    assert(row.getAs[Long]("r_sum") === rs)
  }

  test("image resize samples the decoded raster on the NN grid") {
    val r = Multimodal.imageResize(spark, sf0001).cache()
    assert(r.count() === Tables.documents(spark, sf0001).count())
    // 64 sampled pixels bound each channel sum
    assert(r.filter(col("r_sum") < 0 || col("r_sum") > 64L * 255).count() === 0)
    assert(r.filter(col("out_w") =!= 8 || col("out_h") =!= 8).count() === 0)
    // determinism: rerun produces identical sums
    val a = r.orderBy("media_id").limit(5).collect().map(_.toSeq)
    val b = Multimodal.imageResize(spark, sf0001)
      .orderBy("media_id").limit(5).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("frame sampling emits dense frame indices of fixed size") {
    val frames = Multimodal.frameSample(spark, sf0001).cache()
    assert(frames.count() > 0)
    assert(frames.filter(length(col("frame")) =!= 64).count() === 0)
    assert(frames.groupBy("media_id").agg(min("frame_idx").as("m"))
      .filter(col("m") =!= 0).count() === 0)
  }

  test("WAV decode recovers the planted samples via javax.sound") {
    for (id <- Seq(0L, 6L, 123L, 499L)) {
      val (rate, ch, bits, samples) =
        Multimodal.Wav.decode(Multimodal.Wav.encode(id))
      assert(rate === Multimodal.AudioPattern.sampleRate)
      assert(ch === 1); assert(bits === 16)
      assert(samples.length === Multimodal.AudioPattern.nSamples(id))
      samples.zipWithIndex.foreach { case (a, i) =>
        assert(a === Multimodal.AudioPattern.amp(i, id), s"sample $i of id $id")
      }
    }
  }

  test("AVI demux recovers geometry and every planted frame pixel") {
    for (id <- Seq(0L, 5L, 123L, 499L)) {
      val (w, h, frames) = Multimodal.Avi.decode(Multimodal.Avi.encode(id))
      assert(w === Multimodal.VideoPattern.width(id))
      assert(h === Multimodal.VideoPattern.height(id))
      assert(frames.length === Multimodal.VideoPattern.nFrames(id))
      val rowSize = ((w * 3 + 3) / 4) * 4
      frames.zipWithIndex.foreach { case (fb, f) =>
        assert(fb.length === rowSize * h)
        for (y <- 0 until h; x <- 0 until w) {
          val base = (h - 1 - y) * rowSize + x * 3 // bottom-up BGR
          assert((fb(base) & 0xFF) === Multimodal.VideoPattern.b(x, y, f, id))
          assert((fb(base + 1) & 0xFF) === Multimodal.VideoPattern.g(x, y, f, id))
          assert((fb(base + 2) & 0xFF) === Multimodal.VideoPattern.r(x, y, f, id))
        }
      }
    }
  }

  test("perceptual near-dup: every planted twin is found, output stays image-grain") {
    val nd = Multimodal.ahashNearDups(spark, sf0001).cache()
    val docs = Tables.documents(spark, sf0001).select(col("doc_id")).as[Long].collect()
    val twins = docs.filter(_ % 8 == 0)
    // every planted twin id reports its base as a neighbor (and vice versa):
    // the single-pixel perturbation moves ≤ 3 hash bits on this corpus, so
    // the pigeonhole banding guarantee applies
    val found = nd.filter(col("twin_found"))
      .select("media_id").as[Long].collect().toSet
    twins.foreach { id =>
      assert(found.contains(id), s"base $id lost its planted twin")
      assert(found.contains(id + Multimodal.TwinOffset), s"twin of $id not matched back")
    }
    // image-grain output: never more rows than images
    assert(nd.count() <= docs.length + twins.length)
    // hamming verify actually binds: no neighbor above the default cap
    assert(nd.filter(col("min_hamming") > 8).count() === 0)
  }

  test("language confusion matrix conserves the corpus and exposes recall") {
    val c = graft.ops.TextMetrics.langConfusion(spark, sf0001).cache()
    assert(c.agg(sum("n")).head().getLong(0) ===
      Tables.documents(spark, sf0001).count())
    // class shares sum to 1 within each actual language
    val shares = c.groupBy("lang").agg(sum("class_share").as("s"))
      .select("s").as[Double].collect()
    shares.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
    // the predicted label set is drawn from the marker langs + 'und'
    val preds = c.select("predicted_lang").distinct().as[String].collect().toSet
    assert(preds.subsetOf(Set("de", "en", "es", "fr", "und")))
  }

  test("video stats sample every other frame of the demuxed stream") {
    val v = Multimodal.videoStats(spark, sf0001).cache()
    // stride-2 sampling: only even frame indices, always including 0
    assert(v.filter(col("frame_idx") % 2 =!= 0).count() === 0)
    assert(v.filter(col("frame_idx") === 0).count() ===
      Tables.documents(spark, sf0001).count())
    // spot-check one row against a direct in-JVM demux
    val row = v.filter(col("media_id") === 42L && col("frame_idx") === 2).head()
    val id = 42L
    val (w, h, frames) = Multimodal.Avi.decode(Multimodal.Avi.encode(id))
    var gs = 0L
    for (y <- 0 until h; x <- 0 until w)
      gs += Multimodal.VideoPattern.g(x, y, 2, id)
    assert(row.getAs[Long]("g_sum") === gs)
    assert(row.getAs[Int]("n_frames") === frames.length)
  }
}
