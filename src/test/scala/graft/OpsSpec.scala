package graft

import org.apache.spark.sql.functions._
import graft.ops.{Contamination, Dedup, Sampling, SimHash, Similarity, TextMetrics, TextPrep}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("near-dup pipeline finds high-jaccard pairs, never all-pairs") {
    val pairs = Dedup.nearDups(spark, sf0001).cache()
    val n = pairs.count()
    assert(n > 0, "testdata contains planted near-duplicates")
    // every surviving pair is genuinely similar
    assert(pairs.filter(col("jaccard") < 0.5).count() === 0)
    // candidate set is tiny relative to n^2 (LSH, not all-pairs)
    val docs = Tables.documents(spark, sf0001).count()
    assert(Dedup.candidates(spark, sf0001).count() < docs * 5)
  }

  test("canonical assignment: valid union-find labeling of near-dup components") {
    val canon = graft.ops.Dedup.canonical(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    val pairs = graft.ops.Dedup.nearDups(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(canon.nonEmpty)
    // canonical is the component minimum: ≤ member, and itself canonical
    canon.foreach { case (doc, c) =>
      assert(c <= doc)
      assert(canon(c) === c, s"canonical $c of $doc is not its own canonical")
    }
    // both endpoints of every near-dup pair share a canonical
    pairs.foreach { case (a, b) =>
      assert(canon(a) === canon(b), s"pair ($a,$b) split across components")
    }
  }

  test("repetition signals are valid fractions; planted dups repeat hardest") {
    val rep = TextMetrics.repetition(spark, sf0001).cache()
    assert(rep.count() > 0)
    // each ratio is a fraction in [0,1]; top-word ≥ 1/total by pigeonhole
    assert(rep.filter(
      col("top_word_frac") < lit(1.0) / col("total_words") ||
        col("top_word_frac") > 1.0 ||
        col("top_bigram_frac") <= 0.0 || col("top_bigram_frac") > 1.0 ||
        col("dup_trigram_frac") < 0.0 || col("dup_trigram_frac") >= 1.0).count() === 0)
    rep.unpersist()
  }

  test("contamination: eval docs excluded; overlap bounded by n-gram count") {
    val rep = graft.ops.Contamination.report(spark, sf0001).cache()
    assert(rep.count() > 0)
    assert(rep.filter(col("doc_id") % graft.ops.Contamination.evalMod === 0).count() === 0)
    assert(rep.filter(col("n_overlap") > col("n_ngrams")).count() === 0)
    // the flag is exactly overlap > 0
    assert(rep.filter((col("n_overlap") > 0) =!= col("contaminated")).count() === 0)
    rep.unpersist()
  }

  test("as-of join: latest right at-or-before left ts; one shuffle, no range explosion") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000)
    val left = Seq((10L, 1L, t(100), 5.0), (11L, 1L, t(200), 6.0), (12L, 2L, t(50), 7.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq((1L, 1L, t(100), 1.0), (2L, 1L, t(150), 2.0), (3L, 3L, t(10), 3.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = graft.ops.AsofJoin.asof(left, right, "user_id", "ts", "event_id",
      Seq("value"), "r_").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
    assert(out === Map(10L -> 1L, // equal ts matches (>= semantics)
      11L -> 2L,                  // latest prior, not first
      12L -> -1L))                // no right row for the key → null
    // plan shape: a window over one exchange, not a non-equi join
    val plan = graft.ops.AsofJoin.purchaseAttribution(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("binned range join: exact point-in-interval counts, no nested-loop join") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000)
    // intervals crossing bin boundaries (bin = 10s) and an empty one
    val ivs = Seq((1L, t(5), t(25)), (2L, t(8), t(9)), (3L, t(100), t(200)))
      .toDF("iv_id", "s", "e")
    val pts = Seq(t(5), t(10), t(25), t(26), t(8)).toDF("ts")
    val out = graft.ops.RangeJoin
      .binnedCount(pts, "ts", ivs, "s", "e", Seq("iv_id"), binSeconds = 10L)
      .select("iv_id", "n_points").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 4L, 2L -> 1L, 3L -> 0L))
    val plan = graft.ops.RangeJoin.sessionErrorLoad(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("corpus filter: covers every doc once; dropped near-dup members keep their canonical") {
    val rep = graft.ops.CorpusFilter.report(spark, sf0001).cache()
    assert(rep.count() === Tables.documents(spark, sf0001).count())
    assert(rep.select("doc_id").distinct().count() === rep.count())
    // every verified near-dup component contributes exactly one kept doc
    val canon = graft.ops.Dedup.canonical(spark, sf0001)
      .select(col("canonical_id")).distinct().count()
    val keptCanonicals = rep.join(
        graft.ops.Dedup.canonical(spark, sf0001), "doc_id")
      .filter(col("keep")).count()
    assert(keptCanonicals === canon,
      "each component keeps exactly its canonical member")
    rep.unpersist()
  }

  test("mixture sampling: tier-1 sources fully kept, rates match tiers") {
    val m = graft.ops.Sampling.mixture(spark, sf0001).cache()
    val docs = Tables.documents(spark, sf0001)
    val tier1 = docs.filter(expr("CAST(substring(source, 4) AS INT) < 5"))
    // rate 1.0 ⇒ u < 1.0 always: every tier-1 doc is in the mixture
    assert(m.filter(col("mix_rate") === 1.0).count() === tier1.count())
    // rate column is a pure function of the source tier
    assert(m.filter(
      (expr("CAST(substring(source, 4) AS INT) < 5") && col("mix_rate") =!= 1.0) ||
      (expr("CAST(substring(source, 4) AS INT) BETWEEN 5 AND 9") && col("mix_rate") =!= 0.5) ||
      (expr("CAST(substring(source, 4) AS INT) >= 10") && col("mix_rate") =!= 0.2)
    ).count() === 0)
    m.unpersist()
  }

  test("temperature mixing flattens the source distribution toward the budget") {
    val t = graft.ops.Sampling.temperatureMixture(spark, sf0001).cache()
    val rows = t.collect()
    // weights are a distribution that preserves the size ORDER but
    // flattens the RATIOS: w_i/w_j = sqrt(p_i/p_j), so the head/tail
    // ratio provably shrinks (the defining property of alpha < 1)
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-9)
    val byP = rows.sortBy(_.getAs[Double]("p_raw"))
    assert(byP.map(_.getAs[Double]("weight")).sliding(2).forall(w => w(0) <= w(1)))
    val pr = byP.map(_.getAs[Double]("p_raw"))
    val wr = byP.map(_.getAs[Double]("weight"))
    assert(wr.last / wr.head < pr.last / pr.head,
      s"ratio not flattened: ${wr.last / wr.head} vs ${pr.last / pr.head}")
    // realized kept tokens land near the 30% budget (hash concentration)
    val totTok = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val keptTok = rows.map(_.getAs[Long]("kept_tokens")).sum.toDouble
    assert(keptTok / totTok > 0.2 && keptTok / totTok < 0.45,
      s"kept ${keptTok / totTok} of tokens vs 0.3 budget")
    t.unpersist()
  }

  test("epoch shuffle: per-epoch permutations are dense, distinct, re-shard stable") {
    val e = graft.ops.Sampling.epochShuffle(spark, sf0001).cache()
    val n = Tables.documents(spark, sf0001).count()
    // each epoch covers every doc exactly once
    assert(e.groupBy("epoch").count().filter(col("count") =!= n).count() === 0)
    // positions are dense within each (epoch, shard)
    assert(e.groupBy("epoch", "shard").agg(
      count(lit(1)).as("n"), max("pos").as("mx"))
      .filter(col("n") =!= col("mx")).count() === 0)
    // the two epochs are different permutations: some doc changes shard
    // or position (md5 decorrelation makes identical assignment absurd)
    val e0 = e.filter(col("epoch") === 0).select("doc_id", "shard", "pos")
    val e1 = e.filter(col("epoch") === 1).select("doc_id", "shard", "pos")
    assert(e0.exceptAll(e1).count() > 0)
    // determinism under re-partitioning: same output from a 7-way reshard
    val again = graft.ops.Sampling.epochShuffle(spark, sf0001)
    assert(e.exceptAll(again).count() === 0 && again.exceptAll(e).count() === 0)
    e.unpersist()
  }

  test("PII redaction scrubs planted emails/phones/ids and nothing else") {
    val planted = Seq(
      "mail me at jane.doe+spam@example.co.uk today",
      "call 555-867-5309 or 555.867.5309",
      "ssn 123-45-6789 on file",
      "clean text stays byte-identical").toDF("text")
    val out = planted.select(graft.ops.Redact.redacted(col("text")).as("r"))
      .as[String].collect()
    assert(out(0) === "mail me at [EMAIL] today")
    assert(out(1) === "call [PHONE] or [PHONE]")
    assert(out(2) === "ssn [ID] on file")
    assert(out(3) === "clean text stays byte-identical")
  }

  test("corpus profile: volumes conserve, dup and lang columns consistent") {
    val prof = graft.ops.Profile.corpusProfile(spark, sf0001).cache()
    val docs = Tables.documents(spark, sf0001).cache()
    // every source appears exactly once and doc counts conserve
    assert(prof.count() === docs.select("source").distinct().count())
    assert(prof.agg(sum("n_docs")).head().getLong(0) === docs.count())
    // dup_docs is bounded by n_docs and globally matches the exact-dup set
    assert(prof.filter(col("dup_docs") > col("n_docs")).count() === 0)
    val fp = TextMetrics.fingerprint(spark, sf0001)
    val expectDups = fp.groupBy("fingerprint").count().filter(col("count") > 1)
      .agg(coalesce(sum("count"), lit(0L))).head().getLong(0)
    assert(prof.agg(sum("dup_docs")).head().getLong(0) === expectDups)
    // top_lang is one of the predicted langs of that source's docs
    val langs = docs.select("doc_id", "source")
      .join(TextMetrics.langId(spark, sf0001), "doc_id")
      .select("source", "predicted_lang").distinct()
      .as[(String, String)].collect().groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    prof.select("source", "top_lang").as[(String, String)].collect().foreach {
      case (s, l) => assert(langs(s).contains(l), s"top_lang $l not predicted in $s")
    }
  }

  test("pii stats: planted PII counted per source, clean corpus all zero") {
    val dir = java.nio.file.Files.createTempDirectory("pii_docs")
    Seq(
      (1L, "mail jane@example.com or bob@test.org", "en", "web", 1L),
      (2L, "call 555-867-5309", "en", "web", 1L),
      (3L, "ssn 123-45-6789 and mail a@b.io", "en", "books", 1L),
      (4L, "nothing sensitive here", "en", "books", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Redact.piiStats(spark, dir.toString)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got === Array(
      ("books", 2L, 1L, 0L, 1L, 1L),
      ("web", 2L, 2L, 1L, 0L, 2L)))
    // the shipped corpus is PII-free: the registered query proves parity,
    // this proves the zeros are genuine
    val corpus = graft.ops.Redact.piiStats(spark, sf0001)
    assert(corpus.filter(col("n_emails") + col("n_phones") + col("n_ids") > 0)
      .count() === 0)
  }

  test("keep-best dedup: keeper is the max-quality member of each cluster") {
    val canon = graft.ops.Dedup.canonical(spark, sf0001)
    val q = TextMetrics.quality(spark, sf0001).select("doc_id", "quality_score")
    val best = graft.ops.Dedup.keepBest(spark, sf0001).cache()
    // one keeper per cluster, member counts match the assignment
    val sizes = canon.groupBy("canonical_id").count()
    val j = best.join(sizes, "canonical_id")
    assert(j.count() === sizes.count())
    assert(j.filter(col("n_members") =!= col("count")).count() === 0)
    // no member of the cluster beats its keeper on (quality, -doc_id)
    val members = canon.join(q, "doc_id")
    val viol = members.join(best, "canonical_id")
      .filter(col("quality_score") > col("keep_quality") ||
        (col("quality_score") === col("keep_quality") && col("doc_id") < col("keep_doc")))
    assert(viol.count() === 0)
  }

  test("curated-corpus export reloads exactly the kept documents") {
    val exported = graft.ops.CorpusFilter.export(spark, sf0001)
    val kept = graft.ops.CorpusFilter.report(spark, sf0001).filter(col("keep"))
      .join(Tables.documents(spark, sf0001), "doc_id")
      .groupBy("source").agg(count(lit(1)).as("n"), sum("doc_id").as("s"))
    val j = exported.join(kept, "source")
    assert(j.count() === exported.count() && j.count() === kept.count())
    assert(j.filter(col("n_docs") =!= col("n") || col("sum_ids") =!= col("s"))
      .count() === 0)
  }

  test("cluster-size histogram conserves members and clusters") {
    val cs = graft.ops.Dedup.clusterSizes(spark, sf0001).cache()
    val canon = graft.ops.Dedup.canonical(spark, sf0001)
    assert(cs.select(sum(col("cluster_size") * col("n_clusters"))).head().getLong(0)
      === canon.count())
    assert(cs.agg(sum("n_clusters")).head().getLong(0) ===
      canon.select("canonical_id").distinct().count())
    // near-dup components always have ≥ 2 members
    assert(cs.filter(col("cluster_size") < 2).count() === 0)
  }

  test("per-source contamination rollup conserves the per-doc report") {
    val rep = Contamination.report(spark, sf0001).cache()
    val by = graft.ops.Contamination.bySource(spark, sf0001).cache()
    assert(by.agg(sum("n_docs")).head().getLong(0) === rep.count())
    assert(by.agg(sum("n_contaminated")).head().getLong(0) ===
      rep.filter(col("contaminated")).count())
    assert(by.filter(col("contaminated_rate") < 0.0 ||
      col("contaminated_rate") > 1.0).count() === 0)
  }

  test("stickiness: dau ≤ mau, ratio in (0,1], identity on a single day") {
    val st = graft.ops.EventsOps.stickiness(spark, sf0001).cache()
    assert(st.count() > 0)
    assert(st.filter(col("dau") > col("mau28")).count() === 0)
    assert(st.filter(col("stickiness") <= 0.0 || col("stickiness") > 1.0).count() === 0)
    // the FIRST active day's window contains only itself ⇒ dau == mau
    val first = st.orderBy("event_date").limit(1)
      .select(col("dau") === col("mau28")).head().getBoolean(0)
    assert(first, "first day's trailing window must equal its own dau")
  }

  test("source overlap matrix partitions the near-dup pairs exactly") {
    val nd = graft.ops.Dedup.nearDups(spark, sf0001)
    val ov = graft.ops.Dedup.sourceOverlap(spark, sf0001).cache()
    // every pair lands in exactly one unordered source cell
    assert(ov.agg(sum("n_pairs")).head().getLong(0) === nd.count())
    assert(ov.filter(col("source_x") > col("source_y")).count() === 0)
    assert(ov.filter(col("max_jaccard") < 0.5 || col("max_jaccard") > 1.0).count() === 0)
  }

  test("skew report identities hold against the exact key counts") {
    val r = graft.ops.Salting.skewReport(spark, sf0001)
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    val (nRows, nKeys, maxCnt, top10, t1, t10, avg) = r
    val counts = Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("cnt")).cache()
    assert(nRows === Tables.events(spark, sf0001).count())
    assert(nKeys === counts.count())
    assert(maxCnt === counts.agg(max("cnt")).head().getLong(0))
    assert(top10 >= maxCnt && top10 <= nRows)
    assert(t1 === maxCnt.toDouble / nRows)
    assert(t10 === top10.toDouble / nRows)
    assert(avg === nRows.toDouble / nKeys)
  }

  test("shingle drift: identities vs the raw shingle table, jaccard in [0,1]") {
    val d = graft.ops.Dedup.shingleDrift(spark, sf0001).cache()
    assert(d.filter(col("jaccard") < 0.0 || col("jaccard") > 1.0).count() === 0)
    assert(d.filter(col("common_shingles") > col("union_shingles")).count() === 0)
    // union identity per source against an independent computation
    val sh = graft.ops.Dedup.shingles(spark, sf0001)
      .join(Tables.documents(spark, sf0001).select("doc_id", "source"), "doc_id")
    val expect = sh.select("source", "shingle").distinct()
      .groupBy("source").agg(count(lit(1)).as("u"))
    val j = d.join(expect, "source")
    assert(j.filter(col("union_shingles") =!= col("u")).count() === 0)
    assert(j.count() === d.count())
  }

  test("incremental corpus profile equals the full recompute exactly") {
    val full = graft.ops.Profile.corpusProfile(spark, sf0001)
    val inc = graft.ops.Profile.corpusProfileIncremental(spark, sf0001)
    // exact equality including the decimal-grid avg: maintenance must be
    // invisible in the result
    assert(inc.exceptAll(full).count() === 0)
    assert(full.exceptAll(inc).count() === 0)
    assert(inc.count() === full.count())
  }

  test("embedding coverage matches an independent anti-join") {
    val cov = graft.ops.Similarity.coverage(spark, sf0001).cache()
    assert(cov.agg(sum("n_docs")).head().getLong(0) ===
      Tables.documents(spark, sf0001).count())
    val missing = Tables.documents(spark, sf0001).select("doc_id")
      .join(Tables.embeddings(spark, sf0001)
        .select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_anti")
      .count()
    assert(cov.agg(sum("n_missing")).head().getLong(0) === missing)
    assert(cov.filter(col("coverage") < 0.0 || col("coverage") > 1.0).count() === 0)
  }

  test("aHash: 64 bits, set-count consistent, discriminative across images") {
    val h = graft.ops.Multimodal.imageAHash(spark, sf0001).cache()
    assert(h.count() === Tables.documents(spark, sf0001).count())
    assert(h.filter(length(col("ahash")) =!= 64).count() === 0)
    // n_set is the number of '1' characters in the hash
    assert(h.filter(col("n_set") =!=
      (length(col("ahash")) - length(regexp_replace(col("ahash"), "1", ""))))
      .count() === 0)
    // the planted patterns vary per id: hashes must be largely distinct
    // (a constant hash would also pass the oracle — this is the guard)
    val n = h.count()
    assert(h.select("ahash").distinct().count() > n / 2,
      "aHash is not discriminating between distinct images")
  }

  test("PNG leg: payload is a real compressed PNG and round-trips the raster") {
    // genuine codec: magic bytes + the payload is NOT the raw raster
    val p = graft.ops.Multimodal.Png.encode(7L)
    assert(p.take(8).toSeq === Seq(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte), "missing PNG signature")
    val img = graft.ops.Multimodal.Bmp.decode(p)
    val (w, h) = (img.getWidth, img.getHeight)
    assert(w === graft.ops.Multimodal.Pattern.width(7L))
    assert(h === graft.ops.Multimodal.Pattern.height(7L))
    // lossless round trip: every decoded pixel equals the planted pattern
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF) === graft.ops.Multimodal.Pattern.r(x, y, 7L))
      assert(((rgb >> 8) & 0xFF) === graft.ops.Multimodal.Pattern.g(x, y, 7L))
      assert((rgb & 0xFF) === graft.ops.Multimodal.Pattern.b(x, y, 7L))
    }
    // and the distributed stats over PNG equal the BMP leg exactly
    val png = graft.ops.Multimodal.pngStats(spark, sf0001)
    val bmp = graft.ops.Multimodal.imageStats(spark, sf0001)
    assert(png.exceptAll(bmp).count() === 0)
    assert(bmp.exceptAll(png).count() === 0)
  }

  test("JPEG leg: payload is a real lossy JPEG, dims survive, means bounded") {
    import graft.ops.Multimodal
    val ids = Seq(1L, 7L, 42L)
    ids.foreach { id =>
      val payload = Multimodal.Jpeg.encode(id)
      // JFIF magic: a real JPEG container, not a renamed raster
      assert((payload(0) & 0xFF) === 0xFF && (payload(1) & 0xFF) === 0xD8)
      val img = Multimodal.Bmp.decode(payload)
      assert(img.getWidth === Multimodal.Pattern.width(id))
      assert(img.getHeight === Multimodal.Pattern.height(id))
      // genuinely lossy: at least one pixel differs from the planted
      // raster (else this is the PNG leg in disguise)
      val anyDiff = (0 until img.getHeight).exists { y =>
        (0 until img.getWidth).exists { x =>
          val rgb = img.getRGB(x, y)
          ((rgb >> 16) & 0xFF) != Multimodal.Pattern.r(x, y, id) ||
            ((rgb >> 8) & 0xFF) != Multimodal.Pattern.g(x, y, id) ||
            (rgb & 0xFF) != Multimodal.Pattern.b(x, y, id)
        }
      }
      assert(anyDiff, s"JPEG decode of id=$id reproduced the raster exactly")
    }
    // the registered check passes end-to-end on the sf0.001 corpus
    val chk = Multimodal.jpegCheck(spark, sf0001)
    assert(chk.filter(!col("r_ok") || !col("g_ok") || !col("b_ok")).count() === 0)
  }

  test("audio fingerprint: window count matches clip length, bits consistent") {
    val h = graft.ops.Multimodal.audioFingerprint(spark, sf0001).cache()
    assert(h.count() === Tables.documents(spark, sf0001).count())
    // hash length == declared window count == clip-length formula
    assert(h.filter(length(col("ehash")) =!= col("n_windows")).count() === 0)
    assert(h.filter(col("n_windows") =!=
      ((lit(256) + pmod(col("media_id"), lit(7)) * 64) / 64).cast("int")).count() === 0)
    assert(h.filter(col("n_set") =!=
      (length(col("ehash")) - length(regexp_replace(col("ehash"), "1", ""))))
      .count() === 0)
    // semantics on structured input (the planted corpus is uniform noise
    // whose window energies are honestly near-constant, so discrimination
    // is proven on crafted clips instead): loud windows set their bit,
    // quiet windows clear it, exactly
    val win = 64
    def clip(pattern: String): Array[Int] =
      pattern.toCharArray.flatMap(c => Array.fill(win)(if (c == 'L') 1000 else 1))
    Seq(
      "LQQQ" -> "1000",
      "QLLQ" -> "0110",
      "LLLL" -> "0000", // all-equal energies: no window EXCEEDS the mean
      "QQQL" -> "0001"
    ).foreach { case (p, expect) =>
      val (nw, hash, ones) = graft.ops.Multimodal.energyBits(clip(p), win)
      assert(nw === p.length)
      assert(hash === expect, s"pattern $p")
      assert(ones === expect.count(_ == '1'))
    }
  }

  test("quality-weighted sample tracks its own expected keep count") {
    val s = graft.ops.Sampling.qualityWeighted(spark, sf0001).cache()
    assert(s.filter(col("n_kept") > col("n_docs")).count() === 0)
    assert(s.filter(col("kept_rate") < 0.0 || col("kept_rate") > 1.0).count() === 0)
    // binomial concentration: realized keeps within 4·σ of the summed
    // per-doc probabilities (σ ≤ √n/2), corpus-wide
    val (kept, expect, n) = s.agg(sum("n_kept"), sum("expected_kept"), sum("n_docs"))
      .as[(Long, Double, Long)].head()
    assert(math.abs(kept - expect) <= 4 * math.sqrt(n.toDouble) / 2 + 1,
      s"realized $kept vs expected $expect over $n docs")
    // high-quality sources keep more: kept_rate orders with expected rate
    // (hash membership invariance under repartition is proven in FsUtilSpec)
    val rates = s.select((col("expected_kept") / col("n_docs")).as("er"), col("kept_rate"))
      .as[(Double, Double)].collect()
    assert(rates.forall { case (er, kr) => math.abs(er - kr) < 0.35 })
  }

  test("streaming doc dedup: earlier delivery's survivor wins across batches") {
    // crafted corpus: doc 2 (delivery 1, even) and docs 1,3 (delivery 2,
    // odd) share one fingerprint — the CROSS-batch survivor must be 2,
    // not the global min 1; doc 4 is unique
    val dir = java.nio.file.Files.createTempDirectory("docdedup")
    Seq(
      (1L, "same text", "en", "web", 1L),
      (2L, "same text", "en", "web", 1L),
      (3L, "same  text", "en", "web", 1L), // normalizes to the same fingerprint
      (4L, "unique text", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.streaming.DocStream.dedupCheck(spark, dir.toString)
      .orderBy("keep_doc").as[(String, Long)].collect()
    assert(got.map(_._2).toSeq === Seq(2L, 4L),
      s"expected survivors 2 (earlier delivery beats global-min 1) and 4, got ${got.toSeq}")
    // and on the real corpus the survivor set covers every fingerprint once
    val real = graft.streaming.DocStream.dedupCheck(spark, sf0001)
    val fps = TextMetrics.fingerprint(spark, sf0001).select("fingerprint").distinct()
    assert(real.count() === fps.count())
    assert(real.select("fingerprint").distinct().count() === real.count())
  }

  test("streamed profile fold equals the batch data card exactly") {
    val streamed = graft.streaming.DocStream.profileCheck(spark, sf0001)
    val full = graft.ops.Profile.corpusProfile(spark, sf0001)
    assert(streamed.exceptAll(full).count() === 0)
    assert(full.exceptAll(streamed).count() === 0)
    assert(streamed.count() === full.count())
  }

  test("embedding stats: dims uniform, counts conserve, avg within bounds") {
    val st = graft.ops.Similarity.embStats(spark, sf0001).cache()
    assert(st.agg(sum("n_vecs")).head().getLong(0) ===
      Tables.embeddings(spark, sf0001).count())
    // every label's vectors share the declared dimension
    assert(st.filter(col("min_dim") =!= graft.ops.Similarity.dim ||
      col("max_dim") =!= graft.ops.Similarity.dim).count() === 0)
    assert(st.filter(col("zero_vecs") =!= 0).count() === 0, "fixture has no zero vectors")
    assert(st.filter(col("avg_norm") < col("min_norm") ||
      col("avg_norm") > col("max_norm")).count() === 0)
  }

  test("label purity: count identities hold and top-1 beats chance") {
    val k = 10
    val p = graft.ops.Similarity.labelPurity(spark, sf0001, k = k).cache()
    // every query contributes exactly k neighbor rows
    assert(p.filter(col("topk_total") =!= col("n_queries") * k).count() === 0)
    assert(p.filter(col("top1_matches") > col("n_queries")).count() === 0)
    assert(p.filter(col("topk_matches") > col("topk_total")).count() === 0)
    assert(p.filter(col("purity") < 0.0 || col("purity") > 1.0).count() === 0)
    // the metric is DISCRIMINATIVE: on the isotropic driver fixture the
    // labels carry no geometric signal, so top-1 agreement must sit at
    // the uniform-chance rate (1/labels) ...
    val labels = Tables.embeddings(spark, sf0001).select("label").distinct().count()
    val (m, q) = p.agg(sum("top1_matches"), sum("n_queries"))
      .as[(Long, Long)].head()
    val isoPurity = m.toDouble / q
    assert(isoPurity > 0.5 / labels && isoPurity < 3.0 / labels,
      s"isotropic top-1 purity $isoPurity far from chance 1.0/$labels")
    // ... and on the clustered fixture (labels == geometric clusters)
    // the same metric must read near-perfect
    val dir = java.nio.file.Files.createTempDirectory("purity_clustered").toString
    graft.tools.ClusteredFixture.write(spark, dir)
    val cp = graft.ops.Similarity.labelPurity(spark, dir, k = k).cache()
    val (cm, cq) = cp.agg(sum("top1_matches"), sum("n_queries"))
      .as[(Long, Long)].head()
    assert(cm.toDouble / cq > 0.9,
      s"clustered top-1 purity ${cm.toDouble / cq} should be near 1")
  }

  test("batch padding: buckets are tight powers of two and volumes conserve") {
    val pad = graft.ops.Pack.paddingStats(spark, sf0001).cache()
    val toks = Tables.documents(spark, sf0001)
      .select(size(split(TextMetrics.normalized(col("text")), " ")).cast("long").as("t"))
      .filter(col("t") > 0).cache()
    assert(pad.agg(sum("n_docs")).head().getLong(0) === toks.count())
    assert(pad.agg(sum("total_tokens")).head().getLong(0) ===
      toks.agg(sum("t")).head().getLong(0))
    pad.select("bucket_len", "pad_tokens", "n_docs", "total_tokens")
      .as[(Long, Long, Long, Long)].collect().foreach { case (b, p, n, tt) =>
        assert((b & (b - 1)) === 0L, s"bucket $b not a power of two")
        assert(p === n * b - tt)
      }
    // tightness: each doc's bucket is the SMALLEST power of two ≥ toks,
    // so no doc could fit the next bucket down
    val tight = toks.withColumn("bucket",
      when(col("t") <= 1, 1L)
        .otherwise(expr("CAST(shiftleft(CAST(1 AS BIGINT), length(bin(t - 1))) AS BIGINT)")))
    assert(tight.filter(col("t") > col("bucket") ||
      (col("bucket") > 1 && col("t") * 2 <= col("bucket"))).count() === 0)
  }

  test("modAffineM61 long-arithmetic == BigInteger (a·H + b) mod 2^61-1") {
    import java.math.BigInteger
    val rnd = new scala.util.Random(7)
    // adversarial H values: random 60-bit, boundary, and small
    val hs = Seq.fill(300)(rnd.nextLong() & ((1L << 60) - 1)) ++
      Seq(0L, 1L, (1L << 60) - 1, Dedup.M61 % (1L << 60), (1L << 31) - 1, 1L << 31)
    val df = hs.toDF("hh")
    val m = BigInteger.valueOf(Dedup.M61)
    Dedup.hashParams.foreach { case (a, b) =>
      val got = df.select(Dedup.modAffineM61(col("hh"), a, b).as("r"))
        .as[Long].collect()
      val expected = hs.map(h =>
        BigInteger.valueOf(h).multiply(BigInteger.valueOf(a))
          .add(BigInteger.valueOf(b)).mod(m).longValueExact())
      assert(got.toSeq === expected)
    }
  }

  test("exact dedup groups sum to the document count") {
    val g = Dedup.exact(spark, sf0001)
    val docs = Tables.documents(spark, sf0001).count()
    assert(g.agg(sum("dup_count")).head().getLong(0) === docs)
  }

  test("simhash: near-dup docs are close in Hamming space, others far") {
    val sigs = SimHash.signatures(spark, sf0001).as[(Long, Long)].collect().toMap
    val near = Dedup.nearDups(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(near.nonEmpty)
    val nearDist = near.map { case (a, b) =>
      java.lang.Long.bitCount(sigs(a) ^ sigs(b)) }
    assert(nearDist.max < 15, s"near-dup hamming too high: ${nearDist.max}")
    // random doc pairs should be far (~30 of 60 bits differ)
    val ids = sigs.keys.toSeq.sorted.take(40)
    val nearSet = near.flatMap(p => Seq(p, p.swap)).toSet
    val far = for {
      Seq(a, b) <- ids.combinations(2).toSeq if !nearSet.contains((a, b))
    } yield java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(far.sum.toDouble / far.size > 15.0)
  }

  test("simhash banded candidates include the true near-dups") {
    val cand = SimHash.candidates(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val near = Dedup.nearDups(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val recall = near.count(cand.contains).toDouble / near.length
    assert(recall >= 0.9, s"simhash recall $recall")
  }

  test("ann top-k: k neighbors per query, ranks dense, self excluded") {
    val topk = Similarity.bruteForceTopK(spark, sf0001, k = 5, queryMod = 100).cache()
    val queries = topk.select("query_id").distinct().count()
    assert(queries > 0)
    assert(topk.count() === queries * 5)
    assert(topk.filter(col("query_id") === col("neighbor_id")).count() === 0)
    val ranks = topk.groupBy("query_id").agg(collect_set("rank").as("r"))
      .select(size(col("r"))).as[Int].collect()
    assert(ranks.forall(_ === 5))
  }

  test("ivf: every vector assigned to one list; topk recall vs brute force") {
    val assign = graft.ops.Ivf.assignments(spark, sf0001).cache()
    val n = Tables.embeddings(spark, sf0001).count()
    assert(assign.count() === n)
    assert(assign.select("vec_id").distinct().count() === n)

    val ivf = graft.ops.Ivf.topK(spark, sf0001, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = graft.ops.Similarity.bruteForceTopK(spark, sf0001, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // IVF with nprobe=4/16 lists searches ~25% of the corpus; on near-
    // random embeddings recall is roughly that fraction — assert sane
    // bounds (it IS approximate) and exact subset behavior per query
    val recall = brute.count(ivf.contains).toDouble / brute.length
    assert(recall > 0.15, s"ivf recall $recall")
    assert(ivf.size === brute.length, "same k per query")
  }

  test("multi-probe lsh: recall strictly dominates single-bucket candidates") {
    val brute = Similarity.bruteForceTopK(spark, sf0001, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val multi = Similarity.multiprobeTopK(spark, sf0001, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(multi.contains).toDouble / brute.length
    // single-bucket candidates = vectors sharing the full bucket key; the
    // probe set strictly contains that bucket, so coverage can only grow
    val buckets = Similarity.lshBuckets(spark, sf0001).cache()
    val singleCand = buckets.as("a").join(buckets.as("b"), "bucket")
      .filter(col("a.vec_id") % 50 === 0 && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id")).count()
    val multiCand = multi.size
    assert(recall > 0.0, s"multiprobe recall $recall")
    info(s"multiprobe recall=$recall singleBucketCandPairs=$singleCand topkRows=$multiCand")
    buckets.unpersist()
  }

  test("lsh buckets partition all vectors into 8-bit keys") {
    val b = Similarity.lshBuckets(spark, sf0001).cache()
    assert(b.count() === Tables.embeddings(spark, sf0001).count())
    assert(b.filter(length(col("bucket")) =!= 8).count() === 0)
    // buckets spread (not all vectors in one bucket)
    assert(b.select("bucket").distinct().count() > 10)
  }

  test("language id predicts a language for every doc") {
    val l = TextMetrics.langId(spark, sf0001).cache()
    assert(l.filter(col("predicted_lang").isNull).count() === 0)
    // synthetic corpus is English-ish function words
    assert(l.filter(col("predicted_lang") === "en").count() > 0)
  }

  test("source quota caps every source and is re-shard stable") {
    val q = Sampling.sourceQuota(spark, sf0001, cap = 10).cache()
    val per = q.groupBy("source").agg(count(lit(1)).as("n"))
    assert(per.filter(col("n") > 10).count() === 0)
    // every source with >= 10 docs is filled to exactly the cap
    val eligible = Tables.documents(spark, sf0001)
      .groupBy("source").agg(count(lit(1)).as("total"))
      .filter(col("total") >= 10).count()
    assert(per.filter(col("n") === 10).count() === eligible)
    // membership is a content hash: a different input partitioning must
    // select the identical document set
    val q2 = Sampling.sourceQuota(spark, sf0001, cap = 10)
    assert(q.exceptAll(q2).count() === 0)
    q.unpersist()
  }

  test("incremental dedup equals the symmetric near-dups restricted to the batch boundary") {
    import spark.implicits._
    val inc = Dedup.incrementalNearDups(spark, sf0001)
      .select("new_doc", "corpus_doc").as[(Long, Long)].collect().toSet
    // orientation invariants: incoming on the left, corpus on the right
    inc.foreach { case (n, c) =>
      assert(n % Dedup.incomingMod === Dedup.incomingRem)
      assert(c % Dedup.incomingMod !== Dedup.incomingRem)
    }
    // equality with the full symmetric relation, re-oriented
    val ref = Dedup.nearDups(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .filter { case (a, b) =>
        (a % Dedup.incomingMod == Dedup.incomingRem) !=
          (b % Dedup.incomingMod == Dedup.incomingRem) }
      .map { case (a, b) =>
        if (a % Dedup.incomingMod == Dedup.incomingRem) (a, b) else (b, a) }
      .toSet
    assert(inc === ref)
    assert(inc.nonEmpty, "incoming slice must straddle a planted near-dup pair")
  }

  test("split leakage matrix partitions the near-dup pairs exactly") {
    import spark.implicits._
    val cells = Dedup.splitLeakage(spark, sf0001)
      .select("split_a", "split_b", "n_pairs")
      .as[(String, String, Long)].collect()
    val valid = Set("train", "val", "test")
    cells.foreach { case (a, b, n) =>
      assert(valid(a) && valid(b) && n > 0)
    }
    // every near-dup pair lands in exactly one cell
    assert(cells.map(_._3).sum === Dedup.nearDups(spark, sf0001).count())
  }

  test("bloom decontamination equals the exact broadcast join, and the bloom prunes") {
    import spark.implicits._
    // no false negatives + exact confirm join ⇒ identical to the exact path
    val viaBloom = Contamination.flaggedViaBloom(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    val exact = Contamination.report(spark, sf0001)
      .filter(col("contaminated"))
      .select("doc_id", "n_overlap").as[(Long, Long)].collect().toMap
    assert(viaBloom === exact)
    assert(viaBloom.nonEmpty, "fixture plants eval-overlapping docs")
    // the prefilter must actually prune: at fpp=0.01 the survivors are
    // ≈ true hits + 1% of misses, strictly fewer than the corpus n-grams
    val ng = Contamination.ngrams(spark, sf0001)
      .filter(col("doc_id") % Contamination.evalMod =!= 0).cache()
    val total = ng.count()
    val evalNgs = Contamination.ngrams(spark, sf0001)
      .filter(col("doc_id") % Contamination.evalMod === 0)
      .select("ngram").distinct()
    val bloom = evalNgs.stat.bloomFilter("ngram", math.max(evalNgs.count(), 1L), 0.01)
    val pass = ng.filter(graft.functions.BloomMightContain
      .bloomMightContain(spark, col("ngram"), bloom)).count()
    val trueHits = ng.join(evalNgs, Seq("ngram")).count()
    assert(pass < total, "bloom prefilter passed everything")
    assert(pass >= trueHits, "bloom dropped a true hit (false negative!)")
    ng.unpersist()
  }

  test("bpe pair counts conserve tokens and rank deterministically") {
    import spark.implicits._
    val top = TextPrep.bpePairs(spark, sf0001, k = 50).cache()
    assert(top.count() === 50)
    val counts = top.select("pair_count").as[Long].collect().toSeq
    assert(counts === counts.sortBy(-_), "not ranked by count desc")
    // conservation: total pair occurrences == Σ max(words-1, 0)
    val allPairs = TextPrep.bpePairs(spark, sf0001, k = Int.MaxValue)
      .agg(sum("pair_count")).as[Long].head()
    val expected = Tables.documents(spark, sf0001)
      .select(greatest(size(split(TextMetrics.normalized(col("text")), " ")) - 1, lit(0)).cast("long"))
      .as[Long].collect().sum
    assert(allPairs === expected)
    top.unpersist()
  }

  test("pmi: bounded set, min-count respected, collocations score positive") {
    import graft.ops.TextPrep
    val pmiDir = "/root/testdata/sf0.01"
    val p = TextPrep.pmi(spark, pmiDir).cache()
    assert(p.count() <= 50 && p.count() > 0)
    assert(p.filter(col("pair_count") < 5).count() === 0)
    // top-ranked pairs co-occur more than independence predicts
    assert(p.filter(col("pmi") <= 0).count() === 0,
      "a top-50 PMI pair scored at or below independence")
    // PMI is symmetric in the marginals: recomputing one pair by hand
    val ws = split(graft.ops.TextMetrics.normalized(col("text")), " ")
    val toks = Tables.documents(spark, pmiDir).select(explode(ws).as("t"))
    val first = p.orderBy(col("pmi").desc, col("pair")).head()
    val parts = first.getAs[String]("pair").split(" ", 2)
    val a = parts(0)
    val b = parts(1)
    val na = toks.filter(col("t") === a).count().toDouble
    val nb = toks.filter(col("t") === b).count().toDouble
    val nTok = toks.count().toDouble
    val nBig = Tables.documents(spark, pmiDir)
      .select(greatest(size(ws) - 1, lit(0)).cast("long").as("nb"))
      .agg(sum("nb")).head().getLong(0).toDouble
    val byHand = math.log(
      first.getAs[Long]("pair_count").toDouble * nTok * nTok / (nBig * na * nb))
    assert(math.abs(byHand -
      first.getAs[Double]("pmi")) < 1e-4)
  }

  test("fertility: compression <= 1, totals conserve vs the encode pass") {
    import graft.ops.TextPrep
    val f = TextPrep.fertility(spark, sf0001).cache()
    assert(f.count() > 0)
    // merges only fuse: per-lang token count never exceeds word count
    assert(f.filter(col("n_tokens") > col("n_words")).count() === 0)
    // totals reconcile against the per-doc encode output
    val enc = TextPrep.bpeEncode(spark, sf0001)
      .agg(sum(col("n_tokens_before").cast("long")).as("w"),
        sum(col("n_tokens_after").cast("long")).as("t")).head()
    val agg = f.agg(sum("n_words"), sum("n_tokens")).head()
    assert(agg.getLong(0) === enc.getAs[Long]("w"))
    assert(agg.getLong(1) === enc.getAs[Long]("t"))
  }

  test("substring spans: bounds hold on the corpus, exact on a planted fixture") {
    val rep = graft.ops.SubstringDedup.report(spark, "/root/testdata/sf0.01").cache()
    assert(rep.count() > 0)
    // a span never exceeds the doc, and every span carries >= n words
    assert(rep.filter(col("dup_words") > col("n_words")).count() === 0)
    assert(rep.filter(col("dup_words") <
      col("n_spans") * graft.ops.SubstringDedup.n).count() === 0)

    // planted fixture (n = 5): A and B share the 7-word run "c1..c7"
    // (anchors at 3 consecutive positions -> ONE merged 7-word span in
    // each); C repeats its own 5-word run "r1..r5" at two offsets with a
    // 3-word gap -> intervals [0,4] and [8,12] stay SEPARATE islands;
    // D shares nothing and must not appear.
    import spark.implicits._
    val planted = Seq(
      (1L, "a1 a2 c1 c2 c3 c4 c5 c6 c7 a3 a4"), // 11 words, span 7
      (2L, "c1 c2 c3 c4 c5 c6 c7 b1 b2"), // 9 words, span 7
      (3L, "r1 r2 r3 r4 r5 g1 g2 g3 r1 r2 r3 r4 r5"), // 13 words, 2 spans of 5
      (4L, "d1 d2 d3 d4 d5 d6 d7 d8")
    ).toDF("doc_id", "text")
    val got = graft.ops.SubstringDedup.reportOf(planted)
      .orderBy("doc_id")
      .select("doc_id", "n_words", "n_spans", "dup_words").as[(Long, Long, Long, Long)]
      .collect().toSeq
    assert(got === Seq((1L, 11L, 1L, 7L), (2L, 9L, 1L, 7L), (3L, 13L, 2L, 10L)))
  }

  test("quality calibration: every source keeps ~top 80%, percentiles valid") {
    val cal = graft.ops.QualityModel.calibrated(spark, "/root/testdata/sf0.01")
      .cache()
    assert(cal.filter(col("src_percentile") < 0 || col("src_percentile") >= 1)
      .count() === 0)
    // source-fairness: EVERY source keeps some docs and drops some —
    // the property a global threshold cannot guarantee
    val per = cal.groupBy("source").agg(
      count(lit(1)).as("n"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("kept")).cache()
    assert(per.filter(col("kept") === 0).count() === 0)
    assert(per.filter(col("kept") === col("n")).count() === 0)
    // keep rate per source ~ 1 - dropFrac (ties can move it slightly)
    assert(per.filter(col("kept").cast("double") / col("n") < 0.7 ||
      col("kept").cast("double") / col("n") > 0.9).count() === 0)
    // percentile is monotone in the score within a source
    val bad = cal.as("a").join(cal.as("b"),
      col("a.source") === col("b.source") &&
        col("a.quality_score") < col("b.quality_score") &&
        col("a.src_percentile") > col("b.src_percentile"))
    assert(bad.count() === 0)
  }

  test("containment: bounds, asymmetry caught on a planted quoted-inside pair") {
    import spark.implicits._
    val got = graft.ops.Dedup.containment(spark, "/root/testdata/sf0.01").cache()
    assert(got.count() > 0)
    // containment dominates jaccard and is a valid fraction
    assert(got.filter(col("a_in_b") > 1.0 || col("b_in_a") > 1.0 ||
      col("n_inter") > least(col("na"), col("nb"))).count() === 0)
    // planted: doc 2 wraps doc 1's full text in heavy boilerplate —
    // low resemblance, containment(1 in 2) == 1
    val core = "q1 q2 q3 q4 q5 q6 q7 q8"
    val wrap = (1 to 40).map(i => s"b$i").mkString(" ")
    val planted = Seq((1L, core), (2L, s"$wrap $core $wrap")).toDF("doc_id", "text")
    val sh = graft.ops.Dedup.shinglesFrom(planted)
    val pair = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val j = graft.ops.Dedup.verifiedJaccardFrom(sh, pair).head()
      .getAs[Double]("jaccard")
    assert(j < 0.2, s"planted pair should have low resemblance, got $j")
    val na = sh.filter(col("doc_id") === 1L).count().toDouble
    val inter = sh.filter(col("doc_id") === 1L)
      .join(sh.filter(col("doc_id") === 2L).select("shingle"), "shingle").count()
    assert(inter.toDouble / na === 1.0, "doc 1 should be fully contained in doc 2")
  }

  test("substring spans equal a brute-force reference on random corpora") {
    import spark.implicits._
    val n = graft.ops.SubstringDedup.n
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 3) {
      val docs = (1 to 15).map { id =>
        val len = 3 + rnd.nextInt(28)
        (id.toLong, Seq.fill(len)(s"t${rnd.nextInt(6)}").mkString(" "))
      }
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val gramCount = scala.collection.mutable.Map.empty[Seq[String], Int]
      toks.values.foreach { ws =>
        if (ws.length >= n) (0 to ws.length - n).foreach { i =>
          val g = ws.slice(i, i + n)
          gramCount(g) = gramCount.getOrElse(g, 0) + 1
        }
      }
      val expect = toks.flatMap { case (id, ws) =>
        if (ws.length < n) None
        else {
          val covered = (0 to ws.length - n)
            .filter(i => gramCount(ws.slice(i, i + n)) >= 2)
          if (covered.isEmpty) None
          else {
            var spans = List.empty[(Int, Int)]
            covered.foreach { p =>
              spans match {
                case (ps, pe) :: rest if p <= pe + 1 =>
                  spans = (ps, math.max(pe, p + n - 1)) :: rest
                case _ => spans = (p, p + n - 1) :: spans
              }
            }
            Some((id, ws.length.toLong, spans.length.toLong,
              spans.map { case (s, e) => e - s + 1L }.sum))
          }
        }
      }.toSeq.sortBy(_._1)
      val got = graft.ops.SubstringDedup.reportOf(docs.toDF("doc_id", "text"))
        .orderBy("doc_id").select("doc_id", "n_words", "n_spans", "dup_words")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got === expect, s"round $round diverged from the reference")
    }
  }

  test("zorder bounds both dimensions; single-key sort leaves one at full width") {
    val rep = graft.ops.Layout.zorderReport(spark, "/root/testdata/sf0.01").cache()
    def avgSpan(layout: String, c: String): Double =
      rep.filter(col("layout") === layout)
        .agg(avg(col(c).cast("double"))).head().getDouble(0)
    // the single-key layout nails its own key...
    assert(avgSpan("user_sort", "user_span") < avgSpan("zorder", "user_span"))
    // ...but leaves the day dimension unpruned; z-order bounds it
    assert(avgSpan("zorder", "day_span") < avgSpan("user_sort", "day_span") / 2,
      s"zorder day span ${avgSpan("zorder", "day_span")} vs " +
        s"user_sort ${avgSpan("user_sort", "day_span")}")
    // row conservation per layout
    val tot = Tables.events(spark, "/root/testdata/sf0.01").count()
    assert(rep.groupBy("layout").agg(sum("n_rows").as("n")).filter(col("n") =!= tot)
      .count() === 0)
  }

  test("curriculum select fills each source budget best-first, no gaps") {
    import spark.implicits._
    val sel = graft.ops.Curriculum.select(spark, sf0001).cache()
    assert(sel.count() > 0)
    // ranks are a contiguous 1..k prefix per source (best-first, no gaps)
    sel.groupBy("source")
      .agg(count(lit(1)).as("k"), max("sel_rank").as("mx"), min("sel_rank").as("mn"))
      .as[(String, Long, Int, Int)].collect().foreach { case (src, k, mx, mn) =>
        assert(mn === 1 && mx === k, s"source $src ranks not contiguous")
      }
    // the last kept doc reaches (or crosses) the budget unless the
    // source ran out of docs entirely
    val totalDocs = Tables.documents(spark, sf0001)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    sel.groupBy("source")
      .agg(max("cum_tokens").as("got"), first("budget").as("b"), count(lit(1)).as("k"))
      .join(totalDocs, "source")
      .as[(String, Long, Long, Long, Long)].collect().foreach {
        case (src, got, b, k, n) =>
          assert(got >= b || k === n, s"source $src stopped at $got of budget $b")
      }
    // kept tokens never exceed budget by more than one document
    val over = sel.filter(col("cum_tokens") - col("doc_tokens") >= col("budget"))
    assert(over.count() === 0)
    sel.unpersist()
  }

  test("novelty is a valid fraction, conserved, and depressed for near-dup docs") {
    import spark.implicits._
    val nov = graft.ops.Contamination.novelty(spark, sf0001).cache()
    assert(nov.count() > 0)
    assert(nov.filter(col("novelty_ratio") < 0 || col("novelty_ratio") > 1).count() === 0)
    assert(nov.filter(col("n_unique") > col("n_ngrams")).count() === 0)
    // planted near-dups share runs of text, so their n-grams are not
    // corpus-unique: their average novelty sits below the corpus average
    val dupIds = Dedup.nearDups(spark, sf0001)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct()
    val dupAvg = nov.join(dupIds, "doc_id")
      .agg(avg("novelty_ratio")).as[Double].head()
    val allAvg = nov.agg(avg("novelty_ratio")).as[Double].head()
    assert(dupAvg < allAvg,
      s"near-dup docs avg novelty $dupAvg not below corpus avg $allAvg")
    nov.unpersist()
  }

  test("bm25 ranks query-term-dense short docs first") {
    val top = TextPrep.bm25(spark, sf0001, k = 20).cache()
    assert(top.count() === 20)
    assert(top.filter(col("score") <= 0.0).count() === 0)
    // scores arrive ranked; verify monotone non-increasing
    val scores = top.select("score").collect().map(_.getDouble(0)).toSeq
    assert(scores === scores.sortBy(-_))
    // every returned doc actually contains a query term
    val hits = top.join(Tables.documents(spark, sf0001), "doc_id")
      .filter(TextPrep.Bm25Terms
        .map(t => col("text").contains(t)).reduce(_ || _))
    assert(hits.count() === 20)
    top.unpersist()
  }

  test("hybrid RRF: score identity, leg coverage, distributed top-k plan") {
    val f = graft.ops.Retrieval.hybridRrf(spark, sf0001).cache()
    val rows = f.collect()
    assert(rows.length === 10)
    // score is exactly the declared function of the rank columns
    rows.foreach { r =>
      val (rl, rv) = (r.getAs[Int]("rank_lex"), r.getAs[Int]("rank_vec"))
      val expect = (if (rl > 0) 1.0 / (60 + rl) else 0.0) +
        (if (rv > 0) 1.0 / (60 + rv) else 0.0)
      assert(r.getAs[Double]("rrf_score") === expect)
      assert(rl >= 0 && rl <= 20 && rv >= 0 && rv <= 20)
      assert(rl > 0 || rv > 0)
    }
    // a doc retrieved by BOTH legs at rank r beats one retrieved by a
    // single leg at the same r — fusion genuinely rewards agreement
    val both = rows.filter(r => r.getAs[Int]("rank_lex") > 0 && r.getAs[Int]("rank_vec") > 0)
    if (both.nonEmpty) {
      val bestSingle = 1.0 / 61.0
      assert(both.map(_.getAs[Double]("rrf_score")).max >= bestSingle ||
        rows.map(_.getAs[Double]("rrf_score")).max < bestSingle)
    }
    // the dense leg's corpus top-k must plan as TakeOrdered, not a
    // global Sort over the corpus
    val plan = f.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered in:\n$plan")
    f.unpersist()
  }

  test("quality model: valid probabilities, threshold keep, declared linear form") {
    import spark.implicits._
    val m = graft.ops.QualityModel.score(spark, sf0001).cache()
    assert(m.count() === Tables.documents(spark, sf0001).count())
    assert(m.filter(col("model_score") <= 0 || col("model_score") >= 1).count() === 0)
    assert(m.filter(col("keep") =!= (col("model_score") >= 0.5)).count() === 0)
    // the emitted score IS the declared linear form over the declared
    // features: recompute z independently from the feature queries and
    // compare through the same 6-dp rounding
    val (b, wLen, wUniq, wStop, wTop, wDup) = graft.ops.QualityModel.weights
    val z = lit(b) + col("len_score") * wLen +
      coalesce(col("unique_ratio"), lit(0.0)) * wUniq +
      coalesce(col("stopword_ratio"), lit(0.0)) * wStop +
      coalesce(col("top_word_frac"), lit(1.0)) * wTop +
      coalesce(col("dup_trigram_frac"), lit(1.0)) * wDup
    val recomputed = TextMetrics.quality(spark, sf0001)
      .join(TextMetrics.repetition(spark, sf0001)
        .select(col("doc_id"), col("top_word_frac"), col("dup_trigram_frac")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        (lit(1.0) / (lit(1.0) + exp(-z))).cast("decimal(18,6)").as("expected"))
    val diverged = m.join(recomputed, "doc_id")
      .filter(col("model_score") =!= col("expected"))
    assert(diverged.count() === 0)
    m.unpersist()
  }

  test("lm score: train docs have zero oov, backoff fires on held-out docs") {
    import spark.implicits._
    val sc = graft.ops.LangModel.score(spark, sf0001).cache()
    assert(sc.count() > 0)
    assert(sc.filter(col("avg_logprob") >= 0).count() === 0)
    assert(sc.filter(col("ppl") <= 1.0).count() === 0)
    val split = Sampling.split(spark, sf0001)
    val withSplit = sc.join(split, "doc_id")
    // every bigram of a train doc is in the model by construction
    assert(withSplit.filter(col("split") === "train" && col("oov_bigrams") > 0)
      .count() === 0)
    // and the backoff path actually fires on at least one held-out doc
    assert(withSplit.filter(col("split") =!= "train" && col("oov_bigrams") > 0)
      .count() > 0, "no held-out doc exercised the backoff path")
    // held-out docs (where backoff bites) are less probable on average
    val trainAvg = withSplit.filter(col("split") === "train")
      .agg(avg(col("avg_logprob").cast("double"))).as[Double].head()
    val heldAvg = withSplit.filter(col("split") =!= "train")
      .agg(avg(col("avg_logprob").cast("double"))).as[Double].head()
    assert(heldAvg < trainAvg)
    sc.unpersist()
  }

  test("segment dedup: counts reconcile and survivors are exactly the distinct segments") {
    import spark.implicits._
    val rep = graft.ops.SegmentDedup.report(spark, sf0001).cache()
    assert(rep.count() === Tables.documents(spark, sf0001).count())
    assert(rep.filter(col("kept_segments") + col("dropped_segments") =!= col("total_segments"))
      .count() === 0)
    // keep-first-occurrence ⇒ corpus-wide kept count == distinct segment count
    val segs = TextPrep.chunks(spark, sf0001, chunkWords = 16, overlap = 0)
      .select(md5(col("chunk_text")).as("h"))
    val distinctSegs = segs.distinct().count()
    val kept = rep.agg(sum("kept_segments")).as[Long].head()
    assert(kept === distinctSegs)
    // something was actually deduplicated on this fixture
    assert(rep.agg(sum("dropped_segments")).as[Long].head() > 0)
    rep.unpersist()
  }

  test("bpe encode: merges shrink token counts exactly and digests are stable") {
    import spark.implicits._
    val enc = graft.ops.TextPrep.bpeEncode(spark, sf0001, k = 8).cache()
    assert(enc.count() === Tables.documents(spark, sf0001).count())
    assert(enc.filter(col("n_tokens_after") > col("n_tokens_before")).count() === 0)
    assert(enc.filter(col("n_tokens_after") < 1).count() === 0)
    // the top-8 pairs occur thousands of times at sf0.001 — merging must bite
    assert(enc.filter(col("n_tokens_after") < col("n_tokens_before")).count() > 0)
    enc.unpersist()
  }

  test("bpe learn: iterative trainer recovers the hand-computed merges") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val merges = graft.ops.TextPrep.bpeLearnOf(docs, iters = 2)
    // iter 1: "a b" occurs 4 times (3 in doc1 greedy-left + 1 in doc2)
    // iter 2 re-counts on the MERGED sequences [a_b a_b a_b c], [a_b c d]:
    // ("a_b","a_b")×2 ties ("a_b","c")×2, pair-asc prefers "a_b a_b"
    assert(merges === Seq(("a", "b", 4L), ("a_b", "a_b", 2L)))
  }

  test("bpe learn: sampled training recovers the full-corpus merges") {
    import spark.implicits._
    // Sampling preserves merge RANKS when pair frequencies concentrate
    // (every real tokenizer corpus; NOT the uniform word-soup fixture,
    // where the top pairs are near-ties that any subset reorders — the
    // documented premise of the sampling gate). Concentrated fixture:
    // every doc repeats the same phrase k_d ≥ 3 times behind a unique
    // prefix word, so all competing pair counts scale with the kept
    // docs and ANY nonempty hashUniform sample ranks them identically.
    val docs = (0L until 200L).map { id =>
      val k = 3 + (id % 4).toInt
      (id, s"d$id " + Seq.fill(k)("the quick fox").mkString(" "))
    }.toDF("doc_id", "text")
    val full = graft.ops.TextPrep.bpeLearnOf(docs, iters = 3,
      sampleCap = Long.MaxValue)
    // cap below the corpus size forces the hashUniform sample (200 docs
    // → ~80 kept); merge RULES must agree — counts differ by design
    val sampled = graft.ops.TextPrep.bpeLearnOf(docs, iters = 3,
      sampleCap = 80L)
    assert(sampled.map(m => (m._1, m._2)) === full.map(m => (m._1, m._2)),
      s"sampled merges ${sampled.map(m => m._1 + " " + m._2)} != " +
        s"full ${full.map(m => m._1 + " " + m._2)}")
    // and the sample was genuinely smaller: merge-time counts shrank
    assert(sampled.map(_._3).sum < full.map(_._3).sum)
  }

  test("fuzzy join equals brute force over token-sharing dictionary pairs") {
    import spark.implicits._
    val m = graft.ops.FuzzyJoin.parts(spark, sf0001).cache()
    assert(m.count() > 0)
    assert(m.filter(col("name_a") >= col("name_b")).count() === 0)
    assert(m.filter(col("dist") > 2).count() === 0)
    // the dictionary is vocabulary-sized, so the TEST may brute-force
    // what the operator must never do: all distinct-name pairs, kept if
    // they share a token and sit within the distance — exact set match
    val names = Tables.part(spark, sf0001).select(col("p_name").as("name")).distinct()
    val brute = names.as("a").crossJoin(names.as("b"))
      .filter(col("a.name") < col("b.name"))
      .filter(arrays_overlap(split(col("a.name"), " "), split(col("b.name"), " ")))
      .filter(levenshtein(col("a.name"), col("b.name")) <= 2)
      .select(col("a.name"), col("b.name")).as[(String, String)].collect().toSet
    val got = m.select("name_a", "name_b").as[(String, String)].collect().toSet
    assert(got === brute)
    // multiplicities map the dictionary match back to record space
    val totalParts = Tables.part(spark, sf0001).count()
    assert(m.filter(col("n_parts_a") < 1 || col("n_parts_b") < 1).count() === 0)
    assert(m.filter(col("n_parts_a") > totalParts).count() === 0)
    m.unpersist()
  }

  test("psi drift: full spine, counts conserve, contributions non-negative") {
    import spark.implicits._
    val d = graft.ops.Drift.psi(spark, sf0001).cache()
    assert(d.count() === 10)
    val total = Tables.events(spark, sf0001).count()
    assert(d.agg(sum(col("n1") + col("n2"))).as[Long].head() === total)
    // each period is non-degenerate (the midpoint split saw both halves)
    assert(d.agg(sum("n1")).as[Long].head() > 0)
    assert(d.agg(sum("n2")).as[Long].head() > 0)
    // (p2-p1)·ln(p2/p1) is a product of same-sign factors
    assert(d.filter(col("psi_contrib") < 0).count() === 0)
    d.unpersist()
  }

  test("heavy hitters equal the exact answer and ignore input partitioning") {
    import spark.implicits._
    val k = 25 // below sf0.001 user cardinality so the counters bind
    val events = Tables.events(spark, sf0001)
    val got = graft.ops.Sketch.heavyHittersOf(events, k)
      .select("user_id", "cnt").as[(Long, Long)].collect().toSet
    val n = events.count()
    val exact = events.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") > n.toDouble / (k + 1.0))
      .as[(Long, Long)].collect().toSet
    assert(got === exact)
    assert(exact.nonEmpty, "fixture produced no heavy hitters — k mistuned")
    // the confirm pass makes the output partitioning-invariant even
    // though the per-partition survivor sets differ
    val reparted = graft.ops.Sketch.heavyHittersOf(events.repartition(7), k)
      .select("user_id", "cnt").as[(Long, Long)].collect().toSet
    assert(reparted === got)
  }

  test("html extraction round-trips hostile payloads (tags, entities, newlines)") {
    val nasty = Seq(
      "plain text",
      "a < b && b > c",
      "has a <p>fake paragraph</p> inside",
      "entity soup &amp; &lt;pre-escaped&gt;",
      "line one\nline two\n\ttabbed",
      "</p></div><footer>injection attempt</footer>")
    val df = nasty.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "srcX") }
      .toDF("doc_id", "text", "source")
    val out = df.select(col("text"),
      graft.ops.Extract.extracted(
        graft.ops.Extract.wrapped(col("text"), col("source"), col("doc_id")))
        .as("got"))
    assert(out.filter(col("got") =!= col("text")).count() === 0)
  }

  test("retrieval eval: panel size fixed, metric orderings hold") {
    val r = graft.ops.Retrieval.knownItemEval(spark, sf0001)
      .as[(Long, Long, Long, Double, Double)].head()
    val (nq, h1, h10, mrr, ndcg) = r
    val expected = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 19 === 3 && col("doc_id") < 500).count()
    assert(nq === expected && nq > 0)
    assert(h1 <= h10 && h10 <= nq)
    // per-query 1/rank <= 1/log2(rank+1) for rank >= 1, so MRR <= nDCG;
    // both bounded by the hit fraction
    assert(mrr <= ndcg + 1e-12)
    assert(ndcg <= h10.toDouble / nq + 1e-12)
    assert(mrr >= h1.toDouble / nq - 1e-12, "each @1 hit contributes 1/n to MRR")
  }

  test("k-anonymity: class histograms conserve rows, generalization reduces risk") {
    val a = graft.ops.Privacy.kAnonymity(spark, sf0001, k = 5).cache()
    val nCust = Tables.customer(spark, sf0001).count()
    // every customer lands in exactly one class at each level
    Seq(0, 1).foreach { lvl =>
      assert(a.filter(col("level") === lvl).agg(sum("n_rows"))
        .head().getLong(0) === nCust)
    }
    // coarsening the QI set can only merge classes: rows at risk shrink
    def atRisk(lvl: Int): Long = {
      val r = a.filter(col("level") === lvl && col("at_risk")).agg(sum("n_rows")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    assert(atRisk(1) <= atRisk(0))
    // the fixture's fine QI set actually has singleton classes (the
    // audit has something to find) and the coarse one clears k=5
    assert(atRisk(0) > 0)
  }

  test("entity resolution: tier-1 exact-key precision 1.0, tier 2 rescues the rest") {
    val r = graft.ops.EntityResolution.customers(spark, sf0001)
      .as[(Int, Long, Long, Long, Double)].collect().sortBy(_._1)
    val Array(t1, t2) = r
    val nCust = Tables.customer(spark, sf0001).count()
    // tier 1: every clean-digit record (custkey % 7 != 0) matches, correctly
    assert(t1._2 === nCust)
    assert(t1._3 === Tables.customer(spark, sf0001)
      .filter(col("c_custkey") % 7 =!= 0).count())
    assert(t1._4 === t1._3, "tier-1 match must be exact-precision")
    // tier 2: the digit-corrupted residual is fully rescued, correctly
    assert(t2._2 === nCust - t1._3)
    assert(t2._3 === t2._2 && t2._4 === t2._3)
    // suffix edits guarantee a strictly positive distance on tier 2
    assert(t2._5 >= 2.0)
  }

  test("nfc normalize: composes decomposed marks, identity elsewhere, codegen'd") {
    import graft.functions.NfcFunctions
    NfcFunctions.register(spark)
    val df = Seq(("cafe\u0301", "caf\u00e9", "plain ascii", null: String))
      .toDF("a", "b", "c", "d")
    val r = df.select(
      NfcFunctions.nfcNormalize(spark, col("a")).as("a"),
      NfcFunctions.nfcNormalize(spark, col("b")).as("b"),
      NfcFunctions.nfcNormalize(spark, col("c")).as("c"),
      NfcFunctions.nfcNormalize(spark, col("d")).as("d"))
      .as[(String, String, String, Option[String])].head()
    assert(r._1 === "caf\u00e9", "NFC must compose e+U+0301 into U+00E9")
    assert(r._2 === "caf\u00e9", "precomposed input is already NFC")
    assert(r._3 === "plain ascii", "ASCII fast path is the identity")
    assert(r._4.isEmpty, "null-safe")

    val rep = graft.ops.Normalize.report(spark, sf0001).cache()
    // every planted decomposed doc composes: changed, exactly 2 chars shorter
    val dec = rep.filter(col("doc_id") % 3 === 0)
    assert(dec.count() > 0)
    assert(dec.filter(!col("changed") || col("n_norm") =!= col("n_raw") - 2)
      .count() === 0)
    // precomposed and plain-ascii docs are untouched
    assert(rep.filter(col("doc_id") % 3 =!= 0)
      .filter(col("changed") || col("n_norm") =!= col("n_raw")).count() === 0)
  }

  test("ES weighted sample: exact size, reproducible, weight-biased") {
    import spark.implicits._
    val s1 = Sampling.weightedSample(spark, sf0001)
      .as[(Long, Long)].collect()
    val s2 = Sampling.weightedSample(spark, sf0001)
      .as[(Long, Long)].collect()
    assert(s1.length === 200 && s1.toSeq === s2.toSeq, "must be deterministic")
    assert(s1.map(_._1).distinct.length === 200, "without replacement")
    // heavier (longer) docs must be overrepresented: the sample's mean
    // weight exceeds the corpus mean (the fixture's n_chars varies a lot)
    val corpusMean = Tables.documents(spark, sf0001)
      .agg(avg(log(lit(1.0) + col("n_chars").cast("double"))))
      .head().getDouble(0)
    val sampleMean = s1.map(x => math.log(1.0 + x._2.toDouble)).sum / s1.length
    assert(sampleMean > corpusMean,
      s"sample mean weight $sampleMean not above corpus mean $corpusMean")
  }

  test("semDedup per-list pair bound: subset of the unbounded result, " +
    "loud dropped-pairs report, no-op when lists fit") {
    import graft.ops.Similarity
    val unbounded = Similarity.semDedup(spark, sf0001, threshold = 0.3)
      .select("drop_id", "keep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // a bound far above every list size must not change anything (and
    // must not fire the report)
    var fired = 0
    val loose = Similarity.semDedup(spark, sf0001, threshold = 0.3,
      maxList = 1000000, onBound = (_, _) => fired += 1)
      .select("drop_id", "keep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fired === 0 && loose === unbounded,
      "a non-binding bound must be a no-op")
    // a tight bound reports and only ever REMOVES candidate pairs —
    // drop decisions are per-pair, so survivors are a subset at the
    // (drop_id) grain
    var lists = 0L
    var dropped = 0L
    val tight = Similarity.semDedup(spark, sf0001, threshold = 0.3,
      maxList = 4, onBound = (l, d) => { lists = l; dropped = d })
      .select("drop_id").collect().map(_.getLong(0)).toSet
    assert(lists > 0 && dropped > 0,
      "a binding bound must report the recall trade")
    val unboundedDrops = unbounded.map(_._1)
    assert(tight.subsetOf(unboundedDrops),
      "chunked pair production can only lose drop candidates")
  }
}
