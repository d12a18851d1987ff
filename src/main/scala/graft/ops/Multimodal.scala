package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus per-partition batched feature
  * extraction.
  *
  * The image path is REAL end-to-end: [[imageTable]] synthesizes genuine
  * 24-bit uncompressed BMP payloads (deterministic per-id pixel pattern,
  * encoded by [[Bmp.encode]] on the executors), and [[imageStats]] /
  * [[imageResize]] decode those actual bytes with `javax.imageio` in a
  * batched `mapPartitions` and emit pixel statistics computed from the
  * decoded raster. The planted-truth oracle recomputes the same stats
  * analytically from the pattern definition — if either the encoder or
  * the decoder mis-handles a single byte (row padding, BGR order,
  * bottom-up rows), the hashes diverge.
  *
  * The audio and video paths are real in the same sense: [[Wav]] builds
  * and `javax.sound` parses genuine 16-bit PCM WAVs ([[audioStats]]);
  * [[Avi]] builds genuine RIFF AVI containers of raw DIB frames and an
  * own chunk walker demuxes them ([[videoStats]] — the JDK ships no AVI
  * reader). [[frameSample]] additionally keeps the codec-free byte-slice
  * sampler as pure column ops. What a production deployment would add is
  * only compressed codecs (jpeg/mp3/h264) in the decode positions; every
  * schema, batch shape, and oracle-checked stat stays as proven here.
  */
object Multimodal {

  /** Media table: documents' text bytes stand in for an opaque media
    * payload; metadata columns are what a real ingest would carry.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (col("doc_id") % 3).cast("int") + 1).as("media_type"),
      // octet length of the BINARY payload, not character count of text
      length(encode(col("text"), "UTF-8")).as("payload_bytes"))

  // ---------- real image path: encode → decode → pixel stats ----------

  /** Deterministic per-id image geometry/pattern — the planted truth the
    * oracle recomputes analytically. All arithmetic is non-negative
    * integer, so Scala `%` and DuckDB `%` agree.
    */
  object Pattern {
    def width(id: Long): Int = (8 + id % 13).toInt   // 8..20
    def height(id: Long): Int = (8 + id % 11).toInt  // 8..18
    def r(x: Int, y: Int, id: Long): Int = ((x * 7 + y * 11 + id * 13) % 256).toInt
    def g(x: Int, y: Int, id: Long): Int = ((x * 5 + y * 3 + id * 17) % 256).toInt
    def b(x: Int, y: Int, id: Long): Int = ((x + y + id) % 256).toInt
  }

  /** Minimal 24-bit uncompressed BMP writer (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, bottom-up BGR rows padded to 4 bytes) — the
    * fixture side of the decode proof. Runs on executors.
    */
  object Bmp {
    def encode(id: Long): Array[Byte] = {
      val w = Pattern.width(id)
      val h = Pattern.height(id)
      val rowSize = ((w * 3 + 3) / 4) * 4
      val size = 54 + rowSize * h
      val buf = java.nio.ByteBuffer.allocate(size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte)
      buf.putInt(size).putInt(0).putInt(54)
      buf.putInt(40).putInt(w).putInt(h)
      buf.putShort(1).putShort(24)
      buf.putInt(0).putInt(rowSize * h)
      buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = h - 1
      while (y >= 0) { // bottom-up row order
        var x = 0
        while (x < w) {
          buf.put(Pattern.b(x, y, id).toByte)
          buf.put(Pattern.g(x, y, id).toByte)
          buf.put(Pattern.r(x, y, id).toByte)
          x += 1
        }
        var p = w * 3
        while (p < rowSize) { buf.put(0.toByte); p += 1 }
        y -= 1
      }
      buf.array()
    }

    /** Decode via the JDK's ImageIO BMP reader — receives only the bytes,
      * no access to the generating pattern.
      */
    def decode(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "no ImageIO decoder matched the payload")
      img
    }
  }

  /** Real COMPRESSED-codec writer: the same planted [[Pattern]] raster
    * encoded as PNG through `javax.imageio` — a genuine
    * deflate-compressed payload (what 100% of real image corpora carry),
    * decoded by the same ImageIO path as BMP. PNG is lossless, so every
    * planted-truth oracle carries over byte-exact; JPEG would need
    * tolerance-checked stats and is deliberately not the proof vehicle.
    */
  object Png {
    def encode(id: Long): Array[Byte] = {
      val w = Pattern.width(id)
      val h = Pattern.height(id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (Pattern.r(x, y, id) << 16) |
            (Pattern.g(x, y, id) << 8) | Pattern.b(x, y, id))
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
  }

  /** LOSSY-codec writer: the planted [[Pattern]] raster as a real JPEG
    * through `javax.imageio` (DCT + quantization at the writer's default
    * quality). Unlike BMP/PNG the decoded pixels are NOT the planted
    * ones, so the proof changes shape: the registered query checks the
    * decoded per-channel MEANS against the analytic truth within a fixed
    * tolerance INSIDE the query (JPEG quantizes AC coefficients hard but
    * preserves block DC — image-level means survive within a few
    * levels), and emits booleans the oracle expects to be TRUE. A broken
    * decoder, a swapped channel order, or a corrupted payload flips a
    * boolean and fails the hash compare.
    */
  object Jpeg {
    def encode(id: Long): Array[Byte] = {
      val w = Pattern.width(id)
      val h = Pattern.height(id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (Pattern.r(x, y, id) << 16) |
            (Pattern.g(x, y, id) << 8) | Pattern.b(x, y, id))
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
  }

  /** Image table: one real image binary per document id, built on the
    * executors with `enc`. At 100 TB this is the ingest-side scan of a
    * binary column; everything downstream sees only (id, bytes).
    */
  private def imageTableWith(spark: SparkSession, dir: String,
                             enc: Long => Array[Byte]): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, enc(id))))
      .toDF("media_id", "payload")
  }

  def imageTable(spark: SparkSession, dir: String): DataFrame =
    imageTableWith(spark, dir, Bmp.encode)

  /** One real PNG binary per document id — the compressed-codec twin of
    * [[imageTable]].
    */
  def pngTable(spark: SparkSession, dir: String): DataFrame =
    imageTableWith(spark, dir, Png.encode)

  /** One real JPEG binary per document id — the lossy-codec leg. */
  def jpegTable(spark: SparkSession, dir: String): DataFrame =
    imageTableWith(spark, dir, Jpeg.encode)

  // ---------- perceptual near-dup: planted twins + aHash banding ----------

  /** media_id offset marking a planted near-dup twin of `id − offset`. */
  val TwinOffset = 1000000L

  /** Deterministic channel deltas applied to pixel (0,0) of a twin —
    * exactly one aHash SAMPLE cell moves, so the twin's hash lands
    * within a few bits of its base (the perturbed bit itself plus any
    * borderline bits the mean shift tips).
    */
  object Twin {
    val dr = 101; val dg = 59; val db = 37
    def encode(id: Long): Array[Byte] = {
      val bytes = Bmp.encode(id)
      val w = Pattern.width(id); val h = Pattern.height(id)
      val rowSize = ((w * 3 + 3) / 4) * 4
      val off = 54 + rowSize * (h - 1) // pixel (0,0): last bottom-up row
      bytes(off) = ((Pattern.b(0, 0, id) + db) % 256).toByte
      bytes(off + 1) = ((Pattern.g(0, 0, id) + dg) % 256).toByte
      bytes(off + 2) = ((Pattern.r(0, 0, id) + dr) % 256).toByte
      bytes
    }
  }

  /** The image corpus with planted near-dups: every 8th document's image
    * appears twice — the original, and a twin (media_id + [[TwinOffset]])
    * whose bytes differ in exactly one pixel.
    */
  def nearDupImageTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    val base = ids.mapPartitions(_.map(id => (id, Bmp.encode(id))))
      .toDF("media_id", "payload")
    val twins = ids.filter(_ % 8 == 0)
      .mapPartitions(_.map(id => (id + TwinOffset, Twin.encode(id))))
      .toDF("media_id", "payload")
    base.unionByName(twins)
  }

  /** Perceptual near-dup image pairs over the twin-planted corpus: aHash
    * every payload (REAL decode), band the 64-bit hash into `nBands`
    * 16-bit bands, candidate pairs share a band (the SimHash/MinHash LSH
    * shape — by pigeonhole every pair within Hamming ≤ nBands−1 MUST
    * collide on some band, so planted twins are guaranteed candidates
    * when ≤ 3 bits moved), then verify candidates with the exact Hamming
    * distance and keep those ≤ `maxDist`.
    *
    * The registered output is the PER-IMAGE neighbor summary
    * (`n_neighbors`, `min_hamming`, `twin_found`), not the raw pair
    * list: these synthetic gradient rasters are legitimately near-dup
    * across ids sharing a geometry (the id term shifts all samples
    * almost uniformly, which the mean-relative aHash bit ignores), so
    * the true near-dup graph is DENSE within dimension classes and a
    * pair-grain result would scale with that graph's edges; the image
    * grain stays linear in the corpus no matter how clustered the dups.
    *
    * Scale: banding multiplies the hash table by nBands; the candidate
    * join is an equi-join on (band_idx, band) whose groups are
    * birthday-bounded (16-bit bands: expected collisions n²/2¹⁷ per
    * band, dup-graph-sized output); the exact verify runs only on
    * candidates. No all-pairs stage — the same discipline as the text
    * dedup chain. Hamming is computed from four 16-bit chunks via
    * `conv(…,2,10)` + XOR + `bit_count`, all codegen'd builtins.
    */
  def ahashNearDups(spark: SparkSession, dir: String,
                    maxDist: Int = 8, nBands: Int = 4): DataFrame = {
    val hashes = graft.Memo(spark, "mm_ahash_neardup_hashes", dir, "mm_ahash_pairs") {
      aHashOf(spark, nearDupImageTable(spark, dir)).select("media_id", "ahash")
    }
    val bandW = 64 / nBands
    def ham(ha: Column, hb: Column): Column = (0 until 4).map { i =>
      bit_count(
        conv(substring(ha, 1 + i * 16, 16), 2, 10).cast("long")
          .bitwiseXOR(conv(substring(hb, 1 + i * 16, 16), 2, 10).cast("long")))
    }.reduce(_ + _)
    def shareBand(ha: Column, hb: Column): Column = (0 until nBands).map(i =>
      substring(ha, 1 + i * bandW, bandW) === substring(hb, 1 + i * bandW, bandW))
      .reduce(_ || _)
    // collapse to one LSH participant per DISTINCT hash first: a cluster
    // of c byte-identical images (repeated logos/banners in a real crawl
    // — and this fixture's dense dup classes) would otherwise band into
    // c²/2 candidate pairs that all verify at hamming 0 (measured 37× at
    // 10× before the collapse). Neighbor relations are a function of
    // the HASH alone, so per-image results are recovered exactly from
    // class membership counts.
    val classes = hashes.groupBy("ahash")
      .agg(count(lit(1)).as("n_members"))
    val bandArr = array((0 until nBands).map(i =>
      substring(col("ahash"), 1 + i * bandW, bandW)): _*)
    val bands = classes.select(col("ahash"), col("n_members"),
      posexplode(bandArr).as(Seq("band_idx", "band")))
    val cand = bands.as("a").join(bands.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band") === col("b.band") &&
        col("a.ahash") < col("b.ahash"))
      .select(col("a.ahash").as("ha"), col("a.n_members").as("na"),
        col("b.ahash").as("hb"), col("b.n_members").as("nb"))
      .distinct()
    val pairs = cand
      .withColumn("hamming", ham(col("ha"), col("hb")).cast("int"))
      .filter(col("hamming") <= maxDist)
    val sym = pairs
      .select(col("ha").as("ahash"), col("nb").as("n_nbr"), col("hamming"))
      .unionByName(pairs
        .select(col("hb").as("ahash"), col("na").as("n_nbr"), col("hamming")))
    val classNbr = sym.groupBy("ahash")
      .agg(sum("n_nbr").as("cross_nbrs"), min("hamming").as("min_cross"))
    // twin detection at the ID grain: every (x, x+TwinOffset) pair via a
    // 1-to-1 self-join (linear in the corpus), qualified by the SAME
    // neighbor definition (shares a band AND hamming ≤ maxDist)
    val twinPairs = hashes.as("x").join(hashes.as("y"),
        col("y.media_id") === col("x.media_id") + lit(TwinOffset))
      .filter(shareBand(col("x.ahash"), col("y.ahash")) &&
        ham(col("x.ahash"), col("y.ahash")) <= maxDist)
      .select(col("x.media_id").as("xa"), col("y.media_id").as("xb"))
    val twinIds = twinPairs.select(col("xa").as("media_id"))
      .unionByName(twinPairs.select(col("xb").as("media_id")))
      .distinct().withColumn("_tf", lit(true))
    hashes.join(classes, "ahash")
      .join(classNbr, Seq("ahash"), "left")
      .join(twinIds, Seq("media_id"), "left")
      .select(col("media_id"),
        (col("n_members") - 1 + coalesce(col("cross_nbrs"), lit(0L)))
          .as("n_neighbors"),
        when(col("n_members") > 1, lit(0)).otherwise(col("min_cross"))
          .cast("int").as("min_hamming"),
        coalesce(col("_tf"), lit(false)).as("twin_found"))
      .filter(col("n_neighbors") >= 1)
  }

  /** Oracle: both variants' hashes recomputed ANALYTICALLY from the
    * planted pattern (twin deltas applied at sample k = 0), then the
    * same banding, candidate join, and BIT-xor popcount verify.
    */
  def ahashNearDupsSql(maxDist: Int = 8, nBands: Int = 4): String = {
    val bandW = 64 / nBands
    s"""WITH media AS (
       |  SELECT doc_id AS media_id, doc_id AS bid, 0 AS tw FROM documents
       |  UNION ALL
       |  SELECT doc_id + $TwinOffset, doc_id, 1 FROM documents WHERE doc_id % 8 = 0
       |), dims AS (
       |  SELECT media_id, bid, tw,
       |         CAST(8 + bid % 13 AS INT) AS width,
       |         CAST(8 + bid % 11 AS INT) AS height
       |  FROM media
       |), samp AS (
       |  SELECT d.media_id, d.bid, d.tw,
       |         CAST(j.j * 8 + i.i AS INT) AS k,
       |         (d.width * i.i) // 8 AS sx,
       |         (d.height * j.j) // 8 AS sy
       |  FROM dims d, range(0, 8) i(i), range(0, 8) j(j)
       |), g AS (
       |  SELECT media_id, k,
       |         CASE WHEN tw = 1 AND k = 0
       |           THEN ((sx * 7 + sy * 11 + bid * 13) % 256 + ${Twin.dr}) % 256
       |              + ((sx * 5 + sy * 3 + bid * 17) % 256 + ${Twin.dg}) % 256
       |              + ((sx + sy + bid) % 256 + ${Twin.db}) % 256
       |           ELSE (sx * 7 + sy * 11 + bid * 13) % 256
       |              + (sx * 5 + sy * 3 + bid * 17) % 256
       |              + (sx + sy + bid) % 256
       |         END AS gray
       |  FROM samp
       |), t AS (
       |  SELECT media_id, k, gray,
       |         SUM(gray) OVER (PARTITION BY media_id) AS tot
       |  FROM g
       |), hashes AS (
       |  SELECT media_id,
       |         string_agg(CASE WHEN gray * 64 > tot THEN '1' ELSE '0' END, ''
       |                    ORDER BY k) AS ahash
       |  FROM t GROUP BY 1
       |), bands AS (
       |  SELECT media_id, CAST(b.b AS INT) AS band_idx,
       |         substr(ahash, 1 + CAST(b.b AS INT) * $bandW, $bandW) AS band
       |  FROM hashes, range(0, $nBands) b(b)
       |), cand AS (
       |  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band = b.band
       |   AND a.media_id < b.media_id
       |), pairs AS (
       |  SELECT media_a, media_b,
       |         CAST(bit_count(xor(CAST(ha.ahash AS BIT), CAST(hb.ahash AS BIT)))
       |              AS INT) AS hamming
       |  FROM cand
       |  JOIN hashes ha ON ha.media_id = cand.media_a
       |  JOIN hashes hb ON hb.media_id = cand.media_b
       |  WHERE bit_count(xor(CAST(ha.ahash AS BIT), CAST(hb.ahash AS BIT))) <= $maxDist
       |), sym AS (
       |  SELECT media_a AS media_id, media_b AS nbr, hamming FROM pairs
       |  UNION ALL
       |  SELECT media_b, media_a, hamming FROM pairs
       |)
       |SELECT media_id, COUNT(*) AS n_neighbors, MIN(hamming) AS min_hamming,
       |       MAX(CASE WHEN abs(nbr - media_id) = $TwinOffset THEN 1 ELSE 0 END) = 1
       |         AS twin_found
       |FROM sym GROUP BY 1""".stripMargin
  }

  /** Decode the JPEG payloads and bound the decoded means against the
    * planted truth: (media_id, width, height, r_ok, g_ok, b_ok) with
    * X_ok = |decoded channel mean − analytic channel mean| ≤ tolerance.
    * Dims must survive exactly; means within the DC-preservation
    * tolerance — `tol` levels for R/G, `tolChroma` for B, which rides
    * almost entirely on the 4:2:0-subsampled, harder-quantized Cb plane.
    * Tolerances are MEASURED via [[jpegErrors]] (`tools/JpegErr`) and
    * are CORPUS-SIZE-INDEPENDENT: [[Pattern]] is periodic with cycle
    * lcm(13, 11, 256) = 36 608 ids, and the 10× replica (50 000 ids)
    * covers the whole space — max mean errors over it r/g/b:
    * 5.03 / 3.22 / 12.14 (vs 2.4 / 1.5 / 9.1 at sf0.01 and
    * 4.6 / 2.7 / 10.3 at sf0.1, which sample the space partially).
    * The bounds sit above the full-space worst with margin, so they
    * hold at ANY corpus size. The spec separately proves the codec is
    * genuinely lossy (pixel-level error nonzero) so this is not
    * vacuously the PNG leg.
    */
  def jpegCheck(spark: SparkSession, dir: String,
                tol: Double = 6.0, tolChroma: Double = 15.0): DataFrame =
    jpegErrors(spark, dir)
      .select(col("media_id"), col("width"), col("height"),
        (col("r_err") <= tol).as("r_ok"),
        (col("g_err") <= tol).as("g_ok"),
        (col("b_err") <= tolChroma).as("b_ok"))

  /** The raw per-channel |decoded mean − analytic mean| errors behind
    * [[jpegCheck]] — exposed so the tolerance is MEASURED (the spec and
    * the builder's calibration read these; the registered check reads
    * the flags).
    */
  private[graft] def jpegErrors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    jpegTable(spark, dir).as[(Long, Array[Byte])].mapPartitions { batch =>
      batch.map { case (id, payload) =>
        val img = Bmp.decode(payload)
        val (w, h) = (img.getWidth, img.getHeight)
        var rs = 0L; var gs = 0L; var bs = 0L
        var trs = 0L; var tgs = 0L; var tbs = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            rs += (rgb >> 16) & 0xFF; gs += (rgb >> 8) & 0xFF; bs += rgb & 0xFF
            trs += Pattern.r(x, y, id); tgs += Pattern.g(x, y, id)
            tbs += Pattern.b(x, y, id)
            x += 1
          }
          y += 1
        }
        val n = (w * h).toDouble
        (id, w, h,
          math.abs(rs / n - trs / n),
          math.abs(gs / n - tgs / n),
          math.abs(bs / n - tbs / n))
      }
    }.toDF("media_id", "width", "height", "r_err", "g_err", "b_err")
  }

  /** Oracle for [[jpegCheck]]: analytic dims + all-TRUE tolerance flags —
    * the Spark side must EARN the TRUEs from real decoded bytes.
    * (def: `dimsSql` initializes later in the object.)
    */
  def jpegCheckSql: String =
    s"""WITH dims AS (
       |  $dimsSql
       |)
       |SELECT media_id, width, height,
       |       TRUE AS r_ok, TRUE AS g_ok, TRUE AS b_ok
       |FROM dims""".stripMargin

  /** Batched decode + feature extraction over REAL pixels: width, height,
    * exact per-channel integer sums, and per-channel means (one IEEE
    * division of exact integers — bit-identical across engines). One
    * `mapPartitions` batch per partition; the decoder touches only the
    * payload bytes.
    */
  def imageStats(spark: SparkSession, dir: String): DataFrame =
    imageStatsOf(spark, imageTable(spark, dir))

  /** [[imageStats]] over the PNG payloads — same decoder entry point
    * (`ImageIO.read` dispatches on the magic bytes), same stats, but the
    * bytes crossed a real compression boundary.
    */
  def pngStats(spark: SparkSession, dir: String): DataFrame =
    imageStatsOf(spark, pngTable(spark, dir))

  private def imageStatsOf(spark: SparkSession, tbl: DataFrame): DataFrame = {
    import spark.implicits._
    tbl.as[(Long, Array[Byte])].mapPartitions { batch =>
      batch.map { case (id, payload) =>
        val img = Bmp.decode(payload)
        val (w, h) = (img.getWidth, img.getHeight)
        var rs = 0L; var gs = 0L; var bs = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            rs += (rgb >> 16) & 0xFF; gs += (rgb >> 8) & 0xFF; bs += rgb & 0xFF
            x += 1
          }
          y += 1
        }
        val n = (w * h).toDouble
        (id, w, h, rs, gs, bs, rs / n, gs / n, bs / n)
      }
    }.toDF("media_id", "width", "height", "r_sum", "g_sum", "b_sum",
      "r_mean", "g_mean", "b_mean")
  }

  /** Real image resize: decode, nearest-neighbor sample to `tw`×`th`
    * (source pixel (i·w)/tw, (j·h)/th — integer floor, the standard NN
    * grid), and report the thumbnail's exact channel sums. Binary in,
    * stats out; the decoded raster is the only data source.
    */
  def imageResize(spark: SparkSession, dir: String,
                  tw: Int = 8, th: Int = 8): DataFrame = {
    import spark.implicits._
    imageTable(spark, dir).as[(Long, Array[Byte])].mapPartitions { batch =>
      batch.map { case (id, payload) =>
        val img = Bmp.decode(payload)
        val (w, h) = (img.getWidth, img.getHeight)
        var rs = 0L; var gs = 0L; var bs = 0L
        var j = 0
        while (j < th) {
          var i = 0
          while (i < tw) {
            val rgb = img.getRGB(i * w / tw, j * h / th)
            rs += (rgb >> 16) & 0xFF; gs += (rgb >> 8) & 0xFF; bs += rgb & 0xFF
            i += 1
          }
          j += 1
        }
        (id, w, h, tw, th, rs, gs, bs)
      }
    }.toDF("media_id", "orig_w", "orig_h", "out_w", "out_h",
      "r_sum", "g_sum", "b_sum")
  }

  // ---------- real audio path: encode → decode → windowed stats ----------

  /** Deterministic per-id audio geometry/pattern — the planted truth the
    * audio oracle recomputes analytically. Sample counts are multiples
    * of the 64-sample window so every window is full; amplitudes are
    * non-negative-modulo integers shifted into ±2000 (16-bit safe).
    */
  object AudioPattern {
    val sampleRate = 8000
    val windowSamples = 64
    def nSamples(id: Long): Int = (256 + (id % 7) * 64).toInt // 256..640
    def amp(i: Int, id: Long): Int = ((i * 31L + id * 17) % 4001).toInt - 2000
  }

  /** Minimal 16-bit mono PCM WAV writer (canonical 44-byte RIFF header +
    * little-endian samples) — the fixture side of the audio decode
    * proof. Runs on executors, like [[Bmp.encode]].
    */
  object Wav {
    def encode(id: Long): Array[Byte] = {
      val n = AudioPattern.nSamples(id)
      val dataBytes = n * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)                                  // PCM
        .putShort(1)                                  // mono
        .putInt(AudioPattern.sampleRate)
        .putInt(AudioPattern.sampleRate * 2)          // byte rate
        .putShort(2)                                  // block align
        .putShort(16)                                 // bits per sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
      var i = 0
      while (i < n) { buf.putShort(AudioPattern.amp(i, id).toShort); i += 1 }
      buf.array()
    }

    /** Decode via the JDK's javax.sound WAV reader — a REAL audio
      * parser (header fields come from `AudioFormat`, samples from the
      * decoded stream), receiving only the bytes.
      */
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Int]) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val f = ais.getFormat
      require(!f.isBigEndian && f.getSampleSizeInBits == 16,
        s"unexpected decoded format $f")
      val raw = ais.readAllBytes()
      ais.close()
      val samples = new Array[Int](raw.length / 2)
      var i = 0
      while (i < samples.length) {
        samples(i) = ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort.toInt
        i += 1
      }
      (f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits, samples)
    }
  }

  /** Audio table: one real WAV binary per document id, built on the
    * executors (the audio twin of [[imageTable]]).
    */
  def audioTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, Wav.encode(id))))
      .toDF("media_id", "payload")
  }

  /** Batched decode + per-window stats over REAL PCM samples: the
    * header's sample rate, the total sample count, and per 64-sample
    * window the exact integer amplitude sum, energy (Σ amp²), and peak
    * |amp| — all integers, so the analytic oracle matches bit-for-bit.
    * One `mapPartitions` batch per partition, same shape as
    * [[imageStats]]; a real codec (mp3/opus) would slot into
    * [[Wav.decode]]'s position unchanged.
    */
  def audioStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val win = AudioPattern.windowSamples
    audioTable(spark, dir).as[(Long, Array[Byte])].mapPartitions { batch =>
      batch.flatMap { case (id, payload) =>
        val (rate, channels, bits, samples) = Wav.decode(payload)
        require(channels == 1 && bits == 16)
        (0 until samples.length / win).iterator.map { w =>
          var s = 0L; var sq = 0L; var peak = 0
          var i = w * win
          while (i < (w + 1) * win) {
            val a = samples(i)
            s += a; sq += a.toLong * a
            if (math.abs(a) > peak) peak = math.abs(a)
            i += 1
          }
          (id, rate, samples.length, w, s, sq, peak)
        }
      }
    }.toDF("media_id", "sample_rate", "n_samples", "win_idx",
      "win_sum", "win_sq", "win_peak")
  }

  /** Perceptual audio fingerprint — the energy-hash twin of
    * [[imageAHash]]: one bit per 64-sample window, set when the
    * window's energy (Σ amp², exact integer) exceeds the clip mean —
    * the test is `sq·n_windows > total`, division-free. Emitted as a
    * bit string whose length is the clip's window count, so clips of
    * different lengths are honestly incomparable (production systems
    * band fixed-length frames the same way). One decode pass,
    * stats-sized output; every bit oracle-recomputed analytically from
    * the planted PCM pattern.
    */
  /** The fingerprint kernel: (window count, bit string, set-bit count)
    * from raw samples — package-visible so the spec can feed crafted
    * loud/quiet clips (the planted corpus pattern is uniform noise, so
    * its energies are honestly near-constant; semantics are proven on
    * structured input, bit-exactness on the corpus by the oracle).
    */
  private[graft] def energyBits(samples: Array[Int], win: Int): (Int, String, Long) = {
    val nw = samples.length / win
    val sq = new Array[Long](nw)
    var tot = 0L
    var w = 0
    while (w < nw) {
      var acc = 0L
      var i = w * win
      while (i < (w + 1) * win) {
        val a = samples(i); acc += a.toLong * a; i += 1
      }
      sq(w) = acc; tot += acc; w += 1
    }
    val sb = new java.lang.StringBuilder(nw)
    var ones = 0L
    var k = 0
    while (k < nw) {
      if (sq(k) * nw > tot) { sb.append('1'); ones += 1 }
      else sb.append('0')
      k += 1
    }
    (nw, sb.toString, ones)
  }

  def audioFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val win = AudioPattern.windowSamples
    audioTable(spark, dir).as[(Long, Array[Byte])].mapPartitions { batch =>
      batch.map { case (id, payload) =>
        val (_, channels, bits, samples) = Wav.decode(payload)
        require(channels == 1 && bits == 16)
        val (nw, hash, ones) = energyBits(samples, win)
        (id, nw, hash, ones)
      }
    }.toDF("media_id", "n_windows", "ehash", "n_set")
  }

  val audioFingerprintSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(256 + (doc_id % 7) * 64 AS INT) AS n FROM documents
      |), s AS (
      |  SELECT d.doc_id, d.n, CAST(w.w AS INT) AS win_idx,
      |         (CAST(w.w AS INT) * 64 + CAST(i.i AS INT)) * 31 + d.doc_id * 17 AS base
      |  FROM d
      |  JOIN range(0, 10) w(w) ON w.w < d.n // 64
      |  CROSS JOIN range(0, 64) i(i)
      |), amps AS (
      |  SELECT doc_id, n, win_idx, CAST(base % 4001 - 2000 AS BIGINT) AS amp FROM s
      |), wsq AS (
      |  SELECT doc_id, n, win_idx, SUM(amp * amp) AS sq FROM amps GROUP BY 1, 2, 3
      |), t AS (
      |  SELECT doc_id, n // 64 AS nw, win_idx, sq,
      |         SUM(sq) OVER (PARTITION BY doc_id) AS tot
      |  FROM wsq
      |)
      |SELECT doc_id AS media_id, CAST(nw AS INT) AS n_windows,
      |       string_agg(CASE WHEN sq * nw > tot THEN '1' ELSE '0' END, ''
      |                  ORDER BY win_idx) AS ehash,
      |       CAST(SUM(CASE WHEN sq * nw > tot THEN 1 ELSE 0 END) AS BIGINT) AS n_set
      |FROM t GROUP BY 1, 2""".stripMargin

  // ---------- real video path: encode → RIFF walk → per-frame stats ----------

  /** Deterministic per-id video geometry/pattern — the planted truth the
    * video oracle recomputes analytically. Pixel values depend on the
    * frame index too, so a decoder that misorders or drops frames
    * diverges.
    */
  object VideoPattern {
    val fps = 10
    def width(id: Long): Int = (8 + id % 9).toInt   // 8..16
    def height(id: Long): Int = (8 + id % 7).toInt  // 8..14
    def nFrames(id: Long): Int = (2 + id % 4).toInt // 2..5
    def r(x: Int, y: Int, f: Int, id: Long): Int =
      ((x * 7 + y * 11 + f * 19 + id * 13) % 256).toInt
    def g(x: Int, y: Int, f: Int, id: Long): Int =
      ((x * 5 + y * 3 + f * 23 + id * 17) % 256).toInt
    def b(x: Int, y: Int, f: Int, id: Long): Int =
      ((x + y + f + id) % 256).toInt
  }

  /** Minimal uncompressed AVI writer/parser — the video twin of
    * [[Bmp]]/[[Wav]]. The container is a genuine RIFF 'AVI ' tree
    * (LIST hdrl { avih, LIST strl { strh 'vids'/'DIB ', strf
    * BITMAPINFOHEADER } }, LIST movi { '00db' raw DIB frames }); each
    * frame is a bottom-up BGR24 raster with rows padded to 4 bytes,
    * exactly the BMP pixel-array layout. The JDK ships no AVI demuxer,
    * so [[decode]] is an honest chunk walker: it navigates fourcc/size
    * framing (word alignment included), takes geometry from the strf
    * BITMAPINFOHEADER cross-checked against avih, and extracts the movi
    * frame payloads in stream order — receiving only the bytes.
    */
  object Avi {
    def encode(id: Long): Array[Byte] = {
      val w = VideoPattern.width(id)
      val h = VideoPattern.height(id)
      val nf = VideoPattern.nFrames(id)
      val rowSize = ((w * 3 + 3) / 4) * 4
      val frameBytes = rowSize * h
      val strlContent = 4 + (8 + 56) + (8 + 40)   // 'strl' + strh + strf
      val hdrlContent = 4 + (8 + 56) + (8 + strlContent)
      val moviContent = 4 + nf * (8 + frameBytes) // frameBytes % 4 == 0: aligned
      val riffContent = 4 + (8 + hdrlContent) + (8 + moviContent)
      val buf = java.nio.ByteBuffer.allocate(8 + riffContent)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def cc(s: String) = buf.put(s.getBytes("US-ASCII"))
      cc("RIFF"); buf.putInt(riffContent); cc("AVI ")
      cc("LIST"); buf.putInt(hdrlContent); cc("hdrl")
      cc("avih"); buf.putInt(56)
      buf.putInt(1000000 / VideoPattern.fps)      // usec per frame
        .putInt(frameBytes * VideoPattern.fps)    // max bytes/sec
        .putInt(0)                                // padding granularity
        .putInt(0x10)                             // AVIF_HASINDEX off, interleaved off
        .putInt(nf).putInt(0).putInt(1)           // totalFrames, initial, streams
        .putInt(frameBytes).putInt(w).putInt(h)
        .putInt(0).putInt(0).putInt(0).putInt(0)  // reserved
      cc("LIST"); buf.putInt(strlContent); cc("strl")
      cc("strh"); buf.putInt(56)
      cc("vids"); cc("DIB ")
      buf.putInt(0).putShort(0).putShort(0).putInt(0)   // flags, prio, lang, initial
        .putInt(1).putInt(VideoPattern.fps)             // scale, rate
        .putInt(0).putInt(nf)                           // start, length
        .putInt(frameBytes).putInt(-1).putInt(0)        // bufSize, quality, sampleSize
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
      cc("strf"); buf.putInt(40)
      buf.putInt(40).putInt(w).putInt(h)          // biSize, biWidth, biHeight (+: bottom-up)
        .putShort(1).putShort(24)                 // planes, bpp
        .putInt(0).putInt(frameBytes)             // BI_RGB, biSizeImage
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      cc("LIST"); buf.putInt(moviContent); cc("movi")
      var f = 0
      while (f < nf) {
        cc("00db"); buf.putInt(frameBytes)
        var y = h - 1
        while (y >= 0) { // bottom-up rows, BGR order, padded to 4 bytes
          var x = 0
          while (x < w) {
            buf.put(VideoPattern.b(x, y, f, id).toByte)
            buf.put(VideoPattern.g(x, y, f, id).toByte)
            buf.put(VideoPattern.r(x, y, f, id).toByte)
            x += 1
          }
          var p = w * 3
          while (p < rowSize) { buf.put(0.toByte); p += 1 }
          y -= 1
        }
        f += 1
      }
      buf.array()
    }

    /** (width, height, frames in stream order — each a raw bottom-up
      * BGR24 DIB raster). A mis-read size field, a skipped pad byte, or
      * trusting avih over strf where they disagree all fail loudly.
      */
    def decode(payload: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
      val buf = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      require(fourcc() == "RIFF", "not a RIFF file")
      val riffSize = buf.getInt
      require(riffSize + 8 <= payload.length, "truncated RIFF")
      require(fourcc() == "AVI ", "not an AVI")
      var avihW = -1; var avihH = -1
      var w = -1; var h = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(end: Int): Unit =
        while (buf.position() < end) {
          val id = fourcc()
          val sz = buf.getInt
          val next = buf.position() + sz + (sz & 1) // chunks are word-aligned
          id match {
            case "LIST" =>
              fourcc() // list type: hdrl / strl / movi — recurse regardless
              walk(next)
            case "avih" =>
              val p = buf.position()
              avihW = buf.getInt(p + 32); avihH = buf.getInt(p + 36)
            case "strf" =>
              val p = buf.position()
              require(buf.getInt(p) == 40, "strf is not a BITMAPINFOHEADER")
              w = buf.getInt(p + 4); h = buf.getInt(p + 8)
              require(buf.getShort(p + 14) == 24, "not BGR24")
              require(buf.getInt(p + 16) == 0, "compressed stream")
            case "00db" | "00dc" =>
              val fb = new Array[Byte](sz); buf.get(fb); frames += fb
            case _ => () // strh, idx1, JUNK — framing only
          }
          buf.position(next)
        }
      walk(8 + riffSize)
      require(w > 0 && h > 0, "no strf seen before frames")
      require(w == avihW && h == avihH, s"avih $avihW×$avihH != strf $w×$h")
      (w, h, frames.toArray)
    }
  }

  /** Video table: one real AVI binary per document id, built on the
    * executors (the video twin of [[imageTable]]/[[audioTable]]).
    */
  def videoTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, Avi.encode(id))))
      .toDF("media_id", "payload")
  }

  /** Demux + frame-sample + per-frame stats over REAL DIB rasters: every
    * `stride`-th frame (a training pipeline never featurizes all frames)
    * is decoded from its bottom-up padded BGR rows into exact integer
    * channel sums. One `mapPartitions` batch per partition; an mp4/h264
    * demuxer+codec would slot into [[Avi.decode]]'s position unchanged.
    */
  def videoStats(spark: SparkSession, dir: String, stride: Int = 2): DataFrame = {
    import spark.implicits._
    videoTable(spark, dir).as[(Long, Array[Byte])].mapPartitions { batch =>
      batch.flatMap { case (id, payload) =>
        val (w, h, frames) = Avi.decode(payload)
        val rowSize = ((w * 3 + 3) / 4) * 4
        frames.iterator.zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (fb, fi) =>
            require(fb.length == rowSize * h, s"frame $fi size ${fb.length}")
            var rs = 0L; var gs = 0L; var bs = 0L
            var y = 0
            while (y < h) {
              val base = (h - 1 - y) * rowSize // stored bottom-up
              var x = 0
              while (x < w) {
                bs += fb(base + x * 3) & 0xFF
                gs += fb(base + x * 3 + 1) & 0xFF
                rs += fb(base + x * 3 + 2) & 0xFF
                x += 1
              }
              y += 1
            }
            (id, w, h, frames.length, fi, rs, gs, bs)
          }
      }
    }.toDF("media_id", "width", "height", "n_frames", "frame_idx",
      "r_sum", "g_sum", "b_sum")
  }

  /** Frame sampling: every `stride`-th fixed-size byte slice of the
    * payload (a video frame-sampler's plumbing; pure column ops).
    */
  def frameSample(spark: SparkSession, dir: String,
                  frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = floor(length(col("payload")) / (frameBytes * stride)).cast("int")
    mediaTable(spark, dir)
      .select(col("media_id"), col("payload"), nFrames.as("n"))
      .filter(col("n") > 0)
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), col("n") - 1),
          i => substring(col("payload"), (i * frameBytes * stride) + 1, lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
  }

  // ---------- driver-check projections + DuckDB oracles ----------
  //
  // The BINARY payload / ARRAY feature columns themselves can't round-trip
  // the driver's hash compare (pandas can't sort array cells; binary
  // doesn't hash), so the REGISTERED queries project md5 digests + byte
  // counts instead — full-strength content checks over scalar columns.
  // The oracles recompute the digests from `documents.text` in DuckDB;
  // this corpus is pure ASCII (length == octet_length for every row at
  // every SF), so DuckDB character slicing equals Spark byte slicing.

  /** [[mediaTable]] with the payload projected to its md5 digest. */
  def mediaCheck(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("media_id"), md5(col("payload")).as("payload_md5"),
      col("media_type"), col("payload_bytes"))

  private val mediaTypeSql =
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END"

  val mediaCheckSql: String =
    s"""SELECT doc_id AS media_id, md5(text) AS payload_md5,
       |       $mediaTypeSql AS media_type,
       |       CAST(length(text) AS INT) AS payload_bytes
       |FROM documents""".stripMargin

  /** The analytic dims CTE both image oracles share: the planted truth
    * [[Pattern]] re-expressed in SQL, never touching the binary.
    */
  private val dimsSql =
    """SELECT doc_id AS media_id,
      |         CAST(8 + doc_id % 13 AS INT) AS width,
      |         CAST(8 + doc_id % 11 AS INT) AS height
      |  FROM documents""".stripMargin

  /** [[imageStats]] is already scalar — registered as-is. The oracle
    * enumerates every (x, y) of every image analytically and aggregates
    * the SAME stats the Spark side computed from decoded BMP bytes.
    */
  def featuresCheck(spark: SparkSession, dir: String): DataFrame =
    imageStats(spark, dir)

  val featuresCheckSql: String =
    s"""WITH dims AS (
       |  $dimsSql
       |), px AS (
       |  SELECT d.media_id, d.width, d.height,
       |         (x.x * 7 + y.y * 11 + d.media_id * 13) % 256 AS r,
       |         (x.x * 5 + y.y * 3 + d.media_id * 17) % 256 AS g,
       |         (x.x + y.y + d.media_id) % 256 AS b
       |  FROM dims d
       |  JOIN range(0, 21) x(x) ON x.x < d.width
       |  JOIN range(0, 19) y(y) ON y.y < d.height
       |), agg AS (
       |  SELECT media_id, width, height,
       |         CAST(sum(r) AS BIGINT) AS r_sum,
       |         CAST(sum(g) AS BIGINT) AS g_sum,
       |         CAST(sum(b) AS BIGINT) AS b_sum
       |  FROM px GROUP BY 1, 2, 3
       |)
       |SELECT media_id, width, height, r_sum, g_sum, b_sum,
       |       CAST(r_sum AS DOUBLE) / (width * height) AS r_mean,
       |       CAST(g_sum AS DOUBLE) / (width * height) AS g_mean,
       |       CAST(b_sum AS DOUBLE) / (width * height) AS b_mean
       |FROM agg""".stripMargin

  /** [[imageResize]] is already scalar — registered as-is. */
  def resizeCheck(spark: SparkSession, dir: String): DataFrame =
    imageResize(spark, dir)

  /** Nearest-neighbor twin of [[imageResize]] (8×8): the sampled source
    * pixel of thumbnail cell (i, j) is ((i·w)/8, (j·h)/8) with floor
    * division — `//` in DuckDB, Java int division on the Spark side.
    */
  /** Perceptual image fingerprint (average hash): decode, NN-sample the
    * raster to 8×8, gray = r+g+b per sampled pixel, bit k = 1 iff the
    * pixel is brighter than the image mean — the classic aHash, the
    * cheapest member of the perceptual-dedup family (pHash/dHash share
    * the shape). Emitted as a 64-char bit string in row-major order:
    * engine-portable, no signed-64-bit overflow for bit 63, and
    * Hamming distance is a position-wise compare. The brightness test
    * is `gray·64 > total` — exact integer arithmetic, no division to
    * round apart. Near-dup images then group by hash (exact) or by
    * banded hash substrings (Hamming), the same LSH shape as SimHash
    * banding on text. Scale: one mapPartitions decode pass, stats-sized
    * output; the oracle recomputes every bit analytically from the
    * planted pattern.
    */
  def imageAHash(spark: SparkSession, dir: String): DataFrame =
    aHashOf(spark, imageTable(spark, dir))

  /** [[imageAHash]] over the PNG payloads — perceptual fingerprint of a
    * genuinely compressed raster; being lossless, the aHash is
    * bit-identical to the BMP leg's, which is itself the proof (a lossy
    * codec would flip bits and break the exact-group dedup).
    */
  def pngAHash(spark: SparkSession, dir: String): DataFrame =
    aHashOf(spark, pngTable(spark, dir))

  private def aHashOf(spark: SparkSession, tbl: DataFrame): DataFrame = {
    import spark.implicits._
    tbl.as[(Long, Array[Byte])].mapPartitions { batch =>
      batch.map { case (id, payload) =>
        val img = Bmp.decode(payload)
        val (w, h) = (img.getWidth, img.getHeight)
        val gray = new Array[Long](64)
        var tot = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            val rgb = img.getRGB(i * w / 8, j * h / 8)
            val g = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)).toLong
            gray(j * 8 + i) = g
            tot += g
            i += 1
          }
          j += 1
        }
        val bits = new java.lang.StringBuilder(64)
        var k = 0
        var ones = 0L
        while (k < 64) {
          if (gray(k) * 64L > tot) { bits.append('1'); ones += 1 }
          else bits.append('0')
          k += 1
        }
        (id, w, h, bits.toString, ones)
      }
    }.toDF("media_id", "width", "height", "ahash", "n_set")
  }

  val aHashSql: String =
    s"""WITH dims AS (
       |  $dimsSql
       |), samp AS (
       |  SELECT d.media_id, d.width, d.height,
       |         CAST(j.j * 8 + i.i AS INT) AS k,
       |         (d.width * i.i) // 8 AS sx,
       |         (d.height * j.j) // 8 AS sy
       |  FROM dims d, range(0, 8) i(i), range(0, 8) j(j)
       |), g AS (
       |  SELECT media_id, width, height, k,
       |         (sx * 7 + sy * 11 + media_id * 13) % 256
       |       + (sx * 5 + sy * 3 + media_id * 17) % 256
       |       + (sx + sy + media_id) % 256 AS gray
       |  FROM samp
       |), t AS (
       |  SELECT media_id, width, height, k, gray,
       |         SUM(gray) OVER (PARTITION BY media_id) AS tot
       |  FROM g
       |)
       |SELECT media_id, width, height,
       |       string_agg(CASE WHEN gray * 64 > tot THEN '1' ELSE '0' END, ''
       |                  ORDER BY k) AS ahash,
       |       CAST(SUM(CASE WHEN gray * 64 > tot THEN 1 ELSE 0 END) AS BIGINT) AS n_set
       |FROM t GROUP BY 1, 2, 3""".stripMargin

  val resizeCheckSql: String =
    s"""WITH dims AS (
       |  $dimsSql
       |), samp AS (
       |  SELECT d.media_id, d.width, d.height,
       |         (d.width * i.i) // 8 AS sx,
       |         (d.height * j.j) // 8 AS sy
       |  FROM dims d, range(0, 8) i(i), range(0, 8) j(j)
       |)
       |SELECT media_id, width AS orig_w, height AS orig_h,
       |       CAST(8 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
       |       CAST(sum((sx * 7 + sy * 11 + media_id * 13) % 256) AS BIGINT) AS r_sum,
       |       CAST(sum((sx * 5 + sy * 3 + media_id * 17) % 256) AS BIGINT) AS g_sum,
       |       CAST(sum((sx + sy + media_id) % 256) AS BIGINT) AS b_sum
       |FROM samp GROUP BY 1, 2, 3""".stripMargin

  /** [[audioStats]] is already scalar — registered as-is. The oracle
    * enumerates every (window, sample) index analytically from
    * [[AudioPattern]] and aggregates the SAME integer stats the Spark
    * side computed from decoded WAV bytes — a mis-parsed header field,
    * sign, or byte order diverges the hash.
    */
  def audioCheck(spark: SparkSession, dir: String): DataFrame =
    audioStats(spark, dir)

  val audioCheckSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(256 + (doc_id % 7) * 64 AS INT) AS n FROM documents
      |), s AS (
      |  SELECT d.doc_id, d.n, CAST(w.w AS INT) AS win_idx,
      |         (CAST(w.w AS INT) * 64 + CAST(i.i AS INT)) * 31 + d.doc_id * 17 AS base
      |  FROM d
      |  JOIN range(0, 10) w(w) ON w.w < d.n // 64
      |  CROSS JOIN range(0, 64) i(i)
      |), amps AS (
      |  SELECT doc_id, n, win_idx, CAST(base % 4001 - 2000 AS BIGINT) AS amp FROM s
      |)
      |SELECT doc_id AS media_id, CAST(8000 AS INT) AS sample_rate,
      |       n AS n_samples, win_idx,
      |       CAST(SUM(amp) AS BIGINT) AS win_sum,
      |       CAST(SUM(amp * amp) AS BIGINT) AS win_sq,
      |       CAST(MAX(ABS(amp)) AS INT) AS win_peak
      |FROM amps GROUP BY 1, 2, 3, 4""".stripMargin

  /** [[videoStats]] is already scalar — registered as-is. The oracle
    * enumerates every (frame, x, y) of every sampled frame analytically
    * from [[VideoPattern]] and aggregates the SAME integer sums the
    * Spark side computed from demuxed DIB bytes — a mis-walked chunk,
    * dropped pad byte, or frame-order swap diverges the hash.
    */
  def videoCheck(spark: SparkSession, dir: String): DataFrame =
    videoStats(spark, dir)

  val videoCheckSql: String =
    """WITH dims AS (
      |  SELECT doc_id AS media_id,
      |         CAST(8 + doc_id % 9 AS INT) AS width,
      |         CAST(8 + doc_id % 7 AS INT) AS height,
      |         CAST(2 + doc_id % 4 AS INT) AS n_frames
      |  FROM documents
      |), px AS (
      |  SELECT d.media_id, d.width, d.height, d.n_frames,
      |         CAST(f.f AS INT) AS frame_idx,
      |         (x.x * 7 + y.y * 11 + f.f * 19 + d.media_id * 13) % 256 AS r,
      |         (x.x * 5 + y.y * 3 + f.f * 23 + d.media_id * 17) % 256 AS g,
      |         (x.x + y.y + f.f + d.media_id) % 256 AS b
      |  FROM dims d
      |  JOIN range(0, 5) f(f) ON f.f < d.n_frames AND f.f % 2 = 0
      |  JOIN range(0, 17) x(x) ON x.x < d.width
      |  JOIN range(0, 15) y(y) ON y.y < d.height
      |)
      |SELECT media_id, width, height, n_frames, frame_idx,
      |       CAST(sum(r) AS BIGINT) AS r_sum,
      |       CAST(sum(g) AS BIGINT) AS g_sum,
      |       CAST(sum(b) AS BIGINT) AS b_sum
      |FROM px GROUP BY 1, 2, 3, 4, 5""".stripMargin

  /** [[frameSample]] with each frame projected to its md5 digest. */
  def framesCheck(spark: SparkSession, dir: String): DataFrame =
    frameSample(spark, dir).select(
      col("media_id"), col("frame_idx"), md5(col("frame")).as("frame_md5"))

  /** frameBytes = 64, stride = 4 → one full 64-byte frame per 256 bytes;
    * `f < floor(len/256)` guarantees every frame is full-width.
    */
  val framesCheckSql: String =
    """SELECT doc_id AS media_id, CAST(t.f AS INT) AS frame_idx,
      |       md5(substr(text, CAST(t.f AS INT) * 256 + 1, 64)) AS frame_md5
      |FROM documents, range(0, 64) t(f)
      |WHERE t.f < CAST(floor(length(text) / 256.0) AS INT)""".stripMargin
}
