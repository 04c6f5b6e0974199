package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Fixtures.table

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, and decode/feature-extraction runs
  * partition-wise over typed Datasets.
  *
  * The decode step itself is a DETERMINISTIC FAKE ([[FakeDecoder]]) — real
  * image/audio codecs aren't in this container — but everything Spark-side
  * is real and tested: the schema (binary + metadata), the typed Encoder
  * path, the mapPartitions batch shape (decoder instantiated once per
  * partition, not per row — exactly how a JNI/py-codec handle would be
  * held), and the column pruning before the heavy stage.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every read/write
  // creates a temp file, and at 32 concurrent decode threads the
  // filesystem becomes the bottleneck — measured as a 1.18 scaling
  // exponent on the histogram probe (10→20× corpus) that dropped back to
  // ~linear with the memory cache. Payloads here are KB-sized byte
  // arrays; buffering them in memory is strictly better at any scale.
  javax.imageio.ImageIO.setUseCache(false)

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String,
      width: Int, height: Int)

  /** Decoder output: fixed-shape feature vector + provenance. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int, height: Int,
      feature: Array[Float])

  /** The decode boundary. A real deployment plugs an image/audio codec in
    * here; the contract (bytes + metadata in, fixed-dim features out) is
    * what the pipeline depends on. */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def decode(payload: Array[Byte], width: Int, height: Int): Array[Float]
  }

  /** Deterministic stand-in for the codec: features derived from byte
    * content via the rolling hash — stable across runs and engines. */
  object FakeDecoder extends MediaDecoder {
    val featureDim = 8
    def decode(payload: Array[Byte], width: Int, height: Int): Array[Float] = {
      var h = 0L
      val out = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        h = (h * 31 + (payload(i) & 0xff)) % 1000000007L
        out(i % featureDim) += ((h % 1000L) / 1000.0f)
        i += 1
      }
      out
    }
  }

  /** REAL image decode through the SAME seam (VERDICT r8 #4): JDK-native
    * `javax.imageio` reads the payload bytes (PNG/JPEG/BMP/GIF) into a
    * raster. The 8-dim feature vector carries the decode's ground truth so
    * a golden test can pin it byte-exactly:
    *   [w, h, meanR, meanG, meanB, crc % 1e6, crc / 1e6, n_pixels]
    * where crc is CRC32 over the ARGB bytes in row-major scan order —
    * (f5, f6) reconstruct the exact 32-bit pixel hash (both halves < 2^24,
    * so the floats are exact). The metadata width/height hints are
    * advisory; the DECODED raster wins. Stateless like ImageIO itself, so
    * one object per partition is the JNI-handle shape [[extractFeatures]]
    * already provides. */
  object ImageIoDecoder extends MediaDecoder {
    val featureDim = 8
    def decode(payload: Array[Byte], width: Int, height: Int): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, s"payload (${payload.length} bytes) is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val crc = new java.util.zip.CRC32
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y) // ARGB, color-managed to sRGB by ImageIO
          crc.update(p >>> 24); crc.update((p >>> 16) & 0xff)
          crc.update((p >>> 8) & 0xff); crc.update(p & 0xff)
          sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Array(w.toFloat, h.toFloat,
        (sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat, (sb.toDouble / n).toFloat,
        (crc.getValue % 1000000L).toFloat, (crc.getValue / 1000000L).toFloat, n.toFloat)
    }
  }

  /** Derive a media table from `documents`: payload = utf-8 bytes of the
    * text, fake-but-deterministic raster metadata. (Stands in for reading a
    * real image dataset; the binary-column plumbing is identical.) */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("image/fake").as("media_type"),
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") * 3 % 480 + 1).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** Partition-wise decode: one decoder per partition, rows streamed through
    * it. This is the shape a Pandas-UDF/`mapInPandas` stage takes in
    * PySpark; in Scala `mapPartitions` is the native equivalent. */
  def extractFeatures(ds: Dataset[MediaRecord], decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition setup (codec init) happens here, once
      rows.map { r =>
        MediaFeatures(r.doc_id, r.payload.length.toLong, r.width, r.height,
          decoder.decode(r.payload, r.width, r.height))
      }
    }
  }

  /** SQL-checkable slice of the pipeline (payload size, metadata, content
    * fingerprint — everything except the opaque decode). */
  def mediaManifest(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        octet_length(col("text")).cast("bigint").as("n_bytes"),
        (col("n_chars") % 640 + 1).as("width"),
        (col("n_chars") * 3 % 480 + 1).as("height"),
        md5(col("text")).as("content_fp"))
      .orderBy("doc_id")

  val mediaManifestOracle: String =
    """SELECT doc_id,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  n_chars % 640 + 1 AS width,
      |  n_chars * 3 % 480 + 1 AS height,
      |  md5(text) AS content_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Resize planning (the metadata half of an image-resize stage): aspect-
    * preserving fit-within TARGET×TARGET in pure integer math, downscale
    * only. The pixel transform itself happens inside the [[MediaDecoder]]
    * seam; the plan — which every resize job needs and which drives output
    * buffer sizing — is engine arithmetic, so it is oracle-checked. */
  private val Target = 224L

  def resizePlan(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        (col("n_chars") % 640 + 1).as("width"),
        (col("n_chars") * 3 % 480 + 1).as("height"))
      .withColumn("out_w", expr(
        s"CASE WHEN greatest(width, height) <= $Target THEN width" +
          s" ELSE greatest((width * $Target) div greatest(width, height), 1) END"))
      .withColumn("out_h", expr(
        s"CASE WHEN greatest(width, height) <= $Target THEN height" +
          s" ELSE greatest((height * $Target) div greatest(width, height), 1) END"))
      .orderBy("doc_id")

  val resizePlanOracle: String =
    s"""SELECT doc_id, width, height,
       |  CASE WHEN greatest(width, height) <= $Target THEN width
       |       ELSE greatest((width * $Target) // greatest(width, height), 1) END AS out_w,
       |  CASE WHEN greatest(width, height) <= $Target THEN height
       |       ELSE greatest((height * $Target) // greatest(width, height), 1) END AS out_h
       |FROM (
       |  SELECT doc_id, n_chars % 640 + 1 AS width, n_chars * 3 % 480 + 1 AS height
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Frame sampling (the video half of the multimodal surface): treat each
    * document as a fake clip of `n_chars % 300 + 1` frames at 25 fps and
    * emit at most [[MaxFrames]] uniformly-strided frame indices per clip —
    * `sequence(0, n-1, stride)` + explode, fully distributed, the exact
    * shape a real frame-sampler takes before handing frames to the decode
    * seam. */
  private val MaxFrames = 8L

  def frameSamples(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), (col("n_chars") % 300 + 1).as("n_frames"))
      .withColumn("stride", expr(s"(n_frames + ${MaxFrames - 1}) div $MaxFrames"))
      .select(col("doc_id"), col("n_frames"),
        explode(expr("sequence(0, n_frames - 1, stride)")).as("frame_idx"))
      .withColumn("ts_ms", col("frame_idx") * 40)
      .orderBy("doc_id", "frame_idx")

  val frameSamplesOracle: String =
    s"""SELECT doc_id, n_frames, unnest(generate_series(0, n_frames - 1, stride)) AS frame_idx,
       |  unnest(generate_series(0, n_frames - 1, stride)) * 40 AS ts_ms
       |FROM (
       |  SELECT doc_id, n_frames, (n_frames + ${MaxFrames - 1}) // $MaxFrames AS stride
       |  FROM (SELECT doc_id, n_chars % 300 + 1 AS n_frames FROM documents))
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** Patch-grid tiling plan (the ViT-preprocessing shape): ceil-divide each
    * image into 128-px tiles and emit one row per tile with its pixel
    * bounds — pure integer math exploded from metadata, no payload bytes
    * touched (at 100 TB the tiling plan is computed from the manifest and
    * shipped to the decode stage; only the decode ever reads pixels).
    * `sequence(0, n-1)` is safe here: n ≥ 1 always (width, height ≥ 1). */
  def tilePlan(spark: SparkSession, dir: String, patch: Int = 128): DataFrame =
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        (col("n_chars") % 640 + 1).as("width"),
        (col("n_chars") * 3 % 480 + 1).as("height"))
      .withColumn("tiles_x", expr(s"(width + $patch - 1) div $patch"))
      .withColumn("tiles_y", expr(s"(height + $patch - 1) div $patch"))
      .withColumn("tx", explode(sequence(lit(0L), col("tiles_x") - 1)))
      .withColumn("ty", explode(sequence(lit(0L), col("tiles_y") - 1)))
      .select(
        col("doc_id"), col("tx"), col("ty"),
        (col("tx") * patch).as("x0"),
        (col("ty") * patch).as("y0"),
        least(col("width") - col("tx") * patch, lit(patch.toLong)).as("tile_w"),
        least(col("height") - col("ty") * patch, lit(patch.toLong)).as("tile_h"),
        (col("tiles_x") * col("tiles_y")).as("n_tiles"))
      .orderBy("doc_id", "tx", "ty")

  // ------------------------------------------------- perceptual hash (dHash)

  /** 64-bit DIFFERENCE HASH (dHash) — pixel-level near-dup detection for
    * images, the visual analog of SimHash: decode, box-average down to a
    * 9×8 grayscale grid, emit bit (x,y) = [cell(x+1,y) > cell(x,y)].
    * Re-encodes, resizes, and small noise flip few bits (Hamming ≤ ~10);
    * unrelated images land near 32. Downstream is EXACTLY the SimHash64
    * machinery: block keys → capped candidate pairs → Hamming verify.
    *
    * Determinism is engineered, not hoped: the downsample is an INTEGER
    * box average over floor-partitioned cell boundaries on the decoded
    * ARGB raster (Graphics2D/`getScaledInstance` interpolation varies by
    * platform and is banned here), grayscale is the integer ITU weights
    * 299r+587g+114b, and comparisons are integer — the same payload hashes
    * identically on every JVM. */
  def dHash64(payload: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"payload (${payload.length} bytes) is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val gw = 9; val gh = 8
    val sums = Array.ofDim[Long](gw, gh)
    val counts = Array.ofDim[Long](gw, gh)
    // same TYPE_3BYTE_BGR fast path as [[grayHistogram]] (r16): the
    // decoded bytes ARE what getRGB reassembles for this raster type, so
    // the box sums are bit-identical without a ColorModel call per pixel
    img.getRaster.getDataBuffer match {
      case db: java.awt.image.DataBufferByte
          if img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR &&
            db.getData.length == w * h * 3 =>
        val d = db.getData
        var y = 0
        while (y < h) {
          val gy = math.min(gh - 1, y * gh / h)
          val row = y * w * 3
          var x = 0
          while (x < w) {
            val gx = math.min(gw - 1, x * gw / w)
            val i = row + x * 3
            val gray = 114L * (d(i) & 0xff) + 587L * (d(i + 1) & 0xff) +
              299L * (d(i + 2) & 0xff) // bytes are B,G,R
            sums(gx)(gy) += gray
            counts(gx)(gy) += 1
            x += 1
          }
          y += 1
        }
      case _ =>
        var y = 0
        while (y < h) {
          val gy = math.min(gh - 1, y * gh / h)
          var x = 0
          while (x < w) {
            val gx = math.min(gw - 1, x * gw / w)
            val p = img.getRGB(x, y)
            val gray = 299L * ((p >>> 16) & 0xff) + 587L * ((p >>> 8) & 0xff) + 114L * (p & 0xff)
            sums(gx)(gy) += gray
            counts(gx)(gy) += 1
            x += 1
          }
          y += 1
        }
    }
    var hash = 0L
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw - 1) {
        val a = sums(gx)(gy) * counts(gx + 1)(gy)     // cross-multiplied means:
        val b = sums(gx + 1)(gy) * counts(gx)(gy)     // exact, no division
        if (b > a) hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Per-partition dHash over a binary-payload dataset — the same
    * mapPartitions seam as [[extractFeatures]] (codec init once per
    * partition; only (id, 8-byte hash) ever leaves the decode stage, so
    * the shuffle after this is SimHash-sized regardless of image bytes). */
  def imageDHashes(ds: Dataset[(Long, Array[Byte])]): Dataset[(Long, Long)] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { case (id, payload) => (id, dHash64(payload)) })
  }

  /** Deterministic small grayscale-gradient PNG for doc d: dimensions
    * 18+(d%10) × 16+(d%7), pixel v(x,y) = (d·7 + x·13 + y·29) mod 256 on
    * all three channels. PNG is lossless, so the decoded raster is the
    * formula — an oracle can recompute any integer pixel statistic,
    * including the dHash grid, without touching bytes. */
  private[operators] def synthPng(docId: Long): Array[Byte] = {
    val w = 18 + (docId % 10).toInt; val h = 16 + (docId % 7).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((docId * 7 + x * 13 + y * 29) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** IMAGE PERCEPTUAL-HASH PROFILE, driver-gated end to end: synthesize
    * the deterministic PNG per doc, push the BYTES through the real
    * ImageIO decode + [[dHash64]] integer box-average behind the
    * [[imageDHashes]] mapPartitions seam, and emit the 64-bit hash. The
    * oracle recomputes every hash BIT-FOR-BIT from the synthesis formula
    * in SQL (floor-partitioned 9×8 cells, cross-multiplied mean compares
    * — the exact arithmetic of the operator), so any drift in the codec
    * path, the grid mapping, or the comparison breaks 500 rows at once.
    * At 100 TB the synthesis is replaced by a binary column read; only
    * (id, 8-byte hash) exits the seam, and the hash feeds the SimHash
    * block-key dedup machinery unchanged. */
  def imageDHashProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = table(spark, dir, "documents").select(col("doc_id")).as[Long]
    imageDHashes(ids.map(id => (id, synthPng(id))))
      .toDF("doc_id", "dhash")
      .select(col("doc_id"),
        (lit(18) + col("doc_id") % 10).cast("bigint").as("width"),
        (lit(16) + col("doc_id") % 7).cast("bigint").as("height"),
        col("dhash"))
      .orderBy("doc_id")
  }

  val imageDHashProfileOracle: String =
    """WITH dims AS (
      |  SELECT doc_id, 18 + doc_id % 10 AS w, 16 + doc_id % 7 AS h FROM documents
      |), px AS (
      |  SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y
      |  FROM (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM dims)
      |), cell AS (
      |  SELECT doc_id,
      |    least(8, x * 9 // w) AS gx, least(7, y * 8 // h) AS gy,
      |    1000 * ((doc_id * 7 + x * 13 + y * 29) % 256) AS gray
      |  FROM px
      |), grid AS (
      |  SELECT doc_id, gx, gy, sum(gray) AS s, count(*) AS c
      |  FROM cell GROUP BY 1, 2, 3
      |), bits AS (
      |  SELECT a.doc_id, a.gy, a.gx,
      |    CASE WHEN b.s * a.c > a.s * b.c THEN 1 ELSE 0 END AS bit
      |  FROM grid a
      |  JOIN grid b ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
      |)
      |SELECT d.doc_id, CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height,
      |  CAST(sum(CASE WHEN bit = 1 THEN
      |      CASE WHEN gy * 8 + gx = 63 THEN -9223372036854775807 - 1
      |           ELSE CAST(1 AS BIGINT) << (gy * 8 + gx) END
      |    ELSE 0 END) AS BIGINT) AS dhash
      |FROM dims d JOIN bits USING (doc_id)
      |GROUP BY d.doc_id, d.w, d.h ORDER BY d.doc_id""".stripMargin

  /** VISUAL DUPLICATE GROUPS — the dedup half of the image story: every
    * doc carries the image of its 5-group leader (doc_id − doc_id%5), the
    * REAL decode+dHash seam hashes the bytes, and an exact group-by over
    * the 64-bit hashes recovers the groups with keep-smallest keepers —
    * decode → perceptual hash → hash-keyed dedup, end to end, with only
    * (id, 8-byte hash) ever crossing the shuffle (the whole point of
    * hashing at the seam: the group-by cost is SimHash-sized no matter
    * how large the images are). The oracle recomputes each leader's hash
    * bit-for-bit from the synthesis formula and groups identically, so
    * the gate covers the codec path AND the grouping policy. */
  def imageDupGroups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = table(spark, dir, "documents").select(col("doc_id")).as[Long]
    imageDHashes(ids.map(id => (id, synthPng(id - id % 5))))
      .toDF("doc_id", "dhash")
      .groupBy("dhash")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .orderBy("keeper")
  }

  val imageDupGroupsOracle: String =
    """WITH dims AS (
      |  SELECT doc_id, doc_id - doc_id % 5 AS l,
      |         18 + (doc_id - doc_id % 5) % 10 AS w,
      |         16 + (doc_id - doc_id % 5) % 7 AS h
      |  FROM documents
      |), px AS (
      |  SELECT doc_id, l, w, h, x, unnest(generate_series(0, h - 1)) AS y
      |  FROM (SELECT doc_id, l, w, h, unnest(generate_series(0, w - 1)) AS x FROM dims)
      |), cell AS (
      |  SELECT doc_id,
      |    least(8, x * 9 // w) AS gx, least(7, y * 8 // h) AS gy,
      |    1000 * ((l * 7 + x * 13 + y * 29) % 256) AS gray
      |  FROM px
      |), grid AS (
      |  SELECT doc_id, gx, gy, sum(gray) AS s, count(*) AS c
      |  FROM cell GROUP BY 1, 2, 3
      |), bits AS (
      |  SELECT a.doc_id, a.gy, a.gx,
      |    CASE WHEN b.s * a.c > a.s * b.c THEN 1 ELSE 0 END AS bit
      |  FROM grid a
      |  JOIN grid b ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
      |), hashes AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN bit = 1 THEN
      |        CASE WHEN gy * 8 + gx = 63 THEN -9223372036854775807 - 1
      |             ELSE CAST(1 AS BIGINT) << (gy * 8 + gx) END
      |      ELSE 0 END) AS BIGINT) AS dhash
      |  FROM bits GROUP BY doc_id
      |)
      |SELECT dhash, count(*) AS n_docs, min(doc_id) AS keeper
      |FROM hashes GROUP BY dhash ORDER BY keeper""".stripMargin

  // -------------------------------------------------- luminance histogram
  /** Integer luminance histogram over the decoded raster: per pixel,
    * gray = 299r+587g+114b (the ITU integer weights, 0..255000), binned
    * into 4 equal bands by `gray div 64000`. Returns the counts plus the
    * exact gray sum — everything an exposure screen needs, computed in
    * the decode seam so only (id, 7 ints) exits it. */
  case class ImgHist(nPx: Long, b0: Long, b1: Long, b2: Long, b3: Long, graySum: Long)

  def grayHistogram(payload: Array[Byte]): ImgHist = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"payload (${payload.length} bytes) is not a decodable image")
    val w = img.getWidth; val h = img.getHeight
    val bins = new Array[Long](4)
    var graySum = 0L
    // Fast path for the raster type ImageIO's BMP/PNG decoders actually
    // produce (TYPE_3BYTE_BGR, no alpha): read the decoded bytes straight
    // off the DataBuffer — for that type `getRGB` assembles exactly these
    // bytes per pixel (no color management happens post-decode), so the
    // histogram is bit-identical while skipping a ColorModel call per
    // pixel (r16, guide §1.2 per-task work: the per-pixel getRGB was the
    // hot loop of every decode-seam query).
    img.getRaster.getDataBuffer match {
      case db: java.awt.image.DataBufferByte
          if img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR &&
            db.getData.length == w * h * 3 =>
        val d = db.getData
        var i = 0
        while (i < d.length) {
          val gray = 114L * (d(i) & 0xff) + 587L * (d(i + 1) & 0xff) +
            299L * (d(i + 2) & 0xff) // bytes are B,G,R
          bins((gray / 64000L).toInt) += 1
          graySum += gray
          i += 3
        }
      case _ =>
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val gray = 299L * ((p >>> 16) & 0xff) + 587L * ((p >>> 8) & 0xff) + 114L * (p & 0xff)
            bins((gray / 64000L).toInt) += 1
            graySum += gray
            x += 1
          }
          y += 1
        }
    }
    ImgHist(w.toLong * h, bins(0), bins(1), bins(2), bins(3), graySum)
  }

  /** [[synthPng]]'s exposure variant: doc_id % 9 == 0 renders a constant
    * DARK frame (v=16), % 9 == 1 a constant BRIGHT frame (v=240), the
    * rest the usual gradient — so the exposure screen has planted
    * positives in both directions and the oracle still predicts every
    * pixel closed-form. */
  private[operators] def synthExposurePng(docId: Long): Array[Byte] = {
    val w = 18 + (docId % 10).toInt; val h = 16 + (docId % 7).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = if (docId % 9 == 0) 16
        else if (docId % 9 == 1) 240
        else ((docId * 7 + x * 13 + y * 29) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** IMAGE EXPOSURE PROFILE, driver-gated end to end: deterministic PNG
    * per doc (dark/bright plants among gradients) through the REAL
    * ImageIO decode + [[grayHistogram]] integer binning, emitting the
    * luminance histogram, exact mean gray (milli-units), and the
    * under-/over-exposure screens (≥ 700 ‰ of pixels in the extreme
    * band) an image-curation pipeline drops on. The oracle re-derives
    * every pixel from the synthesis formula in SQL, so a regression in
    * the codec path, the ITU weights, the bin boundaries, or the
    * thresholds breaks 500 rows at once. 100 TB shape: identical to
    * [[imageDHashProfile]] — per-partition decode, fixed-width exit. */
  def imageHistogramProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = table(spark, dir, "documents").select(col("doc_id")).as[Long]
    ids.map { id =>
        val g = grayHistogram(synthExposurePng(id))
        (id, g.nPx, g.b0, g.b1, g.b2, g.b3, g.graySum)
      }
      .toDF("doc_id", "n_px", "b0", "b1", "b2", "b3", "gray_sum")
      .select(col("doc_id"), col("n_px"), col("b0"), col("b1"), col("b2"), col("b3"),
        expr("gray_sum div n_px").as("mean_gray_milli"),
        (col("b0") * 1000 >= col("n_px") * 700).as("under_exposed"),
        (col("b3") * 1000 >= col("n_px") * 700).as("over_exposed"))
      .orderBy("doc_id")
  }

  val imageHistogramProfileOracle: String =
    """WITH dims AS (
      |  SELECT doc_id, 18 + doc_id % 10 AS w, 16 + doc_id % 7 AS h FROM documents
      |), px AS (
      |  SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y
      |  FROM (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM dims)
      |), g AS (
      |  SELECT doc_id,
      |    1000 * (CASE WHEN doc_id % 9 = 0 THEN 16
      |                 WHEN doc_id % 9 = 1 THEN 240
      |                 ELSE (doc_id * 7 + x * 13 + y * 29) % 256 END) AS gray
      |  FROM px
      |), agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_px,
      |    CAST(sum(CASE WHEN gray // 64000 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
      |    CAST(sum(CASE WHEN gray // 64000 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
      |    CAST(sum(CASE WHEN gray // 64000 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
      |    CAST(sum(CASE WHEN gray // 64000 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS b3,
      |    CAST(sum(gray) AS BIGINT) AS gray_sum
      |  FROM g GROUP BY doc_id
      |)
      |SELECT doc_id, n_px, b0, b1, b2, b3,
      |  gray_sum // n_px AS mean_gray_milli,
      |  b0 * 1000 >= n_px * 700 AS under_exposed,
      |  b3 * 1000 >= n_px * 700 AS over_exposed
      |FROM agg ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ shot-cut detect
  /** SHOT-BOUNDARY DETECTION over a frame sequence: decode every frame,
    * take its [[grayHistogram]], and flag a cut wherever the histogram
    * L1 distance to the previous frame clears the total-variation gate
    * (Σ|c_f − c_{f−1}| ≥ 2·tv‰·n_px — exact integers, no division).
    * The classic first pass of video curation: shot boundaries segment a
    * clip before frame sampling, and a clip with zero cuts in an hour is
    * a static-camera screen. Computed row-locally in the decode seam —
    * only (id, 3 ints) exit, frames never cross a shuffle. */
  def shotCutStats(frames: Seq[Array[Byte]], tvPermille: Int = 400): (Long, Long, Long) = {
    val hists = frames.map(grayHistogram)
    require(hists.nonEmpty && hists.forall(_.nPx == hists.head.nPx),
      "frames of one clip must share dimensions")
    val n = hists.head.nPx
    var cuts = 0L; var first = -1L
    var f = 1
    while (f < hists.size) {
      val (a, b) = (hists(f - 1), hists(f))
      val dist = math.abs(a.b0 - b.b0) + math.abs(a.b1 - b.b1) +
        math.abs(a.b2 - b.b2) + math.abs(a.b3 - b.b3)
      if (1000L * dist >= 2L * tvPermille * n) {
        cuts += 1; if (first < 0) first = f.toLong
      }
      f += 1
    }
    (hists.size.toLong, cuts, first)
  }

  /** Deterministic 8-frame clip for doc d: gradient pattern
    * p = (d·7 + x·13 + y·29 + f·11) mod 256 per frame, with a planted CUT
    * at frame `2 + d % 5` — post-cut frames render `p mod 128` (dark-only
    * histogram), so the total-variation gate must fire exactly once,
    * exactly there. Closed-form per pixel, so the oracle recomputes every
    * histogram without decoding. */
  private[operators] def synthFrame(docId: Long, f: Int): Array[Byte] = {
    val w = 18 + (docId % 10).toInt; val h = 16 + (docId % 7).toInt
    val cutAt = 2 + (docId % 5).toInt
    // Hand-rolled 24-bit BMP (a fully specified public container): the
    // previous BufferedImage + ImageIO encode built the SAME bytes through
    // a per-pixel ColorModel call and a fresh ImageWriter/stream stack per
    // frame — at 8 frames/doc the fixture synthesis, not the measured
    // decode, dominated the bench line (r16, guide §1.2). The decode side
    // still goes through the real ImageIO path in [[grayHistogram]];
    // BMP stores raw bottom-up BGR rows, so the decoded raster is
    // unchanged pixel for pixel.
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * h
    val size = 54 + dataSize
    val buf = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    buf.putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val p = ((docId * 7 + x * 13 + y * 29 + f * 11) % 256).toInt
        val v = (if (f >= cutAt) p % 128 else p).toByte
        buf.put(v).put(v).put(v)
        x += 1
      }
      var i = 0
      while (i < pad) { buf.put(0.toByte); i += 1 }
      y -= 1
    }
    buf.array()
  }

  /** SHOT-CUT PROFILE, driver-gated end to end: synthesize the 8-frame
    * clip per doc, decode every frame through the real ImageIO path, and
    * emit (frames, cuts, first cut) from the exact-integer TV gate. The
    * oracle re-derives all 8 histograms per doc from the synthesis
    * formula (dense 4-bin frames, consecutive-frame L1 join) — a planted
    * cut that moves or a spurious cut anywhere breaks the hash. */
  def shotCutProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = table(spark, dir, "documents").select(col("doc_id")).as[Long]
    ids.map { id =>
        val (nf, cuts, first) = shotCutStats((0 until 8).map(f => synthFrame(id, f)))
        (id, nf, cuts, first)
      }
      .toDF("doc_id", "n_frames", "n_cuts", "first_cut")
      .orderBy("doc_id")
  }

  val shotCutProfileOracle: String =
    """WITH dims AS (
      |  SELECT doc_id, 18 + doc_id % 10 AS w, 16 + doc_id % 7 AS h,
      |         2 + doc_id % 5 AS cut_at
      |  FROM documents
      |), px AS (
      |  SELECT doc_id, cut_at, f, x, unnest(generate_series(0, h - 1)) AS y
      |  FROM (SELECT doc_id, h, cut_at, f, unnest(generate_series(0, w - 1)) AS x
      |        FROM (SELECT doc_id, w, h, cut_at, unnest(generate_series(0, 7)) AS f
      |              FROM dims))
      |), v AS (
      |  SELECT doc_id, f,
      |    CASE WHEN f >= cut_at
      |         THEN ((doc_id * 7 + x * 13 + y * 29 + f * 11) % 256) % 128
      |         ELSE (doc_id * 7 + x * 13 + y * 29 + f * 11) % 256 END // 64 AS bin
      |  FROM px
      |), hist AS (
      |  SELECT df.doc_id AS doc_id, df.f AS f, b.bin AS bin,
      |    CAST(count(v.bin) AS BIGINT) AS c,
      |    CAST(sum(count(v.bin)) OVER (PARTITION BY df.doc_id, df.f) AS BIGINT) AS n_px
      |  FROM (SELECT DISTINCT doc_id, f FROM v) df
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS bin) b
      |  LEFT JOIN v ON v.doc_id = df.doc_id AND v.f = df.f AND v.bin = b.bin
      |  GROUP BY df.doc_id, df.f, b.bin
      |), hist2 AS (SELECT doc_id, f, bin, c, n_px FROM hist),
      |dist AS (
      |  SELECT a.doc_id, a.f, sum(abs(a.c - b.c)) AS d, max(a.n_px) AS n_px
      |  FROM hist2 a
      |  JOIN hist2 b ON b.doc_id = a.doc_id AND b.f = a.f - 1 AND b.bin = a.bin
      |  GROUP BY a.doc_id, a.f
      |), cuts AS (
      |  SELECT doc_id, f FROM dist WHERE 1000 * d >= 2 * 400 * n_px
      |)
      |SELECT d.doc_id, CAST(8 AS BIGINT) AS n_frames,
      |  CAST(count(c.f) AS BIGINT) AS n_cuts,
      |  COALESCE(CAST(min(c.f) AS BIGINT), -1) AS first_cut
      |FROM dims d LEFT JOIN cuts c ON c.doc_id = d.doc_id
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------ WAV audio decode
  /** Real AUDIO bytes through the decode seam: parse a RIFF/WAVE PCM
    * payload (header walk + 16-bit little-endian samples — no codec
    * library needed; WAV-PCM is a fully specified public container) and
    * emit the features an audio-curation pipeline filters on: sample
    * rate, channel count, duration, exact integer RMS² and peak
    * amplitude, and the clipped-sample count (|s| ≥ 32760 — the
    * distorted-recording screen). Pure integer math end to end, so the
    * numbers are bit-stable across platforms — unlike float resamplers.
    * Per-partition work behind the same `mapPartitions` seam as the image
    * decoders. Throws on non-PCM/compressed payloads — admission should
    * quarantine, not guess. */
  case class WavStats(sampleRate: Int, channels: Int, nSamples: Long,
      durationMs: Long, rms2: Long, peak: Int, nClipped: Long)

  def wavStats(payload: Array[Byte]): WavStats = {
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(payload.length >= 44 && bb.getInt(0) == 0x46464952 /* RIFF */ &&
      bb.getInt(8) == 0x45564157 /* WAVE */, "not a RIFF/WAVE payload")
    // chunk walk: find fmt and data (canonical files put them at 12/36,
    // but extra chunks (LIST) are legal and common)
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= payload.length && (dataOff < 0 || sampleRate == 0)) {
      val id = bb.getInt(pos); val sz = bb.getInt(pos + 4)
      // a malformed negative size would walk the cursor backwards forever
      require(sz >= 0, s"malformed chunk size $sz at offset $pos")
      if (id == 0x20746d66) { // "fmt "
        require(bb.getShort(pos + 8) == 1, "compressed WAV: PCM only")
        channels = bb.getShort(pos + 10)
        sampleRate = bb.getInt(pos + 12)
        bits = bb.getShort(pos + 22)
        require(bits == 16, s"16-bit PCM only, got $bits")
      } else if (id == 0x61746164) { // "data"
        dataOff = pos + 8; dataLen = sz
      }
      pos += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && dataOff >= 0, "missing fmt/data chunk")
    val n = dataLen / 2
    var i = 0; var rms2 = 0L; var peak = 0; var clipped = 0L
    while (i < n) {
      val s = bb.getShort(dataOff + 2 * i).toInt
      rms2 += s.toLong * s
      val a = math.abs(s)
      if (a > peak) peak = a
      if (a >= 32760) clipped += 1
      i += 1
    }
    val frames = n / math.max(channels, 1)
    WavStats(sampleRate, channels, n.toLong,
      frames.toLong * 1000 / sampleRate, rms2, peak, clipped)
  }

  /** Distributed audio feature extraction — the per-partition decode seam. */
  def audioFeatures(ds: Dataset[(Long, Array[Byte])]): Dataset[(Long, WavStats)] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { case (id, payload) => (id, wavStats(payload)) })
  }

  /** Canonical 16-bit mono PCM WAV with a deterministic integer waveform:
    * doc d gets 64+(d%64) samples at 8 kHz; every 10th doc is a planted
    * CLIPPED recording (full-scale ±32767 square wave) the profile must
    * flag. The synthesis is pure integer arithmetic, so an oracle can
    * predict every stat closed-form without parsing bytes. */
  private[operators] def synthWav(docId: Long, n: Int, sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952); bb.putInt(36 + dataLen); bb.putInt(0x45564157) // RIFF/WAVE
    bb.putInt(0x20746d66); bb.putInt(16)                                  // fmt , PCM
    bb.putShort(1); bb.putShort(1); bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2); bb.putShort(2); bb.putShort(16)
    bb.putInt(0x61746164); bb.putInt(dataLen)                             // data
    var t = 0
    while (t < n) {
      val s = if (docId % 10 == 0) { if (t % 2 == 0) 32767 else -32767 }
      else (((docId * 31 + t * 17) % 2048) - 1024).toInt
      bb.putShort(s.toShort); t += 1
    }
    bb.array()
  }

  /** AUDIO CURATION PROFILE, driver-gated end to end: synthesize the
    * deterministic WAV payload per doc, push the BYTES through the real
    * [[wavStats]] RIFF parser behind the [[audioFeatures]] mapPartitions
    * seam, and emit the integer features an audio pipeline filters on —
    * with the clipped-recording screen catching the planted full-scale
    * docs. The oracle never parses a byte: it predicts every stat from
    * the synthesis arithmetic, so a parser regression (header walk,
    * sample decode, clipping threshold) breaks the gate. At 100 TB the
    * synthesis step is replaced by reading a binary column; only
    * (id, 7 integers) ever exits the decode seam. */
  def audioProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = table(spark, dir, "documents").select(col("doc_id")).as[Long]
    audioFeatures(ids.map(id => (id, synthWav(id, (64 + (id % 64)).toInt))))
      .map { case (id, w) => (id, w.sampleRate.toLong, w.channels.toLong,
        w.nSamples, w.durationMs, w.rms2, w.peak.toLong, w.nClipped) }
      .toDF("doc_id", "sample_rate", "channels", "n_samples", "duration_ms",
        "rms2", "peak", "n_clipped")
      .orderBy("doc_id")
  }

  val audioProfileOracle: String =
    """WITH base AS (
      |  SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
      |), samples AS (
      |  SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS t FROM base
      |), s AS (
      |  SELECT doc_id, n,
      |    CASE WHEN doc_id % 10 = 0
      |         THEN CASE WHEN t % 2 = 0 THEN 32767 ELSE -32767 END
      |         ELSE (doc_id * 31 + t * 17) % 2048 - 1024 END AS v
      |  FROM samples
      |)
      |SELECT doc_id,
      |  CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(1 AS BIGINT) AS channels,
      |  CAST(max(n) AS BIGINT) AS n_samples,
      |  CAST(max(n) * 1000 // 8000 AS BIGINT) AS duration_ms,
      |  CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS rms2,
      |  CAST(max(abs(v)) AS BIGINT) AS peak,
      |  CAST(sum(CASE WHEN abs(v) >= 32760 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ WAV energy VAD
  /** Per-clip energy VAD over the RIFF parse: split the PCM stream into
    * `frameLen`-sample frames (partial tail dropped — the standard
    * frame-synchronous convention) and gate each frame on exact integer
    * energy Σs² ≥ `thr`. Emits the three numbers a speech-curation
    * pipeline filters on — frame count, voiced-frame count, and the
    * LONGEST VOICED RUN (the min-utterance-length screen) — computed
    * row-locally inside the decode seam, so only (id, 3 ints) ever exits
    * it; no shuffle sees samples at any scale. Same chunk-walk contract
    * as [[wavStats]] (16-bit PCM only, throws on compressed payloads). */
  case class VadStats(nFrames: Long, activeFrames: Long, longestRun: Long)

  def vadStats(payload: Array[Byte], frameLen: Int = 20, thr: Long = 10000L): VadStats = {
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(payload.length >= 44 && bb.getInt(0) == 0x46464952 &&
      bb.getInt(8) == 0x45564157, "not a RIFF/WAVE payload")
    var pos = 12
    var haveFmt = false
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= payload.length && (dataOff < 0 || !haveFmt)) {
      val id = bb.getInt(pos); val sz = bb.getInt(pos + 4)
      require(sz >= 0, s"malformed chunk size $sz at offset $pos")
      if (id == 0x20746d66) { // "fmt "
        require(bb.getShort(pos + 8) == 1, "compressed WAV: PCM only")
        require(bb.getShort(pos + 22) == 16, "16-bit PCM only")
        haveFmt = true
      } else if (id == 0x61746164) { dataOff = pos + 8; dataLen = sz } // "data"
      pos += 8 + sz + (sz & 1)
    }
    require(haveFmt && dataOff >= 0, "missing fmt/data chunk")
    val nFrames = (dataLen / 2) / frameLen
    var f = 0; var active = 0L; var run = 0L; var best = 0L
    while (f < nFrames) {
      var i = 0; var e = 0L
      while (i < frameLen) {
        val s = bb.getShort(dataOff + 2 * (f * frameLen + i)).toInt
        e += s.toLong * s; i += 1
      }
      if (e >= thr) { active += 1; run += 1; if (run > best) best = run }
      else run = 0
      f += 1
    }
    VadStats(nFrames.toLong, active, best)
  }

  /** Deterministic VAD fixture waveform: [[synthWav]]'s header with a
    * planted silence structure — every frame where `(frame + doc) % 3 == 0`
    * is digital zero, the rest carry the integer noise pattern (whose
    * per-frame energy provably clears the 10⁴ gate: at most ~12 of 20
    * consecutive 17-step residues can sit inside the ±100 band, so ≥ 8
    * samples contribute ≥ 10⁴ each). The VAD must recover exactly the
    * planted voiced/silent frame pattern. */
  private[operators] def synthVadWav(docId: Long, n: Int, sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952); bb.putInt(36 + dataLen); bb.putInt(0x45564157)
    bb.putInt(0x20746d66); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2); bb.putShort(2); bb.putShort(16)
    bb.putInt(0x61746164); bb.putInt(dataLen)
    var t = 0
    while (t < n) {
      val s = if ((t / 20 + docId) % 3 == 0) 0
      else (((docId * 31 + t * 17) % 2048) - 1024).toInt
      bb.putShort(s.toShort); t += 1
    }
    bb.array()
  }

  /** AUDIO VAD PROFILE, driver-gated end to end: synthesize the
    * silence-planted WAV per doc, run the real [[vadStats]] frame-energy
    * gate through the decode seam, and emit the voiced-frame accounting
    * plus exact half-up speech permille. The oracle re-derives every
    * frame energy from the synthesis arithmetic in SQL (gaps-and-islands
    * for the longest run) without parsing a byte — a parser or gate
    * regression breaks the hash. 100 TB shape: identical to
    * [[audioProfile]] — per-partition decode, 4-int exit, the scan is
    * the cost. */
  def audioVad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = table(spark, dir, "documents").select(col("doc_id")).as[Long]
    ids.map { id =>
      val v = vadStats(synthVadWav(id, (64 + (id % 64)).toInt))
      (id, v.nFrames, v.activeFrames, v.longestRun)
    }.toDF("doc_id", "n_frames", "active_frames", "longest_run")
      .withColumn("speech_permille",
        expr("(1000 * active_frames + n_frames div 2) div n_frames"))
      .orderBy("doc_id")
  }

  val audioVadOracle: String =
    """WITH base AS (
      |  SELECT doc_id, (64 + doc_id % 64) // 20 AS nf FROM documents
      |), ts AS (
      |  SELECT doc_id, nf, unnest(generate_series(0, nf * 20 - 1)) AS t FROM base
      |), s AS (
      |  SELECT doc_id, nf, t // 20 AS f,
      |    CASE WHEN (t // 20 + doc_id) % 3 = 0 THEN 0
      |         ELSE (doc_id * 31 + t * 17) % 2048 - 1024 END AS v
      |  FROM ts
      |), fr AS (
      |  SELECT doc_id, nf, f, sum(CAST(v AS BIGINT) * v) >= 10000 AS active
      |  FROM s GROUP BY doc_id, nf, f
      |), runs AS (
      |  SELECT doc_id, active,
      |    f - row_number() OVER (PARTITION BY doc_id, active ORDER BY f) AS grp
      |  FROM fr
      |), runlen AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS rl
      |  FROM runs WHERE active GROUP BY doc_id, grp
      |), agg AS (
      |  SELECT doc_id, CAST(max(nf) AS BIGINT) AS n_frames,
      |    CAST(sum(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT) AS active_frames
      |  FROM fr GROUP BY doc_id
      |)
      |SELECT a.doc_id, a.n_frames, a.active_frames,
      |  coalesce(max(r.rl), 0) AS longest_run,
      |  (1000 * a.active_frames + a.n_frames // 2) // a.n_frames AS speech_permille
      |FROM agg a LEFT JOIN runlen r ON r.doc_id = a.doc_id
      |GROUP BY a.doc_id, a.n_frames, a.active_frames
      |ORDER BY a.doc_id""".stripMargin

  def tilePlanOracle(patch: Int = 128): String =
    s"""SELECT doc_id, tx, ty,
       |  tx * $patch AS x0, ty * $patch AS y0,
       |  least(width - tx * $patch, $patch) AS tile_w,
       |  least(height - ty * $patch, $patch) AS tile_h,
       |  tiles_x * tiles_y AS n_tiles
       |FROM (
       |  SELECT doc_id, width, height, tiles_x, tiles_y, tx,
       |    unnest(generate_series(0, tiles_y - 1)) AS ty
       |  FROM (
       |    SELECT doc_id, width, height, tiles_x, tiles_y,
       |      unnest(generate_series(0, tiles_x - 1)) AS tx
       |    FROM (
       |      SELECT doc_id, width, height,
       |        (width + $patch - 1) // $patch AS tiles_x,
       |        (height + $patch - 1) // $patch AS tiles_y
       |      FROM (SELECT doc_id, n_chars % 640 + 1 AS width, n_chars * 3 % 480 + 1 AS height
       |            FROM documents))))
       |ORDER BY doc_id, tx, ty""".stripMargin
}
