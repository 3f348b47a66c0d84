package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SketchHash

/** Multimodal column support: media as opaque `binary` content plus typed
  * metadata, with decode / feature-extraction as per-partition imperative
  * stages over a typed Dataset (genuine per-partition logic — the one place
  * mapPartitions is the right tool, SURVEY.md §2.9 pref (d)).
  *
  * The fixture blobs are REAL codec-free containers (BMP / RIFF-WAVE /
  * RIFF-AVI — see [[MediaFormats]]), and [[Multimodal.decode]] extracts
  * width/height/frame-count by parsing the actual header bytes. Only the
  * pixel/sample PAYLOAD transforms ([[resizeStub]], the frame BYTES of
  * [[frameSample]]) remain stubbed — those need image/audio codecs the
  * container doesn't ship; their Spark-side plumbing (typed Datasets,
  * partition-preserving map/flatMap, batch shapes) is real and tested.
  */
object Multimodal {

  /** A media object: opaque bytes + identity. */
  final case class MediaRecord(media_id: Long, uri: String, mime: String, content: Array[Byte])

  /** Decoded metadata + a content-derived feature. */
  final case class MediaFeatures(
      media_id: Long, mime: String, content_len: Int,
      width: Int, height: Int, n_frames: Int, mean_byte: Double)

  private val mimes = Array("image/bmp", "audio/wav", "video/avi")

  /** Deterministic payload bytes (splitmix64 stream) for a media id. */
  private def payloadBytes(id: Long, len: Int): Array[Byte] = {
    val bytes = new Array[Byte](len)
    var i = 0
    while (i < len) {
      bytes(i) = (SketchHash.mix(id * 131L + i) & 0xff).toByte
      i += 1
    }
    bytes
  }

  /** Deterministic content bytes for a media id — a REAL container per
    * modality (BMP / WAVE / AVI) whose header fields encode the id-derived
    * geometry, so [[decode]] recovers them by parsing bytes. Shared by
    * [[synthesize]] and the on-disk fixtures of [[ensureFixtureFiles]] so
    * both source legs carry identical bytes.
    */
  def contentBytes(id: Long): Array[Byte] = (id % 3) match {
    case 0 => MediaFormats.bmpBytes(
      width = (64 + id % 960).toInt, height = (64 + id % 540).toInt,
      payload = payloadBytes(id, (10 + id % 128).toInt)) // total 64 + id%128
    case 1 => MediaFormats.wavBytes(
      sampleRate = (8000 + (id % 8) * 1000).toInt,
      data = payloadBytes(id, (20 + id % 128).toInt))    // total 64 + id%128
    case _ => MediaFormats.aviBytes(
      width = (64 + id % 960).toInt, height = (64 + id % 540).toInt,
      nFrames = (1 + id % 30).toInt,
      payload = payloadBytes(id, (id % 128).toInt))      // total 96 + id%128
  }

  /** Deterministic synthetic media table derived from document ids: a
    * binary `content` column whose bytes come from a splitmix64 stream.
    * Stands in for `spark.read.format("binaryFile")` over an object store
    * (see [[readBinaryFiles]] for the real-file leg).
    */
  def synthesize(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      MediaRecord(id, s"media/$id.bin", mimes((id % 3).toInt), contentBytes(id))
    }
  }

  /** Canonical on-disk fixture directory for a given sf dir — one place so
    * queries and the bench's untimed materialization pre-pass agree.
    */
  def fixtureDir(sfDir: String): String =
    System.getProperty("java.io.tmpdir") +
      "/graft_mm_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")

  /** Write one `media_<id>.bin` fixture file per document id (skipped when
    * the `_SUCCESS` marker exists) so the binaryFile source leg reads real
    * bytes off disk. Fixture generation is a bounded driver loop — the
    * DISTRIBUTED read path is [[readBinaryFiles]]; a production ingest
    * would land these files from the object store, not generate them.
    */
  def ensureFixtureFiles(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    import spark.implicits._
    val ids = docs.select(col("doc_id").cast("long")).as[Long].collect()
    // The marker records the id-set signature, not mere existence:
    // regenerated test data at the same path (different count or id range)
    // must rebuild the blobs, or the source leg silently serves stale files.
    // count:min:max alone is NOT an id-set identity (two different sets can
    // share all three), so an order-insensitive mix of every id is folded
    // in: XOR of splitmix64(id) — per-id mixing keeps structured sets (e.g.
    // consecutive ids, whose raw XOR telescopes toward 0) from colliding.
    // "v3" = container-format blobs (BMP/WAVE/AVI) + set-hash marker: a
    // marker bump forces regeneration over any older fixture tree
    val setHash = ids.foldLeft(0L)((acc, id) =>
      acc ^ graft.functions.SketchHash.mix(id))
    val signature = s"v3:${ids.length}:${if (ids.isEmpty) 0L else ids.min}:${if (ids.isEmpty) 0L else ids.max}:${java.lang.Long.toHexString(setHash)}"
    val marker = java.nio.file.Paths.get(dir, "_SUCCESS")
    if (java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker)) == signature) return
    val dirPath = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(dirPath)) { // clear stale blobs
      val old = java.nio.file.Files.list(dirPath)
      try old.forEach(p => java.nio.file.Files.delete(p)) finally old.close()
    }
    java.nio.file.Files.createDirectories(dirPath)
    ids.foreach { id =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"media_$id.bin"), contentBytes(id))
    }
    java.nio.file.Files.write(marker, signature.getBytes)
  }

  /** Real binary-file source: `spark.read.format("binaryFile")` over a
    * directory of media blobs — path, length and content come from the
    * files themselves; id and mime derive from the blob name exactly as an
    * object-store ingest would parse its keys.
    */
  def readBinaryFiles(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    val mimeArr = array(mimes.map(lit).toIndexedSeq: _*)
    spark.read.format("binaryFile")
      // glob matches exactly the blobs this layout owns — a foreign *.bin
      // would yield a null media_id and break the non-nullable encoder
      .option("pathGlobFilter", "media_[0-9]*.bin")
      .load(dir)
      .select(
        regexp_extract(col("path"), "media_(\\d+)\\.bin$", 1)
          .cast("long").as("media_id"),
        col("path").as("uri"),
        col("content"))
      .select(col("media_id"), col("uri"),
        element_at(mimeArr, (col("media_id") % 3 + 1).cast("int")).as("mime"),
        col("content"))
      .as[MediaRecord]
  }

  /** One sampled frame of a media object. */
  final case class FrameSample(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Resize to a bounding box, one partition at a time. STUB: no codec in
    * the container, so the output bytes are a deterministic splitmix stream
    * sized ∝ targetW·targetH — the Spark-side plumbing (typed Dataset in
    * and out, partition-preserving mapPartitions, per-partition "codec"
    * init point) is real and tested.
    */
  def resizeStub(ds: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    require(targetW > 0 && targetH > 0, s"bad target box ${targetW}x$targetH")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: init scaler/codec here, once per partition
      it.map { r =>
        val len = math.max(16, (targetW.toLong * targetH / 64L).toInt)
        val bytes = new Array[Byte](len)
        var i = 0
        while (i < len) {
          bytes(i) = (SketchHash.mix(r.media_id * 977L + i) & 0xff).toByte
          i += 1
        }
        r.copy(uri = r.uri + s"#${targetW}x$targetH", content = bytes)
      }
    }
  }

  /** Sample every `everyN`-th frame of video media (other modalities yield
    * their single frame 0). The frame COUNT comes from parsing the AVI
    * `avih` header in the real bytes; only the frame BYTES are stubbed
    * deterministic fakes (decoding pixels needs a codec). The flatMap
    * plumbing (one input row → n output rows, typed) is real.
    */
  def frameSample(ds: Dataset[MediaRecord], everyN: Int = 10): Dataset[FrameSample] = {
    require(everyN >= 1, s"everyN=$everyN must be >= 1")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val nFrames = MediaFormats.parseAvi(r.content).map(_.nFrames).getOrElse(1)
        (0 until math.max(nFrames, 1) by everyN).iterator.map { f =>
          val bytes = new Array[Byte](32)
          var i = 0
          while (i < 32) {
            bytes(i) = (SketchHash.mix(r.media_id * 31L + f * 7L + i) & 0xff).toByte
            i += 1
          }
          FrameSample(r.media_id, f, bytes)
        }
      }
    }
  }

  // ---- Perceptual hashing over REAL pixels --------------------------------

  /** Full-raster image fixture dimensions (stride-padded, bottom-up BMPs
    * via [[MediaFormats.bmp24GrayBytes]]).
    */
  val ImgW = 18
  val ImgH = 16

  /** Gray value of pixel (x, y) for image group `g` — a plain integer
    * formula (NOT splitmix: DuckDB cannot wrap 64-bit multiplies, and the
    * oracle replays every pixel) with enough x/y structure that neighbor
    * comparisons vary.
    */
  @inline def imagePixel(g: Long, x: Int, y: Int): Int =
    ((x * 29L + y * 53L + g * 101L +
      ((x + g) % 7L) * ((y + g) % 11L) * 3L) % 256L).toInt

  /** Deterministic full-raster BMP for a media id: ids share a base
    * raster per group `id DIV 4`; members `id % 4 != 0` get ONE pixel
    * inverted — so each group is a clique of near-duplicate images a
    * perceptual hash must collapse, while groups differ everywhere.
    */
  def imageBytes(id: Long): Array[Byte] = {
    val g = id / 4
    val j = (id % 4).toInt
    val perturbed = if (j == 0) -1 else ((g * 31 + j * 97) % (ImgW * ImgH)).toInt
    val gray = new Array[Int](ImgW * ImgH)
    var i = 0
    while (i < gray.length) {
      val v = imagePixel(g, i % ImgW, i / ImgW)
      gray(i) = if (i == perturbed) 255 - v else v
      i += 1
    }
    MediaFormats.bmp24GrayBytes(ImgW, ImgH, gray)
  }

  /** Synthetic full-raster image table (one BMP per document id) — the
    * pixel-bearing sibling of [[synthesize]]'s metadata-only blobs.
    */
  def synthesizeImages(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      MediaRecord(id, s"img/$id.bmp", "image/bmp", imageBytes(id))
    }
  }

  // ---- Video frames over REAL movi chunks ---------------------------------

  /** Video fixture geometry: 8×6 frames, 4-frame shots. */
  val VidW = 8
  val VidH = 6
  val ShotLen = 4

  /** Gray value of pixel (x, y) in frame `f` of video `id`: the
    * [[imagePixel]] base pattern keyed by the SHOT index (`f DIV ShotLen`),
    * plus a ±1 per-frame parity jitter — so consecutive frames inside a
    * shot differ by ~W·H/2 gray levels total while a shot cut rekeys the
    * whole pattern (~85·W·H expected L1). Plain integer formula, oracle
    * replays every pixel.
    */
  @inline def videoPixel(id: Long, f: Int, x: Int, y: Int): Int =
    (imagePixel(id * 7L + (f / ShotLen).toLong * 31L, x, y)
      + (f + x + y) % 2) % 256

  /** Deterministic AVI with REAL uncompressed movi frames for a media id:
    * 8 + id%5 frames of [[videoPixel]] rasters (shot cuts every
    * [[ShotLen]] frames by construction, at every scale).
    */
  def videoBytes(id: Long): Array[Byte] = {
    val n = (8 + id % 5).toInt
    val frames = Array.tabulate(n) { f =>
      Array.tabulate(VidW * VidH)(i => videoPixel(id, f, i % VidW, i / VidW))
    }
    MediaFormats.aviWithFrames(VidW, VidH, frames)
  }

  /** Synthetic video table (one real-frame AVI per document id). */
  def synthesizeVideos(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      MediaRecord(id, s"vid/$id.avi", "video/avi", videoBytes(id))
    }
  }

  /** Shot-boundary detection over REAL decoded movi frames — the
    * segmentation primitive of video-data curation (split at cuts, sample
    * per shot). The per-frame-pair L1 pixel difference is computed inside
    * the decode pass (the genuinely imperative codec path — frames of one
    * video live in one record); the BOUNDARY decision stays relational so
    * the threshold is a query knob. Emits one row per consecutive frame
    * pair; videos with no movi frames are absent.
    *
    * Output: `(media_id, f, l1_diff, boundary)` where `f` is the LATER
    * frame of the pair and boundary = l1_diff &gt; threshold.
    */
  def shotBoundaries(ds: Dataset[MediaRecord], threshold: Long): DataFrame = {
    require(threshold >= 1, s"threshold=$threshold must be >= 1")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        MediaFormats.aviFramesGray(r.content).iterator.flatMap {
          case (_, _, frames) =>
            Iterator.range(1, frames.length).map { f =>
              val a = frames(f - 1); val b = frames(f)
              var d = 0L; var i = 0
              while (i < a.length) { d += math.abs(a(i) - b(i)); i += 1 }
              (r.media_id, f.toLong, d)
            }
        }
      }
    }.toDF("media_id", "f", "l1_diff")
      .withColumn("boundary", (col("l1_diff") > threshold).cast("int"))
  }

  // ---- Audio features over REAL 16-bit PCM --------------------------------

  /** Signed 16-bit sample `i` of audio id — a plain integer formula (the
    * [[imagePixel]] discipline: NOT splitmix, the oracle replays every
    * sample) with sign structure so zero-crossing counts are non-trivial.
    */
  @inline def audioSample(id: Long, i: Int): Int =
    (((i * 37L + id * 211L + ((i + id) % 13L) * (i % 97L) * 5L)
      % 65536L) - 32768L).toInt

  /** Deterministic 16-bit PCM WAVE for a media id: 200 + id%56 samples at
    * an id-derived rate — small enough to fixture, real enough that every
    * feature below comes from decoding actual bytes.
    */
  def audioBytes(id: Long): Array[Byte] = {
    val n = (200 + id % 56).toInt
    val samples = Array.tabulate(n)(i => audioSample(id, i))
    MediaFormats.wavPcm16Bytes((8000 + (id % 8) * 1000).toInt, samples)
  }

  /** Synthetic PCM audio table (one WAVE per document id) — the
    * sample-bearing sibling of [[synthesizeImages]].
    */
  def synthesizeAudio(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      MediaRecord(id, s"audio/$id.wav", "audio/wav", audioBytes(id))
    }
  }

  /** Integer DSP features from REAL decoded PCM: the header yields the
    * sample rate, the data chunk yields the samples, and every feature
    * is an exact integer — peak = max|s|, energy = Σs² (long: 2¹⁵² per
    * sample, overflow past ~2⁶² samples per FILE, not per corpus),
    * zero_crossings = sign(s_i)≠sign(s_{i−1}) count with s ≥ 0 as
    * positive, duration_ms = n·1000 DIV rate. The per-file scan is the
    * genuinely imperative codec path (typed map); everything relational
    * stays in the plan.
    */
  def audioFeatures(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.map { r =>
      val header = MediaFormats.parseWav(r.content)
      val rate = header.map(_.sampleRate).getOrElse(0)
      val s = MediaFormats.pcm16Samples(r.content)
      var peak = 0L; var energy = 0L; var zc = 0L
      var i = 0
      while (i < s.length) {
        val v = s(i).toLong
        if (math.abs(v) > peak) peak = math.abs(v)
        energy += v * v
        if (i > 0 && ((s(i) >= 0) != (s(i - 1) >= 0))) zc += 1
        i += 1
      }
      (r.media_id, rate.toLong, s.length.toLong,
        if (rate > 0) s.length.toLong * 1000L / rate else 0L,
        peak, energy, zc)
    }.toDF("media_id", "sample_rate", "n_samples", "duration_ms",
      "peak", "energy", "zero_crossings")
  }

  /** Silence-run detection over REAL decoded PCM — the trim/segmentation
    * primitive of audio-data curation (leading/trailing silence removal,
    * long-pause splitting). The decode is the imperative stage (one typed
    * flatMap to (media, i, sample) rows); runs are pure relational
    * gaps-and-islands — `i − row_number()` over silent samples groups
    * consecutive positions, a per-media window (media files are the
    * parallelism; a window never spans media).
    *
    * Output: one row per media — `(media_id, n_runs, max_run,
    * silent_samples)` counting only runs of ≥ `minRun` samples with
    * |sample| &lt; `threshold`; silence-free media report zeros.
    */
  def audioSilence(ds: Dataset[MediaRecord], threshold: Int,
                   minRun: Int): DataFrame = {
    require(threshold >= 1 && minRun >= 1,
      s"bad threshold=$threshold minRun=$minRun")
    import ds.sparkSession.implicits._
    val samples = ds.flatMap { r =>
      val s = MediaFormats.pcm16Samples(r.content)
      Iterator.range(0, s.length).map(i => (r.media_id, i, s(i)))
    }.toDF("media_id", "i", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("i"))
    val runs = samples.filter(abs(col("v")) < threshold)
      .withColumn("grp", col("i") - row_number().over(w))
      .groupBy(col("media_id"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .filter(col("run_len") >= minRun)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_runs"), max(col("run_len")).as("max_run"),
        sum(col("run_len")).as("silent_samples"))
    ds.map(_.media_id).toDF("media_id")
      .join(runs, Seq("media_id"), "left")
      .na.fill(0L, Seq("n_runs", "max_run", "silent_samples"))
  }

  /** Windowed loudness profile over REAL decoded PCM — the per-window
    * peak/energy/clipping screen behind loudness normalization and
    * clipped-segment rejection in audio-data curation. The decode is the
    * imperative stage (one typed flatMap to sample rows); windowing is
    * `i DIV windowSamples` — a pure HASH aggregation on (media, window),
    * no window function anywhere. `gain_q8` is the integer Q8.8 gain
    * that would normalize the window's peak to full scale
    * (`32767·256 DIV peak`; NULL for digital silence).
    *
    * Output: one row per (media_id, win): `(media_id, win, n_samples,
    * peak, energy, n_clipped, gain_q8)`.
    */
  def audioWindows(ds: Dataset[MediaRecord], windowSamples: Int,
                   clipThreshold: Int = 30000): DataFrame = {
    require(windowSamples >= 1 && clipThreshold >= 1,
      s"bad windowSamples=$windowSamples clipThreshold=$clipThreshold")
    import ds.sparkSession.implicits._
    val samples = ds.flatMap { r =>
      val s = MediaFormats.pcm16Samples(r.content)
      Iterator.range(0, s.length).map(i => (r.media_id, i, s(i)))
    }.toDF("media_id", "i", "v")
    samples
      .groupBy(col("media_id"), expr(s"i DIV $windowSamples").as("win"))
      .agg(count(lit(1)).as("n_samples"),
        max(abs(col("v"))).cast("long").as("peak"),
        sum(col("v").cast("long") * col("v")).as("energy"),
        sum((abs(col("v")) >= clipThreshold).cast("long")).as("n_clipped"))
      .withColumn("gain_q8",
        expr("CASE WHEN peak = 0 THEN NULL " +
          "ELSE 32767 * 256 DIV peak END"))
  }

  /** Difference hash (dHash) of a gray raster: nearest-neighbor resize to
    * a 9×8 grid, then one bit per horizontal neighbor pair (left < right).
    * Packed as two NON-NEGATIVE 32-bit halves so both engines can xor /
    * popcount them in plain BIGINT arithmetic. Robust to small pixel
    * perturbations by construction — the near-dup primitive for images.
    */
  def dHash(w: Int, h: Int, gray: Array[Int]): (Long, Long) = {
    var lo = 0L
    var hi = 0L
    var k = 0
    while (k < 64) {
      val x = k % 8
      val y = k / 8
      val a = gray((y * h / 8) * w + (x * w / 9))
      val b = gray((y * h / 8) * w + ((x + 1) * w / 9))
      if (a < b) {
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
      k += 1
    }
    (hi, lo)
  }

  /** Exact integer pixel statistics from the REAL decoded raster — the
    * brightness / contrast screen a vision-data pipeline runs before
    * training (all-black / all-white / low-dynamic-range images are
    * dropped on these numbers). Per image: dimensions, pixel count,
    * gray sum, min/max, and the variance NUMERATOR `n·Σx² − (Σx)²`
    * (n² times the population variance — order-independent where a
    * float variance is not). The subtraction runs in BigInt: the NAIVE
    * long products `n·Σx²` and `(Σx)²` wrap at ~1.2·10⁷ pixels (worst
    * case 65025·n² &gt; 2⁶³ — NOT the 2³¹ a previous doc claimed), while
    * the DIFFERENCE n²·var ≤ 16256·n² stays in int64 up to ~2.4·10⁷
    * pixels worst-case (far more for low-variance rasters); a raster
    * whose true numerator overflows int64 throws rather than wrapping.
    * Non-decodable blobs are absent, as in [[imageHashes]].
    */
  def imageStats(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        MediaFormats.decodeImageGray(r.content).map { case (w, h, gray) =>
          var s = 0L; var s2 = 0L; var mn = 256L; var mx = -1L
          var i = 0
          while (i < gray.length) {
            val v = gray(i).toLong
            s += v; s2 += v * v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          val n = gray.length.toLong
          val varNum = BigInt(n) * BigInt(s2) - BigInt(s) * BigInt(s)
          require(varNum.isValidLong,
            s"variance numerator $varNum of media ${r.media_id} " +
              s"($n px) overflows int64")
          (r.media_id, w, h, n, s, mn, mx, varNum.toLong)
        }
      }
    }.toDF("media_id", "width", "height", "n_pixels", "sum_gray",
      "min_gray", "max_gray", "var_num")
  }

  /** Per-image perceptual hashes: decode the REAL BMP container
    * (bottom-up rows, stride padding, luma conversion) and dHash the
    * pixels. Output (media_id, h_hi, h_lo); images that are not complete
    * 24-bit rasters are absent.
    */
  def imageHashes(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        MediaFormats.decodeImageGray(r.content).map { case (w, h, gray) =>
          val (hi, lo) = dHash(w, h, gray)
          (r.media_id, hi, lo)
        }
      }
    }.toDF("media_id", "h_hi", "h_lo")
  }

  /** Near-duplicate image pairs at Hamming distance ≤ `maxHamming` over
    * the 64-bit dHash, found WITHOUT a quadratic self-join: the hash
    * splits into 4 16-bit chunks, distance ≤ 3 forces at least one chunk
    * to match exactly (pigeonhole), so candidates come from 4 hash-
    * partitionable equi-joins on (chunk index, chunk value) — the
    * SimHash plan shape applied to pixels. `maxHamming` is capped at 3
    * because the 4-chunk split only guarantees recall up to there.
    */
  def phashNearDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming out of [0, 3] (4-chunk pigeonhole bound)")
    val chunked = hashes.select(col("media_id"), col("h_hi"), col("h_lo"),
      explode(array(
        struct(lit(0).as("ci"), (col("h_lo") % 65536L).as("cv")),
        struct(lit(1).as("ci"), expr("h_lo DIV 65536").as("cv")),
        struct(lit(2).as("ci"), (col("h_hi") % 65536L).as("cv")),
        struct(lit(3).as("ci"), expr("h_hi DIV 65536").as("cv")))).as("c"))
      .select(col("media_id"), col("h_hi"), col("h_lo"),
        col("c.ci").as("ci"), col("c.cv").as("cv"))
    val a = chunked.toDF("a", "a_hi", "a_lo", "ci", "cv")
    val b = chunked.toDF("b", "b_hi", "b_lo", "ci", "cv")
    a.join(b, Seq("ci", "cv"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (expr("bit_count(a_hi ^ b_hi)") + expr("bit_count(a_lo ^ b_lo)"))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Decode + feature-extract, one partition at a time (batch-amortized the
    * way a real codec pool would be). Metadata is REAL: width / height /
    * frame-count are parsed from the container header bytes
    * ([[MediaFormats.parse]] dispatches on magic bytes, not the mime hint);
    * fields a format doesn't carry (image width for audio) are 0.
    * `mean_byte` touches every content byte.
    */
  def decode(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // a codec pool for payload decode would initialize here, once per partition
      it.map { r =>
        var sum = 0L
        var i = 0
        while (i < r.content.length) { sum += (r.content(i) & 0xff); i += 1 }
        val h = MediaFormats.parse(r.content).getOrElse(
          MediaFormats.MediaHeader("unknown", -1, -1, -1, -1, -1))
        MediaFeatures(
          media_id = r.media_id,
          mime = r.mime,
          content_len = r.content.length,
          width = math.max(h.width, 0),
          height = math.max(h.height, 0),
          n_frames = math.max(h.nFrames, 0),
          mean_byte = sum.toDouble / r.content.length)
      }
    }
  }
}
