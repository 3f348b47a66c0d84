package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IncrementalSource, Multimodal, Sinks}

class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("W1 idempotent append: re-running the same batch appends nothing") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/t"
    val batch = Seq((1L, "a"), (2L, "b"), (2L, "b-dup")).toDF("k", "v")
    val n1 = Sinks.idempotentAppend(spark, batch, dir, Seq("k"))
    assert(n1 == 2) // in-batch dedupe on key
    val n2 = Sinks.idempotentAppend(spark, batch, dir, Seq("k"))
    assert(n2 == 0)
    val n3 = Sinks.idempotentAppend(spark,
      Seq((3L, "c")).toDF("k", "v"), dir, Seq("k"))
    assert(n3 == 1)
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("W3 overwrite-with-derived rewrites the table with new columns") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/t"
    Seq(("a,b", 1), ("c", 2)).toDF("names", "id")
      .write.parquet(dir)
    Sinks.overwriteWithDerived(spark, dir,
      df => df.withColumn("split", split(col("names"), ",")))
    val out = spark.read.parquet(dir)
    assert(out.columns.toSet == Set("names", "id", "split"))
    assert(out.filter(col("id") === 1).select("split").as[Seq[String]].head()
      == Seq("a", "b"))
  }

  test("partitioned write produces prunable layout") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/t"
    val df = Seq(("2024-01-01", 1), ("2024-01-02", 2)).toDF("day", "v")
    Sinks.writePartitioned(df, dir, Seq("day"))
    assert(new java.io.File(dir, "day=2024-01-01").exists())
    val pruned = spark.read.parquet(dir).filter(col("day") === "2024-01-01")
    assert(pruned.count() == 1)
  }

  test("fan-out union tags lineage and aligns drifted schemas") {
    val p1 = Files.createTempDirectory("graft-src").toString + "/a"
    val p2 = Files.createTempDirectory("graft-src").toString + "/b"
    Seq((1, "x")).toDF("id", "name").write.parquet(p1)
    Seq((2, 5.0)).toDF("id", "score").write.parquet(p2)
    val out = IncrementalSource.fanOutUnion(spark,
      Seq("uk" -> p1, "de" -> p2), p => spark.read.parquet(p))
    assert(out.columns.toSet == Set("id", "name", "score", "country_code"))
    assert(out.count() == 2)
    assert(out.filter(col("country_code") === "de").select("id").as[Int].head() == 2)
  }

  test("multimodal decode: mean_byte derives from the real binary bytes") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(20)
    val media = Multimodal.synthesize(spark, docs)
    val feats = Multimodal.decode(media).collect()
    val raw = media.collect().map(r => r.media_id -> r.content).toMap
    feats.foreach { f =>
      val bytes = raw(f.media_id)
      assert(f.content_len == bytes.length)
      val mean = bytes.map(_ & 0xff).sum.toDouble / bytes.length
      assert(math.abs(f.mean_byte - mean) < 1e-12)
    }
    assert(feats.length == 20)
  }

  test("audio features derive from real PCM bytes; wav16 encode/decode round-trips") {
    import graft.sources.MediaFormats
    // byte-level round trip incl. negative samples and sign extension
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345)
    val wav = MediaFormats.wavPcm16Bytes(8000, samples)
    assert(MediaFormats.pcm16Samples(wav).toSeq == samples.toSeq)
    assert(MediaFormats.parseWav(wav).exists(h =>
      h.sampleRate == 8000 && h.nFrames == samples.length))
    // features recomputed from the raw decoded samples must agree exactly
    val docs = Tables.documents(spark, TestSpark.sf).limit(20)
    val audio = Multimodal.synthesizeAudio(spark, docs)
    val feats = Multimodal.audioFeatures(audio)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val raw = audio.collect().map(r => r.media_id -> r.content).toMap
    feats.foreach { case (id, rate, n, durMs, peak, energy, zc) =>
      val s = MediaFormats.pcm16Samples(raw(id))
      assert(n == s.length && rate == 8000 + (id % 8) * 1000)
      assert(durMs == n * 1000 / rate)
      assert(peak == s.map(v => math.abs(v.toLong)).max)
      assert(energy == s.map(v => v.toLong * v).sum)
      assert(zc == s.indices.drop(1)
        .count(i => (s(i) >= 0) != (s(i - 1) >= 0)).toLong)
    }
    assert(feats.length == 20)
  }

  test("CSV and JSON source legs round-trip with explicit schemas") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-fmt").toString
    val df = Tables.customer(spark, TestSpark.sf)
      .select("c_custkey", "c_name", "c_acctbal")
    // CSV: header + explicit schema on read (schema inference over a huge
    // file listing is a scan of its own — never at 100 TB)
    df.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val csvBack = spark.read.schema(df.schema)
      .option("header", "true").csv(s"$base/csv")
    assert(csvBack.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
    // JSON lines
    df.write.mode("overwrite").json(s"$base/json")
    val jsonBack = spark.read.schema(df.schema).json(s"$base/json")
    assert(jsonBack.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("writeWithAudit observes exact metrics in the same pass as the write") {
    val dir = java.nio.file.Files.createTempDirectory("graft-audit").toString
    val li = Tables.lineitem(spark, TestSpark.sf)
    val got = graft.sources.Sinks.writeWithAudit(li, s"$dir/out", Map(
      "n_rows" -> count(lit(1)),
      "n_null_flag" -> sum(when(col("l_returnflag").isNull, 1L).otherwise(0L)),
      "max_qty" -> max(col("l_quantity")),
      "n_violations" -> sum(when(col("l_quantity") < 0, 1L).otherwise(0L))))
    val expected = li.agg(count(lit(1)), max(col("l_quantity"))).head()
    assert(got("n_rows") == expected.getLong(0))
    assert(got("max_qty") == expected.getDouble(1))
    assert(got("n_null_flag") == 0L && got("n_violations") == 0L)
    // and the write itself happened in full
    assert(spark.read.parquet(s"$dir/out").count() == expected.getLong(0))
  }

  test("compactFiles merges fragmented tables, preserves data, no-ops when compact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val path = s"$dir/frag"
    val docs = Tables.documents(spark, TestSpark.sf)
    docs.repartition(20).write.parquet(path) // 20 tiny files
    val expected = docs.collect().map(_.toSeq).toSet
    val (before, after) = graft.sources.Sinks.compactFiles(spark, path,
      targetBytes = 1L << 30)
    assert(before == 20 && after < before,
      s"expected fewer files after compaction, got $before -> $after")
    assert(spark.read.parquet(path).collect().map(_.toSeq).toSet == expected,
      "compaction must not change table contents")
    // second run: already compact, untouched
    val (b2, a2) = graft.sources.Sinks.compactFiles(spark, path,
      targetBytes = 1L << 30)
    assert(b2 == after && a2 == after, "compact table must be left alone")
  }

  test("W7 outbox: RFC-822 render, idempotent redelivery, header-injection guard, size contract") {
    val dir = Files.createTempDirectory("graft-outbox").toString + "/out"
    val msg = Seq(("ops@example.invalid", "Job done",
        "<p><b>completed!</b></p>")).toDF("recipient", "subject", "body_html")
    val p1 = Sinks.writeOutbox(msg, dir)
    assert(p1.length == 1 && p1.head.endsWith(".eml"))
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p1.head)), "UTF-8")
    assert(text.startsWith("To: ops@example.invalid\r\nSubject: Job done\r\n"))
    assert(text.contains("Content-Type: text/html; charset=utf-8\r\n\r\n<p><b>completed!</b></p>"))
    // redelivery (checkpoint replay / retry) must overwrite, not duplicate:
    // the file name is the md5 of the rendered message
    val p2 = Sinks.writeOutbox(msg, dir)
    assert(p2 == p1)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".eml")) == 1)
    // a newline smuggled into a header field must not inject a header
    val evil = Seq(("a@b.c\r\nBcc: x@y.z", "s", "b"))
      .toDF("recipient", "subject", "body_html")
    val p3 = Sinks.writeOutbox(evil, dir)
    val t3 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p3.head)), "UTF-8")
    assert(!t3.contains("\r\nBcc:"), "header injection must be sanitized")
    // a data-sized frame is a contract violation, not a driver collect
    val big = spark.range(0, 200).select(
      concat(lit("u"), col("id").cast("string"), lit("@example.invalid")).as("recipient"),
      lit("s").as("subject"), lit("b").as("body_html"))
    val e = intercept[IllegalArgumentException] { Sinks.writeOutbox(big, dir) }
    assert(e.getMessage.contains("parameter-sized"))
  }

  test("ORC source leg round-trips exactly and materializes only once") {
    import graft.sources.FixtureSources
    FixtureSources.ensureOrc(spark)
    val read = spark.read.orc(FixtureSources.orcPath)
      .as[(Long, String, Double)].collect().toSet
    assert(read == FixtureSources.orcRows.toSet,
      "ORC write -> read must preserve every row bit-exactly")
    val marker = java.nio.file.Paths.get(FixtureSources.orcPath, "_graft_done")
    val t1 = java.nio.file.Files.getLastModifiedTime(marker)
    FixtureSources.ensureOrc(spark) // second call: no rewrite
    assert(java.nio.file.Files.getLastModifiedTime(marker) == t1)
  }

  test("bmp24 gray raster round-trips through the container byte-exactly") {
    import graft.sources.MediaFormats
    val w = 7 // stride 24 != w*3 — padding must be skipped on decode
    val h = 5
    val gray = Array.tabulate(w * h)(i => (i * 37) % 256)
    val bytes = MediaFormats.bmp24GrayBytes(w, h, gray)
    val Some((dw, dh, back)) = MediaFormats.decodeBmp24Gray(bytes)
    assert((dw, dh) == (w, h))
    assert(back.toSeq == gray.toSeq)
    // the metadata-only truncated fixtures must NOT decode as rasters
    assert(MediaFormats.decodeBmp24Gray(
      MediaFormats.bmpBytes(640, 480, Array.fill[Byte](32)(1))).isEmpty)
  }

  test("png decode agrees with the bmp decoder pixel-for-pixel; consumers accept png") {
    import graft.sources.{MediaFormats, Multimodal}
    import spark.implicits._
    // a deterministic RGB pattern exercising all three channels + rounding
    val w = 9; val h = 6
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 41 + y) % 256 << 16) |
        ((y * 73 + x * 5) % 256 << 8) | ((x * 11 + y * 29) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray
    val Some((pw, ph, pGray)) = MediaFormats.decodePngGray(png)
    assert((pw, ph) == (w, h))
    // reference: the BMP decoder over the SAME pixels (identical luma) —
    // the oracle-replayable leg pins the PNG leg
    val expected = for (y <- 0 until h; x <- 0 until w) yield {
      val rgb = img.getRGB(x, y)
      (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
    }
    assert(pGray.toSeq == expected,
      "png luma must equal the shared integer ITU-R 601 formula")
    // dispatching decode routes both containers; non-images stay absent
    assert(MediaFormats.decodeImageGray(png).isDefined)
    assert(MediaFormats.decodePngGray("not a png".getBytes).isEmpty)
    // the Dataset consumers accept a PNG MediaRecord end-to-end
    val ds = Seq(Multimodal.MediaRecord(7L, "x.png", "image/png", png)).toDS()
    val st = Multimodal.imageStats(ds).collect()
    assert(st.length == 1 && st.head.getAs[Long]("n_pixels") == (w * h).toLong
      && st.head.getAs[Long]("sum_gray") == expected.map(_.toLong).sum)
    assert(Multimodal.imageHashes(ds).count() == 1)
  }

  test("dHash collapses one-pixel perturbations; groups differ") {
    val docs = (0L until 40L).toDF("doc_id")
    val hs = Multimodal.imageHashes(Multimodal.synthesizeImages(spark, docs))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hs.size == 40)
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    // within a group of 4: tiny distance; across groups: larger
    val within = for (g <- 0L until 10L; i <- 0 to 3; j <- i + 1 to 3)
      yield ham(hs(g * 4 + i), hs(g * 4 + j))
    val across = for (g <- 0L until 9L) yield ham(hs(g * 4), hs((g + 1) * 4))
    assert(within.max <= 4, s"within-group distances ${within.sorted.reverse.take(3)}")
    assert(across.min > 3, s"cross-group distances ${across.sorted.take(3)}")
  }

  test("phash near-dup join equals brute force at the declared threshold") {
    val docs = (0L until 60L).toDF("doc_id")
    val hashes = Multimodal.imageHashes(Multimodal.synthesizeImages(spark, docs))
    val got = Multimodal.phashNearDups(hashes, maxHamming = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val hs = hashes.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    val brute = (for {
      (ia, (ah, al)) <- hs; (ib, (bh, bl)) <- hs if ia < ib
      if java.lang.Long.bitCount(ah ^ bh) + java.lang.Long.bitCount(al ^ bl) <= 3
    } yield (ia, ib)).toSet
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("audioSilence: islands over decoded PCM, minRun cut, zero rows kept") {
    import spark.implicits._
    import graft.sources.{MediaFormats, Multimodal}
    // file 1: two silence runs of 3 (positions 0-2 and 4-6) at |v|<1000
    // file 2: all loud -> zeros row still present
    val s1 = Array(0, 100, -50, 9000, 0, 0, 0, 9000)
    val s2 = Array(5000, -5000, 5000)
    val ds = Seq(
      Multimodal.MediaRecord(1L, "a.wav", "audio/wav",
        MediaFormats.wavPcm16Bytes(8000, s1)),
      Multimodal.MediaRecord(2L, "b.wav", "audio/wav",
        MediaFormats.wavPcm16Bytes(8000, s2))).toDS()
    val out = Multimodal.audioSilence(ds, threshold = 1000, minRun = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, 2L, 3L, 6L), (2L, 0L, 0L, 0L)))
    // raising minRun past the longest run empties the counts
    val strict = Multimodal.audioSilence(ds, threshold = 1000, minRun = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(strict.forall(_._2 == 0L))
  }

  test("imageStats: exact stats from decoded pixels; perturbation visible") {
    import spark.implicits._
    val docs = (0L to 7L).toDF("doc_id")
    val stats = Multimodal.imageStats(
        Multimodal.synthesizeImages(spark, docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(stats.size == 8)
    // recompute id 0's stats from the generation formula directly
    val gray = Array.tabulate(Multimodal.ImgW * Multimodal.ImgH)(i =>
      Multimodal.imagePixel(0L, i % Multimodal.ImgW, i / Multimodal.ImgW))
    val s = gray.map(_.toLong).sum
    val s2 = gray.map(v => v.toLong * v).sum
    val r0 = stats(0L)
    assert(r0.getInt(1) == 18 && r0.getInt(2) == 16)
    assert(r0.getLong(3) == 288L && r0.getLong(4) == s)
    assert(r0.getLong(5) == gray.min.toLong && r0.getLong(6) == gray.max.toLong)
    assert(r0.getLong(7) == 288L * s2 - s * s)
    // member 1 of the group differs from member 0 in exactly one pixel
    assert(stats(1L).getLong(4) != r0.getLong(4))
  }

  test("aviWithFrames round-trips through aviFramesGray; shot cuts detected") {
    import spark.implicits._
    import graft.sources.{MediaFormats, Multimodal}
    // container round trip: encode 3 hand-made frames, decode them back
    val f0 = Array.tabulate(48)(i => i % 256)
    val f1 = Array.tabulate(48)(i => (i * 3 + 1) % 256)
    val f2 = Array.tabulate(48)(_ => 200)
    val avi = MediaFormats.aviWithFrames(8, 6, Array(f0, f1, f2))
    val Some((w, h, back)) = MediaFormats.aviFramesGray(avi)
    assert(w == 8 && h == 6 && back.length == 3)
    assert(back(0).toSeq == f0.toSeq && back(1).toSeq == f1.toSeq &&
      back(2).toSeq == f2.toSeq)
    // the metadata parser still reads the same container
    assert(MediaFormats.parseAvi(avi).exists(m =>
      m.width == 8 && m.height == 6 && m.nFrames == 3))
    // JUNK-payload fixtures (no movi) yield None, not garbage frames
    assert(MediaFormats.aviFramesGray(
      MediaFormats.aviBytes(8, 6, 3, new Array[Byte](16))).isEmpty)
    // shot boundaries: cuts at every ShotLen-th frame, nowhere else
    val docs = (0L to 9L).toDF("doc_id")
    val out = Multimodal.shotBoundaries(
        Multimodal.synthesizeVideos(spark, docs), threshold = 1000L)
      .as[(Long, Long, Long, Int)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, f, d, b) =>
      val expectCut = f % Multimodal.ShotLen == 0
      assert(b == (if (expectCut) 1 else 0),
        s"media $id frame $f: l1=$d boundary=$b expected cut=$expectCut")
    }
    // every video contributes nFrames-1 pairs
    val pairCounts = out.groupBy(_._1).view.mapValues(_.length).toMap
    (0L to 9L).foreach { id =>
      assert(pairCounts(id) == (8 + id % 5).toInt - 1)
    }
  }

  test("ensureBuiltOnce: builds once per signature, rebuilds on drift") {
    var builds = 0
    val tbl = "graft_test_build_once"
    Seq("", "_marker").foreach(s => Sinks.dropTableAndLocation(spark, tbl + s))
    def build(sig: String): Unit =
      Sinks.ensureBuiltOnce(spark, tbl, sig) { builds += 1 }
    build("sigA"); build("sigA"); build("sigA")
    assert(builds == 1, "same signature must not rebuild")
    build("sigB")
    assert(builds == 2, "a drifted signature must force the rebuild")
    build("sigB")
    assert(builds == 2)
    // marker is written AFTER the build: a throwing build leaves no
    // marker, so the next attempt retries instead of trusting a partial
    intercept[RuntimeException] {
      Sinks.ensureBuiltOnce(spark, tbl, "sigC") {
        throw new RuntimeException("boom")
      }
    }
    build("sigC")
    assert(builds == 3, "failed build must not mark the signature as done")
    Seq("", "_marker").foreach(s => Sinks.dropTableAndLocation(spark, tbl + s))
  }

  test("contentSignature: order-insensitive, content-sensitive") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "t")
    val b = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("id", "t")
    val c = Seq((1L, "x"), (2L, "y"), (3L, "Z")).toDF("id", "t")
    assert(Sinks.contentSignature(a) == Sinks.contentSignature(b),
      "row order must not change the signature")
    assert(Sinks.contentSignature(a) != Sinks.contentSignature(c),
      "a changed value must change the signature")
    assert(Sinks.contentSignature(a) != Sinks.contentSignature(a.limit(2)),
      "a changed count must change the signature")
  }

  test("contentSignature: even-multiplicity swaps change the signature") {
    // the XOR-only collision class: {A,A} -> {B,B} keeps count AND the
    // hash XOR (both pairs fold to 0); the decimal hash sum must differ
    val aa = Seq((1L, "dup"), (1L, "dup")).toDF("id", "t")
    val bb = Seq((2L, "other"), (2L, "other")).toDF("id", "t")
    assert(Sinks.contentSignature(aa) != Sinks.contentSignature(bb),
      "replacing a duplicated row pair with a different pair must " +
        "change the signature (XOR alone cancels even multiplicities)")
    // multiplicity of an existing row is content too
    val a1 = Seq((1L, "dup")).toDF("id", "t")
    assert(Sinks.contentSignature(aa) != Sinks.contentSignature(a1))
  }

  test("ensureBuiltOnce: matching marker is not trusted when a target " +
      "table was dropped out-of-band") {
    var builds = 0
    val tbl = "graft_test_build_targets"
    Seq("", "_idx", "_marker").foreach(s =>
      Sinks.dropTableAndLocation(spark, tbl + s))
    def build(): Unit =
      Sinks.ensureBuiltOnce(spark, tbl, "sig1",
        expectedSuffixes = Seq("_idx")) {
        builds += 1
        Seq((1L, "a")).toDF("id", "t")
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .format("parquet").saveAsTable(s"${tbl}_idx")
      }
    build(); build()
    assert(builds == 1, "unchanged signature with targets present must skip")
    // warehouse wipe with the marker surviving: the build must re-run or
    // every subsequent probe fails on a missing table
    Sinks.dropTableAndLocation(spark, s"${tbl}_idx")
    build()
    assert(builds == 2, "a missing target table must force the rebuild")
    assert(spark.catalog.tableExists(s"${tbl}_idx"))
    Seq("", "_idx", "_marker").foreach(s =>
      Sinks.dropTableAndLocation(spark, tbl + s))
  }

  test("dropTableAndLocation: catalog-resolved managed drop; external data survives") {
    import java.nio.file.Files
    // external table: the catalog entry goes away, the files stay
    val extDir = Files.createTempDirectory("graft_ext_tbl").toFile
    Seq((1L, "a"), (2L, "b")).toDF("id", "t")
      .write.mode("overwrite").parquet(extDir.getAbsolutePath)
    val ext = "graft_test_ext_drop"
    Sinks.createTableIfNotExists(spark, ext, extDir.getAbsolutePath)
    Sinks.dropTableAndLocation(spark, ext)
    assert(!spark.catalog.tableExists(ext))
    assert(spark.read.parquet(extDir.getAbsolutePath).count() == 2,
      "EXTERNAL table data must never be deleted")
    // managed table: both entry and files go away (location from catalog)
    val mng = "graft_test_mng_drop"
    Seq((1L, "a")).toDF("id", "t").write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(mng)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    Sinks.dropTableAndLocation(spark, mng)
    assert(!spark.catalog.tableExists(mng))
    val whPath = new org.apache.hadoop.fs.Path(wh, mng)
    val fs = whPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(whPath), "managed location must be removed")
  }

  test("audioWindows: exact per-window peak/energy/clipping from decoded PCM") {
    import spark.implicits._
    import graft.sources.{MediaFormats, Multimodal}
    val s1 = Array(100, -200, 31000, 5, -31000, 7, 8, 9) // clips at 30000
    val ds = Seq(Multimodal.MediaRecord(1L, "a.wav", "audio/wav",
      MediaFormats.wavPcm16Bytes(8000, s1))).toDS()
    val out = Multimodal.audioWindows(ds, windowSamples = 4,
        clipThreshold = 30000)
      .orderBy("win")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    def en(xs: Seq[Int]) = xs.map(v => v.toLong * v).sum
    assert(out == Seq(
      (1L, 0L, 4L, 31000L, en(Seq(100, -200, 31000, 5)), 1L,
        32767L * 256 / 31000),
      (1L, 1L, 4L, 31000L, en(Seq(-31000, 7, 8, 9)), 1L,
        32767L * 256 / 31000)))
  }

  test("appendBucketed never creates: refuses a missing table, finishes a dangling compaction swap first") {
    def cleanup(): Unit = Seq("t_ab_guard", "t_ab_guard_cstg")
      .foreach(Sinks.dropTableAndLocation(spark, _))
    cleanup()
    val rows = (1L to 20L).map(i => (i, s"v$i")).toDF("k", "v")
    // 1) append to a table that has never existed → refuse (the old
    //    SaveMode.Append default would silently CREATE it holding only
    //    the delta — the corpus-loss trap the round-12 advice named)
    val e = intercept[IllegalArgumentException] {
      Sinks.appendBucketed(rows, "t_ab_guard", Seq("k"), 4)
    }
    assert(e.getMessage.contains("appends never create"))
    // 2) dangling compaction window: original dropped, complete staging
    //    copy present — an append must FINISH the swap, then append, so
    //    the corpus rows survive and the delta lands on top
    Sinks.writeBucketed(rows, "t_ab_guard_cstg", Seq("k"), 4)
    assert(!spark.catalog.tableExists("t_ab_guard"))
    val delta = Seq((100L, "d")).toDF("k", "v")
    Sinks.appendBucketed(delta, "t_ab_guard", Seq("k"), 4)
    assert(spark.catalog.tableExists("t_ab_guard") &&
      !spark.catalog.tableExists("t_ab_guard_cstg"),
      "recovery must rename the staging copy into place")
    assert(spark.table("t_ab_guard").count() == 21,
      "recovered table must hold corpus + delta, never delta alone")
    cleanup()
  }
}
