package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq((0L, "a" * 160), (1L, "b" * 17), (2L, "c")).toDF("doc_id", "text")
  }

  test("withMedia attaches bytes + typed metadata") {
    val m = Multimodal.withMedia(docs).orderBy("doc_id").collect()
    assert(m(0).getAs[Array[Byte]]("media").length === 160)
    assert(m(0).getAs[Long]("n_bytes") === 160L)
    assert(m(0).getAs[String]("media_type") === "image/png")  // doc_id 0 % 3
    assert(m(1).getAs[String]("media_type") === "audio/wav")
    assert(m(2).getAs[String]("media_type") === "video/mp4")
    val w = m(0).getAs[Int]("width"); val h = m(0).getAs[Int]("height")
    assert(w >= 1 && w <= 1920 && h >= 1 && h <= 1080)
  }

  test("stubDecode is deterministic and fixed-width") {
    val bytes = "hello world".getBytes("UTF-8")
    val f1 = Multimodal.stubDecode(bytes)
    val f2 = Multimodal.stubDecode(bytes)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === 8)
    assert(Multimodal.stubDecode(Array.emptyByteArray).toSeq === Seq.fill(8)(0.0f))
  }

  test("sampleFrames: media smaller than one frame samples nothing") {
    import spark.implicits._
    val tiny = Seq((0L, "short", "en", "src0", 5L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Multimodal.sampleFrames(Multimodal.withMedia(tiny)).collect().head
    assert(r.getAs[Int]("n_frames") === 0)
    assert(r.getSeq[Int](r.fieldIndex("sampled_frame_idx")).isEmpty,
      "zero frames must sample zero, not a phantom index 0")
  }

  test("resizePlan: bounding box respected, aspect ratio preserved, small media untouched") {
    val m = Multimodal.withMedia(docs)
    val r = Multimodal.resizePlan(m, maxW = 100, maxH = 50).collect()
    for (row <- r) {
      val w = row.getAs[Int]("width"); val h = row.getAs[Int]("height")
      val nw = row.getAs[Int]("new_width"); val nh = row.getAs[Int]("new_height")
      if (w <= 100 && h <= 50) {
        assert(nw === w && nh === h, "in-bounds media must not resize")
      } else {
        assert(nw >= 1 && nw <= 100 && nh >= 1 && nh <= 50, s"($w,$h)->($nw,$nh) out of box")
        // floor-rounded scale: ratio preserved within 1px of exact
        val scale = math.min(100.0 / w, 50.0 / h)
        assert(math.abs(nw - w * scale) <= 1.0 && math.abs(nh - h * scale) <= 1.0)
      }
    }
  }

  test("extractFeatures runs the mapPartitions decode with correct shapes") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.withMedia(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.length === 3)
    assert(feats.forall(_.feature.length === 8))
    // doc 0: 160 bytes of 'a' (0x61) -> every chunk average is exactly 97
    assert(feats(0).feature.forall(_ === 97.0f))
    assert(feats(0).n_frames === (160 % 30 + 1))
  }

  test("extractFeatures accepts a custom decoder through the same partition-amortized path") {
    // a stateful class decoder: open() builds per-partition state, close()
    // must fire once per partition (counted via accumulators so the
    // assertion sees executor-side effects)
    val opens = spark.sparkContext.longAccumulator("opens")
    val closes = spark.sparkContext.longAccumulator("closes")
    class ConstDecoder extends Multimodal.MediaDecoder {
      @transient private var ready = false
      override def open(): Unit = { ready = true; opens.add(1) }
      def decode(bytes: Array[Byte]): Array[Float] = {
        assert(ready, "decode before open()")
        Array.fill(4)(bytes.length.toFloat)
      }
      override def close(): Unit = closes.add(1)
    }
    val feats = Multimodal
      .extractFeatures(spark, Multimodal.withMedia(docs).repartition(2), new ConstDecoder)
      .collect().sortBy(_.doc_id)
    assert(feats.forall(_.feature.length === 4), "custom decoder's width must pass through")
    assert(feats(0).feature.head === 160.0f)
    assert(opens.value === 2 && closes.value === 2,
      s"open/close once per partition, got ${opens.value}/${closes.value}")
  }

  test("sampleFrames slices every stride-th frame") {
    val r = Multimodal.sampleFrames(Multimodal.withMedia(docs))
      .orderBy("doc_id").collect()
    // doc 0: 160 bytes -> 10 frames -> idx 0,4,8 sampled
    assert(r(0).getAs[Int]("n_frames") === 10)
    assert(r(0).getSeq[Int](r(0).fieldIndex("sampled_frame_idx")) === Seq(0, 4, 8))
    val frames = r(0).getSeq[Array[Byte]](r(0).fieldIndex("sampled_frames"))
    assert(frames.forall(_.length === 16))
    // doc 2: 1 byte -> 0 full frames -> degenerate single sample index
    assert(r(2).getAs[Int]("n_frames") === 0)
  }

  test("ImageIoDecoder decodes REAL PNG bytes through extractFeatures") {
    import spark.implicits._
    // genuine PNGs, synthesized with the same JDK codec family the
    // decoder reads with: three 32x24 solid-color images
    def png(r: Int, g: Int, b: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gr = img.createGraphics()
      try { gr.setColor(new java.awt.Color(r, g, b)); gr.fillRect(0, 0, 32, 24) }
      finally gr.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val media = Seq(
      (0L, png(255, 0, 0)),   // solid red   -> luma 0.299
      (1L, png(0, 255, 0)),   // solid green -> luma 0.587
      (2L, png(0, 0, 255)))   // solid blue  -> luma 0.114
      .toDF("doc_id", "media")
      .withColumn("n_bytes", org.apache.spark.sql.functions.octet_length(
        org.apache.spark.sql.functions.col("media")).cast("long"))
    val feats = Multimodal.extractFeatures(spark, media,
        new Multimodal.ImageIoDecoder(thumb = 8))
      .collect().sortBy(_.doc_id)
    assert(feats.length === 3 && feats.forall(_.feature.length === 64))
    // a solid image downscales to a solid thumbnail: every cell equals
    // the color's luma (to within 8-bit quantization)
    val expected = Seq(0.299f, 0.587f, 0.114f)
    feats.zip(expected).foreach { case (f, e) =>
      f.feature.foreach(v => assert(math.abs(v - e) < 0.01f,
        s"doc ${f.doc_id}: cell $v != luma $e"))
    }
    // undecodable bytes fail loudly, not silently
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
      .withColumn("n_bytes", org.apache.spark.sql.functions.lit(3L))
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(spark, junk, new Multimodal.ImageIoDecoder()).collect()
    }
    assert(ex.getMessage.contains("not a decodable image") ||
      Option(ex.getCause).exists(_.getMessage.contains("not a decodable image")))
  }

  test("WavDecoder decodes REAL WAV bytes through extractFeatures") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // a genuine 16-bit mono PCM WAV: first half silence, second half a
    // full-scale square wave — the energy envelope is unambiguous
    def wav(): Array[Byte] = {
      val n = 8000
      val pcm = new Array[Byte](n * 2)
      var i = n / 2
      while (i < n) {
        val v: Short = if (i % 2 == 0) 30000 else -30000
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq((0L, wav())).toDF("doc_id", "media")
      .withColumn("n_bytes", org.apache.spark.sql.functions.octet_length(
        org.apache.spark.sql.functions.col("media")).cast("long"))
    val f = Multimodal.extractFeatures(spark, media,
        new Multimodal.WavDecoder(dims = 8))
      .collect().head.feature
    assert(f.length === 8)
    // windows 0-3: silence (RMS ~0); windows 4-7: full-scale square
    // (RMS ~30000/32768 ~ 0.9155)
    f.take(4).foreach(v => assert(v < 0.01f, s"silent window read $v"))
    f.drop(4).foreach(v => assert(math.abs(v - 30000f / 32768f) < 0.01f,
      s"square-wave window read $v"))
    // junk bytes fail loudly through the same path
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
      .withColumn("n_bytes", org.apache.spark.sql.functions.lit(3L))
    intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(spark, junk, new Multimodal.WavDecoder()).collect()
    }
  }

  test("mediaCatalog aggregates without reading media bytes") {
    val cat = Multimodal.mediaCatalog(Multimodal.withMedia(docs))
      .orderBy("media_type").collect()
    assert(cat.map(_.getAs[String]("media_type")).toSeq ===
      Seq("audio/wav", "image/png", "video/mp4"))
    assert(cat.map(_.getAs[Long]("total_bytes")).sum === 160L + 17 + 1)
  }

  test("extractFrameFeatures: strided frames through the lazy iterator seam") {
    val media = Multimodal.withMedia(docs)
    val out = Multimodal.extractFrameFeatures(spark, media,
        new Multimodal.ChunkVideoDecoder(frameBytes = 16, dims = 8), stride = 4)
      .collect().groupBy(_.doc_id)
    // doc 0: 160 bytes = 10 complete frames → idx 0,4,8; doc 1: 17 bytes
    // = 1 frame → idx 0; doc 2: 1 byte = 0 frames → absent
    assert(out(0L).map(_.frame_idx).sorted.toSeq === Seq(0, 4, 8))
    assert(out(1L).map(_.frame_idx).toSeq === Seq(0))
    assert(!out.contains(2L))
    // each emitted feature equals stubDecode of exactly that chunk
    val payload = Array.fill[Byte](160)('a'.toByte)
    val frame4 = Multimodal.stubDecode(payload.slice(64, 80), 8)
    assert(out(0L).find(_.frame_idx == 4).get.feature.toSeq === frame4.toSeq)
    // sampled count agrees with sampleFrames' plan arithmetic
    val planned = Multimodal.sampleFrames(media, stride = 4, frameBytes = 16)
      .select("doc_id", "sampled_frame_idx").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).size).toMap
    assert(planned === Map(0L -> 3, 1L -> 1, 2L -> 0))
  }

  test("video decoder lifecycle: open once per partition, close fires on failure") {
    import MultimodalSpec._
    lifecycleLog.clear()
    val media = Multimodal.withMedia(docs).repartition(2)
    Multimodal.extractFrameFeatures(spark, media, new TrackedVideoDecoder(false)).collect()
    val opens = lifecycleLog.toArray.count(_ == "open")
    val closes = lifecycleLog.toArray.count(_ == "close")
    assert(opens === 2 && closes === 2, s"opens=$opens closes=$closes")

    // a decoder that throws mid-stream must still see its close()
    lifecycleLog.clear()
    intercept[org.apache.spark.SparkException](
      Multimodal.extractFrameFeatures(spark, media.repartition(1),
        new TrackedVideoDecoder(true)).collect())
    assert(lifecycleLog.toArray.contains("close"),
      "close() must run via the task-completion listener even on decode failure")
  }

  test("ChunkVideoDecoder's iterator is lazy: strided reads skip chunk decodes") {
    import MultimodalSpec._
    decodeCount.set(0)
    val d = new CountingVideoDecoder(frameBytes = 4)
    // 40 bytes = 10 frames; stride handled by the CONSUMER via
    // zipWithIndex — but chunk DECODE work (the counted part) only runs
    // for frames the consumer actually materializes lazily
    val it = d.frames(Array.fill[Byte](40)(1))
    assert(decodeCount.get() === 0L, "no decode before consumption")
    it.next(); it.next()
    assert(decodeCount.get() === 2L, "decodes run per-frame on demand")
  }
}

object MultimodalSpec {
  /** JVM-shared lifecycle log: tests run local[*], so executor threads
    * share this static — the standard trick for asserting inside-task
    * behavior without accumulators. */
  val lifecycleLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val decodeCount = new java.util.concurrent.atomic.AtomicLong(0L)

  final class TrackedVideoDecoder(explode: Boolean)
      extends Multimodal.VideoDecoder {
    override def open(): Unit = lifecycleLog.add("open")
    override def close(): Unit = lifecycleLog.add("close")
    def frames(bytes: Array[Byte]): Iterator[Array[Float]] = {
      if (explode && bytes.length > 50) throw new RuntimeException("codec died")
      bytes.grouped(16).filter(_.length == 16).map(Multimodal.stubDecode(_, 8))
    }
  }

  final class CountingVideoDecoder(frameBytes: Int)
      extends Multimodal.VideoDecoder {
    def frames(bytes: Array[Byte]): Iterator[Array[Float]] =
      bytes.grouped(frameBytes).filter(_.length == frameBytes).map { chunk =>
        decodeCount.incrementAndGet()
        Multimodal.stubDecode(chunk, 4)
      }
  }
}
