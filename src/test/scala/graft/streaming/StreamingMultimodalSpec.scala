package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.multimodal.Multimodal

final case class Ev(ts: Timestamp, event_type: String, value: Double)

class StreamingOpsSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts aggregates a real stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.windowedCounts(mem.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("complete").start()
    try {
      mem.addData(
        Ev(ts("2026-01-01 10:05:00"), "click", 1.0),
        Ev(ts("2026-01-01 10:55:00"), "click", 2.0),
        Ev(ts("2026-01-01 11:10:00"), "buy", 4.0))
      q.processAllAvailable()
      val rows = spark.table("wincounts")
        .select(col("win").cast("string"), col("event_type"), col("cnt"),
          col("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      rows should contain(("2026-01-01 10:00:00", "click", 2L, 3.0))
      rows should contain(("2026-01-01 11:00:00", "buy", 1L, 4.0))
    } finally q.stop()
  }

  test("windowedCounts runs unchanged on a batch frame") {
    val batch = Seq(Ev(ts("2026-01-01 10:05:00"), "click", 1.0)).toDF()
    StreamingOps.windowedCounts(batch).count() shouldBe 1L
  }

  test("slidingCounts: each event lands in windowLen/slide windows") {
    val batch = Seq(Ev(ts("2026-01-01 10:05:00"), "click", 1.5)).toDF()
    val wins = StreamingOps.slidingCounts(batch)
      .select(col("win").cast("string"), col("cnt"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // 1h window hopping 30min: starts 09:30 and 10:00 both cover 10:05
    wins shouldBe Set(
      ("2026-01-01 09:30:00", 1L, 1.5),
      ("2026-01-01 10:00:00", 1L, 1.5))
  }

  test("sessionizeStateful closes sessions across micro-batches on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val src = mem.toDF().withWatermark("ts", "0 seconds")
      .as[SessionEvent]
    val q = StreamingOps.sessionizeStateful(src, gapMinutes = 30)
      .writeStream.format("memory").queryName("sessstate")
      .outputMode("append").start()
    try {
      // batch 1: two events of user 7 in one session, one of user 9
      mem.addData(
        SessionEvent(7L, ts("2026-01-01 10:00:00"), 1.0),
        SessionEvent(7L, ts("2026-01-01 10:10:00"), 2.0),
        SessionEvent(9L, ts("2026-01-01 10:05:00"), 16.0))
      q.processAllAvailable()
      // nothing closed yet: sessions are still open
      spark.table("sessstate").count() shouldBe 0L
      // batch 2: user 7 comes back past the gap -> session 1 closes
      // inline; the watermark jump also times out user 9's session
      mem.addData(SessionEvent(7L, ts("2026-01-01 12:00:00"), 8.0))
      q.processAllAvailable()
      // one more empty batch so the timeout (watermark from batch 2)
      // fires for user 9
      mem.addData(SessionEvent(5L, ts("2026-01-01 12:00:01"), 0.5))
      q.processAllAvailable()
      val rows = spark.table("sessstate")
        .select("user_id", "sess_no", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      rows should contain((7L, 1L, 2L, 3.0))
      rows should contain((9L, 1L, 1L, 16.0))
      // batch 4: user 9 returns AFTER its session timed out — the
      // tombstone must carry the numbering forward (sess_no = 2, not a
      // duplicate sess_no = 1)
      mem.addData(SessionEvent(9L, ts("2026-01-01 13:00:00"), 32.0))
      q.processAllAvailable()
      // batch 5: far-future event advances the watermark past every
      // open session's gap, closing them via timeout
      mem.addData(SessionEvent(5L, ts("2026-01-01 16:00:00"), 0.25))
      q.processAllAvailable()
      mem.addData(SessionEvent(5L, ts("2026-01-01 16:00:01"), 0.125))
      q.processAllAvailable()
      val later = spark.table("sessstate")
        .select("user_id", "sess_no", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      later should contain((9L, 2L, 1L, 32.0))
      later should contain((7L, 2L, 1L, 8.0))
      // no duplicate (user, sess_no) keys anywhere in the output
      val keys = spark.table("sessstate").select("user_id", "sess_no")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      keys.length shouldBe keys.toSet.size
    } finally q.stop()
  }

  test("sessionizeStateful in batch mode equals the window formulation") {
    val ev = Seq(
      SessionEvent(7L, ts("2026-01-01 10:05:00"), 1.0),
      SessionEvent(7L, ts("2026-01-01 10:25:00"), 2.0),
      SessionEvent(7L, ts("2026-01-01 10:50:00"), 4.0),
      SessionEvent(7L, ts("2026-01-01 13:00:00"), 8.0),
      SessionEvent(9L, ts("2026-01-01 10:10:00"), 16.0)).toDS()
    val stateful = StreamingOps.sessionizeStateful(ev, 30, emitOpen = true)
      .collect().map(r =>
        (r.user_id, r.sess_no, r.sess_start.toString, r.sess_end.toString,
          r.n_events, r.sum_value)).toSet
    val window = graft.operators.Events.sessionize(
        ev.toDF().withColumn("event_type", lit("x")), 30)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getTimestamp(2).toString,
          r.getTimestamp(3).toString, r.getLong(4), r.getDouble(5))).toSet
    stateful shouldBe window
  }

  test("dedupStream runs on batch frames via unbounded dropDuplicates") {
    val batch = Seq(
      Ev(ts("2026-01-01 10:05:00"), "click", 1.0),
      Ev(ts("2026-01-01 10:06:00"), "click", 2.0),
      Ev(ts("2026-01-01 10:07:00"), "buy", 3.0)).toDF()
    StreamingOps.dedupStream(batch, "event_type").count() shouldBe 2L
  }

  test("dedupStream drops duplicate keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.dedupStream(mem.toDF(), "event_type")
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(ts("2026-01-01 10:05:00"), "click", 1.0),
        Ev(ts("2026-01-01 10:06:00"), "click", 2.0),
        Ev(ts("2026-01-01 10:07:00"), "buy", 3.0))
      q.processAllAvailable()
      spark.table("dedupstream").count() shouldBe 2L
    } finally q.stop()
  }

  test("attributionJoin: streaming state join equals the batch range join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (event_id, user_id, ts) with event_type split into two streams
    val clicks = Seq(
      (1L, 7L, ts("2026-01-01 10:00:00")),
      (2L, 7L, ts("2026-01-01 11:00:00")),
      (3L, 8L, ts("2026-01-01 10:10:00")))
    val purchases = Seq(
      (10L, 7L, ts("2026-01-01 10:20:00")), // in click 1's window
      (11L, 7L, ts("2026-01-01 10:31:00")), // outside (>= +30min)
      (12L, 8L, ts("2026-01-01 10:10:00")), // exact-instant match
      (13L, 9L, ts("2026-01-01 10:15:00"))) // no click for user 9
    def df(rows: Seq[(Long, Long, Timestamp)]) =
      rows.toDF("event_id", "user_id", "ts")
    val expected = Set((1L, 10L, 7L), (3L, 12L, 8L))

    val batch = StreamingOps.attributionJoin(df(clicks), df(purchases))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    batch shouldBe expected

    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val q = StreamingOps.attributionJoin(
        cMem.toDF().toDF("event_id", "user_id", "ts"),
        pMem.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      cMem.addData(clicks: _*)
      pMem.addData(purchases: _*)
      q.processAllAvailable()
      spark.table("attrib")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet shouldBe expected
    } finally q.stop()
  }

  test("enrichWithDim joins a live stream against the static dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", "web"), ("buy", "checkout"))
      .toDF("etype", "surface")
    val mem = MemoryStream[Ev]
    val q = StreamingOps.enrichWithDim(mem.toDF(), dim,
        "event_type", "etype")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(ts("2026-01-01 10:05:00"), "click", 1.0),
        Ev(ts("2026-01-01 10:06:00"), "scroll", 2.0), // no dim row
        Ev(ts("2026-01-01 10:07:00"), "buy", 3.0))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("event_type", "surface")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      rows shouldBe Set(("click", "web"), ("buy", "checkout"))
      // batch parity: same operator, same result shape
      val batch = Seq(Ev(ts("2026-01-01 10:05:00"), "click", 1.0)).toDF()
      StreamingOps.enrichWithDim(batch, dim, "event_type", "etype")
        .select("surface").as[String].collect().toSeq shouldBe Seq("web")
    } finally q.stop()
  }

  test("mergeSnapshotSink: versioned MERGE stream, replay-idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val work = java.nio.file.Files
      .createTempDirectory("graft-merge-sink").toString
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.mergeSnapshotSink(
        mem.toDF().toDF("doc_id", "text"), base, work, "doc_id", "text")
      .start()
    try {
      mem.addData((2L, "two v2"))
      q.processAllAvailable() // batch 0: update doc 2
      mem.addData((4L, "four"), (2L, "two v3"))
      q.processAllAvailable() // batch 1: insert doc 4, update 2 again
    } finally q.stop()
    def snap(v: Long): Map[Long, String] =
      spark.read.parquet(s"$work/v=$v")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    snap(0L) shouldBe Map(1L -> "one", 2L -> "two v2", 3L -> "three")
    val v1 = Map(1L -> "one", 2L -> "two v3", 3L -> "three", 4L -> "four")
    snap(1L) shouldBe v1
    // failure replay: re-run batch 1's body; v=1 must rebuild from v=0
    // to the identical snapshot (at-least-once -> exactly-once)
    StreamingOps.mergeSnapshotBatch(base, work, "doc_id", "text")(
      Seq((4L, "four"), (2L, "two v3")).toDF("doc_id", "text"), 1L)
    snap(1L) shouldBe v1
  }

  test("mergeBatch collapses duplicate ids within one batch") {
    val prev = Seq((1L, "one")).toDF("doc_id", "text")
    // same doc re-crawled twice inside a trigger: ONE deterministic
    // survivor (max md5 fingerprint — md5("b") > md5("a")), never two
    // rows for the id
    val batch = Seq((1L, "a"), (1L, "b"), (2L, "x")).toDF("doc_id", "text")
    val out = StreamingOps.mergeBatch(prev, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "b", 2L -> "x")
    StreamingOps.mergeBatch(prev, batch, "doc_id", "text")
      .count() shouldBe 2L
  }
}

class MultimodalSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, "image", "fake-jpeg-bytes-here"),
    (2L, "audio", "fake-wav-bytes"),
    (3L, "video", "fake-mp4-bytes")
  ).toDF("media_id", "kind", "payload")
    .select(col("media_id"), col("kind"), col("payload").cast("binary").as("bytes"),
      map(lit("k"), lit("v")).as("meta"))

  test("decodeFeatures emits the typed feature schema, deterministically") {
    val f1 = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    val f2 = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    f1.keySet shouldBe Set(1L, 2L, 3L)
    f1(1L).getInt(2) shouldBe "fake-jpeg-bytes-here".length // n_bytes
    f1(2L).getInt(5) shouldBe 1 // audio => 1 channel
    // deterministic across runs
    f1(3L).toSeq shouldBe f2(3L).toSeq
    Multimodal.decodeFeatures(media).schema shouldBe Multimodal.featureSchema
  }

  test("syntheticPng emits real PNG bytes that ImageIO decodes exactly") {
    val bytes = Multimodal.syntheticPng(20, 11, 137)
    // real PNG magic, not a pseudo-payload
    Array(bytes(0) & 0xFF, bytes(1) & 0xFF, bytes(2) & 0xFF,
      bytes(3) & 0xFF) shouldBe Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)
    val media = Seq((1L, "image")).toDF("media_id", "kind")
      .select(col("media_id"), col("kind"), lit(bytes).as("bytes"),
        map(lit("k"), lit("v")).as("meta"))
    val r = Multimodal.decodeFeatures(media).collect().head
    (r.getInt(3), r.getInt(4), r.getInt(5)) shouldBe ((20, 11, 3))
    r.getDouble(6) shouldBe 137.0 +- 1e-9
  }

  test("decodeFeatures extracts real dimensions from synthesized PNGs") {
    val ids = Seq(0L, 31L, 40L, 255L, 1000L).toDF("media_id")
    val feats = Multimodal.decodeFeatures(Multimodal.synthesizeImages(ids))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(3), r.getInt(4), r.getInt(5), r.getDouble(6)))).toMap
    feats.keySet shouldBe Set(0L, 31L, 40L, 255L, 1000L)
    for (id <- feats.keySet) {
      feats(id) shouldBe ((8 + (id % 32).toInt, 8 + ((id / 32) % 32).toInt,
        3, (id % 256).toDouble))
    }
  }

  test("syntheticWav round-trips through the real javax.sound decoder") {
    val ids = Seq(0L, 7L, 123L, 1999L).toDF("media_id")
    val feats = Multimodal.audioFeatures(Multimodal.synthesizeAudio(ids))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4),
          r.getDouble(5)))).toMap
    feats.keySet shouldBe Set(0L, 7L, 123L, 1999L)
    for (id <- feats.keySet) {
      feats(id) shouldBe ((8000 + (id % 8).toInt * 1000, 1 + (id % 2).toInt,
        16, 400L + id % 100, (id % 2000).toDouble))
    }
  }

  test("audioFeatures drops undecodable payloads instead of faking them") {
    val junk = Seq((1L, "audio", "not-a-wav"))
      .toDF("media_id", "kind", "payload")
      .select(col("media_id"), col("kind"),
        col("payload").cast("binary").as("bytes"),
        map(lit("k"), lit("v")).as("meta"))
    Multimodal.audioFeatures(junk).count() shouldBe 0L
  }

  test("syntheticMp4 round-trips through the real box parser") {
    val ids = Seq(0L, 9L, 123L, 599L).toDF("media_id")
    val meta = Multimodal.videoMeta(Multimodal.synthesizeVideos(ids))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    meta.keySet shouldBe Set(0L, 9L, 123L, 599L)
    for (id <- meta.keySet) {
      val ts = 600L + (id % 10) * 100
      val dur = 1200L + id % 600
      meta(id)._1 shouldBe ts
      meta(id)._2 shouldBe dur
      meta(id)._3 shouldBe (dur.toDouble / ts) +- 1e-6
    }
    // junk bytes are rejected, not faked
    Multimodal.videoMeta(
      Seq((7L, "video", "not-an-mp4")).toDF("media_id", "kind", "payload")
        .select(col("media_id"), col("kind"),
          col("payload").cast("binary").as("bytes"),
          map(lit("k"), lit("v")).as("meta"))).count() shouldBe 0L
  }

  private def mediaOf(id: Long, kind: String, bytes: Array[Byte]) =
    Seq(id).toDF("media_id")
      .select(col("media_id"), lit(kind).as("kind"),
        lit(bytes).as("bytes"), map(lit("k"), lit("v")).as("meta"))

  test("syntheticMp4WithFrames: stsz/stco index real PNG frames that " +
      "decode back exactly") {
    val frames = Seq(
      Multimodal.syntheticPng(10, 7, 40),
      Multimodal.syntheticPng(12, 9, 200),
      Multimodal.syntheticPng(8, 8, 0))
    val mp4 = Multimodal.syntheticMp4WithFrames(700, 2100, frames)
    // container metadata still parses through the mvhd walker
    val meta = Multimodal.videoMeta(mediaOf(5L, "video", mp4))
      .collect().head
    (meta.getLong(1), meta.getLong(2)) shouldBe ((700L, 2100L))
    // per-frame decode is the REAL ImageIO path: exact dims + gray of
    // each PNG prove the stsz/stco slicing is byte-exact (one corrupt
    // boundary byte would break the PNG CRC and fall to the stub)
    val feats = Multimodal.videoFrameFeatures(mediaOf(5L, "video", mp4))
      .orderBy("frame_no").collect()
    feats.map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
      r.getDouble(5))).toSeq shouldBe Seq(
      (0, 10, 7, 3, 40.0), (1, 12, 9, 3, 200.0), (2, 8, 8, 3, 0.0))
  }

  test("videoFrameFeatures: everyNth sampling; no table => no rows") {
    val frames = (0 until 6).map(g => Multimodal.syntheticPng(8, 8, g * 10))
    val mp4 = Multimodal.syntheticMp4WithFrames(600, 1200, frames)
    val sampled = Multimodal
      .videoFrameFeatures(mediaOf(1L, "video", mp4), everyNth = 2)
      .orderBy("frame_no").collect()
    sampled.map(_.getInt(1)).toSeq shouldBe Seq(0, 2, 4)
    sampled.map(_.getDouble(5)).toSeq shouldBe Seq(0.0, 20.0, 40.0)
    // metadata-only MP4 (no trak/stbl) and junk both yield zero rows
    val metaOnly = Multimodal.syntheticMp4(600, 1200)
    Multimodal.videoFrameFeatures(mediaOf(2L, "video", metaOnly))
      .count() shouldBe 0L
    Multimodal.videoFrameFeatures(
      mediaOf(3L, "video", "junk".getBytes)).count() shouldBe 0L
  }

  test("multi-sample chunks: stsc walk resolves intra-chunk offsets") {
    // 7 frames packed 3-per-chunk (chunks of 3,3,1 — short final chunk
    // gets its own stsc run); sample offsets inside a chunk are
    // cumulative, so one wrong size would shift every later frame and
    // break its PNG decode
    val frames = (0 until 7).map(g =>
      Multimodal.syntheticPng(8 + g, 8, g * 30 % 256))
    val mp4 = Multimodal.syntheticMp4WithFrames(600, 4200, frames,
      samplesPerChunk = 3)
    val feats = Multimodal.videoFrameFeatures(mediaOf(6L, "video", mp4))
      .orderBy("frame_no").collect()
    feats.map(r => (r.getInt(1), r.getInt(2), r.getDouble(5))).toSeq shouldBe
      (0 until 7).map(g => (g, 8 + g, (g * 30 % 256).toDouble))
  }

  test("co64 chunk offsets resolve like stco (64-bit path)") {
    val frames = Seq(Multimodal.syntheticPng(9, 5, 77),
      Multimodal.syntheticPng(8, 8, 3))
    val mp4 = Multimodal.syntheticMp4WithFrames(600, 1200, frames,
      forceCo64 = true)
    new String(mp4) should include("co64")
    val feats = Multimodal.videoFrameFeatures(mediaOf(8L, "video", mp4))
      .orderBy("frame_no").collect()
    feats.map(r => (r.getInt(2), r.getInt(3), r.getDouble(5))).toSeq shouldBe
      Seq((9, 5, 77.0), (8, 8, 3.0))
  }

  test("videoFrameFeatures: codec-bearing samples degrade to the stub") {
    val codecFrame = Array.tabulate[Byte](64)(i => (i * 7).toByte) // no PNG magic
    val mp4 = Multimodal.syntheticMp4WithFrames(600, 600, Seq(codecFrame))
    val r = Multimodal.videoFrameFeatures(mediaOf(4L, "video", mp4))
      .collect()
    r.length shouldBe 1
    r.head.getInt(1) shouldBe 0
    // the stub's "intensity" is the mean byte value of the frame payload
    r.head.getDouble(5) shouldBe
      (codecFrame.map(b => (b & 0xFF).toDouble).sum / 64 +- 1e-4)
  }

  test("decodeFeatures reports the first frame's REAL features for video") {
    val frames = Seq(Multimodal.syntheticPng(14, 6, 99),
      Multimodal.syntheticPng(8, 8, 1))
    val mp4 = Multimodal.syntheticMp4WithFrames(600, 1200, frames)
    val r = Multimodal.decodeFeatures(mediaOf(9L, "video", mp4))
      .collect().head
    (r.getInt(3), r.getInt(4), r.getInt(5)) shouldBe ((14, 6, 3))
    r.getDouble(6) shouldBe 99.0 +- 1e-9
  }

  test("synthesizeVideosWithFrames honors the oracle contract") {
    val ids = Seq(0L, 5L, 123L).toDF("media_id")
    val feats = Multimodal.videoFrameFeatures(
      Multimodal.synthesizeVideosWithFrames(ids)).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5)))).toMap
    for (id <- Seq(0L, 5L, 123L); k <- 0 until (3 + (id % 4)).toInt) {
      feats((id, k)) shouldBe ((8 + ((id + k) % 16).toInt,
        8 + ((id + 2 * k) % 16).toInt, 3, ((id + 37 * k) % 256).toDouble))
    }
    feats.size shouldBe Seq(0L, 5L, 123L).map(id => 3 + (id % 4)).sum
  }

  test("audioFeatures honors 8-bit PCM instead of misreading byte pairs") {
    // regression: mean_abs was always computed as 16-bit byte pairs, so
    // an 8-bit WAV produced garbage amplitude with no error
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1,
      /*signed=*/ false, false) // WAV 8-bit is unsigned by spec
    val pcm = Array.fill[Byte](400)(192.toByte) // 64 above the midpoint
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 400L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val media = Seq((1L, "audio")).toDF("media_id", "kind")
      .select(col("media_id"), col("kind"), lit(out.toByteArray).as("bytes"),
        map(lit("k"), lit("v")).as("meta"))
    val r = Multimodal.audioFeatures(media).collect().head
    r.getInt(3) shouldBe 8 // container sample size is reported as-is
    // amplitude 64 on the 16-bit reporting scale
    r.getDouble(5) shouldBe (64 * 256.0) +- 1e-9
  }

  test("mp4Meta accepts 64-bit largesize and size-0 final boxes") {
    val base = Multimodal.syntheticMp4(700, 1400)
    def metaOf(bytes: Array[Byte]): Seq[(Long, Long)] = {
      val media = Seq((1L, "video")).toDF("media_id", "kind")
        .select(col("media_id"), col("kind"), lit(bytes).as("bytes"),
          map(lit("k"), lit("v")).as("meta"))
      Multimodal.videoMeta(media).collect().toSeq
        .map(r => (r.getLong(1), r.getLong(2)))
    }
    // re-encode ftyp (24 bytes) in the size==1 + 64-bit largesize form
    val bb = java.nio.ByteBuffer.allocate(base.length + 8)
    bb.putInt(1)
    bb.put("ftyp".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putLong(32L) // 16-byte header + the original 16-byte payload
    bb.put(base, 8, 16)
    bb.put(base, 24, base.length - 24)
    metaOf(bb.array()) shouldBe Seq((700L, 1400L))
    // size==0: the final box (moov, at offset 24) extends to end of file
    val zeroTail = base.clone()
    zeroTail(24) = 0; zeroTail(25) = 0; zeroTail(26) = 0; zeroTail(27) = 0
    metaOf(zeroTail) shouldBe Seq((700L, 1400L))
  }

  test("decodeFeatures degrades truncated image payloads to the stub") {
    // regression: only IOException was caught, so plugin RuntimeExceptions
    // on malformed payloads could kill the task instead of falling back
    val truncated = Multimodal.syntheticPng(20, 11, 137).take(30)
    val media = Seq((1L, "image")).toDF("media_id", "kind")
      .select(col("media_id"), col("kind"), lit(truncated).as("bytes"),
        map(lit("k"), lit("v")).as("meta"))
    val rows = Multimodal.decodeFeatures(media).collect()
    rows should have length 1 // row survives, features from the stub
    rows.head.getInt(2) shouldBe 30
  }

  test("frameSamplePlan fans out every Nth frame for videos only") {
    val frames = Multimodal.frameSamplePlan(media, totalFrames = 10, everyNth = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    frames.map(_._1).toSet shouldBe Set(3L)
    frames.map(_._2).sorted shouldBe Array(0, 3, 6, 9)
  }
}
