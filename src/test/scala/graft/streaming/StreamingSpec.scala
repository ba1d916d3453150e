package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("windowed aggregation over a memory stream matches the batch twin") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = Streaming.windowedAgg(df).writeStream
      .format("memory").queryName("win_agg").outputMode("complete").start()
    input.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(7), "click", 4.0))
    q.processAllAvailable()
    val out = spark.table("win_agg").orderBy("window_start")
      .select("n", "sum_value").as[(Long, Double)].collect()
    q.stop()
    assert(out.toSeq === Seq((2L, 3.0), (1L, 4.0)))
  }

  test("sliding window stream equals the batch slidingWindow frame") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = Streaming.slidingAgg(df).writeStream
      .format("memory").queryName("slide_agg").outputMode("complete").start()
    val data = Seq((ts(0), "click", 1.0), (ts(0, 45), "click", 2.0),
      (ts(1, 30), "view", 4.0), (ts(3), "click", 8.0))
    input.addData(data: _*)
    q.processAllAvailable()
    val streamed = spark.table("slide_agg")
      .orderBy("window_start", "event_type")
      .select("window_start", "window_end", "event_type", "n", "sum_value")
      .collect().toSeq
    q.stop()
    val batch = graft.tsdb.Aggregate.slidingWindow(data.toDF("ts", "event_type", "value"))
      .orderBy("window_start", "event_type")
      .collect().toSeq
    assert(streamed === batch)
    // every event appears in exactly width/slide = 4 windows
    assert(streamed.map(_.getLong(3)).sum === data.size * 4)
  }

  test("stream-static enrichment joins meta map-side and matches the batch join") {
    implicit val sc = spark.sqlContext
    val meta = Seq((1L, 10.0), (2L, 20.0)).toDF("station_id", "elev")
    val input = MemoryStream[(Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")
    val q = Streaming.enrich(df, meta).writeStream
      .format("memory").queryName("enriched").outputMode("append").start()
    input.addData((ts(0), 1L, 1.0), (ts(1), 2L, 2.0), (ts(2), 9L, 3.0))
    q.processAllAvailable()
    val out = spark.table("enriched").orderBy("user_id")
      .select("user_id", "elev").as[(Long, Option[Double])].collect().toSeq
    q.stop()
    assert(out === Seq((1L, Some(10.0)), (2L, Some(20.0)), (9L, None)))
  }

  test("streaming near-dup screen flags corpus near-dups, passes novel docs") {
    implicit val sc = spark.sqlContext
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val q = Streaming.nearDupScreen(input.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("screened").outputMode("append").start()
    input.addData(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact dup of 0
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // near-dup of 0
      (12L, "completely unrelated words about catalyst plans and codegen stages"))
    q.processAllAvailable()
    val out = spark.table("screened").orderBy("doc_id")
      .select("doc_id", "maybe_dup").as[(Long, Boolean)].collect().toMap
    q.stop()
    assert(out(10L), "exact duplicate must hit the sketch (no false negatives)")
    assert(out(11L), "near-dup shares most shingles, so some band must hit")
    assert(!out(12L), "novel doc shares no band with the tiny corpus")
    // stream result equals the batch probe of the same frames
    val batch = graft.dedup.Bloom.probe(
        Seq((10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
          (11L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
          (12L, "completely unrelated words about catalyst plans and codegen stages"))
          .toDF("doc_id", "text"),
        graft.dedup.Bloom.build(corpus))
      .select("doc_id", "maybe_dup").as[(Long, Boolean)].collect().toMap
    assert(out === batch)
  }

  test("streaming url dedup keeps the first fetch per canonical url across batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = Streaming.urlIngestDedup(in.toDF().toDF("ts", "doc_id", "url"))
      .writeStream.format("memory").queryName("urldedup").outputMode("append").start()
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    in.addData(
      (t(0), 1L, "https://www.Site.com/a?utm_source=x"),
      (t(2), 3L, "https://site.com/b"))
    q.processAllAvailable()
    // second batch: both are re-fetches of doc 1's canonical URL under
    // different variants — state inside the watermark must drop them
    in.addData(
      (t(3), 4L, "http://site.com/a/"),
      (t(4), 5L, "HTTPS://SITE.com/a"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("urldedup").select("doc_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    assert(out === Set(1L, 3L))
    // clean contract like the batch twin: the internal canonical-url
    // dedup key must not leak into the output schema
    assert(spark.table("urldedup").columns.toSeq === Seq("ts", "doc_id", "url"))
  }

  test("streaming crawl gate matches the batch robots verdicts and dedups the frontier") {
    implicit val sc = spark.sqlContext
    // src4: Disallow /doc/4, Allow /doc/47 (wildcard group)
    val rules = graft.llm.Robots.wideRules(spark, Seq("src4"))
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = Streaming.crawlGate(in.toDF().toDF("ts", "doc_id", "source"), rules)
      .writeStream.format("memory").queryName("crawlgate").outputMode("append").start()
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    in.addData(
      (t(0), 12L, "src4"),  // allowed: /doc/12 matches no rule
      (t(1), 41L, "src4"),  // blocked: /doc/41 under Disallow /doc/4
      (t(2), 47L, "src4"),  // allowed: the more-specific Allow /doc/47 wins
      (t(3), 478L, "src4")) // allowed: same allow-prefix interplay
    q.processAllAvailable()
    in.addData((t(4), 12L, "src4")) // re-fetch of /doc/12 inside the watermark
    q.processAllAvailable()
    q.stop()
    val out = spark.table("crawlgate").select("doc_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    assert(out === Set(12L, 47L, 478L))
    // the stream's verdicts equal the batch robots filter on the same docs
    val batch = graft.llm.Robots.robotsFilter(spark,
        Seq((12L, "src4"), (41L, "src4"), (47L, "src4"), (478L, "src4"))
          .toDF("doc_id", "source"))
      .filter($"allowed" === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(batch === Set(12L, 47L, 478L))
  }

  test("streaming incremental screen equals the batch snapshot screen and batch incrementalDedup") {
    implicit val sc = spark.sqlContext
    // index corpus: ids ≢ 0 mod 10 so the batch incrementalDedup twin
    // (which splits by doc_id % 10) sees the identical side split
    val index = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
      (2L, "one two three four five six seven eight nine ten eleven twelve", "en"),
      (3L, "curious corpus of entirely different prose lives here quietly", "en"))
      .toDF("doc_id", "text", "lang")
    val snap = graft.dedup.Dedup.buildTextIndexSnapshot(index, 0.5)
    val screen = new Streaming.IncrementalScreen(snap)
    val input = MemoryStream[(Long, String, String)]
    val q = screen.attach(input.toDF().toDF("doc_id", "text", "lang"))
    // two micro-batches: per-batch accumulation must equal one-shot
    input.addData(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"), // == doc 1
      (20L, "completely unrelated words about catalyst plans and codegen", "en"))
    q.processAllAvailable()
    input.addData(
      (30L, "one two three four five six seven eight nine ten eleven twelve", "en")) // == doc 2
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getAs[Boolean]("is_dup"),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    val got = rows(screen.results.get)
    assert(got.map(_._1) === Set(10L, 20L, 30L))
    assert(got.contains((10L, true, Some(1L), Some(1.0))))
    assert(got.contains((30L, true, Some(2L), Some(1.0))))
    assert(got.contains((20L, false, None, None)))
    // pinned equal to the batch snapshot screen over all arrived docs...
    val arrived = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
      (20L, "completely unrelated words about catalyst plans and codegen", "en"),
      (30L, "one two three four five six seven eight nine ten eleven twelve", "en"))
      .toDF("doc_id", "text", "lang")
    assert(got === rows(graft.dedup.Dedup.incrementalDedupWithSnapshot(arrived, snap)))
    // ...and to the batch incrementalDedup over the union corpus (the
    // stream ids are ≡ 0 mod 10, the index ids are not)
    assert(got === rows(graft.dedup.Dedup.incrementalDedup(index.unionByName(arrived), 0.5)))
  }

  test("continuous cluster maintenance: labels equal one-shot components after every batch") {
    implicit val sc = spark.sqlContext
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getAs[Long]("comp"), r.getAs[Long]("comp_size"))).toSet
    // day-0 corpus: docs 1 and 2 are near-dups, 3 is clean
    val day0 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "curious corpus of entirely different prose lives here quietly"))
      .toDF("doc_id", "text")
    val maint = new Streaming.ClusterMaintenance(
      graft.dedup.Dedup.buildTextIndexSnapshot(day0, 0.5),
      graft.dedup.Dedup.components(day0, 0.5))
    val input = MemoryStream[(Long, String)]
    val q = maint.attach(input.toDF().toDF("doc_id", "text"))
    // batch 1: doc 10 bridges INTO the {1,2} component; 20 is clean
    input.addData(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (20L, "completely unrelated words about catalyst plans and codegen"))
    q.processAllAvailable()
    val seen1 = day0.unionByName(Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (20L, "completely unrelated words about catalyst plans and codegen"))
      .toDF("doc_id", "text"))
    assert(rows(maint.labels) === rows(graft.dedup.Dedup.components(seen1, 0.5)))
    // batch 2: doc 30 matches doc 20 — a BATCH-1 doc, reachable only if
    // batch 1 was appended to the maintained index artifact
    input.addData((30L, "completely unrelated words about catalyst plans and code"))
    q.processAllAvailable()
    q.stop()
    val seen2 = seen1.unionByName(
      Seq((30L, "completely unrelated words about catalyst plans and code"))
        .toDF("doc_id", "text"))
    val got = rows(maint.labels)
    assert(got === rows(graft.dedup.Dedup.components(seen2, 0.5)))
    // the cross-batch unification is visible: {20, 30} share a component
    val comp20 = got.find(_._1 == 20L).get._2
    assert(got.find(_._1 == 30L).get._2 === comp20, "cross-batch pair missed")
    assert(got.find(_._1 == 10L).get._2 === 1L, "bridge into day-0 component missed")
  }

  test("streaming LSH embedding screen equals the batch artifact screen across micro-batches") {
    implicit val sc = spark.sqlContext
    val index = Seq(
      (1L, Seq(1f, 2f, 3f, 4f)),
      (2L, Seq(-1f, 5f, 0.5f, -2f)),
      (3L, Seq(0.25f, -3f, 2f, 1f))).toDF("vec_id", "embedding")
    val snap = graft.dedup.Dedup.buildEmbeddingLshSnapshot(index)
    val screen = new Streaming.EmbeddingLshScreen(snap)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = screen.attach(input.toDF().toDF("vec_id", "embedding"))
    // two micro-batches: per-batch accumulation must equal one-shot
    input.addData(
      (10L, Seq(1f, 2f, 3f, 4f)), // verbatim copy of vec 1 → cosine 1.0
      (20L, Seq(3f, -1f, -2f, 1.5f))) // cos ≤ 0.09 vs every index vec
    q.processAllAvailable()
    input.addData((30L, Seq(-1f, 5f, 0.5f, -2f))) // copy of vec 2
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getAs[Boolean]("is_dup"),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    val got = rows(screen.results.get)
    assert(got === Set(
      (10L, true, Some(1L), Some(1.0)),
      (20L, false, None, None),
      (30L, true, Some(2L), Some(1.0))))
    // pinned equal to the batch artifact screen over all arrived vectors
    val arrived = Seq(
      (10L, Seq(1f, 2f, 3f, 4f)), (20L, Seq(3f, -1f, -2f, 1.5f)),
      (30L, Seq(-1f, 5f, 0.5f, -2f))).toDF("vec_id", "embedding")
    assert(got === rows(
      graft.dedup.Dedup.embeddingIncrementalWithLshSnapshot(arrived, snap)))
  }

  test("stream-stream interval join matches the batch interval join") {
    implicit val sc = spark.sqlContext
    val vIn = MemoryStream[(Timestamp, Long, Double)]
    val cIn = MemoryStream[(Timestamp, Long, Double)]
    val views = vIn.toDF().toDF("ts", "user_id", "value")
    val clicks = cIn.toDF().toDF("ts", "user_id", "value")
    val q = Streaming.intervalJoin(views, clicks).writeStream
      .format("memory").queryName("ij").outputMode("append").start()
    def t(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    // user 1: click inside the 30-min window; at its edge; outside.
    // user 2: click before the view (must not match). user 3: no click.
    vIn.addData((t(60), 1L, 0.0), (t(60), 2L, 0.0), (t(60), 3L, 0.0))
    cIn.addData((t(75), 1L, 1.5), (t(90), 1L, 2.5), (t(91), 1L, 9.9),
      (t(45), 2L, 7.7))
    q.processAllAvailable()
    val out = spark.table("ij")
      .select("user_id", "click_value").as[(Long, Double)].collect().toSet
    q.stop()
    assert(out === Set((1L, 1.5), (1L, 2.5)))
  }

  test("continuous qc cycle: per-batch incremental updates converge to the batch result") {
    implicit val sc = spark.sqlContext
    def dts(d: Int, h: Int): Timestamp = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // (event_id, ts, user_id, event_type, value) over two stations
    def mkBatch(days: Range): Seq[(Long, Timestamp, Long, String, Double)] =
      for (d <- days; st <- 0L to 1L; h <- Seq(6, 12))
        yield (d * 100L + st * 10 + h, dts(d, h), st,
          if ((d + h) % 3 == 0) "view" else "click", ((st * 31 + d * 17 + h) % 97).toDouble + 1)
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val cq = new Streaming.ContinuousQc(spark)
    val q = cq.attach(input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
    input.addData(mkBatch(1 to 10): _*); q.processAllAvailable()
    input.addData(mkBatch(11 to 14): _*); q.processAllAvailable()
    input.addData(mkBatch(15 to 20): _*); q.processAllAvailable()
    q.stop()
    val maintained = cq.qc.get
    val allEvents = mkBatch(1 to 20)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val full = graft.tsdb.QualityCheck.all(graft.tsdb.Series.dailyRaw(allEvents),
      graft.tsdb.Series.dailyRef(allEvents), graft.tsdb.Series.stationMeta(allEvents))
    assert(maintained.count() === full.count())
    assert(maintained.except(full).count() === 0, "maintained frame diverged from batch recompute")
    assert(full.except(maintained).count() === 0)
  }

  test("continuous qc cycle handles a backfill batch before existing history") {
    implicit val sc = spark.sqlContext
    def dts(d: Int, h: Int): Timestamp = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    def mkBatch(days: Range): Seq[(Long, Timestamp, Long, String, Double)] =
      for (d <- days; st <- 0L to 1L; h <- Seq(6, 12))
        yield (d * 100L + st * 10 + h, dts(d, h), st,
          if ((d + h) % 3 == 0) "view" else "click", ((st * 31 + d * 17 + h) % 97).toDouble + 1)
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val cq = new Streaming.ContinuousQc(spark)
    val q = cq.attach(input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
    input.addData(mkBatch(12 to 20): _*); q.processAllAvailable() // history first
    input.addData(mkBatch(1 to 8): _*); q.processAllAvailable()   // backfill BEFORE it
    q.stop()
    val allEvents = (mkBatch(12 to 20) ++ mkBatch(1 to 8))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val full = graft.tsdb.QualityCheck.all(graft.tsdb.Series.dailyRaw(allEvents),
      graft.tsdb.Series.dailyRef(allEvents), graft.tsdb.Series.stationMeta(allEvents))
    val maintained = cq.qc.get
    assert(maintained.count() === full.count())
    assert(maintained.except(full).count() === 0, "backfill diverged from batch recompute")
    assert(full.except(maintained).count() === 0)
  }

  test("continuous full cycle maintains qc, filled and corr frames per batch") {
    implicit val sc = spark.sqlContext
    def dts(d: Int, h: Int): Timestamp = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    def mkBatch(days: Range): Seq[(Long, Timestamp, Long, String, Double)] =
      for (d <- days; st <- 0L to 2L; h <- Seq(6, 12); if (st + d + h) % 5 != 0)
        yield (d * 100L + st * 10 + h, dts(d, h), st,
          if ((d + h) % 3 == 0) "view" else "click", ((st * 31 + d * 17 + h) % 97).toDouble + 1)
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val cc = new Streaming.ContinuousCycle(spark)
    val q = cc.attach(input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
    input.addData(mkBatch(1 to 12): _*); q.processAllAvailable()
    input.addData(mkBatch(13 to 20): _*); q.processAllAvailable()
    q.stop()
    import graft.tsdb._
    val allEvents = mkBatch(1 to 20)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val meta = Series.stationMeta(allEvents)
    val fullQc = QualityCheck.all(Series.dailyRaw(allEvents), Series.dailyRef(allEvents), meta)
    val fullFilled = Fillup.fillNeighbor(fullQc, meta)
    val temp = Fillup.fillTemp(Series.dailyTemp(allEvents), meta, Series.raster(allEvents))
      .select(col("station_id"), col("day"), col("t_filled").as("t"))
    val fullCorr = Richter.correct(spark, fullFilled, temp, meta)
    // qc merges exactly; fill/corr are graded on the incremental
    // contract — equality over the last import's affected range
    // (history keeps the regionalization stats of its own import time,
    // like the reference's stored MA values)
    assert(cc.qc.get.count() === fullQc.count())
    assert(cc.qc.get.except(fullQc).count() === 0)
    val affected = col("day") >= lit(java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 13).minusDays(Incremental.Reach)))
    assert(cc.filled.get.count() === fullFilled.count())
    assert(cc.filled.get.filter(affected).except(fullFilled.filter(affected)).count() === 0,
      "filled diverged from full recompute on the affected range")
    assert(cc.corr.get.count() === fullCorr.count())
    assert(cc.corr.get.filter(affected).except(fullCorr.filter(affected)).count() === 0,
      "corr diverged from full recompute on the affected range")
  }

  test("streaming ingest dedup drops redelivered (station, ts) keys across batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")
    val q = Streaming.ingestDedup(df).writeStream
      .format("memory").queryName("ingest_dedup").outputMode("append").start()
    input.addData((1L, ts(10), 1.0), (1L, ts(10), 1.0), (2L, ts(10), 5.0))
    q.processAllAvailable()
    input.addData((1L, ts(10), 99.0), (1L, ts(10, 30), 2.0)) // redelivery + new key
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ingest_dedup")
      .select("user_id", "ts").as[(Long, Timestamp)].collect().toSeq
    assert(out.size === 3, s"expected 3 unique keys, got $out")
    assert(out.toSet === Set((1L, ts(10)), (2L, ts(10)), (1L, ts(10, 30))))
  }

  test("streaming CMS cells equal the batch sketch cell-for-cell after two batches") {
    implicit val sc = spark.sqlContext
    val batch1 = Seq((0L, "alpha beta gamma alpha"), (1L, "beta beta delta"))
    val batch2 = Seq((2L, "gamma alpha epsilon"), (3L, "zeta beta alpha alpha"))
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val q = Streaming.cmsCellsStream(df).writeStream
      .format("memory").queryName("cms_cells").outputMode("update").start()
    input.addData(batch1: _*); q.processAllAvailable()
    input.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    // update-mode memory sink appends every update; counts only grow,
    // so the final cell value is the max per key
    val stream = spark.table("cms_cells")
      .groupBy("j", "bucket").agg(max(col("cell")).as("cell"))
      .as[(Int, Long, Long)].collect().map { case (j, b, c) => (j, b) -> c }.toMap
    val allDocs = (batch1 ++ batch2)
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // batch cells via the occurrence-weighted path (same hash family)
    graft.functions.GraftFunctions.register(spark)
    val batchCells = allDocs
      .select(explode(expr(graft.text.TextFns.tokens("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("h0", expr("graft_polyhash(tok)"))
      .select(graft.text.TextAnalysis.cmsProj(512))
      .groupBy(col("p.j"), col("p.bucket")).agg(count(lit(1)).as("cell"))
      .as[(Int, Long, Long)].collect().map { case (j, b, c) => (j, b) -> c }.toMap
    assert(stream === batchCells)
  }

  test("streaming msprt fed per-day batches reproduces the batch per-day p sequence") {
    implicit val sc = spark.sqlContext
    // same strong-lift fixture as the batch spec: 30 days, 400
    // events/day; even users (arm B) convert 3x arm A
    def dayEvents(d: Int): Seq[Streaming.MsprtEvent] = (0 until 400).map { i =>
      val uid = i.toLong
      val conv = if (uid % 2 == 0) (i / 2) % 10 < 3 else (i / 2) % 10 < 1
      Streaming.MsprtEvent(uid, if (conv) "purchase" else "click")
    }
    val input = MemoryStream[Streaming.MsprtEvent]
    val q = Streaming.msprtStream(input.toDS()).writeStream
      .format("memory").queryName("msprt_stream").outputMode("update").start()
    (1 to 30).foreach { d => input.addData(dayEvents(d): _*); q.processAllAvailable() }
    q.stop()
    val stream = spark.table("msprt_stream")
      .select("n_a", "p_always_valid", "significant")
      .as[(Long, Double, Boolean)].collect().sortBy(_._1)
    assert(stream.length === 30)
    // batch twin on the identical event frame
    val rows = for { d <- 1 to 30; i <- 0 until 400 } yield {
      val uid = i.toLong
      val conv = if (uid % 2 == 0) (i / 2) % 10 < 3 else (i / 2) % 10 < 1
      (d.toLong * 1000 + i, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"),
        uid, if (conv) "purchase" else "click", 1.0, "{}")
    }
    val batch = graft.analytics.EventAnalytics.msprt(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .orderBy("day").select("n_a", "p_always_valid", "significant")
      .as[(Long, Double, Boolean)].collect()
    assert(batch.length === 30)
    stream.zip(batch).foreach { case ((na1, p1, s1), (na2, p2, s2)) =>
      assert(na1 === na2)
      assert(math.abs(p1 - p2) < 1e-9, s"p mismatch at n_a=$na1: $p1 vs $p2")
      assert(s1 === s2)
    }
  }

  test("streaming msprt emits nothing on degenerate pooled variance, like the batch filter") {
    implicit val sc = spark.sqlContext
    // zero conversions in both arms -> pooled variance 0: the batch
    // msprt drops such days (filter(v > 0)); the stream must stay
    // silent too instead of emitting a NaN log-lambda row
    val input = MemoryStream[Streaming.MsprtEvent]
    val q = Streaming.msprtStream(input.toDS()).writeStream
      .format("memory").queryName("msprt_degenerate").outputMode("update").start()
    input.addData((0 until 40).map(i =>
      Streaming.MsprtEvent(i.toLong, "click")): _*)
    q.processAllAvailable()
    assert(spark.table("msprt_degenerate").count() === 0)
    // once variance turns positive the stream resumes emission
    input.addData(Streaming.MsprtEvent(0L, "purchase"),
      Streaming.MsprtEvent(1L, "purchase"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("msprt_degenerate")
      .select("log_lambda").as[Double].collect()
    assert(rows.length === 1 && !rows.head.isNaN)
  }

  test("streaming sessionization equals the batch sessionize frame on closed sessions") {
    implicit val sc = spark.sqlContext
    // two stations, three sessions: station 1 splits at an hour of
    // silence (gap > 30 min); station 2 has one session spanning
    // batches. Values chosen binary-exact so sums compare exactly.
    val real = Seq(
      Streaming.SessEvent(1L, 1L, ts(0, 0), 1.5),
      Streaming.SessEvent(1L, 2L, ts(0, 10), 2.25),
      Streaming.SessEvent(1L, 3L, ts(0, 20), 0.5),
      Streaming.SessEvent(2L, 4L, ts(0, 5), 4.0),
      // batch 2 (continues station 2's session, opens station 1's 2nd)
      Streaming.SessEvent(1L, 5L, ts(2, 0), 3.0),
      Streaming.SessEvent(1L, 6L, ts(2, 15), 1.0),
      Streaming.SessEvent(2L, 7L, ts(0, 25), 0.25))
    val input = MemoryStream[Streaming.SessEvent]
    val q = Streaming.sessionizeStream(input.toDS()).writeStream
      .format("memory").queryName("sess").outputMode("append").start()
    input.addData(real.take(4): _*); q.processAllAvailable()
    input.addData(real.drop(4): _*); q.processAllAvailable()
    // two watermark-advancing sentinel batches: the first raises the
    // watermark past every open session's end + gap, the second forces
    // the batch in which those timeouts actually fire
    input.addData(Streaming.SessEvent(999L, 8L, ts(8, 0), 0.0)); q.processAllAvailable()
    input.addData(Streaming.SessEvent(999L, 9L, ts(9, 0), 0.0)); q.processAllAvailable()
    val out = spark.table("sess").filter(col("station_id") =!= 999)
      .select("station_id", "session_id", "session_start", "session_end",
        "n_events", "sum_value", "duration_s")
      .as[(Long, Long, Timestamp, Timestamp, Long, Double, Double)]
      .collect().toSeq.sorted
    q.stop()
    val batchDf = real.map(e => (e.event_id, e.ts, e.user_id, "click", e.value))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val expected = graft.tsdb.Aggregate.sessionize(batchDf)
      .select("station_id", "session_id", "session_start", "session_end",
        "n_events", "sum_value", "duration_s")
      .as[(Long, Long, Timestamp, Timestamp, Long, Double, Double)]
      .collect().toSeq.sorted
    assert(out === expected)
  }

  test("streaming sessionization equals batch on seeded random event sets") {
    implicit val sc = spark.sqlContext
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { round =>
      // events sorted by ts before the batch split, so nothing arrives
      // behind the watermark (batch sessionize has no late-drop notion);
      // values are multiples of 0.25 -> binary-exact sums
      val evs = (1 to 40).map { i =>
        Streaming.SessEvent(1L + rnd.nextInt(3), i.toLong,
          new Timestamp(ts(0, 0).getTime + rnd.nextInt(600) * 60000L),
          rnd.nextInt(8).toDouble / 4.0)
      }.sortBy(e => (e.ts.getTime, e.event_id))
      val cut = evs.length / 2
      val input = MemoryStream[Streaming.SessEvent]
      val q = Streaming.sessionizeStream(input.toDS()).writeStream
        .format("memory").queryName(s"sess_prop_$round").outputMode("append").start()
      input.addData(evs.take(cut): _*); q.processAllAvailable()
      input.addData(evs.drop(cut): _*); q.processAllAvailable()
      input.addData(Streaming.SessEvent(999L, 9998L, ts(20, 0), 0.0)); q.processAllAvailable()
      input.addData(Streaming.SessEvent(999L, 9999L, ts(21, 0), 0.0)); q.processAllAvailable()
      val cols = Seq("station_id", "session_id", "session_start", "session_end",
        "n_events", "sum_value", "duration_s")
      val out = spark.table(s"sess_prop_$round").filter(col("station_id") =!= 999)
        .select(cols.head, cols.tail: _*)
        .as[(Long, Long, Timestamp, Timestamp, Long, Double, Double)]
        .collect().toSeq.sorted
      q.stop()
      val expected = graft.tsdb.Aggregate.sessionize(
          evs.map(e => (e.event_id, e.ts, e.user_id, "click", e.value))
            .toDF("event_id", "ts", "user_id", "event_type", "value"))
        .select(cols.head, cols.tail: _*)
        .as[(Long, Long, Timestamp, Timestamp, Long, Double, Double)]
        .collect().toSeq.sorted
      assert(out === expected, s"seed round $round diverged")
    }
  }

  test("streaming hll sketch equals the batch estimate per closed window") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Streaming.HllEvent]
    val q = Streaming.hllStream(input.toDS(), windowHours = 6).writeStream
      .format("memory").queryName("hll_stream").outputMode("append").start()
    // two 6h windows, two types, duplicate users within a window
    val w0 = (1 to 40).map(u => Streaming.HllEvent("click", ts(u % 6), u.toLong % 25)) ++
      (1 to 15).map(u => Streaming.HllEvent("view", ts(u % 6), u.toLong))
    val w1 = (1 to 30).map(u => Streaming.HllEvent("click", ts(6 + u % 6), u.toLong % 12))
    input.addData(w0: _*); q.processAllAvailable()
    input.addData(w1: _*); q.processAllAvailable()
    // sentinel far past both windows + lateness -> watermark closes them
    input.addData(Streaming.HllEvent("click", ts(23, 59), 999L))
    q.processAllAvailable()
    val streamed = spark.table("hll_stream")
      .select("event_type", "window_start", "hll_estimate")
      .as[(String, Timestamp, Double)].collect().toSeq.sorted
    q.stop()
    // batch twin on each window slice, same hash/rho/estimate math
    val all = (w0 ++ w1).map(e => (e.ts, e.user_id, e.event_type))
      .toDF("ts", "user_id", "event_type")
    val expected = Seq(ts(0) -> ts(6), ts(6) -> ts(12)).flatMap { case (lo, hi) =>
      graft.analytics.EventAnalytics.hllDistinct(
          all.filter(col("ts") >= lo && col("ts") < hi))
        .select("event_type", "hll_estimate").as[(String, Double)].collect()
        .map { case (t, est) => (t, lo, est) }
    }.sorted
    assert(streamed === expected,
      "streaming sketch must reproduce the batch estimates exactly")
  }

  test("gap detector emits alerts across micro-batches via state") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Streaming.StationEvent]
    val q = Streaming.gapDetector(input.toDS(), maxGapHours = 2.0).writeStream
      .format("memory").queryName("gaps").outputMode("append").start()
    input.addData(Streaming.StationEvent(1L, ts(0), 1.0), Streaming.StationEvent(1L, ts(1), 1.0))
    q.processAllAvailable()
    input.addData(Streaming.StationEvent(1L, ts(9), 1.0)) // 8h silence -> alert
    q.processAllAvailable()
    val out = spark.table("gaps").as[Streaming.GapAlert].collect()
    q.stop()
    assert(out.length === 1)
    assert(out.head.station_id === 1L)
    assert(out.head.gap_hours === 8.0)
    assert(out.head.gap_start === ts(1))
  }

  test("sessionize stream recovers keyed state across a checkpoint restart") {
    implicit val sc = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Streaming.Session]()
    val input = MemoryStream[Streaming.SessEvent]
    def start() = Streaming.sessionizeStream(input.toDS()).writeStream
      .outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Streaming.Session], _: Long) =>
        df.collect().foreach(got.add)
      }.start()
    // batch 1 opens a session for station 1, then the query STOPS with
    // the session still live in keyed state
    var q = start()
    input.addData(
      Streaming.SessEvent(1L, 1L, ts(0, 0), 1.5),
      Streaming.SessEvent(1L, 2L, ts(0, 10), 2.25))
    q.processAllAvailable(); q.stop()
    // restart from the checkpoint: the continuation event must extend
    // the SAME session (recovered state), not open session 1
    q = start()
    input.addData(Streaming.SessEvent(1L, 3L, ts(0, 20), 0.5))
    q.processAllAvailable()
    input.addData(Streaming.SessEvent(999L, 8L, ts(8, 0), 0.0)); q.processAllAvailable()
    input.addData(Streaming.SessEvent(999L, 9L, ts(9, 0), 0.0)); q.processAllAvailable()
    q.stop()
    // a replayed uncommitted batch may duplicate emissions — session
    // identity dedups them; the semantics must match the batch frame
    import scala.jdk.CollectionConverters._
    val sessions = got.asScala.toSet.filter(_.station_id != 999L)
    assert(sessions === Set(
      Streaming.Session(1L, 0L, ts(0, 0), ts(0, 20), 3L, 4.25, 1200.0)),
      s"restart must resume the open session, got: $sessions")
  }

  test("streaming funnel stage hits equal the batch per-user minima") {
    implicit val sc = spark.sqlContext
    // per-user strictly increasing timestamps; user 1 full funnel,
    // user 2 clicks before any view (never converts), user 3 view only,
    // user 4 purchase before click (stuck at click stage)
    val evs = Seq(
      Streaming.FunnelEvent(1L, 1L, ts(0, 0), "view"),
      Streaming.FunnelEvent(1L, 2L, ts(0, 10), "click"),
      Streaming.FunnelEvent(1L, 3L, ts(0, 20), "purchase"),
      Streaming.FunnelEvent(2L, 4L, ts(0, 5), "click"),
      Streaming.FunnelEvent(2L, 5L, ts(0, 15), "purchase"),
      Streaming.FunnelEvent(3L, 6L, ts(0, 7), "view"),
      Streaming.FunnelEvent(4L, 7L, ts(0, 1), "view"),
      Streaming.FunnelEvent(4L, 8L, ts(0, 2), "purchase"),
      Streaming.FunnelEvent(4L, 9L, ts(0, 30), "click"),
      // second view/click must NOT re-emit
      Streaming.FunnelEvent(1L, 10L, ts(1, 0), "view"),
      Streaming.FunnelEvent(1L, 11L, ts(1, 5), "click"))
    val input = MemoryStream[Streaming.FunnelEvent]
    val q = Streaming.funnelStream(input.toDS()).writeStream
      .format("memory").queryName("funnel_hits").outputMode("append").start()
    input.addData(evs.take(5): _*); q.processAllAvailable()
    input.addData(evs.drop(5): _*); q.processAllAvailable()
    val out = spark.table("funnel_hits")
      .as[Streaming.StageHit].collect().map(h => (h.user_id, h.stage) -> h.stage_ts).toMap
    q.stop()
    assert(out === Map(
      (1L, "view") -> ts(0, 0), (1L, "click") -> ts(0, 10),
      (1L, "purchase") -> ts(0, 20),
      (3L, "view") -> ts(0, 7),
      (4L, "view") -> ts(0, 1), (4L, "click") -> ts(0, 30)))
    // cross-check against the batch funnel aggregate: stage totals agree
    val batchDf = evs.map(e => (e.event_id, e.ts, e.user_id, e.event_type, 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val f = graft.analytics.EventAnalytics.funnel(batchDf)
      .agg(sum(col("n_view")), sum(col("n_click")), sum(col("n_purchase"))).head
    assert(out.keys.count(_._2 == "view").toLong === f.getLong(0))
    assert(out.keys.count(_._2 == "click").toLong === f.getLong(1))
    assert(out.keys.count(_._2 == "purchase").toLong === f.getLong(2))
  }

  test("streaming anomaly twin equals the batch z-score frame") {
    implicit val sc = spark.sqlContext
    // three users, 30 events each on a tight 0.75/1.25 baseline with
    // planted 50.0 spikes; state carries across the mid-stream batch cut
    val evs = (for {
      u <- 1L to 3L
      i <- 1 to 30
    } yield {
      val v = if (i == 20 || i == 27) 50.0 else if (i % 2 == 0) 1.25 else 0.75
      Streaming.AnomEvent(u, u * 100 + i,
        new Timestamp(ts(0, 0).getTime + i * 60000L), v)
    }).sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Streaming.AnomEvent]
    val q = Streaming.anomalyStream(input.toDS()).writeStream
      .format("memory").queryName("anom").outputMode("append").start()
    val cut = evs.length / 2
    input.addData(evs.take(cut): _*); q.processAllAvailable()
    input.addData(evs.drop(cut): _*); q.processAllAvailable()
    val out = spark.table("anom")
      .select("event_id", "user_id", "value", "mu", "sd", "z")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq.sorted
    q.stop()
    val batchDf = evs.map(e => (e.event_id, e.ts, e.user_id, "click", e.value))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val expected = graft.analytics.EventAnalytics.anomalyZscore(batchDf)
      .select("event_id", "user_id", "value", "mu", "sd", "z")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq.sorted
    assert(out.nonEmpty, "the planted spikes must flag")
    assert(out === expected)
  }

  test("streaming upsert sink merges micro-batches into an exactly-once keyed table") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/t"
    val input = MemoryStream[(Long, Double, String)]
    val df = input.toDF().toDF("event_id", "value", "day")
    val sink = new Streaming.UpsertSink(dir, Seq("event_id"))
    val q = sink.attach(df)
    // batch 0: initial rows on two days
    input.addData((1L, 1.0, "2024-01-01"), (2L, 2.0, "2024-01-01"),
      (3L, 3.0, "2024-01-02"))
    q.processAllAvailable()
    // batch 1: update key 2 in place, move key 3 to another day, add key 4
    input.addData((2L, 20.0, "2024-01-01"), (3L, 30.0, "2024-01-03"),
      (4L, 4.0, "2024-01-02"))
    q.processAllAvailable()
    q.stop()
    val back = spark.read.parquet(dir)
      .select(col("event_id"), col("value"), col("day").cast("string"))
      .as[(Long, Double, String)].collect().toSet
    assert(back === Set(
      (1L, 1.0, "2024-01-01"), (2L, 20.0, "2024-01-01"),
      (3L, 30.0, "2024-01-03"), (4L, 4.0, "2024-01-02")),
      s"merged table mismatch: $back")
  }

  test("streaming cdc upsert: insert/update/noop provenance, last-writer wins") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Streaming.CdcEvent]
    val q = Streaming.cdcUpsertStream(input.toDS()).writeStream
      .format("memory").queryName("cdc_up").outputMode("update").start()
    input.addData(
      Streaming.CdcEvent(1L, 1L, ts(0, 0), "view", 1.0),
      Streaming.CdcEvent(1L, 2L, ts(0, 10), "click", 2.0),
      Streaming.CdcEvent(2L, 3L, ts(0, 5), "view", 4.0))
    q.processAllAvailable()
    input.addData(
      Streaming.CdcEvent(1L, 4L, ts(1, 0), "purchase", 9.0), // newer → update
      Streaming.CdcEvent(2L, 5L, ts(0, 0), "error", 7.0)) // older → noop
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cdc_up").as[Streaming.CdcRow].collect()
    val ins = rows.filter(_.op == "insert")
    assert(ins.map(_.user_id).toSet === Set(1L, 2L))
    assert(ins.find(_.user_id == 1L).get.state === "click", "in-batch max wins")
    val upd = rows.filter(_.op == "update")
    assert(upd.map(_.user_id).toSeq === Seq(1L) && upd.head.state === "purchase")
    val noop = rows.filter(_.op == "noop")
    assert(noop.map(_.user_id).toSeq === Seq(2L), "late redelivery is a noop")
    assert(noop.head.state === "view" && noop.head.value === 4.0,
      "noop must re-emit the HELD state, not the late event")
  }
}
