package graft.api

import graft.SparkSpec
import graft.core.TimestampPeriod

class WeatherApiSpec extends SparkSpec {

  private lazy val db = new WeatherDb(spark, "/root/testdata/sf0.001")

  test("station series retrieval with period filter") {
    val s = db.station(0L)
    val all = s.getDf()
    val period = TimestampPeriod.of("2024-01-05", "2024-01-10")
    val windowed = s.getDf(period = period)
    assert(all.count() === 30)
    assert(windowed.count() === 6)
    assert(windowed.columns.toSeq === Seq("day", "raw", "qc", "filled"))
  }

  test("neighbors, filled period, corrected series") {
    val s = db.station(0L)
    val nbs = s.getNeighbors(3)
    assert(nbs.size === 3 && !nbs.contains(0L))
    val fp = s.getFilledPeriod("raw")
    assert(fp.start.nonEmpty && fp.end.nonEmpty)
    val coef = s.getCoef(nbs.head)
    assert(coef.exists(c => c > 0))
    assert(s.getCorr().count() === 30)
    assert(s.getDist(1L) === 1.0) // grid neighbors are unit-spaced
    assert(s.isReal || s.isVirtual)
    assert(db.stations.getValidStids.contains(0L))
  }

  test("membership guards and per-kind period meta") {
    val s = db.station(0L)
    assert(s.isinMeta && s.isinDb)
    assert(!db.station(99999L).isinMeta)
    val filled = s.getPeriodMeta("filled")
    val raw = s.getPeriodMeta("raw")
    val max = s.getPeriodMeta("max")
    assert(filled.start.nonEmpty && raw.start.nonEmpty && max.start.nonEmpty)
    // grid extent contains the per-kind filled periods
    assert(!max.start.get.isAfter(filled.start.get))
    assert(!max.end.get.isBefore(filled.end.get))
    intercept[IllegalArgumentException](s.getPeriodMeta("nope"))
  }

  test("adjusted series matches the raster target; ma raster accessor prunes") {
    val s = db.station(0L)
    val adj = s.getAdj()
    assert(adj.columns.toSeq === Seq("day", "filled", "adj"))
    assert(adj.count() === 30)
    // multiplicative adjustment: mean(adj) lands on the raster_p target
    val meanAdj = adj.agg(org.apache.spark.sql.functions.avg("adj")).head.getDouble(0)
    val rasterP = s.getMaRaster.select("raster_p").head.getDouble(0)
    assert(math.abs(meanAdj - rasterP) < 0.01, s"mean(adj)=$meanAdj vs raster_p=$rasterP")
    assert(s.getMaRaster.count() === 1)
  }

  test("free-form filter is pushed into the scan and agg_to aggregates") {
    val s = db.station(0L)
    val flt = s.getDf(Seq("raw", "filled"), sqlAddWhere = "filled > 100")
    assert(flt.count() > 0)
    assert(flt.collect().forall(_.getAs[Double]("filled") > 100))
    // the predicate must reach the scan-side filter, not a post-sort step
    assert(flt.queryExecution.optimizedPlan.toString.contains("100.0"))
    val monthly = s.getDf(Seq("filled"), aggTo = "month")
    assert(monthly.columns.toSeq === Seq("month", "filled", "filled_na_share"))
    assert(monthly.count() === 1)
    intercept[IllegalArgumentException] { s.getDf(Seq("filled"), aggTo = "minute") }
  }

  test("broker last-import cycle merges window recompute into persisted frames") {
    import java.sql.Date
    val b = db.broker
    val lo = Date.valueOf("2024-01-20"); val hi = Date.valueOf("2024-01-30")
    val inc = b.lastImpQualityCheck(db.qc, lo, hi)
    assert(inc.count() === db.qc.count())
    // the merge must be a no-op when prev already equals the full run
    assert(inc.except(db.qc).count() === 0)
    assert(b.updateDb.columns.contains("corr"))
  }

  test("stations-level actions and group view") {
    assert(db.stations.getMeta.count() > 0)
    val q = db.stations.getQuotient(Seq("filled"), Seq("raw"))
    assert(q.count() > 0)
    val g = db.groupStation(0L).getDf()
    assert(g.columns.toSeq === Seq("station_id", "day", "p_raw", "t_raw", "et_raw"))
    assert(g.count() === 30)
  }

  test("create_ts writes the delimited model-input export") {
    val out = java.nio.file.Files.createTempDirectory("graft_ts").toString + "/st0"
    db.groupStation(0L).createTs(out)
    // reference layout: 2 meta-header lines + column header + 30 days
    val back = spark.read.text(s"$out/station_id=0/file=P.txt")
    assert(back.count() === 33)
    val header = back.filter(org.apache.spark.sql.functions.col("value")
      .startsWith("Jahr\t")).head().getString(0)
    assert(header === "Jahr\tMonat\tTag\tP")
  }

  test("get_max_period: inner union of kinds vs full grid extent") {
    val s = db.station(0L)
    val inner = s.getMaxPeriod()
    val outer = s.getMaxPeriod(nasAllowed = true)
    assert(inner.start.nonEmpty && inner.end.nonEmpty)
    assert(outer.contains(inner)) // the NAs-allowed extent covers the inner period
  }

  test("all-stations create_ts writes one partition directory per location") {
    val out = java.nio.file.Files.createTempDirectory("graft_all_ts").toString + "/all"
    db.groupStations.createTs(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("station_id=")).toSeq
    assert(dirs.size === db.groupStations.getValidStids.size)
    // every station dir carries the three per-parameter files
    val files = new java.io.File(s"$out/${dirs.head}").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(files === Seq("file=ET.txt", "file=P.txt", "file=T.txt"))
  }

  test("all-stations create_roger_ts uses toolbox names and MA accessors derive") {
    val out = java.nio.file.Files.createTempDirectory("graft_all_rg").toString + "/rg"
    db.groupStations.createRogerTs(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("station_id=")).toSeq
    assert(dirs.size === db.groupStations.getValidStids.size)
    val files = new java.io.File(s"$out/${dirs.head}").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(files === Seq("file=PET.txt", "file=PREC.txt", "file=TA.txt"))
    assert(db.stations.update.count() > 0)
    assert(db.stations.updateMaTimeseries.count() ===
      db.stations.getValidStids.size)
    assert(db.stations.updateMaRaster.count() > 0)
  }

  test("neighbor options: only_real default and elevation weighting") {
    val s = db.station(0L)
    val realIds = db.meta.filter(org.apache.spark.sql.functions.col("is_real"))
      .select("station_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    val nbs = s.getNeighbors(3) // onlyReal = true by default, like the reference
    assert(nbs.forall(realIds.contains))
    val weighted = s.getNeighbors(3, pElev = Some((250.0, 1.5)))
    assert(weighted.size === 3 && weighted.forall(realIds.contains))
  }

  test("get_geom round-trips a station point through WKT and GeoJSON") {
    val s = db.station(0L)
    // single-station form (reference get_geom returns a shapely Point;
    // ours a WKT string): parse it back and compare with the registry
    val wkt = s.getGeom
    val Array(x, y) = wkt.stripPrefix("POINT (").stripSuffix(")")
      .split(" ").map(_.toDouble)
    val meta = s.getMeta.select("x", "y").head
    assert(x === meta.getDouble(0) && y === meta.getDouble(1),
      s"WKT round-trip mismatch: $wkt vs $meta")
    // frame form: one geometry per registry row, WKT and GeoJSON agree
    val g = db.stations.getGeom
    assert(g.count() === db.meta.count())
    val r0 = g.filter(org.apache.spark.sql.functions.col("station_id") === 0L).head
    assert(r0.getAs[String]("geometry") === wkt)
    val gj = r0.getAs[String]("geometry_geojson")
    assert(gj === s"""{"type":"Point","coordinates":[$x,$y]}""")
  }

  test("get_geom WGS84 transform matches the independently computed UTM-32N anchors") {
    import org.apache.spark.sql.functions.col
    val g = db.stations.getGeomWgs84.collect()
      .map(r => (r.getAs[Double]("x"), r.getAs[Double]("y"))
        -> (r.getAs[Double]("lon"), r.getAs[Double]("lat"))).toMap
    // station at grid (0,0) = the (500000, 5400000) zone-32N anchor:
    // lon is EXACTLY the central meridian, lat the footpoint latitude
    // (independently computed with a separate Python implementation
    // of the Snyder series: 9.0, 48.753013)
    assert(g((0.0, 0.0)) === ((9.0, 48.753013)), s"anchor: ${g((0.0, 0.0))}")
    // monotone: east of the central meridian lon grows with x,
    // lat grows with y
    g.keys.groupBy(_._2).values.foreach { row =>
      val sorted = row.toSeq.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(g(a)._1 < g(b)._1, s"lon not monotone $a $b")
        case _ =>
      }
    }
    // the WKT carries the transformed point, on the frame AND the
    // single-station crs accessor (the reference's get_geom(crs=...))
    val wkt = db.stations.getGeomWgs84
      .filter(col("station_id") === 0L).head.getAs[String]("geometry")
    assert(wkt === "POINT (9.0 48.753013)", wkt)
    assert(db.station(0L).getGeom("wgs84") === wkt)
    assert(db.station(0L).getGeom("grid") === db.station(0L).getGeom)
    intercept[IllegalArgumentException](db.station(0L).getGeom("epsg:9999"))
  }

  test("last-import bookkeeping: mark -> pending flags -> broker marks done") {
    // fresh db so the session-local flags start clean
    val db2 = new WeatherDb(spark, "/root/testdata/sf0.001")
    val s = db2.station(0L)
    // nothing pending: done by definition, empty period
    assert(s.isLastImpDone("qc") && s.isLastImpDone("filled") && s.isLastImpDone("corr"))
    assert(s.getLastImpPeriod().start.isEmpty)
    intercept[IllegalArgumentException](s.isLastImpDone("bogus"))
    val p = TimestampPeriod.of("2024-01-20", "2024-01-25")
    db2.markLastImport(p)
    assert(!s.isLastImpDone("qc") && !s.isLastImpDone("filled") && !s.isLastImpDone("corr"))
    assert(s.getLastImpPeriod() === p)
    assert(s.getPeriodMeta("last_imp") === p)
    val broker = db2.broker
    val lo = java.sql.Date.valueOf("2024-01-20"); val hi = java.sql.Date.valueOf("2024-01-25")
    broker.lastImpQualityCheck(db2.qc, lo, hi)
    assert(s.isLastImpDone("qc") && !s.isLastImpDone("filled"))
    broker.lastImpFillup(db2.filled, db2.qc, lo, hi)
    broker.lastImpCorr(db2.corr, db2.filled, lo, hi)
    assert(s.isLastImpDone("filled") && s.isLastImpDone("corr"))
    // a processed window that does NOT cover the pending import must
    // NOT mark the kind done (the reference's fillup coverage check,
    // StationBases.py:1667-1669) — the flag only flips once a window
    // spanning the whole import period has run
    db2.markLastImport(TimestampPeriod.of("2024-01-20", "2024-01-25"))
    assert(!s.isLastImpDone("qc"))
    val hiShort = java.sql.Date.valueOf("2024-01-22")
    broker.lastImpQualityCheck(db2.qc, lo, hiShort)
    assert(!s.isLastImpDone("qc"))
    broker.lastImpQualityCheck(db2.qc, lo, hi)
    assert(s.isLastImpDone("qc"))
    // registry membership twins
    assert(s.isinMa && s.isinMetaP)
  }

  test("last-import prerequisite gating: out-of-order broker calls leave kinds pending") {
    // the reference marks 'filled' done only when qc already is
    // (StationBases.py:1664-1669) and 'corr' only when qc AND filled
    // are (StationP.py:643-646) — a corr call against a stale upstream
    // must not read 'done'
    val db2 = new WeatherDb(spark, "/root/testdata/sf0.001")
    val s = db2.station(0L)
    db2.markLastImport(TimestampPeriod.of("2024-01-20", "2024-01-25"))
    val broker = db2.broker
    val lo = java.sql.Date.valueOf("2024-01-20"); val hi = java.sql.Date.valueOf("2024-01-25")
    // corr first: neither qc nor filled done -> corr stays pending
    broker.lastImpCorr(db2.corr, db2.filled, lo, hi)
    assert(!s.isLastImpDone("corr"))
    // fillup before qc: filled stays pending too
    broker.lastImpFillup(db2.filled, db2.qc, lo, hi)
    assert(!s.isLastImpDone("filled"))
    // in order, the chain completes
    broker.lastImpQualityCheck(db2.qc, lo, hi)
    assert(s.isLastImpDone("qc"))
    broker.lastImpFillup(db2.filled, db2.qc, lo, hi)
    assert(s.isLastImpDone("filled"))
    broker.lastImpCorr(db2.corr, db2.filled, lo, hi)
    assert(s.isLastImpDone("corr"))
  }

  test("get_meta_explanation documents every meta column") {
    val exp = db.stations.getMetaExplanation()
    assert(exp.columns.toSeq === Seq("info", "explanation"))
    // catalog and live frame must stay in sync, both directions
    val documented = exp.select("info")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSet
    assert(documented === db.meta.columns.toSet)
    // subset selection like the reference's infos=[...]
    val sub = db.stations.getMetaExplanation(Seq("station_id", "elev"))
    assert(sub.count() === 2)
    intercept[IllegalArgumentException] {
      db.stations.getMetaExplanation(Seq("no_such_info"))
    }
    // explorer frame exposes the documented columns in catalog order
    assert(db.stations.getMetaExplorer.columns.toSeq ===
      Stations.metaExplanation.map(_._1))
  }
}
