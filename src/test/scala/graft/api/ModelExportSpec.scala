package graft.api

import graft.SparkSpec
import graft.tsdb.Aggregate
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Round-trips the written model-input files against the wide frame
  * (q_group_wide) they were derived from — the reference's create_ts
  * contract (GroupStation.py:434): 2-line meta header, split-date
  * integer columns, tab separation, empty-string NAs. */
class ModelExportSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val db = new WeatherDb(spark, dir)

  private def readPartFile(root: Path, sub: String): Seq[String] = {
    val d = root.resolve(sub)
    val part = Files.list(d).iterator().asScala
      .find(_.getFileName.toString.startsWith("part-"))
      .getOrElse(fail(s"no part file under $d"))
    Files.readAllLines(part).asScala.toSeq
  }

  test("create_ts file round-trips against the q_group_wide frame") {
    val out = Files.createTempDirectory("graft_export")
    db.groupStation(3L).createTs(out.toString)

    val lines = readPartFile(out, "station_id=3/file=P.txt")
    // 2-line meta header (Name/Lat-Lon), then the column header
    assert(lines(0).startsWith("Name: station_3 (ID: 3)"))
    assert(lines(1).startsWith("Lat: ") && lines(1).contains(",Lon: "))
    assert(lines(2) === "Jahr\tMonat\tTag\tP")

    val wide = Aggregate.groupWide(db.events)
      .filter(col("station_id") === 3L).orderBy(col("day"))
      .select(col("day").cast("string"), col("p_raw")).collect()
    val body = lines.drop(3)
    assert(body.size === wide.length, "one line per wide-frame day")
    body.zip(wide).foreach { case (line, row) =>
      val parts = line.split("\t", -1)
      val Array(y, m, d0) = row.getString(0).split("-")
      assert(parts(0) === y.toInt.toString && parts(1) === m.toInt.toString
        && parts(2) === d0.toInt.toString, s"date mismatch: $line vs $row")
      if (row.isNullAt(1)) assert(parts(3) === "", s"NA must be empty: $line")
      else assert(math.abs(parts(3).toDouble - row.getDouble(1)) < 1e-9,
        s"value mismatch: $line vs $row")
    }
  }

  test("roger toolbox format: PET file with R/R0 column, no meta header") {
    val out = Files.createTempDirectory("graft_roger")
    db.groupStation(3L).createRogerTs(out.toString, rR0 = 1.0)
    val lines = readPartFile(out, "station_id=3/file=PET.txt")
    assert(lines(0) === "YYYY\tMM\tDD\tPET\tR/R0")
    val vals = lines.drop(1).map(_.split("\t", -1))
    assert(vals.nonEmpty && vals.forall(_.last == "1.0"),
      "constant R/R0 column on every PET row")
  }

  test("all-locations export writes one directory per station") {
    val out = Files.createTempDirectory("graft_all")
    db.groupStations.createTs(out.toString, addMeta = false)
    val stationDirs = Files.list(out).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("station_id=")).toSeq
    assert(stationDirs.size === db.groupStations.getValidStids.size)
    val lines = readPartFile(out, s"${stationDirs.head}/file=T.txt")
    assert(lines(0) === "Jahr\tMonat\tTag\tT")
    assert(lines.size > 1)
  }
}
