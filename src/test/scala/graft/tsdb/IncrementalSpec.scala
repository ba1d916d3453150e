package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Date

/** Proves the last-import contract: a period-scoped incremental update
  * merged into the persisted frame equals a full recompute on the
  * touched period (and leaves untouched history bit-identical). */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val lo = Date.valueOf("2024-02-01")
  private val hi = Date.valueOf("2024-02-10")

  /** Deterministic synthetic events over Jan 1 – Feb 10; the
    * "last import" adds February. */
  private def mkEvents(untilFeb: Boolean): DataFrame = {
    val days = if (untilFeb) 41 else 31
    val rows = for {
      st <- 0L until 9L
      d <- 1 until days
      // station-dependent gaps so the fill path actually fires
      if (st + d) % 7 != 0
    } yield {
      val day = Date.valueOf("2024-01-01").toLocalDate.plusDays(d - 1)
      val v = ((st * 31 + d * 17) % 97).toDouble + 1
      val typ = if ((st + d) % 3 == 0) "view" else "click"
      (st * 100 + d, java.sql.Timestamp.valueOf(day.atTime(12, 0)), st, typ, v)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  private def world(events: DataFrame) = (
    Series.dailyRaw(events), Series.dailyRef(events), Series.stationMeta(events))

  /** The incremental contract covers the WHOLE affected range: the
    * import period plus the Reach days before it that forward-looking
    * window rules can flip. */
  private val affectedLo =
    Date.valueOf(lo.toLocalDate.minusDays(Incremental.Reach))

  private def sliceEq(a: DataFrame, b: DataFrame, keys: Seq[String]): Unit = {
    val (af, bf) = (a.filter(col("day").between(lit(affectedLo), lit(hi))),
      b.filter(col("day").between(lit(affectedLo), lit(hi))))
    assert(af.count() === bf.count())
    assert(af.except(bf).count() === 0, s"incremental != full on affected range")
    assert(bf.except(af).count() === 0, s"full != incremental on affected range")
  }

  test("incremental qc equals full recompute on the touched period") {
    val (oldRaw, oldRef, oldMeta) = world(mkEvents(untilFeb = false))
    val prevQc = QualityCheck.all(oldRaw, oldRef, oldMeta)
    val (newRaw, newRef, newMeta) = world(mkEvents(untilFeb = true))
    val inc = Incremental.updateQc(prevQc, newRaw, newRef, newMeta, lo, hi)
    val full = QualityCheck.all(newRaw, newRef, newMeta)
    sliceEq(inc, full, Seq("station_id", "day"))
    // untouched history must be exactly the persisted frame
    val jan = inc.filter(col("day") < lit(affectedLo))
    assert(jan.except(prevQc.filter(col("day") < lit(affectedLo))).count() === 0)
  }

  test("incremental fillup equals full recompute on the touched period") {
    val (newRaw, newRef, newMeta) = world(mkEvents(untilFeb = true))
    val qc = QualityCheck.all(newRaw, newRef, newMeta)
    val prevFilled = Fillup.fillNeighbor(qc.filter(col("day") < lit(lo)), newMeta)
    val inc = Incremental.updateFilled(prevFilled, qc, newMeta, lo, hi)
    val full = Fillup.fillNeighbor(qc, newMeta)
    sliceEq(inc, full, Seq("station_id", "day"))
  }

  test("incremental qc contract holds for arbitrary import windows (seeded sweep)") {
    val (newRaw, newRef, newMeta) = world(mkEvents(untilFeb = true))
    val full = QualityCheck.all(newRaw, newRef, newMeta)
    val rnd = new scala.util.Random(42)
    (1 to 4).foreach { _ =>
      val startOff = rnd.nextInt(30)
      val len = 1 + rnd.nextInt(10)
      val wLo = Date.valueOf("2024-01-05").toLocalDate.plusDays(startOff)
      val wHi = wLo.plusDays(len)
      val (plo, phi) = (Date.valueOf(wLo), Date.valueOf(wHi))
      // prev = full run (steady state); updating any window must be a no-op
      val inc = Incremental.updateQc(full, newRaw, newRef, newMeta, plo, phi)
      assert(inc.count() === full.count(), s"window $plo..$phi changed row count")
      assert(inc.except(full).count() === 0, s"window $plo..$phi diverged")
      assert(full.except(inc).count() === 0, s"window $plo..$phi lost rows")
    }
  }

  test("incremental corr equals full recompute on the touched period") {
    val events = mkEvents(untilFeb = true)
    val (newRaw, newRef, newMeta) = world(events)
    val qc = QualityCheck.all(newRaw, newRef, newMeta)
    val filled = Fillup.fillNeighbor(qc, newMeta)
    val temp = Fillup.fillTemp(Series.dailyTemp(events), newMeta, Series.raster(events))
      .select(col("station_id"), col("day"), col("t_filled").as("t"))
    val prevCorr = Richter.correct(spark, filled.filter(col("day") < lit(lo)), temp, newMeta)
    val inc = Incremental.updateCorr(prevCorr, filled, temp, newMeta, lo, hi)
    val full = Richter.correct(spark, filled, temp, newMeta)
    sliceEq(inc, full, Seq("station_id", "day"))
  }
}
