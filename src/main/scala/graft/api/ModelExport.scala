package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's model-input timeseries export — its main end-user
  * deliverable (GroupStation.create_ts, GroupStation.py:434;
  * create_roger_ts, GroupStation.py:347): one tab-separated text file
  * per (location, parameter) with
  *   - an optional 2-line meta header (`Name: {name} (ID: {id})` /
  *     `Lat: {y}   ,Lon: {x}`, tab-padded to the column count,
  *     GroupStation.py:633-638),
  *   - the date either as one ISO column or split into integer parts
  *     (`Jahr/Monat/Tag`, or `YYYY/MM/DD` in the RoGeR toolbox
  *     format, GroupStation.py:625-631 `_split_date`),
  *   - the parameter value column (renamed `PREC`/`TA`/`PET` for
  *     RoGeR, GroupStation.py:408-416),
  *   - an optional constant `R/R0` column on the ET file
  *     (GroupStation.py:610-620),
  *   - NA encoded as the empty string (pandas `to_csv` default).
  *
  * Spark-native shape: the reference loops stations on the driver and
  * writes each file with pandas.to_csv. Here the per-file text is
  * assembled DISTRIBUTED — one output row per (station, parameter),
  * each station's lines gathered with collect_list inside its own
  * hash partition (a single station's daily series is bounded, so the
  * per-group array is small by construction) — and written with
  * `partitionBy(station_id, file)`, so a 1000-executor cluster writes
  * all locations at once with no driver loop and one shuffle total.
  */
object ModelExport {
  /** One exported parameter: wide-frame source column → file + column
    * name in the export. `decimals` is the series' fixed decimal count
    * (the reference's `_decimals` scaling, StationBases.py:58-112):
    * values print as `%.{decimals}f` — deterministic across engines,
    * unlike shortest-double formatting (Java emits `5.0E-4` where
    * DuckDB/pandas emit `0.0005`). */
  final case class ParaSpec(key: String, valueCol: String, fileBase: String,
      colName: String, decimals: Int)

  /** RoGeR toolbox naming (GroupStation.py:408-416). */
  val rogerParas: Seq[ParaSpec] = Seq(
    ParaSpec("p", "p_raw", "PREC.txt", "PREC", 3),
    ParaSpec("t", "t_raw", "TA.txt", "TA", 6),
    ParaSpec("et", "et_raw", "PET.txt", "PET", 3))

  /** Default naming (file `{PARA}_{id}.txt` is flattened to `{PARA}.txt`
    * because the id is already the partition directory). */
  val defaultParas: Seq[ParaSpec] = Seq(
    ParaSpec("p", "p_raw", "P.txt", "P", 3),
    ParaSpec("t", "t_raw", "T.txt", "T", 6),
    ParaSpec("et", "et_raw", "ET.txt", "ET", 3))

  private def dateCols(splitDate: Boolean, roger: Boolean): Seq[(String, Column)] =
    if (splitDate) {
      val names = if (roger) Seq("YYYY", "MM", "DD") else Seq("Jahr", "Monat", "Tag")
      Seq(names(0) -> year(col("day")).cast("string"),
        names(1) -> month(col("day")).cast("string"),
        names(2) -> dayofmonth(col("day")).cast("string"))
    } else Seq("timestamp" -> date_format(col("day"), "yyyy-MM-dd"))

  /** The export as a frame: one row per (station, parameter) with the
    * complete file text — inspectable/testable without touching disk.
    *
    * All parameters ride ONE pass over the wide frame: the per-para
    * line strings are projected side by side, ONE groupBy(station_id)
    * gathers all bodies (Catalyst does not dedup common subplans
    * across union branches, so the per-para union alternative would
    * recompute the upstream wide aggregation once per parameter), and
    * a partition-local posexplode fans the station row out to its
    * #paras files. */
  def tsFiles(wide: DataFrame, meta: DataFrame, paras: Seq[ParaSpec],
      splitDate: Boolean, roger: Boolean, addMeta: Boolean,
      rR0: Option[Double]): DataFrame = {
    val dcs = dateCols(splitDate, roger)
    case class Para(ps: ParaSpec, headerLine: String, nCols: Int, line: Column)
    val pp = paras.map { ps =>
      val extras =
        if (ps.key == "et") rR0.toSeq.map(v => "R/R0" -> lit(v).cast("string"))
        else Nil
      val valueCols =
        (ps.colName -> when(col(ps.valueCol).isNotNull,
          format_string(s"%.${ps.decimals}f", col(ps.valueCol)))
          .otherwise(lit(""))) +: extras
      Para(ps, (dcs.map(_._1) ++ valueCols.map(_._1)).mkString("\t"),
        dcs.size + valueCols.size,
        concat_ws("\t", (dcs.map(_._2) ++ valueCols.map(_._2)): _*))
    }
    def bodyAgg(p: Para): Column = array_join(
      transform(array_sort(collect_list(struct(col("day"), col(s"line_${p.ps.key}")))),
        x => x.getField(s"line_${p.ps.key}")), "\n").as(s"body_${p.ps.key}")
    val bodies = wide
      .select(col("station_id") +: col("day") +:
        pp.map(p => p.line.as(s"line_${p.ps.key}")): _*)
      .groupBy(col("station_id"))
      .agg(bodyAgg(pp.head), pp.tail.map(bodyAgg): _*)
    val withMeta =
      if (addMeta)
        bodies.join(broadcast(meta.select(col("station_id"),
            col("x").cast("string").as("_lon"), col("y").cast("string").as("_lat"))),
          Seq("station_id"), "left")
      else bodies
    def text(p: Para): Column = {
      val header = lit(p.headerLine + "\n")
      if (addMeta) {
        val tabs = "\t" * (p.nCols - 1)
        concat(
          lit("Name: station_"), col("station_id"),
          lit(" (ID: "), col("station_id"), lit(s")$tabs\n"),
          lit("Lat: "), coalesce(col("_lat"), lit("")),
          lit("   ,Lon: "), coalesce(col("_lon"), lit("")), lit(s"$tabs\n"),
          // the text sink terminates the row with the final newline
          header, col(s"body_${p.ps.key}"))
      } else concat(header, col(s"body_${p.ps.key}"))
    }
    withMeta
      .select(col("station_id"),
        explode(array(pp.map(p =>
          struct(lit(p.ps.fileBase).as("file"), text(p).as("text"))): _*)).as("ft"))
      .select(col("station_id"), col("ft.file").as("file"), col("ft.text").as("text"))
  }

  /** Distributed write: `outDir/station_id=…/file=PREC.txt/part-*.txt`
    * — the reference's dir-per-location layout, with each executor
    * writing its own stations. */
  def writeTs(wide: DataFrame, meta: DataFrame, outDir: String,
      paras: Seq[ParaSpec] = defaultParas, splitDate: Boolean = true,
      roger: Boolean = false, addMeta: Boolean = true,
      rR0: Option[Double] = None): Unit =
    tsFiles(wide, meta, paras, splitDate, roger, addMeta, rR0)
      .repartition(col("station_id"))
      .write.mode("overwrite").partitionBy("station_id", "file")
      .text(outDir)
}
