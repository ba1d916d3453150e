package graft.tsdb

/** Single source of truth for the station-timeseries model constants.
  *
  * The reference works on real DWD stations (meta tables with PostGIS
  * geometry, elevation, horizon). The driver test data has no station
  * registry, so station coordinates / elevation / horizon are DERIVED
  * deterministically from the station id with pure integer arithmetic —
  * the DuckDB oracle SQL applies the exact same formulas, so both
  * engines see the same "world".
  *
  * Thresholds are tuned to the synthetic `events` value distribution
  * (daily sums: median ~97, p95 ~324, max ~818) so every rule actually
  * fires, while keeping the reference's rule STRUCTURE:
  * StationP.py:83-187 (range/repeat/spike/daily-compare),
  * StationT.py:89-119 + StationET.py:71-100 (neighbor median).
  */
object Constants {
  // station "world" derivation (mirrored in TsOracle.worldCtes)
  val GridW = 15                 // stations on a 15-wide grid
  val ElevMul = 37; val ElevMod = 500
  val HorizonMul = 7; val HorizonMod = 16

  // quality check thresholds — values TUNED to the synthetic
  // distribution (see header); the reference's own value is quoted
  // separately per line
  val RangeMax = 500.0           // tuned; reference P: raw >= 50 mm/10min -> NULL (StationP.py:177)
  val RepeatRound = -1           // compare values rounded to nearest 10
  val RepeatLimit = 50.0         // tuned; reference drops only repeats above 0 (StationP.py:144)
  val SpikeThreshold = 300.0     // tuned; reference: isolated peak > 5 mm (StationP.py:132)
  val DailyCmpMin = 100.0        // tuned; reference: agg >= 10 mm and >= 2x daily ref (StationP.py:118)
  val NeighborK = 5              // 5 nearest stations (StationBases.py:2211)
  val NeighborMedianMaxDiff = 200.0 // tuned; reference T: |raw - nbs_median| > 5 K (StationT.py:101)

  // fillup
  val FillK = 10                 // neighbor candidates in distance order
  val FillMedianK = 5            // P-style median-of-5 (StationBases.py:1436 _filled_by_n)
  val InterpMaxGap = 3           // linear interpolation limit, days (StationBases.py:1494)

  // LARSIM elevation weighting (StationBases.py:2196, default (250, 1.5))
  val PElev1 = 250.0; val PElev2 = 1.5

  // aggregation completeness: >20% missing in group -> NULL (StationBases.py:2567)
  val AggMinShare = 0.8

  // Richter exposition classes from horizon angle (StationP.py:33-48)
  // and correction parameters (db/fixtures/RichterParameters.json)
  val RichterClasses: Seq[(String, Double, Double)] = Seq(
    // (class, minHorizon inclusive, maxHorizon exclusive)
    ("no-protection", 0, 3),
    ("little-protection", 3, 7),
    ("protected", 7, 12),
    ("heavy-protection", 12, Double.PositiveInfinity))
  // precipitation_typ -> (e, b_no, b_little, b_protected, b_heavy)
  val RichterParams: Map[String, (Double, Double, Double, Double, Double)] = Map(
    "precip_summer" -> (0.38, 0.345, 0.31, 0.28, 0.245),
    "precip_winter" -> (0.46, 0.34, 0.28, 0.24, 0.19),
    "mix" -> (0.55, 0.535, 0.39, 0.305, 0.185),
    "snow" -> (0.82, 0.72, 0.51, 0.33, 0.21))
  val SnowTemp = -0.7            // t <= -0.7C -> snow (StationP.py:577)
  val RainTemp = 3.0             // t >= 3C -> liquid (StationP.py:575)
  val PDecimals = 100            // P integer scaling (models.py: raw int = value * 100)
  val TempShift = 50.0           // temperature proxy = avg(view value) - 50

  // deterministic multi-annual "raster" values per station (pure
  // arithmetic stand-in for station_ma_raster, models.py:324)
  val RasterPMulA = 13; val RasterPModA = 97; val RasterPScale = 1.7; val RasterPBase = 50.0
  val RasterTMulA = 7; val RasterTModA = 23; val RasterTScale = 0.8; val RasterTBase = 5.0
}
