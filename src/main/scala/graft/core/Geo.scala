package graft.core

/** UTM zone 32N → WGS84 inverse Transverse Mercator as SHARED SQL
  * (Snyder 1987, "Map Projections — A Working Manual", eqs. 8.17-8.25
  * with the standard footpoint-latitude series; WGS84 ellipsoid,
  * k₀ = 0.9996, central meridian 9°E).
  *
  * The reference's `get_geom` (StationBases.py:1817) transforms its
  * EPSG:25832 point geometry to WGS84 through pyproj; here the same
  * conversion is a chain of (column, SQL expression) steps whose
  * strings run VERBATIM on both engines — Spark via `expr`, DuckDB as
  * an oracle CTE chain — so cross-engine parity is structural: both
  * execute identical arithmetic with identical literal constants
  * (precomputed once below; Scala's Double.toString round-trips
  * exactly on both parsers). Only libm trig ulps can differ, absorbed
  * by the closing 6-dp rounding (≈ 0.1 m).
  *
  * The synthetic registry grid maps onto the zone at [[GridMeters]]
  * spacing from the ([[FalseEasting]], [[AnchorNorthing]]) anchor —
  * ~48.75°N 9°E, the reference's Baden-Württemberg extent.
  */
object Geo {
  val A = 6378137.0
  val F = 1 / 298.257223563
  val E2: Double = F * (2 - F)
  val EP2: Double = E2 / (1 - E2)
  val K0 = 0.9996
  val Lon0Deg = 9.0
  val FalseEasting = 500000.0
  val AnchorNorthing = 5400000.0
  val GridMeters = 1000.0

  private val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
  val MFac: Double = A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256)
  val C2: Double = 3 * e1 / 2 - 27 * math.pow(e1, 3) / 32
  val C4: Double = 21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32
  val C6: Double = 151 * math.pow(e1, 3) / 96
  val C8: Double = 1097 * math.pow(e1, 4) / 512

  /** Literal formatter: force a DOUBLE literal on BOTH engines (a
    * bare decimal literal is DECIMAL in DuckDB — and a const×const
    * DECIMAL product overflows; the exponent form is a double in both
    * SQL dialects). */
  private def d(x: Double): String = {
    val s = x.toString
    if (s.contains('e') || s.contains('E')) s else s + "e0"
  }

  /** The inverse-projection step chain: evaluate in order, each step
    * may reference earlier names; columns `easting` and `northing`
    * (meters) must already exist. Final columns `lat`/`lon` are
    * 6-dp-rounded WGS84 degrees. */
  val inverseUtmChain: Seq[(String, String)] = Seq(
    "mu" -> s"northing / ${d(K0)} / ${d(MFac)}",
    "phi1" -> (s"mu + ${d(C2)} * sin(2 * mu) + ${d(C4)} * sin(4 * mu)"
      + s" + ${d(C6)} * sin(6 * mu) + ${d(C8)} * sin(8 * mu)"),
    "sp" -> "sin(phi1)",
    "cp" -> "cos(phi1)",
    "tp" -> "tan(phi1)",
    "bigc1" -> s"${d(EP2)} * cp * cp",
    "bigt1" -> "tp * tp",
    "bign1" -> s"${d(A)} / sqrt(1 - ${d(E2)} * sp * sp)",
    "bigr1" -> s"${d(A * (1 - E2))} / pow(1 - ${d(E2)} * sp * sp, 1.5e0)",
    "dd" -> s"(easting - ${d(FalseEasting)}) / (bign1 * ${d(K0)})",
    "lat" -> (s"round(degrees(phi1 - (bign1 * tp / bigr1) * (dd * dd / 2"
      + s" - (5 + 3 * bigt1 + 10 * bigc1 - 4 * bigc1 * bigc1 - 9 * ${d(EP2)})"
      + s" * pow(dd, 4) / 24"
      + s" + (61 + 90 * bigt1 + 298 * bigc1 + 45 * bigt1 * bigt1"
      + s" - 252 * ${d(EP2)} - 3 * bigc1 * bigc1) * pow(dd, 6) / 720))"
      + s" + 1e-9, 6)"),
    "lon" -> (s"round(${d(Lon0Deg)} + degrees((dd - (1 + 2 * bigt1 + bigc1)"
      + s" * pow(dd, 3) / 6"
      + s" + (5 - 2 * bigc1 + 28 * bigt1 - 3 * bigc1 * bigc1 + 8 * ${d(EP2)}"
      + s" + 24 * bigt1 * bigt1) * pow(dd, 5) / 120) / cp) + 1e-9, 6)"))
}
