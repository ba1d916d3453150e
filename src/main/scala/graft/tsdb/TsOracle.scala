package graft.tsdb

import Constants._

/** DuckDB oracle SQL for the station-timeseries operators.
  *
  * The shared CTE prelude re-derives the same "world" (grid, daily
  * series, station registry, neighbor ranking, MA means) with the same
  * constants and rounding as the Spark implementations, so results are
  * comparable value-for-value.
  */
object TsOracle {

  /** Shared CTEs (station world + daily series). */
  val world: String = s"""
    stations AS (SELECT DISTINCT user_id::BIGINT AS station_id FROM events),
    bounds AS (SELECT min(ts)::date AS d0, max(ts)::date AS d1 FROM events),
    grid AS (
      SELECT s.station_id, unnest(generate_series(b.d0::timestamp, b.d1::timestamp, INTERVAL 1 DAY))::date AS day
      FROM stations s, bounds b),
    daily AS (
      SELECT user_id::BIGINT AS station_id, ts::date AS day,
             round(sum(value), 3) AS raw, count(value) AS n_obs
      FROM events GROUP BY 1, 2),
    raw_daily AS (
      SELECT g.station_id, g.day, d.raw, coalesce(d.n_obs, 0) AS n_obs
      FROM grid g LEFT JOIN daily d USING (station_id, day)),
    meta AS (
      SELECT station_id,
        (station_id % $GridW)::DOUBLE AS x,
        (station_id // $GridW)::DOUBLE AS y,
        ((station_id * $ElevMul) % $ElevMod)::DOUBLE AS elev,
        ((station_id * $HorizonMul) % $HorizonMod)::DOUBLE AS horizon
      FROM stations),
    pairs AS (
      SELECT a.station_id, b.station_id AS nb_id,
        (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2,
        a.elev AS elev, b.elev AS nb_elev
      FROM meta a JOIN meta b ON a.station_id != b.station_id),
    knn AS (
      SELECT station_id, nb_id, rank, d2 FROM (
        SELECT station_id, nb_id, d2,
          row_number() OVER (PARTITION BY station_id ORDER BY d2, nb_id) AS rank
        FROM pairs) WHERE rank <= $NeighborK),
    ma_raw AS (SELECT station_id, round(avg(raw), 6) AS ma FROM raw_daily GROUP BY 1),
    ref_daily AS (
      SELECT user_id::BIGINT AS station_id, ts::date AS day, round(sum(value), 3) AS ref
      FROM events WHERE event_type != 'error' GROUP BY 1, 2)"""

  val qMetaDerive: String = s"""
    WITH $world
    SELECT m.station_id, m.x, m.y, m.elev, m.horizon,
           o.raw_from, o.raw_until, o.n_obs
    FROM meta m JOIN (
      SELECT user_id::BIGINT AS station_id, min(ts)::date AS raw_from,
             max(ts)::date AS raw_until, count(*) AS n_obs
      FROM events GROUP BY 1) o USING (station_id)
    ORDER BY station_id"""

  val qExpandGrid: String = s"""
    WITH $world
    SELECT station_id, day, raw, n_obs FROM raw_daily ORDER BY station_id, day"""

  val qKnnDist: String = s"""
    WITH $world
    SELECT station_id, rank, nb_id, round(sqrt(d2), 6) AS dist
    FROM knn ORDER BY station_id, rank"""

  val qKnnElev: String = s"""
    WITH $world,
    wpairs AS (
      SELECT station_id, nb_id,
        sqrt(d2) * (1.0 + pow(abs(elev - nb_elev) / $PElev1, $PElev2)) AS wdist
      FROM pairs),
    wknn AS (
      SELECT station_id, nb_id, wdist,
        row_number() OVER (PARTITION BY station_id ORDER BY wdist, nb_id) AS rank
      FROM wpairs)
    SELECT station_id, rank, nb_id, round(wdist, 6) AS wdist
    FROM wknn WHERE rank <= $NeighborK ORDER BY station_id, rank"""

  val qQcRange: String = s"""
    WITH $world
    SELECT station_id, day, raw,
      CASE WHEN raw < 0 OR raw >= $RangeMax THEN NULL ELSE raw END AS qc
    FROM raw_daily ORDER BY station_id, day"""

  /** Per-row membership in a >=3-run of equal rounded values. */
  private val repeatsRun: String = s"""
      SELECT station_id, day, raw, round(raw, $RepeatRound) AS r,
        lag(round(raw, $RepeatRound), 1) OVER w AS l1,
        lag(round(raw, $RepeatRound), 2) OVER w AS l2,
        lead(round(raw, $RepeatRound), 1) OVER w AS n1,
        lead(round(raw, $RepeatRound), 2) OVER w AS n2
      FROM raw_daily
      WINDOW w AS (PARTITION BY station_id ORDER BY day)"""

  val qQcRepeats: String = s"""
    WITH $world,
    rep AS ($repeatsRun)
    SELECT station_id, day, raw,
      CASE WHEN r IS NOT NULL AND r > $RepeatLimit AND (
          (r IS NOT DISTINCT FROM l1 AND r IS NOT DISTINCT FROM l2) OR
          (r IS NOT DISTINCT FROM l1 AND r IS NOT DISTINCT FROM n1) OR
          (r IS NOT DISTINCT FROM n1 AND r IS NOT DISTINCT FROM n2))
        THEN NULL ELSE raw END AS qc
    FROM rep ORDER BY station_id, day"""

  private val spikeRun: String = s"""
      SELECT station_id, day, raw,
        lag(coalesce(raw, 0), 1) OVER w AS pv,
        lead(coalesce(raw, 0), 1) OVER w AS nv
      FROM raw_daily
      WINDOW w AS (PARTITION BY station_id ORDER BY day)"""

  val qQcSpike: String = s"""
    WITH $world,
    sp AS ($spikeRun)
    SELECT station_id, day, raw,
      CASE WHEN raw > $SpikeThreshold AND pv = 0 AND nv = 0
        THEN NULL ELSE raw END AS qc
    FROM sp ORDER BY station_id, day"""

  private val dailyCmpFail: String = s"""
      (coalesce(raw, 0) = 0 AND coalesce(ref, 0) != 0) OR
      (raw IS NOT NULL AND ref IS NOT NULL AND raw >= $DailyCmpMin AND raw >= ref * 2)"""

  val qQcDailyCompare: String = s"""
    WITH $world,
    j AS (SELECT r.station_id, r.day, r.raw, f.ref
          FROM raw_daily r LEFT JOIN ref_daily f USING (station_id, day))
    SELECT station_id, day, raw, ref,
      ($dailyCmpFail) AS day_failed,
      CASE WHEN ($dailyCmpFail) THEN NULL ELSE raw END AS qc
    FROM j ORDER BY station_id, day"""

  private val nbMedianCte: String = s"""
    coefs AS (
      SELECT k.station_id, k.nb_id,
        round(ms.ma - mo.ma, 6) AS coef
      FROM knn k
      JOIN ma_raw ms ON ms.station_id = k.station_id
      JOIN ma_raw mo ON mo.station_id = k.nb_id),
    nb_med AS (
      SELECT c.station_id, s.day, round(median(s.raw + c.coef), 6) AS nbs_median
      FROM coefs c JOIN raw_daily s ON s.station_id = c.nb_id
      GROUP BY c.station_id, s.day)"""

  val qQcNeighborMedian: String = s"""
    WITH $world,
    $nbMedianCte
    SELECT r.station_id, r.day, r.raw, m.nbs_median,
      CASE WHEN abs(r.raw - m.nbs_median) > $NeighborMedianMaxDiff
        THEN NULL ELSE r.raw END AS qc
    FROM raw_daily r LEFT JOIN nb_med m USING (station_id, day)
    ORDER BY r.station_id, r.day"""

  /** Combined QC (all rules) as a reusable CTE tail. */
  val qcAllCte: String = s"""
    $nbMedianCte,
    qc_parts AS (
      SELECT r.station_id, r.day, r.raw, r.n_obs,
        (r.raw < 0 OR r.raw >= $RangeMax) AS f_range,
        (rep.r IS NOT NULL AND rep.r > $RepeatLimit AND (
          (rep.r IS NOT DISTINCT FROM rep.l1 AND rep.r IS NOT DISTINCT FROM rep.l2) OR
          (rep.r IS NOT DISTINCT FROM rep.l1 AND rep.r IS NOT DISTINCT FROM rep.n1) OR
          (rep.r IS NOT DISTINCT FROM rep.n1 AND rep.r IS NOT DISTINCT FROM rep.n2))) AS f_rep,
        (r.raw > $SpikeThreshold AND sp.pv = 0 AND sp.nv = 0) AS f_spike,
        ((coalesce(r.raw, 0) = 0 AND coalesce(f.ref, 0) != 0) OR
         (r.raw IS NOT NULL AND f.ref IS NOT NULL AND r.raw >= $DailyCmpMin AND r.raw >= f.ref * 2)) AS f_daily,
        (abs(r.raw - m.nbs_median) > $NeighborMedianMaxDiff) AS f_nb
      FROM raw_daily r
      JOIN ($repeatsRun) rep USING (station_id, day)
      JOIN ($spikeRun) sp USING (station_id, day)
      LEFT JOIN ref_daily f USING (station_id, day)
      LEFT JOIN nb_med m USING (station_id, day)),
    qc_all AS (
      SELECT station_id, day, raw, n_obs,
        CASE WHEN raw IS NOT NULL AND NOT coalesce(f_range, false)
               AND NOT coalesce(f_rep, false) AND NOT coalesce(f_spike, false)
               AND NOT coalesce(f_daily, false) AND NOT coalesce(f_nb, false)
          THEN raw ELSE NULL END AS qc
      FROM qc_parts)"""

  val qQcAll: String = s"""
    WITH $world,
    $qcAllCte
    SELECT station_id, day, raw, n_obs, qc FROM qc_all ORDER BY station_id, day"""

  val qQcDroppedShare: String = s"""
    WITH $world,
    $qcAllCte
    SELECT station_id,
      round((count(raw) - count(qc))::DOUBLE / count(raw), 4) * 100 AS qc_dropped
    FROM qc_all GROUP BY station_id ORDER BY station_id"""

  val all: Map[String, String] = Map(
    "q_meta_derive" -> qMetaDerive,
    "q_expand_grid" -> qExpandGrid,
    "q_knn_dist" -> qKnnDist,
    "q_knn_elev" -> qKnnElev,
    "q_qc_range" -> qQcRange,
    "q_qc_repeats" -> qQcRepeats,
    "q_qc_spike" -> qQcSpike,
    "q_qc_daily_compare" -> qQcDailyCompare,
    "q_qc_neighbor_median" -> qQcNeighborMedian,
    "q_qc_all" -> qQcAll,
    "q_qc_dropped_share" -> qQcDroppedShare)
}
