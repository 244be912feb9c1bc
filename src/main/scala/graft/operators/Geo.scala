package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial primitives: great-circle distance and the grid-bucketed
  * radius join. The engine's point data is (lat, lon) double columns —
  * no geometry dependency; the two operators here cover the pipeline
  * uses (nearest-facility enrichment, geo-dedup of scraped documents
  * with coordinates, store-catchment joins) with plain Catalyst
  * expressions and ONE equi-join shuffle.
  */
object Geo {

  /** Mean Earth radius (km), the haversine convention. */
  val EarthRadiusKm = 6371.0

  /** Great-circle distance in km (haversine form — numerically stable
    * for the small distances a radius join filters on, where the
    * spherical law of cosines loses all precision). Formula is kept in
    * the engine-portable subset (sin/cos/asin/sqrt/radians) so the SQL
    * oracle states the IDENTICAL expression. */
  def haversineKm(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val h = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    // least() guards the asin domain against h = 1 + 1ulp from the
    // antipodal rounding edge
    lit(2.0 * EarthRadiusKm) * asin(sqrt(least(h, lit(1.0))))
  }

  /** All (a, b) pairs within `radiusKm` great-circle km — WITHOUT the
    * all-pairs cross join. Both sides bucket into square grid cells of
    * `cellDeg` degrees; side b is replicated into its 3x3 neighbor
    * cells (9 rows, each carrying only the join payload); the
    * candidate join is a plain hash EQUI-join on the cell id, and the
    * exact haversine predicate filters candidates. At 100 TB this is
    * the standard spatial-join shape: shuffle keys are (cellX, cellY)
    * ints, candidate fan-in per cell is density-bounded, and no
    * geometry library or R-tree is needed for point-radius duty.
    *
    * Correctness bound (asserted): the 3x3 neighborhood covers the
    * radius only while one cell spans it in BOTH axes. A lat degree is
    * ~111.19 km everywhere; a lon degree shrinks by cos(lat), so the
    * caller passes `maxAbsLat` (default 60°, cos >= 0.5) and the cell
    * is sized 2·radius/111 deg — >= the worst-case lon radius inside
    * the band. Rows outside the band are rejected loudly rather than
    * silently dropped from the candidate set.
    *
    * Output: every column of `a` and `b` plus `dist_km`. */
  def radiusJoin(a: DataFrame, b: DataFrame,
      latA: String, lonA: String, latB: String, lonB: String,
      radiusKm: Double, maxAbsLat: Double = 60.0): DataFrame = {
    require(radiusKm > 0.0, "radiusKm must be positive")
    require(maxAbsLat < 89.0, "grid cells degenerate at the poles")
    val cellDeg = 2.0 * radiusKm / 111.0
    require(cellDeg >= radiusKm / (111.19 * math.cos(math.toRadians(maxAbsLat))),
      s"cell ${cellDeg}deg cannot cover ${radiusKm}km at lat ${maxAbsLat}")
    // the guard REPLACES the lat column (a dropped side-column would be
    // pruned out of the plan and never evaluate)
    def guard(df: DataFrame, latCol: String): DataFrame =
      df.withColumn(latCol,
        when(abs(col(latCol)) <= maxAbsLat, col(latCol)).otherwise(
          raise_error(concat(lit(s"radiusJoin: |lat| > $maxAbsLat: "),
            col(latCol).cast("string")))))
    // Longitude cells form a MODULAR ring: haversine is antimeridian-
    // correct (sin(dLon/2) is periodic), so a pair straddling ±180°
    // is a real neighbor — plain floor cells would never join it.
    // Equal-width ring cells (360/nLon, each >= cellDeg) keep "within
    // radius => adjacent ring cells" true even at the seam; a thin
    // remainder cell would break that with a 2-step straddle.
    val nLon = math.max(1L, (360.0 / cellDeg).toLong)
    val lonCell = 360.0 / nLon
    def lonIdx(lon: Column): Column =
      pmod(floor((lon + 180.0) / lonCell), lit(nLon))
    val ga = guard(a, latA)
      .withColumn("__cx", lonIdx(col(lonA)))
      .withColumn("__cy", floor(col(latA) / cellDeg))
    val off = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    val gb = guard(b, latB)
      .withColumn("__o", explode(off))
      .withColumn("__cx", pmod(lonIdx(col(lonB)) + col("__o.dx"), lit(nLon)))
      .withColumn("__cy", floor(col(latB) / cellDeg) + col("__o.dy"))
      .drop("__o")
    val d = haversineKm(col(latA), col(lonA), col(latB), col(lonB))
    ga.join(gb, Seq("__cx", "__cy"))
      .withColumn("dist_km", d)
      .filter(col("dist_km") <= radiusKm)
      .drop("__cx", "__cy")
  }
}
