package graft

import graft.operators.Geo
import org.apache.spark.sql.functions._

/** Geospatial filter semantics: haversine properties on known points,
  * bbox-then-radius composition, synthetic-coordinate ranges. */
class GeoSpec extends SparkSpec {

  test("haversine: zero at the center, symmetric, matches a known distance") {
    import spark.implicits._
    val pts = Seq(
      (1L, Geo.CenterLat, Geo.CenterLon), // the center itself
      (2L, Geo.CenterLat + 1.0, Geo.CenterLon), // 1° of latitude ≈ 111.19 km
      (3L, -Geo.CenterLat, -Geo.CenterLon))
      .toDF("id", "lat", "lon")
    val d = pts.select(col("id"),
        Geo.haversineKm(col("lat"), col("lon"), Geo.CenterLat, Geo.CenterLon).as("km"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d(1L) == 0.0, s"distance at the center must be exactly 0: ${d(1L)}")
    // 1° meridian arc on the 6371 km sphere: 6371·π/180 = 111.1949 km
    assert(math.abs(d(2L) - 111.1949) < 0.001, s"1° latitude distance off: ${d(2L)}")
    // swapping the roles of point and center must give the same distance
    val back = pts.filter(col("id") === 3)
      .select(Geo.haversineKm(lit(Geo.CenterLat), lit(Geo.CenterLon),
        -Geo.CenterLat, -Geo.CenterLon).as("km"))
      .head().getDouble(0)
    assert(math.abs(d(3L) - back) < 1e-9, s"haversine asymmetric: ${d(3L)} vs $back")
  }

  test("q33: every result is inside both the bbox and the radius") {
    val res = Geo.q33GeoFilter(spark, sfDir)
    val rows = res.collect()
    assert(rows.nonEmpty, "geo filter returned no rows")
    rows.foreach { r =>
      val (lat, lon, km) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(lat >= Geo.LatMin && lat <= Geo.LatMax &&
        lon >= Geo.LonMin && lon <= Geo.LonMax, s"row outside bbox: $r")
      assert(km <= Geo.RadiusKm, s"row outside radius: $r")
    }
    // the bbox is wider than the circle on two sides, so the radius
    // predicate must actually reject some bbox survivors
    val boxedOnly = Geo.bbox(
      Geo.synthCoords(Tables.load(spark, sfDir, "customer")),
      Geo.LatMin, Geo.LatMax, Geo.LonMin, Geo.LonMax).count()
    assert(boxedOnly > rows.length,
      s"radius predicate rejected nothing: bbox=$boxedOnly radius=${rows.length}")
  }

  test("no synthetic point sits near the radius boundary (flip-proof gate)") {
    // The q33 radius predicate is a raw double compare. A Spark/DuckDB
    // flip would need a row's distance within libm drift (~1e-9 km
    // absolute) of RadiusKm; assert the whole sf0.1 coordinate grid —
    // a superset of the sf0.01/sf0.001 key spaces the oracle gate runs
    // on — keeps a gap at least four orders of magnitude wider.
    val minGap = Geo.synthCoords(Tables.load(spark, sfDir, "customer"))
      .select(abs(Geo.haversineKm(col("lat"), col("lon"),
        Geo.CenterLat, Geo.CenterLon) - Geo.RadiusKm).as("gap"))
      .agg(min("gap")).head().getDouble(0)
    assert(minGap > 1e-5,
      f"a synthetic point is $minGap%.2e km from the radius boundary — " +
        "the raw-compare predicate is no longer provably engine-stable")
  }

  test("geo clusters partition the viewport and centroids stay in-cell") {
    val boxed = Geo.bbox(
      Geo.synthCoords(Tables.load(spark, sfDir, "customer")),
      Geo.LatMin, Geo.LatMax, Geo.LonMin, Geo.LonMax).count()
    val cells = Geo.q38GeoCluster(spark, sfDir).collect()
    assert(cells.map(_.getLong(2)).sum == boxed,
      "cluster counts do not partition the boxed points")
    cells.foreach { r =>
      val (cla, clo) = (r.getLong(0), r.getLong(1))
      val (lat, lon) = (r.getDouble(3), r.getDouble(4))
      assert(lat >= cla * 5.0 - 90.0 && lat < (cla + 1) * 5.0 - 90.0,
        s"centroid lat outside its cell: $r")
      assert(lon >= clo * 5.0 - 180.0 && lon < (clo + 1) * 5.0 - 180.0,
        s"centroid lon outside its cell: $r")
    }
  }

  test("synthetic coordinates stay in range and are deterministic") {
    val g = Geo.synthCoords(Tables.load(spark, sfDir, "customer"))
    val mm = g.agg(min("lat"), max("lat"), min("lon"), max("lon")).head()
    assert(mm.getDouble(0) >= -60.0 && mm.getDouble(1) < 60.0, s"lat range: $mm")
    assert(mm.getDouble(2) >= -180.0 && mm.getDouble(3) < 180.0, s"lon range: $mm")
  }
}
