package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic helpers for the station→county nearest-neighbor assignment
  * (reference: driver-side geopy loop at `silver_table_creation.py:260-278`,
  * rewritten Spark-native per SURVEY.md §2.4 J7).
  *
  * Pure `Column` composition of codegen'd builtins — no UDF, stays inside
  * whole-stage codegen. Haversine (spherical) rather than geopy's WGS-84
  * geodesic: up to ~0.5% distance difference (SURVEY.md §7.4); the oracle
  * uses the same formula so differential tests are exact.
  */
object Geo {
  val EarthRadiusKm = 6371.0

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2), degrees in. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    lit(2 * EarthRadiusKm) * asin(sqrt(
      pow(sin(dLat), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)))
  }
}
