package graft.pipeline

import java.sql.{Date, Timestamp}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reference-schema pipeline semantics on FIXTURES.md §B-shaped fixtures:
  * silver cleaning chains, merge-keyed idempotent sync, availability
  * datetimes, NN station assignment, and the gold wide join with the
  * leakage-column drop.
  */
class EnefitShapesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def dt(s: String) = Date.valueOf(s)

  private def trainDF = {
    import spark.implicits._
    Seq(
      (1, 1, 0, ts("2023-05-01 10:00:00"), 0, 10, 1L, 5.0, 3),
      (1, 1, 0, ts("2023-05-01 10:00:00"), 0, 10, 1L, 5.0, 3),   // dup
      (12, 1, 0, ts("2023-05-01 11:00:00"), 0, 11, 2L, 6.0, 3),  // county 12
      (2, 3, 1, ts("2023-05-01 12:00:00"), 1, 12, 3L, 7.5, 3)
    ).toDF("county", "product_type", "is_business", "datetime",
      "is_consumption", "prediction_unit_id", "row_id", "target", "data_block_id")
  }

  test("silverTrain: dedup + dropna + county-12 filter") {
    import spark.implicits._
    val withNull = trainDF.union(
      Seq((3, 2, 0, ts("2023-05-01 13:00:00"), 0, 13, 4L,
        null.asInstanceOf[java.lang.Double], 3))
        .toDF(trainDF.columns: _*))
    val out = EnefitShapes.silverTrain(withNull)
    assert(out.collect().map(_.getLong(6)).sorted.toSeq == Seq(1L, 3L))
  }

  test("Stage.sync is idempotent under re-run (merge keyed on row_id)") {
    val wh = tmpDir("enefit")
    val first = EnefitShapes.trainStage.sync(spark, wh, trainDF)
    val snap1 = first.collect().map(_.toSeq).toSet
    val second = EnefitShapes.trainStage.sync(spark, wh, trainDF)
    assert(second.collect().map(_.toSeq).toSet == snap1)
    assert(snap1.size == 2)
  }

  test("silverStations assigns unlabeled stations to nearest county, no collect") {
    import spark.implicits._
    val st = Seq(
      (java.lang.Integer.valueOf(1), "TARTU", 58.37, 26.73),
      (java.lang.Integer.valueOf(2), "TALLINN", 59.44, 24.75),
      (null.asInstanceOf[java.lang.Integer], null.asInstanceOf[String], 59.40, 24.70)
    ).toDF("county_id", "county_name", "latitude", "longitude")
    val out = EnefitShapes.silverStations(st)
    assert(out.count() == 3)
    val assigned = out.filter($"latitude" === 59.4).head()
    assert(assigned.getInt(0) == 2, "nearest is TALLINN")
    assert(assigned.getString(1) == "TALLINN")
  }

  test("historical weather: hour-gated availability + per-location averaging") {
    import spark.implicits._
    val wx = Seq(
      // two reports for the same (location, time): averaged (A1)
      (58.4, 26.7, ts("2023-05-01 09:00:00"), 10.0, 3),
      (58.4, 26.7, ts("2023-05-01 09:00:00"), 14.0, 3),
      (58.4, 26.7, ts("2023-05-01 15:00:00"), 20.0, 3)
    ).toDF("latitude", "longitude", "datetime", "temperature", "data_block_id")
    val map = Seq((1, 58.4, 26.7)).toDF("county_id", "latitude", "longitude")
    val out = EnefitShapes.silverHistoricalWeather(wx, map)
    val rows = out.select("datetime", "historical_weather_available_datetime", "temperature")
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getDouble(2))).toSet
    assert(rows == Set(
      (ts("2023-05-01 09:00:00"), ts("2023-05-02 09:00:00"), 12.0), // <11h → +1d, avg
      (ts("2023-05-01 15:00:00"), ts("2023-05-03 15:00:00"), 20.0)  // ≥11h → +2d
    ))
  }

  test("gold wide table: 4 left joins land values, leakage columns dropped") {
    import spark.implicits._
    val train = EnefitShapes.silverTrain(trainDF)
    val client = Seq(
      (1, 1, 0, dt("2023-05-01"), 5, 120.0, 3)
    ).toDF("product_type", "county", "is_business", "date",
      "eic_count", "installed_capacity", "data_block_id")
    val electricity = EnefitShapes.silverElectricity(Seq(
      (ts("2023-04-30 10:00:00"), 80.5, dt("2023-04-29"))
    ).toDF("forecast_date", "euros_per_mwh", "origin_date"))
    val gas = EnefitShapes.silverGas(Seq(
      (dt("2023-05-01"), 30.0, 45.0, dt("2023-04-30"))
    ).toDF("forecast_date", "lowest_price_per_mwh", "highest_price_per_mwh", "origin_date"))
      .withColumn("gas_data_block_id", lit(3))
    val wxAgg = EnefitShapes.silverHistoricalWeather(
      Seq((58.4, 26.7, ts("2023-04-30 10:00:00"), 12.0, 3))
        .toDF("latitude", "longitude", "datetime", "temperature", "data_block_id"),
      Seq((1, 58.4, 26.7)).toDF("county_id", "latitude", "longitude"))
      .withColumnRenamed("data_block_id", "wx_data_block_id")
      .drop("latitude", "longitude")

    val gold = EnefitShapes.goldWideTable(train, client, electricity, gas, wxAgg)
    assert(gold.count() == train.count())
    val c1 = gold.filter($"county" === 1).head()
    val get = gold.columns.zipWithIndex.toMap
    assert(c1.getInt(get("eic_count")) == 5)             // J2 landed
    assert(c1.getDouble(get("euros_per_mwh")) == 80.5)   // J3: datetime == avail(+1d)
    assert(c1.getDouble(get("lowest_price_per_mwh")) == 30.0) // J4 batch key
    assert(c1.getDouble(get("temperature")) == 12.0)     // J5: county+block+avail
    val leak = Seq("electricity_available_datetime", "gas_effective_date",
      "client_date", "county_id", "historical_weather_available_datetime")
    assert(leak.forall(!gold.columns.contains(_)), s"leakage cols present")
  }
}
