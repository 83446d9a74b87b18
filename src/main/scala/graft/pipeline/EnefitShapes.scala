package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Geo
import graft.table.MedallionTable

/** The reference's domain pipeline, faithful to FIXTURES.md §B schemas:
  * every silver cleaning chain, merge-key set, and derived availability
  * column from `silver_table_creation.py`, and the gold wide-table build
  * from `gold_table_creation.py` — re-expressed Spark-first. This is the
  * switch-over surface: a user of the reference runs these stage functions
  * on their own tables.
  *
  * Each `silver*` function is the exact transform chain; `Stage.sync`
  * applies the reference's create-or-3-clause-merge control flow
  * (`silver_table_creation.py:43-66`) against a [[MedallionTable]].
  */
object EnefitShapes {

  /** create-on-first-run / full-sync-merge-on-rerun, keyed per table
    * (the reference's try-save-except-merge, exception-free).
    */
  case class Stage(name: String, keys: Seq[String],
      transform: DataFrame => DataFrame) {
    def sync(spark: SparkSession, warehouse: String, bronze: DataFrame): DataFrame = {
      val silver = transform(bronze)
      MedallionTable(spark, s"$warehouse/silver/$name")
        .createOrMerge(silver, keys)
      MedallionTable(spark, s"$warehouse/silver/$name").read
    }
  }

  /** train: dedup → dropna → drop unknown county 12; merge key row_id
    * (`silver_table_creation.py:28-66`).
    */
  def silverTrain(df: DataFrame): DataFrame =
    df.dropDuplicates()
      .na.drop("any")
      .filter(col("county") =!= 12)

  val trainStage: Stage = Stage("train", Seq("row_id"), silverTrain)

  /** client: dedup → dropna; composite key (`silver_table_creation.py:72-112`). */
  def silverClient(df: DataFrame): DataFrame =
    df.dropDuplicates().na.drop("any")

  val clientStage: Stage =
    Stage("client", Seq("product_type", "county", "is_business", "date"), silverClient)

  /** electricity: rename forecast_date → effective datetime, derive the
    * +1-day availability timestamp (`silver_table_creation.py:117-149`).
    */
  def silverElectricity(df: DataFrame): DataFrame =
    df.dropDuplicates().na.drop("any")
      .withColumnRenamed("forecast_date", "electricity_effective_datetime")
      .withColumn("electricity_available_datetime",
        expr("electricity_effective_datetime + INTERVAL 1 DAY"))

  val electricityStage: Stage =
    Stage("electricity", Seq("electricity_effective_datetime"), silverElectricity)

  /** gas: rename forecast_date → effective date (`silver_table_creation.py:180-230`). */
  def silverGas(df: DataFrame): DataFrame =
    df.dropDuplicates().na.drop("any")
      .withColumnRenamed("forecast_date", "gas_effective_date")

  val gasStage: Stage = Stage("gas", Seq("gas_effective_date"), silverGas)

  /** station map: ROUND(coords, 1) projection, then Spark-native NN
    * assignment of unlabeled stations + union
    * (`silver_table_creation.py:236-300`, J7 rewrite — no collect()).
    */
  def silverStations(df: DataFrame): DataFrame = {
    val st = df.selectExpr("county_id", "county_name",
      "ROUND(latitude, 1) AS latitude", "ROUND(longitude, 1) AS longitude")
    val labeled = st.filter(col("county_id").isNotNull)
    val lab = labeled.select(col("county_id").as("lid"),
      col("county_name").as("lname"), col("latitude").as("llat"),
      col("longitude").as("llon"))
    val w = Window.partitionBy(col("latitude"), col("longitude"))
      .orderBy(col("dist"), col("lid"))
    val assigned = st.filter(col("county_id").isNull)
      .drop("county_id", "county_name")
      .crossJoin(broadcast(lab))
      .withColumn("dist",
        Geo.haversineKm(col("latitude"), col("longitude"), col("llat"), col("llon")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("lid").as("county_id"), col("lname").as("county_name"),
        col("latitude"), col("longitude"))
    labeled.unionByName(assigned) // U1
  }

  /** historical weather: hour-dependent +1/+2-day availability datetime
    * (`silver_table_creation.py:306-394`), per-(location, time) averaging
    * over the dynamic measure list (A1, `:347-361`).
    */
  def silverHistoricalWeather(df: DataFrame, stationMap: DataFrame): DataFrame = {
    val cleaned = df.dropDuplicates().na.drop("any")
      .withColumn("historical_weather_available_datetime",
        expr("CASE WHEN HOUR(datetime) < 11 THEN datetime + INTERVAL 1 DAY " +
             "ELSE datetime + INTERVAL 2 DAY END"))
    val joined = cleaned.join(stationMap.select("county_id", "latitude", "longitude"),
      Seq("latitude", "longitude"), "left") // J1
      .na.drop("any")
    // A1: group keys vs averaged measures derived from runtime columns
    val keys = Seq("latitude", "longitude", "county_id", "data_block_id",
      "datetime", "historical_weather_available_datetime")
    val measures = joined.columns.filterNot(keys.contains).toSeq
    joined.groupBy(keys.map(col): _*)
      .agg(measures.head -> "avg", measures.tail.map(_ -> "avg"): _*)
      .select(keys.map(col) ++
        measures.map(m => col(s"avg($m)").as(m)): _*)
  }

  def historicalWeatherStage(stationMap: DataFrame): Stage =
    Stage("historical_weather",
      Seq("latitude", "longitude", "historical_weather_available_datetime", "datetime"),
      silverHistoricalWeather(_, stationMap))

  /** gold: train ⟕ client (J2, 4-col) ⟕ electricity (J3) ⟕ gas (J4) ⟕
    * averaged weather (J5) with the leakage-column drop
    * (`gold_table_creation.py:33-164`).
    */
  def goldWideTable(train: DataFrame, client: DataFrame, electricity: DataFrame,
      gas: DataFrame, weatherAgg: DataFrame): DataFrame = {
    val c = client.withColumnRenamed("date", "client_date")
    val step1 = train.join(c,
      train("product_type") === c("product_type") &&
        train("county") === c("county") &&
        train("is_business") === c("is_business") &&
        train("data_block_id") === c("data_block_id"), "left")
      .drop(c("product_type")).drop(c("county"))
      .drop(c("is_business")).drop(c("data_block_id"))
    val step2 = step1.join(electricity,
      step1("datetime") === electricity("electricity_available_datetime"), "left")
    val step3 = step2.join(gas,
      step2("data_block_id") === gas("gas_data_block_id"), "left")
    val w = weatherAgg
    val step4 = step3.join(w,
      step3("data_block_id") === w("wx_data_block_id") &&
        step3("county") === w("county_id") &&
        step3("datetime") === w("historical_weather_available_datetime"), "left")
    step4.drop("electricity_effective_datetime", "electricity_available_datetime",
      "gas_effective_date", "gas_data_block_id", "client_date",
      "wx_data_block_id", "county_id", "historical_weather_available_datetime")
  }
}
