package graft.ops

import graft.SparkSpec
import graft.table.MedallionTable

/** Catalog-surface behaviors the oracle queries can't reach: pushdown
  * through the named table, snapshot write-refusal, missing-option
  * errors, and truncate semantics of INSERT OVERWRITE.
  */
class GraftSqlSourceSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def freshTable(name: String): (String, MedallionTable) = {
    val p = tmpDir(name)
    (p, new MedallionTable(spark, p))
  }

  test("CREATE TABLE … PARTITIONED BY writes hive-partitioned dirs via SQL") {
    import spark.implicits._
    val (p, t) = freshTable("cat_part")
    spark.sql("DROP TABLE IF EXISTS cat_part_t")
    spark.sql(s"CREATE TABLE cat_part_t (id BIGINT, blk INT) USING graft " +
      s"PARTITIONED BY (blk) LOCATION '$p'")
    (1L to 20L).map(i => (i, (i % 3).toInt)).toDF("id", "blk")
      .createOrReplaceTempView("cat_part_src")
    spark.sql("INSERT INTO cat_part_t SELECT * FROM cat_part_src")
    // the write landed hive-partitioned: blk=N directories on disk
    val dirs = new java.io.File(p).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("blk=")).sorted
    assert(dirs.toSeq == Seq("blk=0", "blk=1", "blk=2"))
    // partition-pruned read returns the right slice
    assert(spark.sql("SELECT COUNT(*) FROM cat_part_t WHERE blk = 1")
      .collect()(0).getLong(0) == 7)
    assert(t.read.count() == 20)
    // non-identity transforms refuse instead of silently ignoring
    spark.sql("DROP TABLE IF EXISTS cat_part_bad")
    val e = intercept[Exception] {
      spark.sql("DROP TABLE IF EXISTS cat_part_bad")
      spark.sql(s"CREATE TABLE cat_part_bad (id BIGINT, b INT) USING graft " +
        s"PARTITIONED BY (bucket(4, b)) LOCATION '${tmpDir("cat_part_bad")}'")
      Seq((1L, 1)).toDF("id", "b").createOrReplaceTempView("cat_part_bad_src")
      spark.sql("INSERT INTO cat_part_bad SELECT * FROM cat_part_bad_src")
    }
    assert(e.getMessage.contains("identity"), e.getMessage)
  }

  test("CREATE TABLE AS SELECT materializes through the write bridge") {
    val p = tmpDir("cat_ctas")
    spark.sql("DROP TABLE IF EXISTS cat_ctas_t")
    spark.sql(s"CREATE TABLE cat_ctas_t USING graft LOCATION '$p' " +
      "AS SELECT id, id * 2 AS v FROM RANGE(10)")
    assert(spark.sql("SELECT SUM(v) FROM cat_ctas_t").collect()(0).getLong(0) == 90)
    assert(new MedallionTable(spark, p).read.count() == 10)
  }

  test("INSERT OVERWRITE replaces through the commit protocol") {
    import spark.implicits._
    val (p, t) = freshTable("cat_ovw")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    spark.sql("DROP TABLE IF EXISTS cat_ovw_t")
    spark.sql(s"CREATE TABLE cat_ovw_t USING graft LOCATION '$p'")
    Seq((9L, "z")).toDF("id", "s").createOrReplaceTempView("cat_ovw_src")
    spark.sql("INSERT OVERWRITE cat_ovw_t SELECT * FROM cat_ovw_src")
    assert(spark.sql("SELECT id, s FROM cat_ovw_t").collect().map(
      r => (r.getLong(0), r.getString(1))).toSet == Set((9L, "z")))
    // and the API read agrees — one table, two surfaces
    assert(t.read.count() == 1)
  }

  test("filters and projection reach the inner parquet scan") {
    import spark.implicits._
    val (p, t) = freshTable("cat_push")
    t.overwrite((1L to 100L).map(i => (i, s"s$i", i * 2)).toDF("id", "s", "v"))
    spark.sql("DROP TABLE IF EXISTS cat_push_t")
    spark.sql(s"CREATE TABLE cat_push_t USING graft LOCATION '$p'")
    val df = spark.sql("SELECT v FROM cat_push_t WHERE id > 90")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == (91L to 100L).map(_ * 2))
    // The V1 bridge re-declares the scan as a DataFrame, so the executed
    // plan contains a parquet scan whose pushed filters include id.
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("PushedFilters") && executed.contains("id"),
      s"expected pushed filter on id in:\n$executed")
  }

  test("versionAsOf pins a snapshot and refuses writes") {
    import spark.implicits._
    val (p, _) = freshTable("cat_ver")
    val t = new MedallionTable(spark, p, retainVersions = 2)
    t.overwrite(Seq((1L, 10.0)).toDF("id", "x"))
    t.merge(Seq((1L, 99.0), (2L, 5.0)).toDF("id", "x"), Seq("id"))
    spark.sql("DROP TABLE IF EXISTS cat_ver_t")
    spark.sql(s"CREATE TABLE cat_ver_t USING graft LOCATION '$p' " +
      "OPTIONS (versionAsOf 1)")
    assert(spark.sql("SELECT id, x FROM cat_ver_t").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet == Set((1L, 10.0)))
    Seq((3L, 1.0)).toDF("id", "x").createOrReplaceTempView("cat_ver_src")
    val e = intercept[Exception](
      spark.sql("INSERT INTO cat_ver_t SELECT * FROM cat_ver_src"))
    assert(e.getMessage.contains("read-only"),
      s"expected a read-only refusal, got: ${e.getMessage}")
  }

  test("missing LOCATION is a clear error") {
    val e = intercept[Exception](
      spark.read.format("graft").load())
    assert(e.getMessage.toLowerCase.contains("path") ||
      e.getMessage.contains("LOCATION"))
  }
}
