package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NOT NULL constraints ([[MedallionTable.setNotNull]] — Delta's
  * `ALTER COLUMN … SET NOT NULL` parity): existing-null rejection at SET,
  * write-pass refusals on every path (append, omitted column, rewrite
  * update, DV update/merge), DROP re-opening, registry survival across
  * rewrites, and the SQL DDL surface.
  */
class NotNullSpec extends SparkSpec {
  import spark.implicits._

  test("SET validates existing rows; writes refuse NULLs and omitted " +
      "columns; DROP re-opens; registry survives rewrites") {
    val t = MedallionTable(spark, tmpDir("nn1"))
    t.overwrite(Seq((1L, Some("a")), (2L, None)).toDF("id", "s"))
    // existing NULL → SET refuses with the backfill hatch
    val e = intercept[IllegalArgumentException](t.setNotNull("s"))
    assert(e.getMessage.contains("backfill"))
    t.update(col("s").isNull, Map("s" -> lit("filled")))
    t.setNotNull("s")
    // append with a NULL refuses in-pass; batch does not land
    intercept[Exception](t.append(Seq((3L, null: String)).toDF("id", "s")))
    assert(t.read.count() == 2)
    // a batch OMITTING the column refuses too (it would read back NULL)
    intercept[Exception](t.append(Seq(4L).toDF("id")))
    assert(t.read.count() == 2)
    // rewrite UPDATE assigning NULL refuses
    intercept[Exception](
      t.update(col("id") === 1L, Map("s" -> lit(null).cast("string"))))
    // registry survives a rewrite swap (compact replaces _graft_meta)
    t.append(Seq((5L, "ok")).toDF("id", "s"))
    t.compact()
    intercept[Exception](t.append(Seq((6L, null: String)).toDF("id", "s")))
    // DROP re-opens
    t.dropNotNull("s")
    t.append(Seq((7L, null: String)).toDF("id", "s"))
    assert(t.read.filter(col("s").isNull).count() == 1)
  }

  test("DV paths are gated: updateVectored SET NULL and merge-dv INSERT " +
      "NULL refuse; valid DV writes land") {
    import MergeOps._
    val t = MedallionTable(spark, tmpDir("nn_dv"))
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    t.setNotNull("s")
    intercept[Exception](
      t.updateVectored(col("id") === 1L,
        Map("s" -> lit(null).cast("string"))))
    assert(t.read.filter(col("s").isNull).count() == 0)
    intercept[Exception](
      t.mergeVectored(Seq(9L).toDF("k"), Seq("id" -> "k"), Nil,
        Seq(WhenNotMatchedInsert(None,
          Map("id" -> ((_, sc: ColRef) => sc("k")))))))
    assert(t.read.count() == 2, "violating DV merge must not land")
    // valid DV update and merge still land
    t.updateVectored(col("id") === 1L, Map("s" -> lit("a2")))
    t.mergeVectored(Seq((9L, "n")).toDF("k", "v"), Seq("id" -> "k"), Nil,
      Seq(WhenNotMatchedInsert(None, Map(
        "id" -> ((_, sc: ColRef) => sc("k")),
        "s" -> ((_, sc: ColRef) => sc("v"))))))
    assert(t.read.count() == 3 &&
      t.read.filter(col("s").isNull).count() == 0)
  }

  test("SQL DDL surface: ALTER COLUMN SET/DROP NOT NULL round-trips") {
    val p = tmpDir("nn_sql")
    val t = MedallionTable(spark, p)
    t.overwrite(Seq((1L, "a")).toDF("id", "s"))
    spark.sql("DROP TABLE IF EXISTS nn_sql_t")
    spark.sql(s"CREATE TABLE nn_sql_t USING graft LOCATION '$p'")
    spark.sql("ALTER TABLE nn_sql_t ALTER COLUMN s SET NOT NULL")
    assert(t.notNullColumns == Set("s"))
    intercept[Exception](t.append(Seq((2L, null: String)).toDF("id", "s")))
    spark.sql("ALTER TABLE nn_sql_t ALTER COLUMN s DROP NOT NULL")
    assert(t.notNullColumns.isEmpty)
    t.append(Seq((2L, null: String)).toDF("id", "s"))
    assert(t.read.count() == 2)
  }
}
