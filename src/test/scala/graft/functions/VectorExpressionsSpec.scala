package graft.functions

import graft.SparkSpec
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** The native codegen'd vector expressions must agree bit-for-bit with the
  * declarative HOF formulation (same index-order accumulation), handle
  * nulls, and register through both extension paths.
  */
class VectorExpressionsSpec extends SparkSpec {

  test("graft_dot / graft_cosine match HOF accumulation bit-for-bit") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val a = emb.filter($"vec_id" < 30).select($"vec_id".as("ia"), $"v".as("va"))
    val b = emb.filter($"vec_id" >= 30 && $"vec_id" < 60)
      .select($"vec_id".as("ib"), $"v".as("vb"))
    val hofDot = aggregate(zip_with($"va", $"vb", (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val hofNorm = (c: org.apache.spark.sql.Column) =>
      sqrt(aggregate(transform(c, x => x * x), lit(0.0), (acc, x) => acc + x))
    val cmp = a.crossJoin(b).select(
      call_function("graft_dot", $"va", $"vb").as("nd"),
      hofDot.as("hd"),
      call_function("graft_cosine", $"va", $"vb").as("nc"),
      (hofDot / (hofNorm($"va") * hofNorm($"vb"))).as("hc"))
    val rows = cmp.collect()
    assert(rows.length == 900)
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot mismatch")
      assert(r.getDouble(2) == r.getDouble(3), "cosine mismatch")
    }
  }

  test("null inputs yield null, and SQL registration works end-to-end") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
      "graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS n").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.isNullAt(1))
  }

  test("orthogonal and antiparallel vectors") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(0.0d, 2.0d)) AS o, " +
      "graft_cosine(array(1.0d, 1.0d), array(-1.0d, -1.0d)) AS ap").head()
    assert(r.getDouble(0) == 0.0)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-15)
  }
}
