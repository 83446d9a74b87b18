package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck model check over the round-11 metadata features: a random
  * SEQUENCE of table operations — append, vectored delete, rename,
  * OPTIMIZE (materialize), plain delete — must leave the table
  * row-identical to a driver-side model that replays the same ops on a
  * plain list. This is the composition guarantee the per-feature specs
  * can't give: any interleaving of soft deletes, renames and rewrites
  * reads back the same rows.
  */
object TableOpsPropertySpec extends Properties("TableOps") {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", false)
      .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  // model row: (id, v); the value column's LOGICAL name evolves with
  // renames, the model tracks it alongside
  private sealed trait Op
  private case class Append(rows: List[(Long, Long)]) extends Op
  private case class DeleteVec(mod: Long, rem: Long) extends Op
  private case class DeleteRewrite(mod: Long, rem: Long) extends Op
  private case object Rename extends Op
  private case object Optimize extends Op

  private val appendGen = Gen.listOfN(8,
    Gen.zip(Gen.choose(0L, 500L), Gen.choose(0L, 99L))).map(Append(_))
  private val delVecGen = Gen.zip(Gen.choose(2L, 7L), Gen.choose(0L, 6L))
    .map { case (m, r) => DeleteVec(m, r % m) }
  private val delRwGen = Gen.zip(Gen.choose(2L, 7L), Gen.choose(0L, 6L))
    .map { case (m, r) => DeleteRewrite(m, r % m) }
  private val opGen: Gen[Op] = Gen.frequency(
    3 -> appendGen, 3 -> delVecGen, 1 -> delRwGen,
    1 -> Gen.const(Rename), 1 -> Gen.const(Optimize))

  private var n = 0
  property("any op sequence ≡ the driver-side model") =
    Prop.forAllNoShrink(Gen.listOfN(6, opGen)) { ops =>
      import spark.implicits._
      n += 1
      val p = java.nio.file.Files
        .createTempDirectory(s"tops$n").toString + "/t"
      val t = MedallionTable(spark, p)
      t.overwrite((0L until 40L).map(i => (i, i % 10)).toDF("id", "v0"))
      var model: Map[Long, Long] = (0L until 40L).map(i => i -> (i % 10)).toMap
      var vName = "v0"
      var nextRename = 1
      ops.foreach {
        case Append(rows) =>
          // appends must be key-fresh (the table has no uniqueness
          // contract, but the MODEL is a map — skip ids already present)
          val fresh = rows.filterNot { case (id, _) => model.contains(id) }
            .groupBy(_._1).map(_._2.head).toList
          if (fresh.nonEmpty) {
            t.append(fresh.toDF("id", vName))
            model ++= fresh
          }
        case DeleteVec(m, r) =>
          t.deleteVectored(col("id") % m === r)
          model = model.filterNot { case (id, _) => id % m == r }
        case DeleteRewrite(m, r) =>
          t.delete(col("id") % m === r)
          model = model.filterNot { case (id, _) => id % m == r }
        case Rename =>
          val nv = s"v$nextRename"; nextRename += 1
          t.renameColumn(vName, nv); vName = nv
        case Optimize =>
          t.compact(nFiles = 2)
      }
      val got = t.read.select(col("id"), col(vName))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val okCols = t.read.columns.toSeq == Seq("id", vName)
      Prop.collect(ops.map(_.getClass.getSimpleName).mkString(","))(
        got == model && okCols)
    }
}
