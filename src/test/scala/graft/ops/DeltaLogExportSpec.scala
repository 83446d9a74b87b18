package graft.ops

import graft.SparkSpec
import graft.table.{DeltaLogExport, MedallionTable}
import com.fasterxml.jackson.databind.ObjectMapper

/** The Delta-log export: version-chain shape, action-level contents, and
  * replay fidelity (an external reader following adds-minus-removes must
  * see exactly the table layer's rows). The DuckDB half of the interop
  * check is the `k10_delta_export_replay` oracle.
  */
class DeltaLogExportSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def logLines(p: String, version: Long): Seq[String] = {
    val f = new java.io.File(s"$p/_delta_log/" + f"$version%020d.json")
    assert(f.exists(), s"missing log version $version at $p")
    scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq
  }

  test("create + append export a replayable two-version chain") {
    val p = tmpDir("dlx_chain")
    val t = MedallionTable(spark, p)
    t.overwrite((0 until 100).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    assert(DeltaLogExport.sync(spark, p) == 0L)
    // idempotent: a second sync with no table change writes nothing
    assert(DeltaLogExport.sync(spark, p) == -1L)
    t.append((100 until 150).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    assert(DeltaLogExport.sync(spark, p) == 1L)

    // v0 carries protocol + metaData + adds; v1 only the new adds
    val v0 = logLines(p, 0).map(mapper.readTree)
    assert(v0.head.has("protocol") &&
      v0.head.get("protocol").get("minReaderVersion").asInt == 1)
    val meta = v0.find(_.has("metaData")).get.get("metaData")
    assert(meta.get("format").get("provider").asText == "parquet")
    // schemaString is the Spark-JSON schema Delta itself serializes
    val parsed = org.apache.spark.sql.types.DataType
      .fromJson(meta.get("schemaString").asText)
    assert(parsed == t.read.schema)
    val v1 = logLines(p, 1).map(mapper.readTree)
    assert(v1.forall(n => n.has("add")), s"v1 must be adds only: $v1")
    assert(v1.forall(_.get("add").get("size").asLong > 0))

    // replaying the log yields exactly the table layer's live files…
    val fromLog = DeltaLogExport.liveFilesFromLog(spark, p).toSet
    val fromFs = t.read.inputFiles.map(_.split('/').last).toSet
    assert(fromLog == fromFs, s"log live set $fromLog != fs $fromFs")
    // …and reading those files reproduces the table's rows
    val replayed = spark.read.parquet(fromLog.map(f => s"$p/$f").toSeq: _*)
    assert(replayed.count() == 150)
    assert(replayed.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == (0L until 150L).sum)
  }

  test("partitioned tables export hive partitionValues and relative paths") {
    val p = tmpDir("dlx_part")
    val t = MedallionTable(spark, p, partitionColumns = Seq("blk"))
    t.overwrite((0 until 40).map(i => (i.toLong, i % 4)).toDF("id", "blk"))
    assert(DeltaLogExport.sync(spark, p) == 0L)
    val adds = logLines(p, 0).map(mapper.readTree).filter(_.has("add"))
      .map(_.get("add"))
    assert(adds.nonEmpty)
    adds.foreach { a =>
      val path = a.get("path").asText
      assert(path.startsWith("blk="), s"expected relative hive path: $path")
      val pv = a.get("partitionValues")
      assert(pv.get("blk").asText == path.split('/').head.stripPrefix("blk="))
    }
    val meta = logLines(p, 0).map(mapper.readTree)
      .find(_.has("metaData")).get.get("metaData")
    assert(meta.get("partitionColumns").get(0).asText == "blk")
  }

  test("a vanished file exports a remove action and drops out of replay") {
    val p = tmpDir("dlx_remove")
    val t = MedallionTable(spark, p)
    t.overwrite((0 until 20).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    assert(DeltaLogExport.sync(spark, p) == 0L)
    // simulate an out-of-band compaction deleting one data file
    val victim = t.read.inputFiles.head
    assert(new java.io.File(new java.net.URI(victim)).delete())
    assert(DeltaLogExport.sync(spark, p) == 1L)
    val v1 = logLines(p, 1).map(mapper.readTree)
    val removed = v1.filter(_.has("remove")).map(_.get("remove").get("path").asText)
    assert(removed == Seq(victim.split('/').last))
    assert(!DeltaLogExport.liveFilesFromLog(spark, p).contains(victim.split('/').last))
  }

  test("checkpoint seeds replay; post-checkpoint versions extend it") {
    val p = tmpDir("dlx_ck")
    val t = MedallionTable(spark, p)
    t.overwrite((0 until 60).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    assert(DeltaLogExport.sync(spark, p) == 0L)
    t.append((60 until 90).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    assert(DeltaLogExport.sync(spark, p) == 1L)
    assert(DeltaLogExport.checkpoint(spark, p) == 1L)
    val ckFile = new java.io.File(s"$p/_delta_log/" + f"${1L}%020d.checkpoint.parquet")
    assert(ckFile.isFile, "checkpoint must be a flat parquet FILE")
    val ptr = mapper.readTree(scala.io.Source
      .fromFile(s"$p/_delta_log/_last_checkpoint", "UTF-8").mkString)
    assert(ptr.get("version").asLong == 1L)

    // checkpoint contents: 1 protocol + 1 metaData + one add per file
    val ck = spark.read.parquet(ckFile.getAbsolutePath)
    val nAdds = ck.filter("add IS NOT NULL").count()
    assert(nAdds == t.read.inputFiles.length)
    assert(ck.filter("protocol IS NOT NULL").count() == 1)
    assert(ck.filter("metaData IS NOT NULL").count() == 1)

    // a post-checkpoint append replays on top of the checkpoint seed
    t.append((90 until 100).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    assert(DeltaLogExport.sync(spark, p) == 2L)
    val fromLog = DeltaLogExport.liveFilesFromLog(spark, p).toSet
    assert(fromLog == t.read.inputFiles.map(_.split('/').last).toSet)
    val replayed = spark.read.parquet(fromLog.map(f => s"$p/$f").toSeq: _*)
    assert(replayed.count() == 100)
    // and sync stays idempotent with a checkpoint present
    assert(DeltaLogExport.sync(spark, p) == -1L)
  }

  test("a rewrite restarts the log at a consistent version 0 snapshot") {
    val p = tmpDir("dlx_rewrite")
    val t = MedallionTable(spark, p)
    t.overwrite((0 until 30).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    assert(DeltaLogExport.sync(spark, p) == 0L)
    t.overwrite((100 until 110).map(i => (i.toLong, s"n$i")).toDF("id", "s"))
    // the directory swap dropped the old log; the export restarts clean
    assert(DeltaLogExport.sync(spark, p) == 0L)
    val fromLog = DeltaLogExport.liveFilesFromLog(spark, p).toSet
    assert(fromLog == t.read.inputFiles.map(_.split('/').last).toSet)
    val replayed = spark.read.parquet(fromLog.map(f => s"$p/$f").toSeq: _*)
    assert(replayed.count() == 10)
  }

  test("soft state refuses with the materialize hatch; MATERIALIZED exports it") {
    import org.apache.spark.sql.functions._
    val p = tmpDir("dlx_mat")
    val t = MedallionTable(spark, p)
    t.overwrite((0 until 100).map(i => (i.toLong, s"r$i", i * 10.0))
      .toDF("id", "s", "v"))
    t.renameColumn("v", "value_usd")
    t.deleteVectored($"id" >= 90)
    t.updateVectored($"id" < 5, Map("s" -> lit("updated")))
    // the default sync refuses each soft feature, naming the escape hatch
    val e = intercept[IllegalArgumentException] { DeltaLogExport.sync(spark, p) }
    assert(e.getMessage.contains("materialize = true"), e.getMessage)
    // materialize-on-export: one OPTIMIZE, then a clean v0 log
    assert(DeltaLogExport.sync(spark, p, materialize = true) == 0L)
    val viaLog = DeltaLogExport.readViaLog(spark, p)
    assert(viaLog.columns.contains("value_usd"), "rename materialized")
    assert(viaLog.count() == 90L, "DV delete materialized")
    assert(viaLog.filter(col("s") === "updated").count() == 5L,
      "DV update materialized")
    // an already-plain table skips the rewrite: materialize is a no-op
    val files = viaLog.inputFiles.toSet
    assert(DeltaLogExport.sync(spark, p, materialize = true) == -1L)
    assert(DeltaLogExport.readViaLog(spark, p).inputFiles.toSet == files)
    // SQL spelling on a partitioned table with soft state: layout survives
    val pp = tmpDir("dlx_mat_part")
    val tp = MedallionTable(spark, pp, partitionColumns = Seq("grp"))
    tp.overwrite((0 until 60).map(i => (i.toLong, i % 3L)).toDF("id", "grp"))
    tp.deleteVectored($"id" === 0L)
    spark.sql(s"SYNC DELTA LOG FOR '$pp' MATERIALIZED")
    val viaLogP = DeltaLogExport.readViaLog(spark, pp)
    assert(viaLogP.count() == 59L)
    assert(viaLogP.groupBy("grp").count().count() == 3L,
      "partition column survives the materializing OPTIMIZE")
    assert(new java.io.File(s"$pp/grp=1").isDirectory,
      "hive layout preserved for the exported partitionValues")
  }
}
