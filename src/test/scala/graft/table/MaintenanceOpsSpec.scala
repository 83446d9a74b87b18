package graft.table

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** OPTIMIZE ... WHERE (partition-scoped compaction), VACUUM DRY RUN, and
  * CONVERT-in-place: the round-11 maintenance surface. The load-bearing
  * assertions are the at-scale contracts — untouched partitions stay
  * byte-identical under a scoped compaction, convert moves zero data
  * bytes, dry run mutates nothing.
  */
class MaintenanceOpsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def fs(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (relative path → (length, mtime)) of live parquet files under root. */
  private def fileFingerprints(root: String): Map[String, (Long, Long)] = {
    val p = new Path(root)
    val f = fs(root)
    val rootUri = f.makeQualified(p).toUri
    val b = Map.newBuilder[String, (Long, Long)]
    val it = f.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      val rel = rootUri.relativize(f.makeQualified(st.getPath).toUri).getPath
      if (st.getPath.getName.endsWith(".parquet") &&
          !rel.split('/').exists(s => s.startsWith("_") || s.startsWith(".")))
        b += rel -> ((st.getLen, st.getModificationTime))
    }
    b.result()
  }

  private def mkPartitioned(prefix: String): (MedallionTable, String) = {
    import spark.implicits._
    val tp = tmpDir(prefix)
    val t = MedallionTable(spark, tp, partitionColumns = Seq("p"))
    // several single-task appends → exactly one file per partition per
    // append (compaction fodder with a deterministic file count)
    (1 to 3).foreach { i =>
      t.append((1L to 4L).map(id => (id * i, id % 2)).toDF("id", "p").coalesce(1))
    }
    (t, tp)
  }

  test("compactWhere rewrites only matching partitions; others stay byte-identical; content preserved") {
    val (t, tp) = mkPartitioned("cw_basic")
    val before = t.read.orderBy("p", "id").collect().toSeq
    val fpBefore = fileFingerprints(tp)
    val untouchedBefore = fpBefore.filter(_._1.startsWith("p=0"))
    assert(fpBefore.count(_._1.startsWith("p=1")) == 3, "3 files pre-compact")

    t.compactWhere(col("p") === 1)

    val fpAfter = fileFingerprints(tp)
    assert(fpAfter.count(_._1.startsWith("p=1")) == 1,
      "matched partition compacts to one file")
    assert(fpAfter.filter(_._1.startsWith("p=0")) == untouchedBefore,
      "non-matching partition files must be byte-for-byte untouched")
    assert(t.read.orderBy("p", "id").collect().toSeq == before,
      "compaction must not change content")
    assert(t.history().head._2 == "optimize-where")
    assert(TableStats.hasManifest(spark, tp), "skipping re-armed after compact")
  }

  test("compactWhere refuses row-level predicates and unpartitioned tables") {
    import spark.implicits._
    val (t, _) = mkPartitioned("cw_refuse")
    intercept[IllegalArgumentException] { t.compactWhere(col("id") > 2) }
    intercept[IllegalArgumentException] {
      t.compactWhere(col("p") === 1 && col("id") > 2)
    }
    val flat = MedallionTable(spark, tmpDir("cw_flat"))
    flat.overwrite(Seq((1L, 0)).toDF("id", "p"))
    intercept[IllegalArgumentException] { flat.compactWhere(col("p") === 0) }
  }

  test("compactWhere applies (and physically absorbs) deletion vectors in the touched partition") {
    val (t, tp) = mkPartitioned("cw_dv")
    t.deleteVectored(col("id") === 2L && col("p") === 0)
    val before = t.read.orderBy("p", "id").collect().toSeq
    t.compactWhere(col("p") === 0)
    assert(t.read.orderBy("p", "id").collect().toSeq == before,
      "DV-applied view preserved across scoped compaction")
    assert(!t.read.filter(col("id") === 2L && col("p") === 0).head(1).nonEmpty)
  }

  test("vacuumDryRun lists litter without touching it; real vacuum then clears it") {
    import spark.implicits._
    val tp = tmpDir("vdr")
    val t = MedallionTable(spark, tp)
    t.overwrite(Seq((1L, "a")).toDF("id", "s"))
    val f = fs(tp)
    f.mkdirs(new Path(s"${tp}__graft_tmp_dead"))
    f.mkdirs(new Path(s"${tp}__graft_old_1_dead"))
    // a young tmp could be a live rewrite's: dry run must not list it…
    assert(t.vacuumDryRun().map(_._2) == Seq("delete"))
    // …aged past the horizon it becomes provably-crashed litter
    f.setTimes(new Path(s"${tp}__graft_tmp_dead"),
      System.currentTimeMillis() - 3L * 3600 * 1000, -1)
    val dry = t.vacuumDryRun()
    assert(dry.map(_._2) == Seq("delete", "delete"))
    assert(f.exists(new Path(s"${tp}__graft_tmp_dead")), "dry run touched litter")
    assert(t.read.count() == 1L)
    assert(t.vacuum() == 2)
    assert(t.vacuumDryRun().isEmpty)
  }

  test("vacuumDryRun reports refuse (not delete) when tmp litter is the only data candidate") {
    import spark.implicits._
    val tp = tmpDir("vdr_refuse")
    val f = fs(tp)
    // crashed-first-write state: tmp dir only, no live table, no backup
    f.mkdirs(new Path(s"${tp}__graft_tmp_dead"))
    val t = MedallionTable(spark, tp)
    val dry = t.vacuumDryRun()
    assert(dry.map(_._2) == Seq("refuse"),
      s"dry run must mirror vacuum's refusal, got $dry")
    intercept[IllegalStateException] { t.vacuum() } // and vacuum DOES refuse
    assert(f.exists(new Path(s"${tp}__graft_tmp_dead")))
  }

  test("vacuumDryRun reports the newest backup as restore when the live dir is gone") {
    import spark.implicits._
    val tp = tmpDir("vdr_restore")
    val t = MedallionTable(spark, tp)
    t.overwrite(Seq((1L, "a")).toDF("id", "s"))
    val f = fs(tp)
    // simulate a mid-swap crash: live dir renamed away, two backups standing
    assert(f.rename(new Path(tp), new Path(s"${tp}__graft_old_1_aa")))
    f.mkdirs(new Path(s"${tp}__graft_old_2_bb"))
    val dry = t.vacuumDryRun()
    assert(dry.exists { case (p, a) => a == "restore" && p.endsWith("_2_bb") },
      s"newest backup must be the restore candidate, got $dry")
    assert(dry.count(_._2 == "delete") == 1)
    assert(!t.exists, "dry run must not perform the restore")
  }

  test("convertInPlace adopts a plain parquet dir metadata-only; append works after") {
    import spark.implicits._
    val tp = tmpDir("conv")
    (1L to 10L).map(i => (i, i % 3)).toDF("id", "p").write.parquet(tp)
    val fpBefore = fileFingerprints(tp)

    val t = MedallionTable(spark, tp)
    t.convertInPlace()
    assert(fileFingerprints(tp) == fpBefore,
      "convert must not move or rewrite one data byte")
    assert(t.commitVersion == 1L && t.history().head._2 == "convert")
    assert(TableStats.hasManifest(spark, tp), "skipping armed at adoption")
    assert(t.read.count() == 10L)

    intercept[IllegalArgumentException] { t.convertInPlace() } // birth cert, not repair
    t.append(Seq((11L, 1L)).toDF("id", "p"))
    assert(t.read.count() == 11L && t.commitVersion == 2L)
  }

  test("autoCompact compacts only over-threshold partitions; below-threshold untouched; no-op when clean") {
    import spark.implicits._
    val tp = tmpDir("ac_part")
    val t = MedallionTable(spark, tp, partitionColumns = Seq("p"))
    (1 to 5).foreach { i =>
      t.append(Seq((i.toLong, 0L), (i.toLong + 100, 1L)).toDF("id", "p").coalesce(1))
    }
    // skew partition 2 separately, below threshold
    (1 to 2).foreach { i =>
      t.append(Seq((i.toLong + 200, 2L)).toDF("id", "p").coalesce(1))
    }
    val before = t.read.orderBy("p", "id").collect().toSeq
    val fp2Before = fileFingerprints(tp).filter(_._1.startsWith("p=2"))

    assert(t.autoCompact(maxFiles = 4) == 2, "p=0 and p=1 are over threshold")
    val fp = fileFingerprints(tp)
    assert(fp.count(_._1.startsWith("p=0")) == 1)
    assert(fp.count(_._1.startsWith("p=1")) == 1)
    assert(fp.filter(_._1.startsWith("p=2")) == fp2Before,
      "below-threshold partition must be untouched")
    assert(t.read.orderBy("p", "id").collect().toSeq == before)
    assert(t.autoCompact(maxFiles = 4) == 0, "clean table is a no-op")
  }

  test("autoCompact handles null partition values and unpartitioned tables") {
    import spark.implicits._
    val tp = tmpDir("ac_null")
    val t = MedallionTable(spark, tp, partitionColumns = Seq("p"))
    (1 to 5).foreach { i =>
      t.append(Seq((i.toLong, null.asInstanceOf[java.lang.Long]),
        (i.toLong + 50, java.lang.Long.valueOf(1L)))
        .toDF("id", "p").coalesce(1))
    }
    val before = t.read.orderBy("id").collect().toSeq
    assert(t.autoCompact(maxFiles = 4) == 2,
      "the null-key dir and p=1 both compact")
    assert(t.read.orderBy("id").collect().toSeq == before,
      "null-key partition content preserved")

    val flat = MedallionTable(spark, tmpDir("ac_flat"))
    (1 to 6).foreach(i => flat.append(Seq((i.toLong, "x")).toDF("id", "s").coalesce(1)))
    assert(flat.autoCompact(maxFiles = 4) == 1)
    assert(flat.read.count() == 6)
    assert(flat.autoCompact(maxFiles = 4) == 0)
  }

  test("COPY INTO PATTERN narrows the landing by source-relative glob") {
    import spark.implicits._
    val src = tmpDir("ci_pat_src")
    val tp = tmpDir("ci_pat_tbl")
    (1L to 3L).toDF("id").coalesce(1).write.parquet(s"$src/a/land")
    (4L to 5L).toDF("id").coalesce(1).write.parquet(s"$src/b/land")
    val t = MedallionTable(spark, tp)
    val r1 = CopyInto.copyInto(t, src, pattern = Some("a/**"))
    assert(r1.rowsLoaded == 3L, "glob must load only the a/ landing")
    // the un-matched landing is NOT in the log — a broader later run loads it
    val r2 = spark.sql(
      s"COPY INTO '$tp' FROM '$src' FILEFORMAT = PARQUET PATTERN = 'b/**'")
      .collect()
    assert(r2.head.getLong(1) == 2L)
    assert(t.read.count() == 5L)
  }

  test("RESTORE TO TIMESTAMP AS OF resolves the newest commit at or before the instant") {
    import spark.implicits._
    val tp = tmpDir("restore_ts")
    val t = MedallionTable(spark, tp, retainVersions = 2)
    t.overwrite(Seq((1L, "v1")).toDF("id", "s"))
    Thread.sleep(1100) // marker mtimes are the clock; force distinct seconds
    val mid = new java.sql.Timestamp(System.currentTimeMillis()).toString
    Thread.sleep(1100)
    t.merge(Seq((1L, "v2")).toDF("id", "s"), Seq("id"))
    assert(t.read.head().getString(1) == "v2")
    spark.sql(s"RESTORE TABLE '$tp' TO TIMESTAMP AS OF '$mid'").collect()
    assert(t.read.head().getString(1) == "v1",
      "restore must land on the state before the instant")
    intercept[IllegalArgumentException] {
      spark.sql(s"RESTORE TABLE '$tp' TO TIMESTAMP AS OF '1999-01-01'").collect()
    }
  }

  test("SQL surface: COPY INTO / OPTIMIZE WHERE / VACUUM DRY RUN / CONVERT on quoted paths") {
    import spark.implicits._
    // CONVERT on a hive-partitioned plain dir, discovery-validated
    val cp = tmpDir("sql_conv")
    (1L to 6L).map(i => (i, (i % 2).toInt)).toDF("id", "p")
      .write.partitionBy("p").parquet(cp)
    intercept[IllegalArgumentException] {
      spark.sql(s"CONVERT TO GRAFT '$cp' PARTITIONED BY (wrong)").collect()
    }
    val conv = spark.sql(s"CONVERT TO GRAFT '$cp'").collect()
    assert(conv.head.getLong(1) == 1L)

    // COPY INTO a fresh path-target table
    val src = tmpDir("sql_ci_src")
    val tp = tmpDir("sql_ci_tbl")
    (1L to 5L).toDF("id").coalesce(1).write.parquet(s"$src/b1")
    val r1 = spark.sql(s"COPY INTO '$tp' FROM '$src' FILEFORMAT = PARQUET").collect()
    assert(r1.head.getLong(1) == 5L)
    val r2 = spark.sql(s"COPY INTO '$tp' FROM '$src' FILEFORMAT = PARQUET").collect()
    assert(r2.head.getInt(0) == 0 && r2.head.getLong(1) == 0L, "SQL re-run no-op")

    // OPTIMIZE WHERE on the converted partitioned table (+ an extra
    // append so there is something to compact)
    val mt = MedallionTable(spark, cp, partitionColumns = Seq("p"))
    mt.append(Seq((7L, 1L)).toDF("id", "p"))
    val ow = spark.sql(s"OPTIMIZE '$cp' WHERE p = 1").collect()
    assert(ow.head.getInt(2) <= ow.head.getInt(1))
    assert(mt.read.count() == 7L)

    // VACUUM DRY RUN: empty on a clean table
    assert(spark.sql(s"VACUUM '$cp' DRY RUN").collect().isEmpty)
  }
}
