package graft.ops

import graft.SparkSpec
import graft.dedup.StandingDedupIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persistent incremental-dedup index: check-then-ingest over
  * append-only MedallionTables. The query twin (`dedup_index_persisted`)
  * proves the numbers cross-engine; this spec pins the table-maintenance
  * mechanics — what each ingest appends, commit history, and the
  * check-before-ingest ordering hazard.
  */
class StandingDedupIndexSpec extends SparkSpec {

  // Trivial 1-band builder: band key = md5 of the text itself, docs with
  // ≥ 1 token. Keeps the band semantics (equal text ⇒ shared band)
  // without dragging minhash into a table-mechanics spec.
  private def oneBand(docs: DataFrame): DataFrame =
    docs.where(length(trim(col("text"))) > 0)
      .select(col("doc_id"), lit(0).as("band_idx"), md5(col("text")).as("band_key"))

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("check sees exactly the previously ingested batches") {
    val idx = new StandingDedupIndex(spark, tmpDir("sdi_basic"), oneBand)
    idx.ingest(df(1L -> "alpha beta", 2L -> "gamma delta"))
    val day2 = df(10L -> "alpha beta", 11L -> "epsilon zeta")
    val r = idx.check(day2).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(r(10L) == ((true, 1L)), "planted dup: exact hit + its band candidate")
    assert(r(11L) == ((false, 0L)), "fresh doc: no hits against the standing index")
  }

  test("ingest appends; re-check after ingest counts the batch itself") {
    val idx = new StandingDedupIndex(spark, tmpDir("sdi_after"), oneBand)
    idx.ingest(df(1L -> "alpha beta"))
    val day2 = df(10L -> "alpha beta", 11L -> "epsilon zeta")
    idx.ingest(day2)
    val r = idx.check(day2).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    // every doc's own keys are in the index now: exact always true, and
    // candidates include self (10 also matches doc 1's identical band)
    assert(r(10L) == ((true, 2L)))
    assert(r(11L) == ((true, 1L)))
  }

  test("excludeTag makes a replayed batch's check idempotent") {
    val idx = new StandingDedupIndex(spark, tmpDir("sdi_replay"), oneBand)
    idx.ingest(df(1L -> "alpha beta"), tag = 1L)
    val day2 = df(10L -> "alpha beta", 11L -> "epsilon zeta")
    def report(exclude: Option[Long]) = idx.check(day2, exclude).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    val first = report(Some(2L))
    idx.ingest(day2, tag = 2L)
    // replay: same batch, same tag — the re-check must reproduce the
    // pre-ingest report exactly (the crash-after-ingest recovery path)
    assert(report(Some(2L)) == first)
    // and without the exclusion the self-count is visible, proving the
    // filter is what provides the idempotence
    assert(report(None) != first)
  }

  test("the index is ONE append-only MedallionTable: one commit per " +
      "ingest carrying both row kinds atomically") {
    val idx = new StandingDedupIndex(spark, tmpDir("sdi_tables"), oneBand)
    idx.ingest(df(1L -> "a b"))
    idx.ingest(df(2L -> "c d"))
    import org.apache.spark.sql.functions.col
    assert(idx.indexTable.read.filter(col("h").isNotNull).count() == 2)
    assert(idx.indexTable.read.filter(col("band_idx").isNotNull).count() == 2)
    // two ingests = exactly two append commits TOTAL (round-15 verdict
    // #8: the former two-table layout paid two commits per ingest, and a
    // crash between them could split a batch's hash rows from its bands)
    assert(idx.indexTable.history().map(_._2) == Seq("append", "append"))
  }

  test("hash rows are unconditional; band rows only for builder-accepted docs") {
    val idx = new StandingDedupIndex(spark, tmpDir("sdi_partial"), oneBand)
    idx.ingest(df(1L -> "word", 2L -> "   ")) // doc 2: no tokens, no band
    import org.apache.spark.sql.functions.col
    assert(idx.indexTable.read.filter(col("h").isNotNull).count() == 2,
      "every doc gets a hash row")
    assert(idx.indexTable.read.filter(col("band_idx").isNotNull)
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // the bandless doc still exact-dups by content hash
    val r = idx.check(df(20L -> "   ")).collect().head
    assert(r.getBoolean(1) && r.getLong(2) == 0L)
  }

  test("checkAndIngest ≡ check-then-ingest under one shared signature " +
      "pass; report materialized in `between` stays replay-idempotent") {
    import org.apache.spark.sql.functions.col
    // two indexes, identical seed; one runs the split protocol, the
    // other the fused pass — reports and final index content must match
    val a = new StandingDedupIndex(spark, tmpDir("sdi_fuse_a"), oneBand)
    val b = new StandingDedupIndex(spark, tmpDir("sdi_fuse_b"), oneBand)
    val seed = df(1L -> "alpha beta", 2L -> "gamma delta")
    a.ingest(seed, tag = 1L); b.ingest(seed, tag = 1L)
    val batch = df(3L -> "alpha beta", 4L -> "omega psi")
    val ra = a.check(batch, excludeTag = Some(2L)).collect().sortBy(_.getLong(0))
    a.ingest(batch, tag = 2L)
    var seen: Array[org.apache.spark.sql.Row] = Array.empty
    b.checkAndIngest(batch, 2L) { report =>
      seen = report.collect().sortBy(_.getLong(0))
    }
    assert(seen.toSeq == ra.toSeq, "fused report diverged from split")
    assert(a.indexTable.read.orderBy("doc_id", "h", "band_idx", "band_key")
      .collect().toSeq ==
      b.indexTable.read.orderBy("doc_id", "h", "band_idx", "band_key")
        .collect().toSeq, "fused index content diverged")
    // replay: re-running the fused pass with the same tag reproduces the
    // original report (tag-excluded) — the foreachBatch recovery contract
    var replay: Array[org.apache.spark.sql.Row] = Array.empty
    b.checkAndIngest(batch, 2L) { report =>
      replay = report.collect().sortBy(_.getLong(0))
    }
    assert(replay.toSeq == seen.toSeq, "replayed report diverged")
    // duplicate rows from the replayed ingest are absorbed by the
    // membership semantics: a fresh check still sees doc 3 as exact-dup
    val r3 = b.check(df(30L -> "alpha beta")).collect().head
    assert(r3.getBoolean(1))
  }
}
