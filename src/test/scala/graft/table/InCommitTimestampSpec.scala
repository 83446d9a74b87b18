package graft.table

import graft.SparkSpec

/** In-commit timestamps (Delta ICT parity): commit instants ride in the
  * marker BODY, monotone by construction — file mtimes are not (clock
  * skew, fs copies), and `TIMESTAMP AS OF` resolves against these.
  */
class InCommitTimestampSpec extends SparkSpec {
  import spark.implicits._

  test("history instants are strictly increasing across rapid commits " +
      "(mtimes would collide within a granularity tick)") {
    val t = MedallionTable(spark, tmpDir("ict1"))
    t.overwrite(Seq(1).toDF("x"))
    (0 until 6).foreach(i => t.append(Seq(i).toDF("x")))
    val ts = t.history().map(_._3)
    assert(ts.length == 7)
    // history() is newest-first: strictly decreasing down the list
    assert(ts.zip(ts.tail).forall { case (newer, older) => newer > older },
      s"non-monotone instants: $ts")
    // ops still render clean (the instant is split off the body)
    assert(t.history().map(_._2).toSet == Set("create-overwrite", "append"))
  }

  test("legacy markers without an instant fall back to mtime and keep " +
      "their op; TIMESTAMP AS OF resolution stays usable") {
    val p = tmpDir("ict2")
    val t = MedallionTable(spark, p)
    t.overwrite(Seq(1).toDF("x"))
    t.append(Seq(2).toDF("x"))
    // rewrite marker v1 as a legacy body (op only, no \t instant)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = new org.apache.hadoop.fs.Path(p + "__graft_commits", "v1.commit")
    fs.delete(m, false)
    val out = fs.create(m, true)
    out.write("create-overwrite".getBytes("UTF-8")); out.close()
    val h = t.history()
    assert(h.map(_._2).toSet == Set("create-overwrite", "append"))
    assert(h.forall(_._3 > 0L))
  }

  test("upgrade boundary: the first in-commit instant fences ABOVE a " +
      "legacy predecessor's mtime, even a skewed/restored future one") {
    val p = tmpDir("ict3")
    val t = MedallionTable(spark, p)
    t.overwrite(Seq(1).toDF("x"))
    // demote v1 to a legacy marker (op only) with a FUTURE mtime — the
    // restored-backup / skewed-clock scenario ICT exists for; history()
    // renders legacy timestamps from the mtime, so the next in-commit
    // instant must fence above it or the boundary goes non-monotone
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = new org.apache.hadoop.fs.Path(p + "__graft_commits", "v1.commit")
    fs.delete(m, false)
    val out = fs.create(m, true)
    out.write("create-overwrite".getBytes("UTF-8")); out.close()
    val future = System.currentTimeMillis() + 3600L * 1000L
    fs.setTimes(m, future, -1)
    t.append(Seq(2).toDF("x"))
    val ts = t.history().map(_._3) // newest first
    assert(ts.length == 2)
    assert(ts.head > ts(1),
      s"ICT instant ${ts.head} did not fence above legacy mtime ${ts(1)}")
  }
}
