package graft.operators

import graft.SparkSpec

class DedupOpsSpec extends SparkSpec {

  test("dropDuplicatesSorted ≡ dropDuplicates on planted duplicates (incl. nulls)") {
    import spark.implicits._
    val rows = Seq(
      (1L, Some("a"), 0), (1L, Some("a"), 0), (1L, Some("a"), 0), // triplicate
      (2L, Some("b"), 1), (2L, Some("c"), 1),                     // same key, diff val
      (3L, None, 0), (3L, None, 0),                               // null duplicate
      (4L, Some("d"), 1))
    val df = rows.toDF("id", "s", "blk")
    val expected = df.dropDuplicates().collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getInt(2))).toSet
    val got = DedupOps.dropDuplicatesSorted(df, "blk").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getInt(2))).toSet
    assert(got == expected)
    assert(got.size == 5)
  }

  test("an ALL-NULL duplicate row keeps exactly one copy (DISTINCT semantics)") {
    import spark.implicits._
    // For the first row of a partition lag(c) is null for every column, and
    // null <=> null holds — without the row_number guard an all-null row
    // compared "equal to its nonexistent predecessor" and ALL copies vanished.
    val rows = Seq[(Option[Long], Option[String])](
      (None, None), (None, None), (None, None),
      (Some(1L), Some("a")), (Some(1L), Some("a")))
    val df = rows.toDF("id", "s")
    val got = DedupOps.dropDuplicatesSorted(df, "id").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        Option(r.getString(1)))).toSet
    assert(got == Set((None, None), (Some(1L), Some("a"))))
  }

  test("dedup + partitioned write reuse ONE exchange (no second shuffle)") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong % 500, i % 4)).toDF("id", "blk")
    val deduped = DedupOps.dropDuplicatesSorted(df, "blk")
      .repartition(org.apache.spark.sql.functions.col("blk"))
    val plan = deduped.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one exchange, got $exchanges:\n$plan")
    assert(deduped.count() == 500) // i and i+500 collide on (id, blk)
  }
}
