package graft.ops

import graft.SparkSpec
import graft.queries.ScalarQueries

/** Shape invariants for the events-table analytics queries (exact values
  * are oracle-checked by the driver's DuckDB twins).
  */
class EventsAnalyticsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("funnel stages are strictly ordered and prefix-closed") {
    val rows = ScalarQueries.defs("events_funnel")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val view = Option(r.getTimestamp(1))
      val click = Option(r.getTimestamp(2))
      val purchase = Option(r.getTimestamp(3))
      assert(view.nonEmpty, "funnel rows exist only for users who viewed")
      // a stage can only be reached through the previous one
      if (purchase.nonEmpty) assert(click.nonEmpty)
      click.foreach(c => assert(c.after(view.get), "click not after first view"))
      purchase.foreach(p => assert(p.after(click.get), "purchase not after first click"))
    }
  }

  test("retention: week-0 holds the full cohort, offsets non-negative") {
    val rows = ScalarQueries.defs("events_retention")(spark, dir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "negative week offset")
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (cw, cells) =>
      val week0 = cells.find(_._2 == 0)
      assert(week0.nonEmpty, s"cohort $cw missing its week-0 cell")
      // every member is active in their own first week, so week 0 bounds
      // every later offset
      assert(cells.forall(_._3 <= week0.get._3), s"cohort $cw grows after week 0")
    }
  }
}
