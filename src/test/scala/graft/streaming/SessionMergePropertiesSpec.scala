package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties over the sessionizer's pure merge core
  * ([[EventStreams.mergeEvent]] / [[EventStreams.splitClosed]]): for ANY
  * event arrival order the open-session buffer must stay canonical
  * (pairwise > gap apart), conserve counts/totals/extents, and produce
  * the same final sessions as the sorted-order reference — the invariant
  * the late-orphan/bridging fix relies on. Runs under sbt's native
  * ScalaCheck framework (scalatestplus is not resolvable offline).
  */
object SessionMergePropertiesSpec extends Properties("SessionMerge") {
  import EventStreams.{mergeEvent, splitClosed, SessionState}

  private val gapMs = 100L

  private val eventsGen: Gen[List[(Long, Double)]] =
    Gen.listOfN(30, for {
      t <- Gen.choose(0L, 2000L)
      v <- Gen.choose(1, 9).map(_.toDouble)
    } yield (t, v)).map(_.take(30))

  private def mergeAll(evs: List[(Long, Double)]): List[SessionState] =
    evs.foldLeft(List.empty[SessionState]) { case (ss, (t, v)) =>
      mergeEvent(ss, t, v, gapMs)
    }

  property("buffer stays canonical: sessions pairwise more than gap apart") =
    Prop.forAll(eventsGen) { evs =>
      val ss = mergeAll(evs).sortBy(_.startMs)
      ss.zip(ss.drop(1)).forall { case (a, b) => b.startMs - a.lastMs > gapMs } &&
        ss.forall(s => s.startMs <= s.lastMs)
    }

  property("counts and totals are conserved") =
    Prop.forAll(eventsGen) { evs =>
      val ss = mergeAll(evs)
      ss.map(_.n).sum == evs.size &&
        math.abs(ss.map(_.total).sum - evs.map(_._2).sum) < 1e-9
    }

  property("arrival order does not change the final sessions") =
    Prop.forAll(eventsGen) { evs =>
      def canon(ss: List[SessionState]) =
        ss.map(s => (s.n, math.round(s.total), s.startMs, s.lastMs)).sortBy(_._3)
      canon(mergeAll(evs)) == canon(mergeAll(evs.sortBy(_._1))) &&
        canon(mergeAll(evs)) == canon(mergeAll(evs.reverse))
    }

  property("splitClosed closes exactly the sessions the watermark passed") =
    Prop.forAll(eventsGen, Gen.choose(0L, 2200L)) { (evs, wm) =>
      val ss = mergeAll(evs)
      val (done, open) = splitClosed(ss, wm, gapMs)
      done.forall(s => s.lastMs + gapMs < wm) &&
        open.forall(s => s.lastMs + gapMs >= wm) &&
        (done.size + open.size) == ss.size
    }

  // Regression (round-7 advice): close and merge must PARTITION the
  // timeline. mergeEvent admits an event at exactly t == lastMs + gap, and
  // Spark does not drop an event with ts == watermark — so a session a
  // strict-close watermark has passed must be unreachable by EVERY
  // admissible event (t ≥ wm), boundary included. The old `<=` close
  // violated this at t == wm == lastMs + gap: the event would have landed
  // in a fresh session instead of extending the just-emitted one.
  property("no admissible event can merge into a closed session") =
    Prop.forAll(eventsGen, Gen.choose(0L, 2200L)) { (evs, wm) =>
      val (done, _) = splitClosed(mergeAll(evs), wm, gapMs)
      done.forall { s =>
        // t = wm is the earliest admissible arrival — the worst case
        !(wm >= s.startMs - gapMs && wm <= s.lastMs + gapMs)
      }
    }

  property("sessions match the reference gap-split on sorted events") =
    Prop.forAll(eventsGen) { evs0 =>
      val evs = evs0.sortBy(_._1)
      // reference: linear scan over sorted times, split where gap exceeded
      val ref = evs.foldLeft(List.empty[List[(Long, Double)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._1 - cur.head._1 <= gapMs => (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }.map { g =>
        (g.size.toLong, g.map(_._1).min, g.map(_._1).max)
      }.sortBy(_._2)
      val got = mergeAll(evs0).map(s => (s.n, s.startMs, s.lastMs)).sortBy(_._2)
      got == ref
    }
}
