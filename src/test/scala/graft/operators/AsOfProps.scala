package graft.operators

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Property-based adversarial check for the as-of family: random event sets
  * drawn from a TINY timestamp domain (so equal-ts ties are dense — the
  * regime where as-of formulations break) must match a driver-side
  * transcription of the declared semantics:
  *
  *  - backward: latest right with ts <= left.ts, equal-ts rights MATCH,
  *    equal right ts → greatest tieBreak;
  *  - forward: earliest right with ts >= left.ts, ties → smallest tieBreak;
  *  - nearest: min |Δt| in exact microseconds, exact-distance tie →
  *    backward.
  */
object AsOfProps extends Properties("AsOf") {

  // each sample runs three Spark jobs: keep the count modest
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxDiscardRatio(10)

  private lazy val spark = graft.SparkSpec.session

  /** (key, tsMillis, id) with ts from a 6-value domain → heavy ties. */
  private def rowsGen(idBase: Long): Gen[List[(Long, Long, Long)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.choose(1L, 3L)
      t <- Gen.oneOf(100L, 200L, 200L, 300L, 400L, 500L) // duplicate 200: extra ties
    } yield (k, t * 1000L, 0L)).map(_.zipWithIndex.map {
      case ((k, t, _), i) => (k, t, idBase + i)
    })

  private val bothGen: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
    for { l <- rowsGen(1000); r <- rowsGen(5000) } yield (l, r)

  private def df(rows: List[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.map { case (k, ms, id) => (k, new Timestamp(ms), id) }
      .toDF("k", "ts", "event_id")
  }

  property("backward == naive argmax over ties") =
    forAllNoShrink(bothGen) { case (l, r) =>
      val out = AsOf.joinBackward(df(l), df(r), Seq("k"), "ts", "event_id",
        Seq("event_id")).collect()
        .map(x => x.getLong(2) -> Option(x.get(3)).map(_.asInstanceOf[Long])).toMap
      val naive = l.map { case (k, ts, id) =>
        val c = r.filter(x => x._1 == k && x._2 <= ts)
        id -> (if (c.isEmpty) None
               else Some(c.maxBy(x => (x._2, x._3))._3))
      }.toMap
      out == naive
    }

  property("forward == naive argmin over ties") =
    forAllNoShrink(bothGen) { case (l, r) =>
      val out = AsOf.joinForward(df(l), df(r), Seq("k"), "ts", "event_id",
        Seq("event_id")).collect()
        .map(x => x.getLong(2) -> Option(x.get(3)).map(_.asInstanceOf[Long])).toMap
      val naive = l.map { case (k, ts, id) =>
        val c = r.filter(x => x._1 == k && x._2 >= ts)
        id -> (if (c.isEmpty) None
               else Some(c.minBy(x => (x._2, x._3))._3))
      }.toMap
      out == naive
    }

  property("nearest == naive abs-distance argmin, backward tie-preferred") =
    forAllNoShrink(bothGen) { case (l, r) =>
      val out = AsOf.joinNearest(df(l), df(r), Seq("k"), "ts", "event_id",
        Seq("event_id")).collect()
        .map(x => x.getLong(2) -> Option(x.get(3)).map(_.asInstanceOf[Long])).toMap
      val naive = l.map { case (k, ts, id) =>
        val back = r.filter(x => x._1 == k && x._2 <= ts)
          .sortBy(x => (x._2, x._3)).lastOption
        val fwd = r.filter(x => x._1 == k && x._2 >= ts)
          .sortBy(x => (x._2, x._3)).headOption // min (ts, id)
        id -> ((back, fwd) match {
          case (None, None) => None
          case (Some(b), None) => Some(b._3)
          case (None, Some(f)) => Some(f._3)
          case (Some(b), Some(f)) =>
            if (ts - b._2 <= f._2 - ts) Some(b._3) else Some(f._3)
        })
      }.toMap
      out == naive
    }
}
