package graft.ops

import graft.TestSpark
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Brute-force invariant for the session entry/exit/bounce report on
  * random event logs (timestamp collisions, singleton users, gap-edge
  * spacing): the engine must equal a straight local reference that
  * sorts each user's events by (ts, event_id), splits sessions at
  * gap-exceeding steps, and tallies first/last/bounce types — the
  * definition, with none of the engine's window or explode machinery.
  */
object EventAnalyticsProperties extends Properties("graft.ops.EventAnalytics") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val gapSec = 600L

  // events on a coarse second grid so ts collisions and exact-gap
  // spacings actually occur
  private val genLog: Gen[List[(Long, Long, Long, String)]] = for {
    n <- Gen.chooseNum(1, 18)
    evs <- Gen.listOfN(n, for {
      user <- Gen.chooseNum(1L, 3L)
      sec <- Gen.chooseNum(0L, 12L).map(_ * gapSec / 2) // multiples of half-gap
      typ <- Gen.oneOf("view", "click", "purchase")
    } yield (user, sec, typ))
  } yield evs.zipWithIndex.map { case ((u, s, t), i) => (i + 1L, u, s, t) }

  private def refReport(evs: List[(Long, Long, Long, String)])
      : Map[String, (Long, Long, Long)] = {
    val sessions = evs.groupBy(_._2).toList.flatMap { case (_, xs) =>
      val sorted = xs.sortBy(e => (e._3, e._1)) // (ts, event_id)
      val runs = sorted.foldLeft(List.empty[List[(Long, Long, Long, String)]]) {
        case (((h @ (p :: _)) :: rest), e) if e._3 - p._3 <= gapSec =>
          (e :: h) :: rest
        case (acc, e) => List(e) :: acc
      }
      runs.map(_.reverse)
    }
    val roles = sessions.flatMap { s =>
      val bounce = if (s.size == 1) 1L else 0L
      List((s.head._4, 1L, 0L, bounce), (s.last._4, 0L, 1L, 0L))
    }
    roles.groupBy(_._1).map { case (t, xs) =>
      t -> ((xs.map(_._2).sum, xs.map(_._3).sum, xs.map(_._4).sum))
    }
  }

  property("entryExit == the literal sort/split/tally definition") = {
    forAll(genLog) { evs =>
      val df = evs.toDF("event_id", "user_id", "sec", "event_type")
        .selectExpr("event_id", "user_id", "event_type",
          "timestamp_seconds(sec) as ts")
      val out = EventAnalytics.entryExit(df, gapSec = gapSec).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val ref = refReport(evs)
      if (out != ref) println(s"MISMATCH evs=$evs\n engine=$out\n ref=$ref")
      out == ref
    }
  }

  property("mannKendallDaily == the literal pairwise-sign definition on tie-heavy random series") = {
    // small count domain forces heavy ties (the tie-correction path)
    val genDaily: Gen[List[Int]] = for {
      n <- Gen.chooseNum(1, 12)
      cs <- Gen.listOfN(n, Gen.chooseNum(1, 4))
    } yield cs
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    forAll(genDaily) { counts =>
      var id = 0L
      val rows = counts.zipWithIndex.flatMap { case (c, i) =>
        (1 to c).map { _ =>
          id += 1
          (id, 1L, "view", f"2024-01-${i + 1}%02d 10:00:00")
        }
      }
      val df = rows.toDF("event_id", "user_id", "event_type", "ts_s")
        .selectExpr("event_id", "user_id", "event_type", "cast(ts_s as timestamp) as ts")
      val got = DataQuality.mannKendallDaily(df).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).head
      // literal definition
      val s = (for (i <- counts.indices; j <- counts.indices if i < j)
        yield math.signum(counts(j) - counts(i)).toLong).sum
      val n = counts.size.toLong
      val tt = counts.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val varS = (n * (n - 1) * (2 * n + 5) - tt).toDouble / 18.0
      val zRef = if (varS > 0) {
        Some(r6(if (s > 0) (s - 1).toDouble / math.sqrt(varS)
        else if (s < 0) (s + 1).toDouble / math.sqrt(varS) else 0.0))
      } else None
      got == ((n, s, r6(varS), zRef)) || { println(s"counts=$counts got=$got want=${(n, s, r6(varS), zRef)}"); false }
    }
  }
}
