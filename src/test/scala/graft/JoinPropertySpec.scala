package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Randomized (seeded) equivalence checks of the composed join operators
  * against naive driver-side reference implementations — the same oracle
  * idea as the DuckDB gate, but over adversarial shapes the testdata
  * doesn't contain (equal timestamps, empty sides, singleton keys).
  */
class JoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def t(s: Long) = new Timestamp(s * 1000)

  test("asof == naive latest-at-or-before over random data (5 seeds)") {
    for (_ <- 1 to 5) {
      val left = Seq.fill(40)((rnd.nextInt(1000).toLong,
        rnd.nextInt(5).toLong, t(rnd.nextInt(50).toLong), rnd.nextDouble()))
        .distinctBy(_._1)
        .toDF("event_id", "user_id", "ts", "value")
      val right = Seq.fill(40)((1000L + rnd.nextInt(1000),
        rnd.nextInt(5).toLong, t(rnd.nextInt(50).toLong), rnd.nextDouble()))
        .distinctBy(_._1)
        .toDF("event_id", "user_id", "ts", "value")

      val got = graft.ops.AsofJoin
        .asof(left, right, "user_id", "ts", "event_id", Seq("value"), "r_")
        .select("event_id", "r_event_id")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap

      val ls = left.as[(Long, Long, Timestamp, Double)].collect()
      val rs = right.as[(Long, Long, Timestamp, Double)].collect()
      val expected = ls.map { case (lid, lu, lts, _) =>
        val cands = rs.filter(r => r._2 == lu && !r._3.after(lts))
        // tiebreak mirrors the operator: max (ts, event_id)
        lid -> cands.sortBy(r => (r._3.getTime, r._1)).lastOption.map(_._1)
      }.toMap
      assert(got === expected)
    }
  }

  test("binnedCount == naive point-in-interval count over random data (5 seeds)") {
    for (_ <- 1 to 5) {
      val ivs = Seq.fill(30) {
        val s = rnd.nextInt(200).toLong
        // ~1 in 6 inverted (e < s): must yield n_points = 0, not explode
        (rnd.nextInt(10000).toLong, t(s), t(s + rnd.nextInt(48) - 8))
      }.distinctBy(_._1).toDF("iv_id", "s", "e")
      val pts = Seq.fill(60)(t(rnd.nextInt(250).toLong)).toDF("ts")

      val got = graft.ops.RangeJoin
        .binnedCount(pts, "ts", ivs, "s", "e", Seq("iv_id"), binSeconds = 16L)
        .select("iv_id", "n_points").as[(Long, Long)].collect().toMap

      val is = ivs.as[(Long, Timestamp, Timestamp)].collect()
      val ps = pts.as[Timestamp].collect()
      val expected = is.map { case (id, s, e) =>
        id -> ps.count(p => !p.before(s) && !p.after(e)).toLong
      }.toMap
      assert(got === expected)
    }
  }
}
