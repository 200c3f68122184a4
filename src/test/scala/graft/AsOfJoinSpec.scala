package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks the latest prior right row per key, inclusive ties") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:10:00")),
      (2L, 10L, ts("2024-01-01 00:20:00")),
      (3L, 20L, ts("2024-01-01 00:05:00")), // user 20 has no prior right row
      (4L, 30L, ts("2024-01-01 00:30:00")) // equal-time right row counts
    ).toDF("id", "user", "t")
    val right = Seq(
      (101L, 10L, ts("2024-01-01 00:01:00")),
      (102L, 10L, ts("2024-01-01 00:09:00")), // latest prior for left id=1,2
      (103L, 10L, ts("2024-01-01 00:15:00")), // latest prior for left id=2
      (104L, 20L, ts("2024-01-01 00:06:00")), // AFTER left id=3 -> no match
      (105L, 30L, ts("2024-01-01 00:30:00")) // equal timestamp -> inclusive
    ).toDF("rid", "user", "t")

    val out = AsOfJoin.asof(left, right, "user", "t", "t", Map("rid" -> "matched"))
      .select("id", "matched")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(
      1L -> Some(102L), 2L -> Some(103L), 3L -> None, 4L -> Some(105L)))
  }

  test("multi-column carry is atomic: all carried values come from ONE right row") {
    val left = Seq((1L, 10L, ts("2024-01-01 01:00:00"))).toDF("id", "user", "t")
    // two right rows; the later one has a NULL aux column — a per-column
    // independent carry would take aux from row A and rid from row B
    val right = Seq(
      (201L, 10L, ts("2024-01-01 00:10:00"), "from-201"),
      (202L, 10L, ts("2024-01-01 00:20:00"), null.asInstanceOf[String])
    ).toDF("rid", "user", "t", "aux")
    val out = AsOfJoin.asof(left, right, "user", "t", "t",
      Map("rid" -> "rid", "aux" -> "aux")).select("rid", "aux").head()
    // latest prior row is 202, whose aux IS null — mixing 202/"from-201"
    // would be a row that never existed
    assert(out.getLong(0) == 202L && out.isNullAt(1), out.toString)
  }

  test("duplicate (key, ts) right rows carry the deterministic struct-max row") {
    val left = Seq((1L, 10L, ts("2024-01-01 01:00:00"))).toDF("id", "user", "t")
    val right = Seq(
      (301L, 10L, ts("2024-01-01 00:10:00"), "a"),
      (302L, 10L, ts("2024-01-01 00:10:00"), "b") // same (key, ts)
    ).toDF("rid", "user", "t", "aux")
    val out = AsOfJoin.asof(left, right, "user", "t", "t",
      Map("rid" -> "rid", "aux" -> "aux")).select("rid", "aux").head()
    // (302, "b") > (301, "a") field-by-field -> the carried pair is 302/b
    assert(out.getLong(0) == 302L && out.getString(1) == "b", out.toString)
  }

  test("range join: equi-join plan (no nested loop), pairs unique, equals naive theta join") {
    import graft.operators.RangeJoin
    val points = (1 to 200).map(i => (i.toLong, i * 7.3)).toDF("pid", "v")
    val intervals = (0 to 30).map(i =>
      (i.toLong, i * 40.0, i * 40.0 + 100.0)).toDF("iid", "lo", "hi") // overlapping
    val joined = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 25.0)

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")

    val got = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "pair duplicated across buckets")
    val naive = points.join(intervals,
        col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == naive.toSet && got.nonEmpty)
  }

  test("interval overlap: equi-join plan, pairs unique, equals naive theta join incl. touching ends") {
    import graft.operators.RangeJoin
    // overlapping, nested, touching-at-endpoint, disjoint and inverted cases
    val lhs = Seq((1L, 0.0, 100.0), (2L, 50.0, 60.0), (3L, 200.0, 300.0),
      (4L, 400.0, 350.0)).toDF("aid", "lo_a", "hi_a") // 4 is inverted
    val rhs = Seq((10L, 90.0, 150.0), (11L, 55.0, 58.0), (12L, 300.0, 310.0),
      (13L, 500.0, 600.0), (14L, 360.0, 390.0)).toDF("bid", "lo_b", "hi_b")
    val joined = RangeJoin.intervalOverlap(lhs, "lo_a", "hi_a",
      rhs, "lo_b", "hi_b", bucketWidth = 40.0)

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join must stay an equi-join:\n$plan")

    val got = joined.select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "pair duplicated across shared buckets")
    val naive = lhs.where(col("lo_a") <= col("hi_a")).join(rhs,
        col("lo_a") <= col("hi_b") && col("lo_b") <= col("hi_a"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == naive.toSet && got.nonEmpty)
    // endpoint touch (3: 200..300 vs 12: 300..310) is an overlap; inverted (4) is not
    assert(got.toSet.contains((3L, 12L)))
    assert(!got.exists(_._1 == 4L))
  }

  test("range join guards: inverted intervals match nothing; runaway width raises a clear error") {
    import graft.operators.RangeJoin
    val points = Seq((1L, 50.0)).toDF("pid", "v")
    // lo > hi: theta-join semantics = no match (NOT a descending explode)
    val inverted = Seq((1L, 100.0, 0.0)).toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(points, "v", inverted, "lo", "hi", 10.0)
      .collect().isEmpty)
    // a pathologically wide interval fails attributably instead of OOMing
    val wide = Seq((1L, 0.0, 1e12)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, "v", wide, "lo", "hi", 10.0,
        maxBucketsPerInterval = 1000L).collect()
    }
    assert(ex.getMessage != null)
  }

  test("asof join keeps every left row exactly once") {
    val left = (1 to 100).map(i => (i.toLong, (i % 5).toLong,
      ts(f"2024-01-01 00:${i % 60}%02d:00"))).toDF("id", "user", "t")
    val right = Seq((999L, 0L, ts("2024-01-01 00:00:00"))).toDF("rid", "user", "t")
    val out = AsOfJoin.asof(left, right, "user", "t", "t", Map("rid" -> "m"))
    assert(out.count() == 100)
    assert(out.select("id").distinct().count() == 100)
  }
}
