package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of semantics: latest earlier row, exact-time visibility, no-match null") {
    val left = Seq(
      (1L, 100L, 10L),  // after right@5 -> sees v5
      (2L, 100L, 5L),   // exactly at right@5 -> right sorts first, sees v5
      (3L, 100L, 3L),   // before any right -> null
      (4L, 200L, 50L)   // key with no right rows -> null
    ).toDF("event_id", "user_id", "sec")
    val right = Seq(
      (90L, 100L, 5L, 5.5),
      (91L, 100L, 8L, 8.8),
      (92L, 300L, 1L, 1.1)
    ).toDF("event_id", "user_id", "sec", "value")
    val got = AsOfJoin.join(left, right, "user_id", "sec", Seq("value"),
        tieBreaker = Some("event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got == Map(
      1L -> Some(8.8),  // latest earlier is right@8
      2L -> Some(5.5),  // equal-time right row visible
      3L -> None,
      4L -> None))
  }

  test("forward direction: earliest later row, exact-time visibility, no-match null") {
    val left = Seq(
      (1L, 100L, 10L),  // purchases at 5,8 are earlier -> null
      (2L, 100L, 5L),   // exactly at right@5 -> sees v5 (inclusive)
      (3L, 100L, 3L),   // next right is @5 -> v5
      (4L, 200L, 50L)   // key with no right rows -> null
    ).toDF("event_id", "user_id", "sec")
    val right = Seq(
      (90L, 100L, 5L, 5.5),
      (91L, 100L, 8L, 8.8),
      (92L, 300L, 1L, 1.1)
    ).toDF("event_id", "user_id", "sec", "value")
    val got = AsOfJoin.join(left, right, "user_id", "sec", Seq("value"),
        tieBreaker = Some("event_id"), direction = "forward")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got == Map(
      1L -> None,       // nothing at-or-after 10
      2L -> Some(5.5),  // equal-time right row visible
      3L -> Some(5.5),
      4L -> None))
  }

  test("nearest direction: closest side wins, ties go backward") {
    val left = Seq(
      (1L, 100L, 6L),   // right@5 (d=1) beats right@9 (d=3)
      (2L, 100L, 7L),   // equidistant from 5 and 9 -> tie -> backward (5)
      (3L, 100L, 20L),  // only earlier rows exist -> right@9
      (4L, 100L, 1L),   // only later rows exist -> right@5
      (5L, 200L, 9L)    // no right rows -> null
    ).toDF("event_id", "user_id", "sec")
    val right = Seq(
      (90L, 100L, 5L, 5.5),
      (91L, 100L, 9L, 9.9)
    ).toDF("event_id", "user_id", "sec", "value")
    val got = AsOfJoin.joinNearest(left, right, "user_id", "sec", Seq("value"),
        tieBreaker = Some("event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got == Map(
      1L -> Some(5.5), 2L -> Some(5.5), 3L -> Some(9.9),
      4L -> Some(5.5), 5L -> None))
  }

  test("null-time rows: null match for null-time left, null-time right ignored") {
    def L(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    val left = Seq(
      (L(1), L(100), L(10)),
      (L(2), L(100), null.asInstanceOf[java.lang.Long]) // no defensible match
    ).toDF("event_id", "user_id", "sec")
    val right = Seq(
      (L(90), L(100), L(5), 5.5),
      (L(91), L(100), null.asInstanceOf[java.lang.Long], 99.9) // must never match
    ).toDF("event_id", "user_id", "sec", "value")
    for (dir <- Seq("backward", "forward")) {
      val got = AsOfJoin.join(left, right, "user_id", "sec", Seq("value"),
          tieBreaker = Some("event_id"), direction = dir)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      val expect1 = if (dir == "backward") Some(5.5) else None
      assert(got == Map(1L -> expect1, 2L -> None), s"direction=$dir")
    }
  }

  test("one shuffle: plan contains a single Exchange for the window") {
    val left = Seq((1L, 1L, 1L)).toDF("event_id", "user_id", "sec")
    val right = Seq((2L, 1L, 1L, 1.0)).toDF("event_id", "user_id", "sec", "value")
    val df = AsOfJoin.join(left, right, "user_id", "sec", Seq("value"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan) // union+window, not a join
  }
}
