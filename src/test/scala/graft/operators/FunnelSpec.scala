package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(60000L * m)

  // user 1: full ordered funnel; user 2: view then purchase but no
  // click (stops at step 1); user 3: click BEFORE the first view only
  // (ordering matters — stops at step 1); user 4: never views
  private def events = Seq(
    (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
    (2L, ts(1), "view"), (2L, ts(4), "purchase"),
    (3L, ts(1), "click"), (3L, ts(2), "view"),
    (4L, ts(1), "purchase")
  ).toDF("user_id", "ts", "event_type").repartition(3)

  private val steps = Seq(
    "view" -> (col("event_type") === "view"),
    "click" -> (col("event_type") === "click"),
    "purchase" -> (col("event_type") === "purchase"))

  test("greedy ordered matching with strict inequality between steps") {
    val got = Funnel.conversion(events, steps)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1, "view", 3L, 1.0),      // users 1, 2, 3
      (2, "click", 1L, 0.3333),  // only user 1 clicked after viewing
      (3, "purchase", 1L, 0.3333)))
  }

  test("same-timestamp events do not satisfy a later step") {
    val e = Seq((9L, ts(5), "view"), (9L, ts(5), "click")).toDF(
      "user_id", "ts", "event_type")
    val got = Funnel.conversion(e, steps.take(2))
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(got == Seq((1, "view", 1L, 1.0), (2, "click", 0L, 0.0)))
  }

  test("retention cohorts: exact integer periods, first-activity cohorting") {
    // periodSeconds = 60 for readability: user 1 active minutes 1,2,4;
    // user 2 joins at minute 2, active 2,3; user 3 only minute 4
    val e = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(4), "view"),
      (1L, ts(2), "view"), // duplicate (user, period) must not double-count
      (2L, ts(2), "view"), (2L, ts(3), "purchase"),
      (3L, ts(4), "view")
    ).toDF("user_id", "ts", "event_type").repartition(3)
    val got = Funnel.retentionCohorts(e, periodSeconds = 60L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 1L), (1L, 1L, 1L), (1L, 3L, 1L), // user 1 cohort=min1
      (2L, 0L, 1L), (2L, 1L, 1L),               // user 2 cohort=min2
      (4L, 0L, 1L)))                            // user 3 cohort=min4
  }

  test("plan shape: per-step aggregates, no global sort of raw events") {
    val plan = Funnel.conversion(events, steps)
      .queryExecution.executedPlan.toString
    // raw events are never globally sorted; the only Sort is the
    // 4-row output orderBy
    assert(!plan.contains("SortMergeJoin") ||
      plan.contains("HashAggregate"), plan.take(400))
  }
}
