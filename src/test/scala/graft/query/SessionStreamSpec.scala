package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the two semantics the w4/t7 oracles replay in SQL: the exact
  * inactivity-gap boundary of session_window, and streaming-vs-batch
  * agreement for the windowed rollup on a drained bounded stream.
  */
class SessionStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("session_window: exactly-one-gap-later merges; one microsecond more splits") {
    val gapUs = 1800000000L // 30 min
    val events = Seq(
      ("u", 0L),
      ("u", gapUs),     // exactly gap after the previous: still the SAME session
      ("u", 2 * gapUs + 1) // one microsecond beyond the gap: new session
    ).toDF("user", "tu").select($"user", timestamp_micros($"tu").as("ts"))

    val sessions = events
      .groupBy($"user", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros($"session_window.start").as("s"), $"n")
      .orderBy("s")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    // Sessions split only when the inactivity gap is STRICTLY exceeded —
    // the `>` the DuckDB oracle uses.
    assert(sessions.toSeq == Seq((0L, 2L), (2 * gapUs + 1, 1L)))
  }

  test("streaming daily rollup equals the batch rollup on a drained stream") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.streaming.StreamAnalytics.dailyTypeRollup(spark, dir)
      .orderBy("day_start", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    val expect = graft.Tables(spark, dir, "events")
      .select($"event_type", $"value", timestamp_micros(expr("ts DIV 1000")).as("tsm"))
      .groupBy(window($"tsm", "1 day"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_micros($"window.start").as("day_start"), $"event_type", $"n", $"sum_value")
      .orderBy("day_start", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    assert(got.nonEmpty && got.toSeq == expect.toSeq)
  }
}
