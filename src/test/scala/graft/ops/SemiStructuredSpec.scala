package graft.ops

import graft.pipeline.SparkSuite

class SemiStructuredSpec extends SparkSuite {

  test("eventPropStats: hand counts; malformed and missing-k payloads count as rows but not extractions") {
    import spark.implicits._
    val events = Seq(
      ("click", """{"k": 3}"""),
      ("click", """{"k": 7}"""),
      ("click", """{"other": 1}"""), // well-formed, no k → NULL
      ("view", """not json at all"""), // malformed → NULL, job survives
      ("view", """{"k": 10}"""),
      ("view", null: String), // NULL payload
      ("err", """{"k": 3.5}"""), // non-integral → NULL (no silent truncation)
      ("err", """{"k": "3"}"""), // string → NULL (no silent coercion)
    ).toDF("event_type", "props")
    val byType = SemiStructured.eventPropStats(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.get(3), r.get(4), r.get(5)))).toMap
    assert(byType("click") == ((3L, 2L, 10L, 3L, 7L)))
    assert(byType("view") == ((3L, 1L, 10L, 10L, 10L)))
    // the oracle's json_type guard mirrors exactly this: neither 3.5 nor
    // "3" extracts as a long
    assert(byType("err")._1 == 2L && byType("err")._2 == 0L)
  }

  test("eventPropStats over sf0.001: extraction is total (synthetic props are all well-formed)") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val rows = SemiStructured.eventPropStats(events).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"malformed payloads in ${r.getString(0)}")
    }
  }
}
