package graft

import graft.queries.SemiStructured

class SemiStructuredSpec extends SparkSpec {

  test("propStats: malformed / missing / null props count as events without k") {
    import spark.implicits._
    val events = Seq(
      ("click", """{"k": 5}"""),
      ("click", """{"k": 7, "extra": true}"""),
      ("click", """{"other": 1}"""), // field missing
      ("click", "not json at all"),  // malformed
      ("view", null.asInstanceOf[String]), // null props
      ("view", """{"k": -3}""")
    ).toDF("event_type", "props")
    val got = SemiStructured.propStats(events)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      ("click", 4L, 2L, 12L, 5L, 7L),
      ("view", 2L, 1L, -3L, -3L, -3L)))
  }

  test("q_json_props covers every event exactly once") {
    val out = SparkEntry.queries("q_json_props")(spark, sfDir)
    import org.apache.spark.sql.functions._
    val total = out.agg(sum(col("n_events"))).head.getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }
}
