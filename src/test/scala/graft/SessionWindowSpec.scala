package graft

/** G1 cross-check: the custom lag/cumsum sessionization (DuckDB-oracled)
  * and Spark's native `session_window` operator produce identical
  * sessions on the corpus — two independent formulations agreeing is a
  * stronger check than either alone. */
class SessionWindowSpec extends SparkSpec {

  test("session_window formulation equals the lag/cumsum sessionization") {
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "session_start", "n_events", "duration_us", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    val events = Tables.events(spark, sfDir)
    val custom = key(queries.Sessions.sessionize(events))
    val native = key(queries.Sessions.sessionizeNative(events))
    assert(custom.nonEmpty)
    assert(custom == native,
      s"only-custom=${(custom -- native).take(3)} only-native=${(native -- custom).take(3)}")
  }
}
