package graft

import graft.mr.{KeyValue, MapReduce}

/** A1: the generic MR API honours the reference worker contract
  * (/root/reference/src/mr/worker.go): map -> hash-shuffle by key ->
  * reduce once per distinct key. */
class MapReduceSpec extends SparkSpec {

  test("runJob: reference-contract word count over (file, contents) pairs") {
    import spark.implicits._
    val files = Seq(
      ("f1", "the quick brown fox"),
      ("f2", "the lazy dog the end")).toDS()
    val out = MapReduce.runJob(
      files,
      (_, contents) => contents.split(" ").toSeq.map(w => KeyValue(w, "1")),
      (_, values) => values.size.toString)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(out("the") == "3")
    assert(out("fox") == "1")
    assert(out.size == 7) // the quick brown fox lazy dog end
  }

  test("indexer doc-name pad stays lossless and order-preserving past doc_id 10^8") {
    import org.apache.spark.sql.functions.{col, format_string}
    import spark.implicits._
    // A2b formats doc names as %012d and its DuckDB oracle pads with
    // lpad(...,12): DuckDB's lpad TRUNCATES past the target width, so
    // the two agree only while the pad is wide enough. Pin that 12
    // digits holds ids across the 10^8 boundary — full round-trip and
    // lexical order == numeric order (an 8-wide pad breaks both).
    val ids = Seq(1L, 99999999L, 100000000L, 123456789L, 999999999999L)
    val names = ids.toDF("doc_id")
      .select(format_string("doc%012d", col("doc_id")).as("dn"))
      .as[String].collect().toSeq
    assert(names == names.sorted, "lexical order must match numeric order")
    assert(names.map(_.stripPrefix("doc").toLong) == ids, "pad must round-trip losslessly")
    assert(names.forall(_.length == 15), "every name is 'doc' + exactly 12 digits")
  }

  test("mapReduce: reduce sees every value of its key exactly once") {
    import spark.implicits._
    val input = (1 to 100).toDS()
    val out = MapReduce.mapReduce[Int, Int, Int, (Int, Int)](
      input,
      n => Seq((n % 7, n)),
      (k, vs) => (k, vs.sum))
      .collect().toMap
    assert(out.values.sum == (1 to 100).sum)
    assert(out(0) == (7 to 98 by 7).sum)
  }

  test("mapCombineReduce: combiner path equals generic path") {
    import spark.implicits._
    val input = (1 to 1000).toDS()
    val combined = MapReduce.mapCombineReduce[Int, Int, Long, (Int, Long)](
      input, n => Seq((n % 13, 1L)), _ + _, (k, v) => (k, v))
      .collect().toMap
    val generic = MapReduce.mapReduce[Int, Int, Long, (Int, Long)](
      input, n => Seq((n % 13, 1L)), (k, vs) => (k, vs.sum))
      .collect().toMap
    assert(combined == generic)
  }
}
