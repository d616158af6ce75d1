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
