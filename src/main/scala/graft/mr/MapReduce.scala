package graft.mr

import org.apache.spark.sql.{Dataset, Encoder}

/** The reference's user-facing pair type
  * (/root/reference/src/mr/types.go — `KeyValue{Key, Value string}`). */
final case class KeyValue(key: String, value: String)

/** Generic MapReduce API with the reference's contract
  * (/root/reference/src/mr/worker.go:30-107: `Map(file, contents) ->
  * []KeyValue`, hash-partition by key, `Reduce(key, values) -> string`),
  * re-expressed as a typed Spark plan.
  *
  * Spark-first mapping of the reference's moving parts:
  *  - the coordinator/worker task graph, 10 s re-issue timeout and
  *    exactly-once output rename are subsumed by Spark's scheduler
  *    (lineage re-execution, speculative tasks, task-commit protocol);
  *  - `ihash(key) % NReduce` (worker.go:16-20) becomes the hash shuffle
  *    Catalyst plans for `groupByKey` — partition count comes from
  *    `spark.sql.shuffle.partitions`/AQE instead of a fixed NReduce;
  *  - when the user supplies an associative combiner we run it as a typed
  *    `reduceGroups` (an `Aggregator` with map-side partial merge), so
  *    shuffle volume is O(distinct keys × partitions), not O(records) —
  *    the classic MR combiner, chosen automatically by the plan.
  *
  * Scale notes: `mapGroups` streams each key's values (no
  * materialization), so a hot key spills rather than OOMs; keys are
  * hash-distributed across all reducers exactly like the reference but
  * with AQE-coalesced partitioning.
  */
object MapReduce {

  /** Fully generic map→shuffle→reduce. `reduceFn` sees the key's values as
    * a single iterator (order unspecified, as in the reference — values
    * arrive in worker-local order there too). */
  def mapReduce[IN, K, V, OUT](
      input: Dataset[IN],
      mapFn: IN => IterableOnce[(K, V)],
      reduceFn: (K, Iterator[V]) => OUT)(implicit
      kvEnc: Encoder[(K, V)],
      kEnc: Encoder[K],
      outEnc: Encoder[OUT]): Dataset[OUT] =
    input
      .flatMap(mapFn)
      .groupByKey(_._1)
      .mapGroups((k, it) => reduceFn(k, it.map(_._2)))

  /** Combiner path for associative-commutative reductions: map-side partial
    * aggregation (MR "combiner"), then `finishFn` shapes the final record. */
  def mapCombineReduce[IN, K, V, OUT](
      input: Dataset[IN],
      mapFn: IN => IterableOnce[(K, V)],
      combineFn: (V, V) => V,
      finishFn: (K, V) => OUT)(implicit
      kvEnc: Encoder[(K, V)],
      kEnc: Encoder[K],
      vEnc: Encoder[V],
      outEnc: Encoder[OUT]): Dataset[OUT] =
    input
      .flatMap(mapFn)
      .groupByKey(_._1)
      .mapValues(_._2)
      .reduceGroups(combineFn)
      .map { case (k, v) => finishFn(k, v) }

  /** String-typed veneer matching the reference worker contract verbatim:
    * one (docName, contents) record per input file, `[]KeyValue` out of
    * map, `values` materialized per key for reduce. Prefer the typed
    * variants above for new code — this exists so reference mrapps port
    * line-for-line. */
  def runJob(
      files: Dataset[(String, String)],
      map: (String, String) => Seq[KeyValue],
      reduce: (String, Seq[String]) => String)(implicit
      kvEnc: Encoder[(String, String)],
      kEnc: Encoder[String],
      outEnc: Encoder[KeyValue]): Dataset[KeyValue] =
    mapReduce[(String, String), String, String, KeyValue](
      files,
      (fc: (String, String)) => map(fc._1, fc._2).map(kv => (kv.key, kv.value)),
      (k: String, vs: Iterator[String]) => KeyValue(k, reduce(k, vs.toSeq)))
}
