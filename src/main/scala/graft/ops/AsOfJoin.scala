package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Broadcast as-of join — for each fact row, the LATEST state row with
  * the same key and `stateTime <= factTime` (nulls when no state
  * qualifies). The operator Spark lacks natively: expressing it as an
  * interval theta-join makes every fact row evaluate EVERY candidate
  * interval of its key (a hash join on the key with an O(n) residual —
  * at n states per key that is facts×n filter evaluations), and
  * expressing it as a window over the union shuffles the full fact
  * stream. Here the state history folds into one sorted array per key,
  * broadcasts (state is metadata-scale by assumption: config logs,
  * dimension versions, exchange rates), and each fact row binary-searches
  * it via the codegen [[graft.functions.NativeExpressions.SearchSortedRight]]
  * kernel — O(log n) per row, no shuffle of the fact side at all.
  */
object AsOfJoin {

  /** `facts` joined as-of against `states`.
    *
    * @param facts     the big side; keeps all rows and columns
    * @param states    the per-key state history — must be small enough
    *                  to broadcast after per-key folding
    * @param keys      equi-join key columns (present on both sides)
    * @param factTime  BIGINT column on `facts` (convert timestamps with
    *                  `unix_micros` — integer time keeps the kernel
    *                  exact; doubles would not be)
    * @param stateTime BIGINT column on `states`, same epoch/scale
    * @param payload   state columns carried to the output. Ties on
    *                  stateTime resolve by the LARGEST payload tuple
    *                  (lexicographic over payload order) — pass a
    *                  monotone version/sequence column first to make
    *                  tie-breaks explicit.
    */
  def asOfJoin(
      facts: DataFrame,
      states: DataFrame,
      keys: Seq[String],
      factTime: String,
      stateTime: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asOfJoin needs at least one payload column")
    val entry = struct(col(stateTime).as("t") +: payload.map(col): _*)
    // one sorted (t, payload…) array per key; ascending by (t, payload)
    // so the rightmost element <= factTime is the latest state
    val folded = states
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(entry)).as("__hist"))
      .select(keys.map(col) :+
        col("__hist") :+
        transform(col("__hist"), e => e("t")).as("__ts"): _*)
    val idx = graft.functions.NativeExpressions
      .searchSortedRight(col("__ts"), col(factTime))
    val hit = element_at(col("__hist"), col("__idx"))
    payload.foldLeft(
        facts.join(broadcast(folded), keys, "left")
          .withColumn("__idx", idx)) { (df, p) =>
        df.withColumn(p, when(col("__idx") > 0, hit(p)))
      }
      .drop("__hist", "__ts", "__idx")
  }

  /** Shuffle-based as-of join for when BOTH sides are big — same
    * semantics as [[asOfJoin]] (latest state per key with
    * `stateTime <= factTime`, ties on stateTime to the largest payload
    * tuple), different execution: union the two streams, ONE hash
    * shuffle on the key, sort each partition by (time, side, payload)
    * with states ordered before facts at equal time, and carry the
    * last state forward with a running `last(ignoreNulls)` window.
    * No broadcast anywhere, state flows through Spark's spillable
    * sort — the shape that joins 100 TB of facts to 10 TB of states
    * (trades→quotes, events→dimension versions). Prefer [[asOfJoin]]
    * when the folded state history fits in a broadcast: it skips the
    * fact-side shuffle entirely. */
  def asOfJoinBig(
      facts: DataFrame,
      states: DataFrame,
      keys: Seq[String],
      factTime: String,
      stateTime: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asOfJoinBig needs at least one payload column")
    val factCols = facts.columns.toSeq
    val pStruct = struct(payload.map(col): _*)
    val sTagged = states.select(
      keys.map(col) :+ col(stateTime).cast("long").as("__t") :+
        lit(0).as("__kind") :+ pStruct.as("__p"): _*)
    val sFull = factCols.filterNot(keys.contains).foldLeft(sTagged) { (df, c) =>
      df.withColumn(c, lit(null).cast(facts.schema(c).dataType))
    }
    val fTagged = facts.select(
      factCols.map(col) :+ col(factTime).cast("long").as("__t") :+
        lit(1).as("__kind") :+
        lit(null).cast(sTagged.schema("__p").dataType).as("__p"): _*)
    // states sort before facts at equal time (<= semantics); among
    // equal-time states the payload tuple breaks the tie ascending, so
    // the running last picks the largest — matching asOfJoin exactly
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__kind"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = fTagged.unionByName(sFull)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
    payload.foldLeft(filled) { (df, p) => df.withColumn(p, col("__last")(p)) }
      .drop("__t", "__kind", "__p", "__last")
  }
}
