package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  *
  * Shared contract of both variants:
  *  - time columns must ALREADY be BIGINT (convert timestamps with
  *    `unix_micros`; integer time keeps the kernels exact) — rejected
  *    up front rather than silently cast, because a silent
  *    TIMESTAMP→long cast truncates to seconds and reorders sub-second
  *    fact/state sequences;
  *  - payload names must not collide with fact columns (the payload is
  *    appended to the fact row — a collision would silently overwrite
  *    fact data);
  *  - states with NULL stateTime are dropped (an unknown-time state
  *    can never be "the latest at or before t").
  */
object AsOfJoin {

  private def checkContract(
      fn: String,
      facts: DataFrame,
      states: DataFrame,
      factTime: String,
      stateTime: String,
      payload: Seq[String]): Unit = {
    require(payload.nonEmpty, s"$fn needs at least one payload column")
    require(facts.schema(factTime).dataType == LongType,
      s"$fn: factTime '$factTime' must be BIGINT (got " +
        s"${facts.schema(factTime).dataType.catalogString}); convert " +
        "timestamps with unix_micros — a silent cast would truncate")
    require(states.schema(stateTime).dataType == LongType,
      s"$fn: stateTime '$stateTime' must be BIGINT (got " +
        s"${states.schema(stateTime).dataType.catalogString})")
    val collisions = payload.filter(facts.columns.contains)
    require(collisions.isEmpty,
      s"$fn: payload column(s) ${collisions.mkString(", ")} already exist " +
        "on the fact side — rename one side or they would be overwritten")
    // the operator's own scratch columns: a fact/payload column with one
    // of these names would be silently overwritten and then dropped
    val reserved = Set("__hist", "__ts", "__idx", "__t", "__kind", "__p",
      "__last", "__asof_t")
    val taken = (facts.columns.toSeq ++ payload).filter(reserved)
    require(taken.isEmpty,
      s"$fn: column name(s) ${taken.distinct.mkString(", ")} are reserved " +
        "internal names of the as-of join — rename them")
  }

  /** `facts` joined as-of against `states`.
    *
    * @param facts     the big side; keeps all rows and columns
    * @param states    the per-key state history — must be small enough
    *                  to broadcast after per-key folding
    * @param keys      equi-join key columns (present on both sides)
    * @param factTime  BIGINT column on `facts`
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
    checkContract("asOfJoin", facts, states, factTime, stateTime, payload)
    // "__asof_t" not "t": the struct field must never shadow a payload
    // column's name, or e("__asof_t")/hit(p) turns ambiguous
    val entry = struct(col(stateTime).as("__asof_t") +: payload.map(col): _*)
    // one sorted (t, payload…) array per key; ascending by (t, payload)
    // so the rightmost element <= factTime is the latest state
    val folded = states
      .filter(col(stateTime).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(entry)).as("__hist"))
      .select(keys.map(col) :+
        col("__hist") :+
        transform(col("__hist"), e => e("__asof_t")).as("__ts"): _*)
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
    checkContract("asOfJoinBig", facts, states, factTime, stateTime, payload)
    val factCols = facts.columns.toSeq
    val pStruct = struct(payload.map(col): _*)
    val sTagged = states
      .filter(col(stateTime).isNotNull)
      .select(keys.map(col) :+ col(stateTime).as("__t") :+
        lit(0).as("__kind") :+ pStruct.as("__p"): _*)
    val sFull = factCols.filterNot(keys.contains).foldLeft(sTagged) { (df, c) =>
      df.withColumn(c, lit(null).cast(facts.schema(c).dataType))
    }
    val fTagged = facts.select(
      factCols.map(col) :+ col(factTime).as("__t") :+
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
