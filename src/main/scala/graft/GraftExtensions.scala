package graft

import graft.functions.NativeExpressions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for graft's native kernels.
  *
  * Production wiring (applies to every session built from the config):
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * For an already-running session, [[GraftExtensions.register]] installs
  * the same functions into its registry.
  *
  * SQL: `graft_poly_hash(str)`, `graft_shingle_hashes(str, k)`,
  * `graft_minhash_sigs(arr, k)`, `graft_simhash(arr, bits)`,
  * `graft_dot(a, b)`, `graft_cosine(a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // custom whole-operator path: window row_number()<=k rewrites to the
    // partial/final bounded-heap TopKPerKey operator
    ext.injectOptimizerRule(_ => graft.rules.WindowRankToTopK)
    ext.injectPlannerStrategy(sp => new graft.plans.TopKStrategy(sp))
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer parameter, got $other")
  }

  /** Wrong argument COUNTS must fail analysis with a named error, same
    * policy as the expressions' own checkInputDataTypes — extra args
    * silently dropped would be exactly the misuse class those checks
    * exist to eliminate. */
  private def arity(fn: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n) throw new IllegalArgumentException(
        s"$fn expects $n argument(s), got ${args.length}")
      build(args)
    }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (name, info, builder) for every graft SQL function. */
  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_poly_hash",
      info("graft_poly_hash", "_FUNC_(str) - portable polynomial hash (mod 1e9+7) of the UTF-8 bytes"),
      arity("graft_poly_hash", 1)(args => PolyHash(args.head))),
    ("graft_shingle_hashes",
      info("graft_shingle_hashes", "_FUNC_(str, k) - poly hashes of every word k-shingle"),
      arity("graft_shingle_hashes", 2)(args =>
        ShingleHashes(args.head, intArg(args(1), "graft_shingle_hashes")))),
    ("graft_minhash_sigs",
      info("graft_minhash_sigs", "_FUNC_(arr, k) - k MinHash signatures over a hash array"),
      arity("graft_minhash_sigs", 2)(args =>
        MinHashSigs(args.head, intArg(args(1), "graft_minhash_sigs")))),
    ("graft_simhash",
      info("graft_simhash", "_FUNC_(arr, bits) - SimHash bit-majority of a hash array"),
      arity("graft_simhash", 2)(args =>
        SimHash(args.head, intArg(args(1), "graft_simhash")))),
    ("graft_simhash64",
      info("graft_simhash64", "_FUNC_(arr) - 64-bit banded SimHash of a hash array"),
      arity("graft_simhash64", 1)(args => SimHash64(args.head))),
    ("graft_dot",
      info("graft_dot", "_FUNC_(a, b) - strict left-fold dot product of float/double arrays"),
      arity("graft_dot", 2)(args => DotProduct(args.head, args(1)))),
    ("graft_intersect_size",
      info("graft_intersect_size", "_FUNC_(a, b) - |A intersect B| of two BIGINT arrays (set semantics)"),
      arity("graft_intersect_size", 2)(args => IntersectSize(args.head, args(1)))),
    ("graft_search_sorted",
      info("graft_search_sorted", "_FUNC_(arr, key) - count of elements <= key in an ascending BIGINT array (binary search)"),
      arity("graft_search_sorted", 2)(args => SearchSortedRight(args.head, args(1)))),
    ("graft_lsh_buckets",
      info("graft_lsh_buckets", "_FUNC_(emb, planeBase, tables, bits, dims) - sign-bit LSH bucket ids, one per table"),
      arity("graft_lsh_buckets", 5)(args => LshBuckets(args.head,
        intArg(args(1), "graft_lsh_buckets"), intArg(args(2), "graft_lsh_buckets"),
        intArg(args(3), "graft_lsh_buckets"), intArg(args(4), "graft_lsh_buckets")))),
    ("graft_simhash_combos",
      info("graft_simhash_combos", "_FUNC_(simhash) - the 56 3-of-8 block-combination band keys of a 64-bit SimHash"),
      arity("graft_simhash_combos", 1)(args => SimHashCombos(args.head))),
    ("graft_max_multiplicity",
      info("graft_max_multiplicity", "_FUNC_(arr) - highest multiplicity of any value in a BIGINT array"),
      arity("graft_max_multiplicity", 1)(args => MaxMultiplicity(args.head))),
    ("graft_top_gram_cover",
      info("graft_top_gram_cover", "_FUNC_(toks, n) - max char coverage of any word n-gram (occurrences x gram chars)"),
      arity("graft_top_gram_cover", 2)(args =>
        TopGramCover(args.head, intArg(args(1), "graft_top_gram_cover")))))

  /** Install the functions into a LIVE session's registry (the
    * extensions path only applies at session construction). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, i, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, i, builder)
    }
}
