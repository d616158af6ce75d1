package graft

import graft.queries.Quantize
import org.apache.spark.sql.functions._

/** int8 embedding quantization (SURVEY.md §2 E6) semantics. */
class QuantizeSpec extends SparkSpec {

  import spark.implicits._

  test("codes span [-127, 127]; extrema map to the range ends") {
    val emb = Seq(
      (1L, Array(0.0f, 10.0f)),
      (2L, Array(1.0f, 20.0f)),
      (3L, Array(0.5f, 15.0f))).toDF("vec_id", "embedding")
    val got = Quantize.quantizeInt8(emb)
      .as[(Long, Long, Long)].collect()
      .map { case (v, d, c) => (v, d) -> c }.toMap
    assert(got((1L, 0L)) == -127L && got((2L, 0L)) == 127L)
    assert(got((1L, 1L)) == -127L && got((2L, 1L)) == 127L)
    assert(got((3L, 0L)) == 0L && got((3L, 1L)) == 0L) // midpoints
  }

  test("constant dimension codes to 0, not NaN") {
    val emb = Seq((1L, Array(5.0f, 1.0f)), (2L, Array(5.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val dim0 = Quantize.quantizeInt8(emb).filter($"dim" === 0)
      .select("code").as[Long].collect().toSet
    assert(dim0 == Set(0L))
  }

  test("corpus codes stay in range and order preserves within a dimension") {
    val emb = Tables.embeddings(spark, sfDir).limit(100)
    val q = Quantize.quantizeInt8(emb).cache()
    val (lo, hi) = q.agg(min("code"), max("code")).as[(Long, Long)].head()
    assert(lo >= -127L && hi <= 127L)
    // monotone: larger raw value never gets a smaller code (dim 0)
    val joined = emb.select($"vec_id", element_at($"embedding", 1).as("v"))
      .join(q.filter($"dim" === 0), "vec_id")
      .select($"v".cast("double"), $"code").as[(Double, Long)].collect()
      .sortBy(_._1)
    assert(joined.sliding(2).forall {
      case Array((_, c1), (_, c2)) => c1 <= c2
      case _ => true
    })
    q.unpersist()
  }
}
