package graft

import org.apache.spark.sql.functions._

/** The SQL surface must agree with the Column API kernels. */
class ExtensionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.register(spark)
  }

  test("graft_poly_hash from SQL == native Column API") {
    val r = spark.sql("SELECT graft_poly_hash('abc') AS h").head.getLong(0)
    assert(r == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("full minhash signature pipeline in pure SQL") {
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs_v")
    val sql = spark.sql(
      """SELECT doc_id, graft_minhash_sigs(array_distinct(graft_shingle_hashes(text, 3)), 16) AS sig
         FROM docs_v WHERE size(graft_shingle_hashes(text, 3)) > 0""")
    val api = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.NativeExpressions.minhashSigs(
          array_distinct(graft.functions.NativeExpressions.shingleHashes(col("text"), 3)), 16).as("sig"))
      .filter(size(graft.functions.NativeExpressions.shingleHashes(col("text"), 3)) > 0)
    assert(sql.exceptAll(api).count() == 0)
    assert(api.exceptAll(sql).count() == 0)
  }

  test("graft_dot and graft_simhash from SQL") {
    val d = spark.sql("SELECT graft_dot(array(1.0F, 2.0F), array(3.0D, 0.5D)) AS d").head.getDouble(0)
    assert(d == 1.0 * 3.0 + 2.0 * 0.5)
    val s = spark.sql("SELECT graft_simhash(array(3L, 3L, 4L), 3) AS s").head.getLong(0)
    assert(s == 3L) // bits 0,1 majority-positive (2 of 3), bit 2 negative (1 of 3)
  }

  test("non-literal k is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sigs(array(1L), CAST(rand()*4 AS INT))").collect()
    }
    assert(e.getMessage.contains("literal integer"))
  }

  test("wrong arity and wrong types fail analysis with named errors") {
    val extra = intercept[Exception] {
      spark.sql("SELECT graft_simhash64(array(1L), 32)").collect()
    }
    assert(extra.getMessage.contains("graft_simhash64 expects 1 argument"))
    val missing = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0))").collect()
    }
    assert(missing.getMessage.contains("graft_dot expects 2 argument"))
    val wrongType = intercept[Exception] {
      spark.sql("SELECT graft_poly_hash(42)").collect()
    }
    assert(wrongType.getMessage.contains("graft_poly_hash expects STRING"))
    val badK = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sigs(array(1L), 65)").collect()
    }
    assert(badK.getMessage.contains("k must be in [1, 64]"))
  }
}
