package graft

import graft.queries.Integrity

/** I7 [[Integrity.fkAudit]] on planted keys: orphan rows vs keys, null
  * FK exclusion (SQL semantics: null never dangles), unreferenced
  * parents, and non-unique parent key collapsing. */
class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("fkAudit counts orphans, nulls, and unreferenced parents") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(4L), None)
      .toDF("fk_key")
    val parent = Seq(1L, 2L, 3L).toDF("pk_key")
    val r = Integrity.fkAudit(child, "fk_key", parent, "pk_key", "c->p")
      .collect().head
    assert(r.getString(0) == "c->p")
    assert(r.getLong(1) == 5L, "n_child_rows counts null FKs too")
    assert(r.getLong(2) == 3L, "n_child_keys: distinct non-null {1,2,4}")
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L, "orphan rows/keys: {4}")
    assert(r.getLong(5) == 3L && r.getLong(6) == 1L, "parents 3, unref {3}")
  }

  test("duplicate parent keys collapse; clean FK audits to zero orphans") {
    val child = Seq(1L, 2L, 2L).toDF("k")
    val parent = Seq(1L, 1L, 2L).toDF("p")
    val r = Integrity.fkAudit(child, "k", parent, "p", "x").collect().head
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((0L, 0L, 2L, 0L)), r)
  }
}
