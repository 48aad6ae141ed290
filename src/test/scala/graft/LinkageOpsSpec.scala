package graft

import org.apache.spark.sql.functions._

import graft.operators.LinkageOps

class LinkageOpsSpec extends SparkSpec {

  test("recordLinkage: every planted corruption resolves to its true " +
      "parent at the expected edit distance") {
    val got = LinkageOps.recordLinkage(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dirtyIds = Tables.customer(spark, sf)
      .filter((col("c_custkey") % 10).isin(0L, 3L, 5L))
      .select(col("c_custkey")).collect().map(_.getLong(0))
    assert(dirtyIds.nonEmpty)
    assert(got.keySet === dirtyIds.toSet, "every dirty record matched")
    for (id <- dirtyIds) {
      val (matched, dist) = got(id)
      assert(matched === id, s"dirty $id linked to wrong parent $matched")
      val expected = if (id % 10 == 3) 0L else 1L
      assert(dist === expected, s"dirty $id at distance $dist")
    }
  }

  test("blocking is load-bearing: candidate pairs are block-bounded, " +
      "orders of magnitude under all-pairs") {
    val dirty = LinkageOps.dirtyRecords(spark, sf)
      .withColumn("blk", substring(col("dirty_name"), -4, 4))
    val canon = Tables.customer(spark, sf)
      .select(col("c_custkey"), substring(col("c_name"), -4, 4).as("blk"))
    val nCand = dirty.join(canon, "blk").count()
    val nDirty = dirty.count()
    val allPairs = nDirty * canon.count()
    // suffix blocks hold ~registry/10^4 members; candidates should sit
    // within a small constant of the dirty count, not near all-pairs
    assert(nCand <= nDirty * 4, s"block fan-out $nCand vs dirty $nDirty")
    assert(nCand * 20 < allPairs, s"candidates $nCand too close to all-pairs $allPairs")
  }
}
