package graft

import org.apache.spark.sql.functions._
import graft.operators.Cleaning

class CleaningSpec extends SparkSpec {

  test("dedupFirstKeepFirst keeps the first-arrived row per key") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("k1", 3, "late"), ("k1", 1, "first"), ("k1", 2, "mid"),
      ("k2", 10, "only"),
    ).toDF("k", "arrival", "tag")
    val got = Cleaning.dedupFirstKeepFirst(df, Seq("k"), "arrival")
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(got === Seq(("k1", "first"), ("k2", "only")))
  }

  test("dedupFirstKeepFirst is idempotent") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 1)).toDF("k", "arrival")
    val once = Cleaning.dedupFirstKeepFirst(df, Seq("k"), "arrival")
    val twice = Cleaning.dedupFirstKeepFirst(once, Seq("k"), "arrival")
    assert(once.orderBy("k").collect().toSeq === twice.orderBy("k").collect().toSeq)
  }

  test("coerceDecimalElseZero: parse failures → 0, rounding half-up, rows kept") {
    val s = spark; import s.implicits._
    val df = Seq("12.345", "abc", "", "7", "-3.005").toDF("raw")
    val got = df.select(Cleaning.coerceDecimalElseZero(col("raw")).cast("string"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("12.35", "0.00", "0.00", "7.00", "-3.01"))
    assert(got.size === 5) // never drops rows
  }

  test("unionPages preserves bag semantics across reordered page schemas") {
    val u = Cleaning.unionPages(spark, sf)
    val e = Tables.events(spark, sf)
    assert(u.count() === e.count())
    assert(u.columns.toSeq === Seq("event_id", "event_type", "value"))
  }
}
