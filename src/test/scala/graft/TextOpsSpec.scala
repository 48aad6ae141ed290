package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {

  test("tokens: lowercase ASCII split, empties removed") {
    val s = spark; import s.implicits._
    val got = Seq("Hello, World! 42", "", "  ", "a-b_c").toDF("t")
      .select(TextOps.tokens(col("t")).as("tok"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(got(0) === Seq("hello", "world", "42"))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
    assert(got(3) === Seq("a", "b", "c"))
  }

  test("qualityScore ratios are bounded and rows preserved") {
    val q = TextOps.qualityScore(spark, sf)
    assert(q.count() === Tables.documents(spark, sf).count())
    val bad = q.filter(
      col("stopword_ratio") < 0 || col("stopword_ratio") > 1 ||
      col("punct_ratio") < 0 || col("punct_ratio") > 1 ||
      col("mean_token_len") < 0).count()
    assert(bad === 0)
  }

  test("docFingerprint: whitespace-insensitive, case-insensitive") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "different")).toDF("doc_id", "text")
    df.createOrReplaceTempView("fp_docs")
    val fp = df.select(col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("langId predicts a language (or und) for every doc") {
    val l = TextOps.langId(spark, sf)
    assert(l.count() === Tables.documents(spark, sf).count())
    val langs = l.select("predicted_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "fr", "es", "de", "zh", "und")))
  }
}
