package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sources.FileFormats

/** The file-format round-trip gate's local proofs: each format
  * generation is the IDENTITY on the adversarial payload (multiset
  * equality, not just aggregate equality), the armor actually covers
  * the loss classes it claims, and the pinned CSV option set is
  * load-bearing (the default-options read demonstrably loses data on
  * the same files).
  */
class FileFormatsSpec extends SparkSpec {

  private def hard = FileFormats.hardenedDocs(spark, sf).cache()

  test("payload armor covers every claimed loss class") {
    val p = hard.select(col("payload")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(p.contains(null), "null case present")
    assert(p.contains(""), "empty-string case present (distinct from null)")
    val armored = p.filter(s => s != null && s.nonEmpty)
    assert(armored.nonEmpty)
    for (needle <- Seq("\n", "\r", "\"", ",", "\t", "\\", "😀"))
      assert(armored.forall(_.contains(needle)), s"armor carries ${needle.map(_.toInt)}")
    // edge whitespace — the writer-trim loss class is on the gated hash
    assert(armored.forall(s => s.startsWith(" ") && s.endsWith("\t ")))
    // the CSV null sentinel must never occur as content — the format's
    // documented ambiguity, kept out of the derivation by construction
    assert(armored.forall(!_.contains("\\N")))
  }

  test("each format generation is the identity (multiset equality)") {
    def assertSame(a: org.apache.spark.sql.DataFrame, label: String): Unit = {
      assert(a.exceptAll(hard).count() === 0, s"$label added/changed rows")
      assert(hard.exceptAll(a).count() === 0, s"$label lost rows")
    }
    Layout.withStagedDir(spark, "fmtspec-csv") { dir =>
      assertSame(FileFormats.throughCsv(spark, hard, dir).localCheckpoint(true), "csv")
    }
    Layout.withStagedDir(spark, "fmtspec-json") { dir =>
      assertSame(FileFormats.throughJsonl(spark, hard, dir).localCheckpoint(true), "jsonl")
    }
    Layout.withStagedDir(spark, "fmtspec-orc") { dir =>
      assertSame(FileFormats.throughOrc(spark, hard, dir).localCheckpoint(true), "orc")
    }
  }

  test("the pinned CSV options are load-bearing: the default-option read " +
      "of the same files loses rows or folds null/empty") {
    Layout.withStagedDir(spark, "fmtspec-neg") { dir =>
      hard.sparkSession // force init
      FileFormats.throughCsv(spark, hard, dir) // writes with the pinned set
      val naive = spark.read
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType))))
        .option("header", "true") // but default escape/multiLine/null handling
        .csv(dir).localCheckpoint(true)
      val nHard = hard.count()
      val naiveDiffers =
        naive.count() != nHard ||
          naive.exceptAll(hard).count() != 0 ||
          naive.filter(col("payload") === "").count() !=
            hard.filter(col("payload") === "").count()
      assert(naiveDiffers,
        "default-option CSV read round-tripped the armored payload — the " +
          "pinned option set would be dead weight")
    }
  }

  test("gated aggregate is stable across the triple round-trip re-run " +
      "(deterministic derivation, order-invariant checksum)") {
    val a = FileFormats.formatRoundtrip(spark, sf).collect()
    val b = FileFormats.formatRoundtrip(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.nonEmpty)
  }

  test("schemaEvolution: the merged read is exactly the derived union — " +
      "legacy rows carry typed NULL quality, new rows their values") {
    import org.apache.spark.sql.types._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val expected = docs.filter(col("doc_id") % 2 === 0)
      .withColumn("quality", lit(null).cast(LongType))
      .unionByName(docs.filter(col("doc_id") % 2 =!= 0)
        .withColumn("quality", (col("n_chars") % 100).cast(LongType)))
    graft.operators.Layout.withStagedDir(spark, "fmtspec-evo") { dir =>
      docs.filter(col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$dir/gen1")
      docs.filter(col("doc_id") % 2 =!= 0)
        .withColumn("quality", (col("n_chars") % 100).cast(LongType))
        .write.mode("overwrite").parquet(s"$dir/gen2")
      val merged = spark.read.option("mergeSchema", "true")
        .parquet(s"$dir/gen1", s"$dir/gen2").localCheckpoint(true)
      assert(merged.schema("quality").dataType === LongType,
        "merged schema carries the evolved column as its declared type")
      assert(merged.exceptAll(expected).count() === 0)
      assert(expected.exceptAll(merged).count() === 0)
      // the gate is load-bearing: the old generation really lacks the
      // column on disk (reading gen1 alone has no quality field)
      assert(!spark.read.parquet(s"$dir/gen1").schema.fieldNames.contains("quality"))
    }
  }

  test("adversarial battery: CSV and JSONL round-trip control chars, BOM, " +
      "bidi overrides, combining marks, and edge whitespace; the CSV null " +
      "sentinel is the ONLY documented exception") {
    import spark.implicits._
    val nasty: Seq[String] = Seq(
      "nul:" + "\u0000", "bell:" + "\u0007", "esc:" + "\u001b[0m",
      "bom:" + "\ufeff" + "x", "comb:e" + "\u0301",
      "zwj:" + "\u200d" + "\u200b", "rtl:" + "\u202e" + "abc",
      "crlf:\r\n", "cr:\r", "lf:\n", "tabs:\t\t",
      "q:\"\"q", "\\N", "\\", "''", ",,,", " lead", "trail ", "  ",
      new String(Character.toChars(0x1f600)) + new String(Character.toChars(0x1d54a)),
      "mix:\"y,\n\tz\\w")
    val df = nasty.zipWithIndex.map { case (v, i) => (i.toLong, "s", v) }
      .toDF("doc_id", "source", "payload")
    val sentinelIds = nasty.zipWithIndex.collect { case (v, i) if v == "\\N" => i.toLong }
    assert(sentinelIds.nonEmpty, "battery must include the sentinel itself")
    Layout.withStagedDir(spark, "fmtspec-nasty-csv") { dir =>
      val back = FileFormats.throughCsv(spark, df, dir).localCheckpoint(true)
      val lost = df.exceptAll(back).collect()
      // the ONLY acceptable divergence: a payload equal to the null
      // sentinel folds to NULL — the format limit the scaladoc declares
      assert(lost.map(_.getLong(0)).toSet === sentinelIds.toSet,
        s"csv lost more than the declared sentinel: ${lost.mkString("; ")}")
      assert(back.exceptAll(df).collect()
        .forall(r => sentinelIds.contains(r.getLong(0)) && r.isNullAt(2)))
    }
    Layout.withStagedDir(spark, "fmtspec-nasty-json") { dir =>
      val back = FileFormats.throughJsonl(spark, df, dir).localCheckpoint(true)
      assert(back.exceptAll(df).count() === 0 && df.exceptAll(back).count() === 0,
        "jsonl must be lossless on the whole battery")
    }
    Layout.withStagedDir(spark, "fmtspec-nasty-orc") { dir =>
      val back = FileFormats.throughOrc(spark, df, dir).localCheckpoint(true)
      assert(back.exceptAll(df).count() === 0 && df.exceptAll(back).count() === 0,
        "orc must be lossless on the whole battery")
    }
  }
}
