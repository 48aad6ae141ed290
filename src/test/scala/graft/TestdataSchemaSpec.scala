package graft

import org.apache.spark.sql.types._

/** Environment-drift tripwire for the WHOLE testdata surface — the
  * generalization of [[TsEncodingSpec]]'s lesson: round 8 lost three
  * oracle keys to a silent regeneration of `events.ts`'s parquet
  * encoding, discovered only in the driver's CORRECTNESS artifact. This
  * spec pins the column names and Spark-visible types every operator
  * currently assumes, so the NEXT regeneration fails HERE, in one test
  * whose message names the drifted column — not as N cryptic analysis
  * errors scattered across the query surface.
  *
  * If this spec fails after a testdata regeneration: (1) check whether
  * a normalization belongs in [[Tables]] (the `eventsWithTs` precedent —
  * normalize encodings that denote the same values); (2) if the type
  * change is semantic (e.g. embedding float→double), audit the operators
  * reading that column (micros quantization, the native
  * CosineSimilarity expression) AND their DuckDB oracle twins together
  * before updating the pin.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    // o_orderdate / l_shipdate read as NTZ (timestamp[us], no tz) and the
    // reference views are oracle-green on NTZ (date_trunc/date_format
    // accept it; only unix_micros-class arithmetic rejects it, which is
    // why events.ts alone needs the Tables normalization)
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // ts is whatever the generator shipped, POST-normalization by
    // Tables.eventsWithTs — the reader contract, not the file encoding
    // (TsEncodingSpec covers the encodings themselves)
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  for (sfDir <- Seq(TestSpark.sf0001, TestSpark.sf001, TestSpark.sf01))
    test(s"testdata schema pin: $sfDir") {
      for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
        val df = table match {
          case "events" => Tables.events(spark, sfDir) // reader contract incl. ts normalization
          case t        => Tables.read(spark, sfDir, t)
        }
        val got = df.schema.fields.map(f => f.name -> f.dataType).toSeq
        assert(got === cols,
          s"$sfDir/$table drifted from the pinned schema — see this spec's " +
            "scaladoc for the remediation protocol before updating the pin")
      }
    }
}
