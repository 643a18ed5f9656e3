package graft

import org.apache.spark.sql.types._

/** Canary for the DRIVER-FIXTURE contract: every column the engine's
  * operators actually reference must load with the expected name and a
  * workable type. The fixtures are regenerated between rounds and their
  * physical encodings have changed before (round 7: every timestamp
  * column silently became TIMESTAMP_NTZ and broke two queries) — this
  * suite turns the next such change into an immediate, named test
  * failure instead of a mid-bench analysis error.
  *
  * Deliberately a SUBSET check: the driver may add columns freely; it
  * removing or retyping one the engine reads is what must get caught.
  */
class FixtureContractSpec extends SparkSpec {

  private val required: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("every fixture table loads with the engine's column contract " +
      "(names + types the operators reference), timestamps normalized") {
    val problems = Seq.newBuilder[String]
    for ((table, cols) <- required.toSeq.sortBy(_._1)) {
      val df = Tables.load(spark, sf, table)
      val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
      for ((c, t) <- cols) have.get(c) match {
        case None => problems += s"$table.$c: MISSING (have ${have.keys.toSeq.sorted.mkString(",")})"
        case Some(got) if got != t &&
            // array element nullability is writer-dependent; compare shape
            !((got, t) match {
              case (ArrayType(ge, _), ArrayType(te, _)) => ge == te
              case _ => false
            }) =>
          problems += s"$table.$c: expected ${t.simpleString}, got ${got.simpleString}"
        case _ => ()
      }
      // no TIMESTAMP_NTZ may leak past Tables.load — the round-7 lesson
      df.schema.fields.filter(_.dataType == TimestampNTZType).foreach(f =>
        problems += s"$table.${f.name}: TIMESTAMP_NTZ leaked through Tables.load")
    }
    assert(problems.result().isEmpty,
      "fixture contract violated:\n  " + problems.result().mkString("\n  "))
  }

  test("fixture tables are non-empty at the smoke scale factor") {
    for (t <- Tables.names)
      assert(Tables.load(spark, sf, t).limit(1).count() === 1L,
        s"$t is empty at $sf")
  }
}
