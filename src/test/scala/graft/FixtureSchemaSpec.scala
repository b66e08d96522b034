package graft

import org.apache.spark.sql.types._

/** Early-warning gate for driver fixture drift.
  *
  * The round-8 lesson: the driver regenerated `events.parquet` with a
  * different `ts` physical type and 15 queries failed analysis with a
  * message naming none of this. This spec reads every fixture through
  * [[Tables]] (adapters applied — the exact relations the queries see)
  * and asserts the column/type contract each query family depends on,
  * so the NEXT regeneration fails one test with the table and column
  * in the failure message instead of a cascade downstream.
  *
  * Timestamp columns accept both TIMESTAMP and TIMESTAMP_NTZ: the
  * fixtures have shipped as isAdjustedToUTC=false micros (reads as
  * NTZ; fine for batch queries), and the events adapter normalizes
  * `ts` to TIMESTAMP for the watermark consumers.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def ts(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType
  private def int(dt: DataType): Boolean =
    dt == IntegerType || dt == LongType
  private def vec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  private val contract: Map[String, Map[String, DataType => Boolean]] = Map(
    "region" -> Map("r_regionkey" -> int, "r_name" -> (_ == StringType)),
    "nation" -> Map("n_nationkey" -> int, "n_name" -> (_ == StringType),
      "n_regionkey" -> int),
    "customer" -> Map("c_custkey" -> int, "c_name" -> (_ == StringType),
      "c_nationkey" -> int, "c_acctbal" -> (_ == DoubleType),
      "c_mktsegment" -> (_ == StringType)),
    "supplier" -> Map("s_suppkey" -> int, "s_nationkey" -> int,
      "s_acctbal" -> (_ == DoubleType)),
    "part" -> Map("p_partkey" -> int, "p_brand" -> (_ == StringType),
      "p_type" -> (_ == StringType), "p_size" -> int,
      "p_retailprice" -> (_ == DoubleType)),
    "orders" -> Map("o_orderkey" -> int, "o_custkey" -> int,
      "o_orderstatus" -> (_ == StringType), "o_totalprice" -> (_ == DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> (_ == StringType)),
    "lineitem" -> Map("l_orderkey" -> int, "l_partkey" -> int,
      "l_suppkey" -> int, "l_quantity" -> (_ == DoubleType),
      "l_extendedprice" -> (_ == DoubleType), "l_discount" -> (_ == DoubleType),
      "l_returnflag" -> (_ == StringType), "l_linestatus" -> (_ == StringType),
      "l_shipdate" -> ts),
    // ts must be the ADAPTED TimestampType here: watermarks reject NTZ,
    // and Tables' branch exists precisely to guarantee this postcondition
    "events" -> Map("event_id" -> int, "ts" -> (_ == TimestampType),
      "user_id" -> int, "event_type" -> (_ == StringType),
      "value" -> (_ == DoubleType), "props" -> (_ == StringType)),
    "documents" -> Map("doc_id" -> int, "text" -> (_ == StringType),
      "lang" -> (_ == StringType), "source" -> (_ == StringType)),
    "embeddings" -> Map("vec_id" -> int, "embedding" -> vec, "label" -> int)
  )

  test("every fixture table satisfies the column/type contract the queries assume") {
    contract.foreach { case (table, cols) =>
      val schema = Tables(spark, dir, table).schema
      cols.foreach { case (name, ok) =>
        val field = schema.find(_.name == name)
        assert(field.isDefined, s"$table: column '$name' missing (schema: ${schema.simpleString})")
        assert(ok(field.get.dataType),
          s"$table.$name: unexpected type ${field.get.dataType.simpleString} " +
            s"(schema: ${schema.simpleString}) — fixture drift? see Tables.scala adapter")
      }
    }
  }

  test("all three SFs agree on the adapted events.ts type") {
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val d = s"/root/testdata/$sf"
      if (new java.io.File(d).isDirectory) {
        val dt = Tables(spark, d, "events").schema("ts").dataType
        assert(dt == TimestampType, s"$sf: adapted events.ts is ${dt.simpleString}")
      }
    }
  }
}
