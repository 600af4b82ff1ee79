package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema contract over the driver-generated testdata lake.
  *
  * Round-8 lesson: the driver regenerated `events.parquet` with a
  * different timestamp encoding and the drift surfaced as 14 SCATTERED
  * analysis failures (every events consumer died with a cryptic
  * DATATYPE_MISMATCH) plus 13 silently-missing correctness rows. This
  * spec turns the next drift into ONE named failure whose message says
  * which table/column moved and to what — diagnosis in one read, not an
  * evening. Columns the operators don't touch are not pinned; columns
  * with a known encoding history carry an allowed SET (events.ts has
  * shipped as nanos-as-long, micros-NTZ, and could ship as LTZ or
  * INT96-backed TimestampType).
  */
class TablesContractSpec extends AnyFunSuite {
  import TestSpark._

  private val anyTimestamp: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  // table -> (column -> allowed types). Only load-bearing columns.
  private val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map("r_regionkey" -> Set(IntegerType, LongType), "r_name" -> Set(StringType)),
    "nation" -> Map("n_nationkey" -> Set(IntegerType, LongType),
      "n_name" -> Set(StringType), "n_regionkey" -> Set(IntegerType, LongType)),
    "customer" -> Map("c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType, LongType), "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map("s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType, LongType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Map("p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType, LongType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map("o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> anyTimestamp, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map("l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType, LongType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> anyTimestamp),
    "events" -> Map("event_id" -> Set(LongType), "ts" -> anyTimestamp,
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map("doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType, IntegerType)),
    "embeddings" -> Map("vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false)),
      "label" -> Set(IntegerType, LongType)))

  test("testdata schemas match the loader contract (drift fails HERE, with a name)") {
    // The nanos conf mirrors Tables.events: without it a nanos-encoded
    // ts would throw PARQUET_TYPE_ILLEGAL at schema read instead of
    // reporting drift (it reads as LongType, which the contract allows).
    // Restored in the finally — the shared session must not leak it into
    // sibling suites (RelationalSpec pins the loader's no-delta contract).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
    val drift = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = Tables.load(spark, sf, table).schema
      cols.toSeq.sortBy(_._1).flatMap { case (c, allowed) =>
        schema.fields.find(_.name == c) match {
          case None => Some(s"$table.$c: MISSING (schema: ${schema.simpleString})")
          case Some(f) if !allowed(f.dataType) =>
            Some(s"$table.$c: ${f.dataType.simpleString} not in " +
              s"{${allowed.map(_.simpleString).mkString(", ")}}")
          case _ => None
        }
      }
    }
    assert(drift.isEmpty,
      "\nTESTDATA SCHEMA DRIFT — the driver likely regenerated the lake." +
        "\nUpdate the matching loader (see Tables.events for the round-9" +
        "\nprecedent: branch on the read schema, add a fixture) and this" +
        "\ncontract:\n  " + drift.mkString("\n  "))
    } finally spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
  }

  test("events loader OUTPUT contract: ts is session TimestampType whatever the file held") {
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType)
  }
}
