package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Pins the LOADED schema of every testdata table, so a driver-side
  * testdata regeneration that changes a physical type fails here — one
  * obvious assertion — instead of surfacing as dozens of downstream
  * analysis errors spread across unrelated entries (the round-7 lesson:
  * `events.ts` flipped TIMESTAMP(NANOS) → TIMESTAMP(MICROS) and took out
  * 26 entries before the loader branch in [[Tables]] absorbed it).
  *
  * The pins are on the post-loader schema (what every query consumes),
  * not the raw parquet footer: `events.ts` must come out as a
  * session-zoned TimestampType regardless of which physical generation is
  * on disk, while date-like columns elsewhere are NTZ as Spark naturally
  * infers `isAdjustedToUTC=false` micros.
  */
class TablesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def loaded(name: String): Map[String, DataType] =
    Tables(spark, sf, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("events loads with ts as TimestampType for any physical generation") {
    assert(loaded("events") === Map(
      "event_id" -> LongType,
      "ts" -> TimestampType, // loader guarantee — NOT the raw footer type
      "user_id" -> LongType,
      "event_type" -> StringType,
      "value" -> DoubleType,
      "props" -> StringType))
  }

  test("dimension and fact tables load with the pinned schemas") {
    assert(loaded("region") === Map(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(loaded("nation") === Map(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assert(loaded("customer") === Map(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assert(loaded("supplier") === Map(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assert(loaded("part") === Map(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    assert(loaded("orders") === Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType))
    assert(loaded("lineitem") === Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
  }

  test("pipeline tables load with the pinned schemas") {
    assert(loaded("documents") === Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assert(loaded("embeddings") === Map(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }

  test("events loader restores the nanosAsLong conf on a MICROS generation") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    Tables(spark, sf, "events").schema
    assert(spark.conf.getOption(key) === prior)
  }

  test("a TIMESTAMP(NANOS) generation executes end-to-end after the loader returns") {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types => PTypes}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

    // synthesize the nanos footer Spark itself cannot write: an INT64 ts
    // annotated TIMESTAMP(NANOS, isAdjustedToUTC=false), microsecond-
    // aligned values like the real generation
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos-gen").toString
    val schema = PTypes.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts")
      .named("events")
    val microsBase = 1704067200000000L // 2024-01-01T00:00:00Z
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try (0L until 10L).foreach { i =>
      writer.write(gf.newGroup()
        .append("event_id", i)
        .append("ts", (microsBase + i * 1000000L) * 1000L))
    } finally writer.close()

    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    try {
      val events = Tables(spark, dir, "events")
      // the loader has RETURNED; this action is where a restored conf
      // would break the vectorized reader on the nanos footer (Spark
      // re-resolves the conf from the session at plan time) — the
      // sticky-conf contract keeps it executable
      assert(spark.conf.getOption(key).contains("true"),
        "nanos detection must leave nanosAsLong set for the session")
      assert(events.schema("ts").dataType === TimestampType)
      val got = events.selectExpr("event_id", "unix_micros(ts)")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(got.toSeq ===
        (0L until 10L).map(i => (i, microsBase + i * 1000000L)))
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
