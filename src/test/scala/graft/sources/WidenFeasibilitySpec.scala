package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata-only type widening: the Spark-4 parquet upcast contract it
  * stands on, and the [[Snapshots.widenColumn]] behavior built on top —
  * no rewrite at widen time, mixed narrow/wide files read correctly
  * through every path, unsafe promotions and hash-dependent columns
  * refused.
  */
class WidenFeasibilitySpec extends SparkSpec {
  import spark.implicits._

  test("parquet read upcasts int32->long and float->double under a requested schema") {
    val dir = Files.createTempDirectory("graft-widen").toString
    Seq((1, 1.5f, 7), (2, 2.5f, 8)).toDF("i", "f", "d")
      .write.parquet(s"$dir/narrow")
    val wide = StructType(Seq(
      StructField("i", LongType), StructField("f", DoubleType),
      StructField("d", DoubleType)))
    val got = spark.read.schema(wide).parquet(s"$dir/narrow")
      .orderBy("i").collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq ==
      Seq((1L, 1.5d, 7.0d), (2L, 2.5d, 8.0d)))

    // mixed narrow + wide files under one requested wide schema
    Seq((3L, 3.5d, 9.5d)).toDF("i", "f", "d").write.parquet(s"$dir/widef")
    val mixed = spark.read.schema(wide)
      .parquet(s"$dir/narrow", s"$dir/widef").orderBy("i").collect()
    assert(mixed.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("widenColumn is metadata-only and mixed-generation reads stay exact") {
    val dir = Files.createTempDirectory("graft-widen-col").toString
    val data = spark.range(0, 400).toDF("id")
      .withColumn("v", (col("id") * 3).cast("int"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    Snapshots.commit(spark, data, dir, statsColumns = Seq("id", "v"))
    val v2 = Snapshots.widenColumn(spark, dir, "v", "bigint")
    assert(v2 == 2L)
    // no data rewritten; the declared type is wide immediately
    assert(spark.read.parquet(s"$dir/snap-2").count() == 0L)
    val widened = Snapshots.read(spark, dir)
    assert(widened.schema("v").dataType == LongType)
    assert(widened.agg(sum("v")).head().getLong(0) ==
      (0L until 400L).map(_ * 3).sum)
    // time travel shows the narrow type at v1
    assert(Snapshots.readVersion(spark, dir, 1L).schema("v").dataType ==
      IntegerType)

    // a post-widening scoped merge writes values ABOVE Int.MaxValue —
    // the reason the widening exists — into files that sit next to the
    // narrow originals
    val big = 3000000000L
    Snapshots.merge(spark, dir,
      spark.range(100, 150).toDF("id").withColumn("v", lit(big)),
      Seq("id"), statsColumns = Seq("id", "v"), scoped = true)
    val after = Snapshots.read(spark, dir)
    assert(after.filter($"v" === big).count() == 50L)
    assert(after.count() == 400L)
    // pruned reads cross the narrow/wide manifest generations: a range
    // probe on the WIDENED stats column finds the wide rows...
    val hits = Snapshots.readRange(spark, dir, "v", big, big + 1)
    assert(hits.count() == 50L)
    // ...and one on the untouched int generation still prunes files
    val (sel, tot) = Snapshots.selectFiles(spark, dir,
      Snapshots.version(spark, dir), "id", 300L, 350L)
    assert(sel.size < tot, s"widening must not defeat pruning: $sel/$tot")
    // MoR delete over the mixed layout (exercises the pinned raw scan)
    Snapshots.deleteMergeOnRead(spark, dir, $"v" === big, Seq("id"),
      statsColumns = Seq("id", "v"))
    assert(Snapshots.read(spark, dir).count() == 350L)
  }

  test("widenColumn refuses unsafe promotions and hash-dependent columns") {
    val dir = Files.createTempDirectory("graft-widen-refuse").toString
    Snapshots.commit(spark,
      spark.range(0, 50).toDF("id")
        .withColumn("v", (col("id") % 7).cast("int"))
        .withColumn("s", col("id").cast("string")),
      dir, statsColumns = Seq("id"), bloomColumns = Seq("v"))
    // narrowing / lateral moves refused
    intercept[IllegalArgumentException](
      Snapshots.widenColumn(spark, dir, "id", "int"))
    intercept[IllegalArgumentException](
      Snapshots.widenColumn(spark, dir, "s", "bigint"))
    intercept[IllegalArgumentException](
      Snapshots.widenColumn(spark, dir, "nope", "bigint"))
    // a bloom-sketched column: wide probes would miss narrow hashes
    intercept[IllegalArgumentException](
      Snapshots.widenColumn(spark, dir, "v", "bigint"))
    // a bucket-transformed column is refused the same way
    val pdir = Files.createTempDirectory("graft-widen-bucket").toString
    Snapshots.commit(spark,
      spark.range(0, 50).toDF("id")
        .withColumn("u", (col("id") % 5).cast("int")),
      pdir, statsColumns = Seq("id"),
      partitionSpec = Seq(Snapshots.Transform.Bucket("u", 4)))
    intercept[IllegalArgumentException](
      Snapshots.widenColumn(spark, pdir, "u", "bigint"))
  }

  test("widening composes with rename: probes through the logical name") {
    val dir = Files.createTempDirectory("graft-widen-rename").toString
    Snapshots.commit(spark,
      spark.range(0, 100).toDF("id")
        .withColumn("v", (col("id") * 2).cast("int"))
        .repartitionByRange(2, col("id")).sortWithinPartitions("id"),
      dir, statsColumns = Seq("id", "v"))
    Snapshots.renameColumn(spark, dir, "v", "score")
    Snapshots.widenColumn(spark, dir, "score", "bigint")
    val out = Snapshots.read(spark, dir)
    assert(out.schema("score").dataType == LongType)
    assert(out.agg(sum("score")).head().getLong(0) ==
      (0L until 100L).map(_ * 2).sum)
    val got = Snapshots.readRange(spark, dir, "score", 100L, 120L)
    assert(got.count() == 11L)
  }
}
