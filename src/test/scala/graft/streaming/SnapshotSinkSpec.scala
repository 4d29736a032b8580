package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The exactly-once contract of [[SnapshotSink]]: every micro-batch
  * becomes a snapshot, a replayed batch id is a no-op, and a restarted
  * stream resumes committing without disturbing history.
  */
class SnapshotSinkSpec extends SparkSpec {
  import spark.implicits._

  test("streaming CDC upserts maintain a table via merge-on-read; replays are logically idempotent") {
    implicit val ctx = spark.sqlContext
    val tableDir = Files.createTempDirectory("graft-cdc-mor").toString
    val checkpoint = Files.createTempDirectory("graft-cdc-mor-ckpt").toString
    import org.apache.spark.sql.functions.col

    // bootstrap: keys 0-99
    Snapshots.commit(spark,
      spark.range(0, 100).toDF("id").withColumn("v", col("id") * 2),
      tableDir, statsColumns = Seq("id"))

    // the streaming maintenance job: every CDC micro-batch lands as a
    // merge-on-read upsert — O(batch) commits against an arbitrarily
    // large base, the lakehouse streaming-ingestion shape
    val input = MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("id", "v")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Snapshots.mergeOnRead(spark, tableDir, batch, Seq("id"),
          statsColumns = Seq("id")): Unit
      }
      .start()
    try {
      input.addData((50L, -1L), (100L, -1L)) // update 50, insert 100
      q.processAllAvailable()
      input.addData((50L, -2L), (101L, -2L)) // re-update 50 across generations
      q.processAllAvailable()
    } finally q.stop()

    def state() = Snapshots.read(spark, tableDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = state()
    assert(s.size == 102)
    assert(s(50L) == -2L && s(100L) == -1L && s(101L) == -2L)
    assert(s(49L) == 98L)

    // foreachBatch is at-least-once: a REPLAYED CDC batch re-applies,
    // but upserting identical rows leaves the logical table unchanged —
    // physical accumulation, logical idempotence
    Snapshots.mergeOnRead(spark, tableDir,
      Seq((50L, -2L), (101L, -2L)).toDF("id", "v"), Seq("id"),
      statsColumns = Seq("id"))
    assert(state() == s)
  }

  test("each micro-batch commits once; replayed batch ids are skipped") {
    implicit val ctx = spark.sqlContext
    val tableDir = Files.createTempDirectory("graft-snapsink").toString
    val checkpoint = Files.createTempDirectory("graft-snapsink-ckpt").toString

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(SnapshotSink.into(tableDir))
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    val v = Snapshots.version(spark, tableDir)
    assert(v >= 2L, s"expected one snapshot per micro-batch, got $v")
    // the latest snapshot holds exactly the last batch's rows
    assert(Snapshots.read(spark, tableDir).collect().map(_.getLong(0)).toSet
      == Set(3L))
    // history preserved: version 1 still reads batch 0's rows
    assert(Snapshots.readVersion(spark, tableDir, 1L)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))

    // a REPLAY of an already-committed batch id must be a no-op
    val replay = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(!SnapshotSink.commitBatch(spark, replay, tableDir, batchId = 0L))
    assert(Snapshots.version(spark, tableDir) == v)

    // a restarted stream (same checkpoint) continues from the next id
    val q2 = input.toDF().toDF("id", "v")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(SnapshotSink.into(tableDir))
      .start()
    try {
      input.addData((4L, "d"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(Snapshots.version(spark, tableDir) == v + 1)
    assert(Snapshots.read(spark, tableDir).collect().map(_.getLong(0)).toSet
      == Set(4L))
  }
}
