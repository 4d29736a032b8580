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
