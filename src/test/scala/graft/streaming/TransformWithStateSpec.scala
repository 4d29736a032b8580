package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._

/** The operator-state API for custom streaming operators beyond
  * flatMapGroupsWithState: Spark 4's transformWithState gives named,
  * individually-evolvable state variables (here a ValueState running
  * total) on the RocksDB store. Pinned with a MemoryStream drive:
  * per-key totals accumulate across micro-batches and publish in
  * Update mode.
  */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("transformWithState: ValueState running totals across micro-batches") {
    implicit val ctx = spark.sqlContext
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    try {
      val input = MemoryStream[(String, Int)]
      val result = input.toDS()
        .groupByKey(_._1)
        .transformWithState(
          new RunningTotalProcessor(), TimeMode.None(), OutputMode.Update())
      val q = result.writeStream
        .format("memory").queryName("tws_totals")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-tws").toString)
        .outputMode("update")
        .start()
      try {
        input.addData(("a", 1), ("a", 2), ("b", 10))
        q.processAllAvailable()
        input.addData(("a", 4), ("b", 5))
        q.processAllAvailable()
        val rows = spark.table("tws_totals")
          .as[(String, Long)].collect().toSeq
        // Update mode: latest total per key per batch; last emissions win
        assert(rows.contains(("a", 3L)) && rows.contains(("b", 10L))) // batch 1
        assert(rows.contains(("a", 7L)) && rows.contains(("b", 15L))) // batch 2
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}

/** Named-state processor: one Long ValueState per key. */
class RunningTotalProcessor
  extends StatefulProcessor[String, (String, Int), (String, Long)] {

  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long](
      "total", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Int)],
      timerValues: TimerValues): Iterator[(String, Long)] = {
    val sum = (if (total.exists()) total.get() else 0L) + rows.map(_._2).sum
    total.update(sum)
    Iterator.single((key, sum))
  }
}
