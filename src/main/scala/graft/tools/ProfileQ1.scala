package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Throwaway q1_agg cost breakdown (round-3 perf work). */
object ProfileQ1 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): Unit = {
      // twice: first includes codegen/scan warmup, second is steady-state
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"$name%-24s run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))
    val one = lit(1).cast(DecimalType(18, 4))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    time("exact q1_agg entry") {
      graft.operators.RelationalQueries.queries("q1_agg")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("scan only") {
      li.select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount")
        .write.format("noop").mode("overwrite").save()
    }
    time("double sums") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("decimal sums (current)") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double"),
          sum(dec(col("l_extendedprice"))).cast("double"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))).cast("double"),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("long-scaled sums") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(round(col("l_quantity") * 10000).cast("long")) / 10000.0),
          (sum(round(col("l_extendedprice") * 10000).cast("long")) / 10000.0),
          (sum(round(col("l_extendedprice") * 10000).cast("long") *
            (lit(10000L) - round(col("l_discount") * 10000).cast("long"))) / 1e8),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
