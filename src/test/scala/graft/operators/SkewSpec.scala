package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on real tables") {
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"),
        r.getAs[String]("o_orderpriority"))

    val salted = Skew.saltedJoin(
        li, ord, Seq("l_orderkey" -> "o_orderkey"), buckets = 8,
        saltBy = xxhash64(col("l_linenumber")))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .collect().map(key)
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .collect().map(key)

    // multiset equality: salting must not add or drop any matched row
    assert(salted.length == plain.length)
    assert(salted.sorted.sameElements(plain.sorted))
  }

  test("salted join spreads a hot key over all buckets") {
    // one pathologically hot key: 1000 left rows, all key=1
    val hot = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "payload")
    val dim = Seq((1L, "x")).toDF("k2", "name")
    val out = Skew.saltedJoin(hot, dim, Seq("k" -> "k2"), buckets = 8,
      saltBy = xxhash64(col("payload")))
    assert(out.count() == 1000)
    // the physical join key includes the salt column
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("_salt"), p)
    // and the hot key's rows genuinely hash to multiple salt buckets
    val spread = hot
      .withColumn("_salt", pmod(xxhash64(col("payload")), lit(8)).cast("int"))
      .select(countDistinct(col("_salt"))).head().getLong(0)
    assert(spread == 8L)
  }
}
