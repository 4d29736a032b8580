package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck laws for the manifest-pruned range DELETE: for ANY
  * clustered layout and ANY (lo, hi) range, [[Snapshots.deleteRange]]
  * must (a) keep exactly the rows a plain SQL `DELETE WHERE lo <= id
  * AND id <= hi` keeps — NULL ids always surviving — and (b) account
  * for every base file as dropped, carried, or rewritten: carried
  * paths persist verbatim in the new version, dropped/rewritten paths
  * never do. The row law is checked against a driver-side filter of
  * the same data (no Spark expressions shared with the implementation),
  * so a drift in the envelope trichotomy fails the law, not just a
  * cross-engine hash.
  */
class RetentionPropertiesSpec extends SparkSpec {
  import spark.implicits._

  // ONE scratch root per suite, overwritten per sample (ADVICE r8:
  // per-sample createTempDirectory leaks tmp dirs across runs)
  private lazy val root = {
    val p = Files.createTempDirectory("graft-retention-props")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  private val layoutGen: Gen[(List[Option[Long]], Int, Long, Long)] =
    for {
      n <- Gen.chooseNum(20, 200)
      ids <- Gen.listOfN(n, Gen.frequency(
        9 -> Gen.chooseNum(0L, 999L).map(Some(_)),
        1 -> Gen.const(Option.empty[Long])))
      files <- Gen.chooseNum(1, 6)
      a <- Gen.chooseNum(-50L, 1050L)
      b <- Gen.chooseNum(-50L, 1050L)
    } yield (ids, files, math.min(a, b), math.max(a, b))

  test("deleteRange equals row-level DELETE semantics and accounts for every file") {
    check(Prop.forAll(layoutGen) { case (ids, files, lo, hi) =>
      val dir = s"$root/t"
      val hp = new org.apache.hadoop.fs.Path(dir)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.delete(hp, true)

      val data = ids.zipWithIndex
        .map { case (id, i) => (id, i.toLong) }.toDF("id", "payload")
      Snapshots.commit(spark,
        data.repartitionByRange(files, col("id")), dir,
        statsColumns = Seq("id"))
      val v1Files = Snapshots.read(spark, dir).inputFiles.toSet
      Snapshots.deleteRange(spark, dir, "id", lo, hi,
        statsColumns = Seq("id"))

      val got = Snapshots.read(spark, dir).collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          r.getLong(1))).toSet
      val want = ids.zipWithIndex.collect {
        case (id, i) if id.forall(v => v < lo || v > hi) => (id, i.toLong)
      }.toSet
      val rowLaw = got == want

      // file accounting: survivors of v1 in v2 must be exactly the
      // files whose envelope the range cannot touch (reading them
      // back, every surviving original holds only surviving rows)
      val v2Files = Snapshots.read(spark, dir).inputFiles.toSet
      val carried = v1Files.intersect(v2Files)
      val carriedClean = carried.isEmpty || {
        val rows = spark.read.parquet(carried.toSeq: _*)
          .select("id").collect()
        rows.forall(r => r.isNullAt(0) ||
          r.getLong(0) < lo || r.getLong(0) > hi)
      }
      (rowLaw :| s"rows: got ${got.size} want ${want.size} " +
        s"(lo=$lo hi=$hi files=$files)") &&
        (carriedClean :| "a carried file holds a deleted row")
    })
  }
}
