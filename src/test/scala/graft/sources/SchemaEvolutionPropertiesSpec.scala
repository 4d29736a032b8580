package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck law for the schema-evolution surface: for ANY interleaving
  * of metadata-only DDL (rename / drop / widen) with data-changing
  * upserts, the table read must equal an in-memory model that applies
  * the same operations to plain vectors — same column names in order,
  * same declared types, same rows. The model shares no code with the
  * engine (no column map, no parquet), so a carry bug anywhere in the
  * map plumbing — a commit forgetting to republish the sidecar, a
  * probe translating the wrong way, a write resurrecting a dropped
  * column — fails the law directly.
  */
class SchemaEvolutionPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val p = Files.createTempDirectory("graft-schema-evo-props")
    p.toFile.deleteOnExit()
    p.toString
  }

  // model: ordered column slots + rows keyed by the first slot (id)
  private case class Slot(logical: String, wide: Boolean, isInt: Boolean)

  private sealed trait Op
  private case class Rename(slot: Int, to: String) extends Op
  private case class Drop(slot: Int) extends Op
  private case class Widen(slot: Int) extends Op
  private case class Upsert(seed: Int) extends Op

  // reuse-marker: rename a slot to a name some EARLIER rename freed —
  // the swap-chain corner where logical and physical name spaces
  // overlap and every translation must stay atomic
  private case class RenameToFreed(slot: Int) extends Op

  // slots: 0=id (long, merge key, never dropped), 1..2 int, 3 string
  private val opGen: Gen[Int => Op] = Gen.frequency(
    3 -> Gen.chooseNum(0, 3).map(s => (i: Int) => Rename(s, s"c$i")),
    2 -> Gen.chooseNum(0, 3).map(s => (_: Int) => RenameToFreed(s)),
    2 -> Gen.chooseNum(1, 3).map(s => (_: Int) => Drop(s)),
    2 -> Gen.chooseNum(1, 2).map(s => (_: Int) => Widen(s)),
    3 -> Gen.chooseNum(0, 1000).map(x => (_: Int) => Upsert(x)))

  private val opsGen: Gen[List[Int => Op]] =
    Gen.chooseNum(4, 8).flatMap(n => Gen.listOfN(n, opGen))

  test("rename/drop/widen interleaved with upserts always equals the model") {
    var sampleId = 0
    val prop = Prop.forAll(opsGen) { mkOps =>
      sampleId += 1
      val dir = s"$root/t$sampleId"
      val fs = new java.io.File(dir)
      if (fs.exists()) { def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }; rm(fs) }

      // initial state: 4 columns, 20 rows
      var slots = Vector(
        Slot("id", wide = true, isInt = false),
        Slot("a", wide = false, isInt = true),
        Slot("b", wide = false, isInt = true),
        Slot("s", wide = false, isInt = false))
      var rows: Map[Long, Vector[Any]] = (0L until 20L).map(i =>
        i -> Vector[Any](i, i.toInt * 2, i.toInt * 3, s"v$i")).toMap
      def frame(rs: Map[Long, Vector[Any]]) = {
        val schema = StructType(slots.zipWithIndex.map { case (sl, i) =>
          StructField(sl.logical,
            if (i == 0) LongType
            else if (sl.isInt && !sl.wide) IntegerType
            else if (sl.isInt) LongType
            else StringType)
        })
        spark.createDataFrame(
          java.util.Arrays.asList(rs.values.toSeq.sortBy(_.head
            .asInstanceOf[Long]).map(v => Row.fromSeq(v)): _*), schema)
      }
      Snapshots.commit(spark, frame(rows), dir, statsColumns = Seq("id"))

      var nameCounter = 0
      var freed = List.empty[String]
      var ok = true
      mkOps.foreach { mk =>
        nameCounter += 1
        mk(nameCounter) match {
          case Rename(s, to) if s < slots.length =>
            freed = slots(s).logical :: freed
            Snapshots.renameColumn(spark, dir, slots(s).logical, to)
            slots = slots.updated(s, slots(s).copy(logical = to))
          case RenameToFreed(s)
              if s < slots.length &&
                freed.exists(f => !slots.exists(_.logical == f)) =>
            val to = freed.find(f => !slots.exists(_.logical == f)).get
            freed = slots(s).logical :: freed.filterNot(_ == to)
            Snapshots.renameColumn(spark, dir, slots(s).logical, to)
            slots = slots.updated(s, slots(s).copy(logical = to))
          case Drop(s) if s < slots.length && s > 0 && slots.length > 2 =>
            Snapshots.dropColumn(spark, dir, slots(s).logical)
            val keep = slots.indices.filterNot(_ == s)
            rows = rows.view.mapValues(v => keep.map(v).toVector).toMap
            slots = keep.map(slots).toVector
          case Widen(s) if s < slots.length && slots(s).isInt && !slots(s).wide =>
            Snapshots.widenColumn(spark, dir, slots(s).logical, "bigint")
            slots = slots.updated(s, slots(s).copy(wide = true))
            rows = rows.view.mapValues(v => v.zipWithIndex.map {
              case (x: Int, `s`) => x.toLong
              case (x, _) => x
            }).toMap
          case Upsert(seed) =>
            // update 3 existing ids + insert 2 fresh ones, values from
            // the seed so every sample differs
            val ids = Seq(seed % 20L, (seed + 7) % 20L, (seed + 13) % 20L,
              100L + seed, 101L + seed).distinct
            val ups = ids.map { id =>
              id -> slots.zipWithIndex.map { case (sl, i) =>
                if (i == 0) id: Any
                else if (sl.isInt && !sl.wide) (id + seed).toInt % 1000000
                else if (sl.isInt) (id + seed) % 1000000L
                else s"u$id-$seed"
              }.toVector
            }.toMap
            Snapshots.merge(spark, dir, frame(ups),
              Seq(slots.head.logical), statsColumns = Seq(slots.head.logical))
            rows = rows ++ ups
          case _ => () // generated op not applicable to current state
        }
        // the read must equal the model after EVERY step
        val got = Snapshots.read(spark, dir)
        val colsOk = got.columns.toSeq == slots.map(_.logical)
        val typesOk = slots.zipWithIndex.forall { case (sl, i) =>
          val dt = got.schema(sl.logical).dataType
          if (i == 0) dt == LongType
          else if (sl.isInt && !sl.wide) dt == IntegerType
          else if (sl.isInt) dt == LongType
          else dt == StringType
        }
        val gotRows = got.collect()
          .map(r => (0 until slots.length).map(r.get).toVector)
          .sortBy(_.head.asInstanceOf[Long]).toVector
        val wantRows = rows.values.toVector.sortBy(_.head.asInstanceOf[Long])
        if (!(colsOk && typesOk && gotRows == wantRows)) ok = false
      }
      ok :| s"divergence in sample $sampleId (ops=${mkOps.length})"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
