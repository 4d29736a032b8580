package graft.operators

import java.nio.file.Files
import java.security.MessageDigest

import graft.{SparkEntry, SparkSpec}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck law for the content-defined chunker: for ANY random corpus
  * the chunk rows must (a) tile each document exactly — contiguous
  * 1-based ranges from word 1 through the last word with no gaps or
  * overlaps — (b) break exactly where an independent reimplementation of
  * the boundary rule says (every non-final chunk ends at a 4-gram whose
  * md5-prefix draw lands in 1/8 of the hash space, and NO interior
  * position of any chunk is such a boundary), and (c) carry the md5 of
  * exactly the words the range denotes. The re-check recomputes the rule
  * from scratch in plain Scala (MessageDigest, no Spark expressions), so
  * a silent drift in either the kernel or the column algebra fails the
  * law rather than the cross-engine hash alone.
  */
class CdcPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val W = 4
  private val Div = 8

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** The boundary rule, reimplemented: 1-based end positions. */
  private def boundaries(words: Array[String]): Seq[Int] =
    (W to words.length).filter { e =>
      val gram = words.slice(e - W, e).mkString(" ")
      java.lang.Long.parseLong(md5hex(gram).take(15), 16) % Div == 0
    }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  // small vocabulary → realistic boundary density; 1..60 words per doc
  private val corpusGen: Gen[List[String]] =
    for {
      nDocs <- Gen.chooseNum(1, 6)
      docs <- Gen.listOfN(nDocs, for {
        n <- Gen.chooseNum(1, 60)
        ws <- Gen.listOfN(n, Gen.oneOf(
          "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"))
      } yield ws.mkString(" "))
    } yield docs

  // ONE scratch dir for the whole suite, overwritten per sample and
  // reaped on JVM exit — per-sample createTempDirectory left a dir
  // behind for every ScalaCheck run (ADVICE r8)
  private val scratch = {
    val d = Files.createTempDirectory("graft-cdc-prop")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("cdc chunks tile every document and break exactly at the rule's boundaries") {
    check(Prop.forAll(corpusGen) { docs =>
      val dir = scratch
      docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val rows = SparkEntry.queries("corpus_cdc_chunk")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getString(4)))

      docs.zipWithIndex.forall { case (text, id) =>
        val words = text.trim.toLowerCase.split("\\s+")
        val n = words.length
        val bs = boundaries(words)
        val expectedEnds =
          if (bs.isEmpty || bs.last != n) bs :+ n else bs
        val got = rows.filter(_._1 == id.toLong).sortBy(_._2)
        // guard before head/last: an engine bug dropping every row for a
        // doc must report as a property failure, not NoSuchElement
        got.nonEmpty && {
          val tile = got.head._3 == 1 && got.last._4 == n &&
            got.sliding(2).forall {
              case Array(a, b) => b._3 == a._4 + 1
              case _ => true
            }
          val ends = got.map(_._4).toSeq == expectedEnds
          val hashes = got.forall { case (_, _, s, e, h) =>
            h == md5hex(words.slice(s - 1, e).mkString(" "))
          }
          tile && ends && hashes
        }
      }
    })
  }
}
