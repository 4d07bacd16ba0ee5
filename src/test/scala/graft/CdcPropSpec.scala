package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Hash60
import graft.pipeline.Packing

/** Property pin for [[Packing.cdcChunks]] against an independent model:
  * random small-vocabulary corpora (dense hash collisions exercise the
  * boundary logic), the model re-deriving boundaries directly from
  * hash60 — guards the window/groupBy formulation beyond the fixed
  * oracle corpus. */
class CdcPropSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff", "gg", "hhh")
  private val corpusGen: Gen[List[List[String]]] = for {
    nDocs <- Gen.choose(1, 5)
    docs <- Gen.listOfN(nDocs, for {
      n <- Gen.choose(0, 25)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws)
  } yield docs

  /** Straight model: chunk id of token i = number of boundary tokens
    * strictly before i; a token is a boundary when hash60 ≡ 0 (mod m). */
  private def model(docs: Seq[(Long, Seq[String])],
      mask: Int): Seq[(Long, Int, String, Long)] =
    docs.flatMap { case (id, ws) =>
      // cdcChunks tokenizes the TEXT, so an empty doc is one "" token
      val toks = if (ws.isEmpty) Seq("") else ws
      val bnd = toks.map(t =>
        Hash60.hash60(UTF8String.fromString(t)) % mask == 0)
      val cid = bnd.scanLeft(0)((acc, b) => acc + (if (b) 1 else 0)).init
      toks.zip(cid).groupBy(_._2).toSeq.sortBy(_._1).map { case (c, xs) =>
        (id, c, xs.map(_._1).mkString(" "), xs.size.toLong)
      }
    }

  test("cdcChunks matches the direct boundary model on random corpora") {
    val prop = Prop.forAll(corpusGen, Gen.oneOf(2, 4, 8)) { (docs, mask) =>
      val withIds = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws) }
      val df = withIds.map { case (i, ws) => (i, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Packing.cdcChunks(df, "doc_id", "text", mask)
        .orderBy("doc_id", "chunk_id")
        .as[(Long, Int, String, Long)].collect().toSeq
      val want = model(withIds.map { case (i, ws) => (i, ws.toSeq) }, mask)
      if (got != want)
        println(s"mask=$mask docs=$docs\n got=$got\nwant=$want")
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
