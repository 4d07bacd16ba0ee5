package graft

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sharding
import graft.server.{EntryFlat, ManagementProto, WriteProto}
import graft.streaming.{DatabaseRules, Lifecycle}

/** Property round-trips for the r9 wire codecs — no Spark session needed.
  *
  * [[EntryFlat]]: arbitrary batches encode through the conformant
  * flatbuffers runtime and must decode back exactly through the
  * hand-rolled vtable reader (the reader-accepts-any-conformant-producer
  * contract, fuzzed). [[ManagementProto]]: arbitrary DatabaseRules
  * protobuf round-trips (database_rules.proto). */
class EntryFlatPropertySpec extends AnyFunSuite {
  import WriteProto.{PbColumn, PbTableBatch, PbValues, Semantic}

  private def check(name: String, prop: Prop, min: Int = 150): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val name: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('_', '-', 'µ'))))

  /** A column of `rows` total rows: dense values + null mask. */
  private def column(rows: Int): Gen[PbColumn] = for {
    n <- name
    sem <- Gen.oneOf(Semantic.Tag, Semantic.Field, Semantic.Time)
    nulls <- Gen.listOfN(rows, Gen.prob(0.25))
    dense = rows - nulls.count(identity)
    // at least one non-null value so the column has a type
    mask = if (nulls.forall(!_)) Array.emptyByteArray
      else {
        val m = new Array[Byte]((rows + 7) / 8)
        nulls.zipWithIndex.foreach { case (isNull, r) =>
          if (isNull) m(r >> 3) = (m(r >> 3) | (1 << (r & 7))).toByte
        }
        m
      }
    values <- Gen.oneOf[Gen[PbValues]](
      Gen.listOfN(dense, Arbitrary.arbitrary[Long])
        .map(v => PbValues(i64 = v.toVector)),
      Gen.listOfN(dense, Arbitrary.arbitrary[Double].suchThat(d => !d.isNaN))
        .map(v => PbValues(f64 = v.toVector)),
      Gen.listOfN(dense, Arbitrary.arbitrary[Long])
        .map(v => PbValues(u64 = v.toVector)),
      Gen.listOfN(dense, name).map(v => PbValues(str = v.toVector)),
      Gen.listOfN(dense, Arbitrary.arbitrary[Boolean])
        .map(v => PbValues(bool = v.toVector)),
      Gen.listOfN(dense,
          Gen.chooseNum(0, 6).flatMap(k =>
            Gen.listOfN(k, Arbitrary.arbitrary[Byte]).map(_.toArray)))
        .map(v => PbValues(bytes = v.toVector))).flatMap(identity)
  } yield PbColumn(n, sem, Some(values), mask)

  private val batch: Gen[PbTableBatch] = for {
    n <- name
    rows <- Gen.chooseNum(1, 9)
    ncols <- Gen.chooseNum(1, 4)
    cols <- Gen.listOfN(ncols, column(rows))
  } yield PbTableBatch(n, cols.toVector, rows)

  private val write: Gen[EntryFlat.PartitionWrite] = for {
    key <- name
    nb <- Gen.chooseNum(1, 3)
    tables <- Gen.listOfN(nb, batch)
  } yield EntryFlat.PartitionWrite(key, tables.toVector)

  private def sameValues(a: PbValues, b: PbValues): Boolean =
    a.i64 == b.i64 && a.f64 == b.f64 && a.u64 == b.u64 &&
      a.str == b.str && a.bool == b.bool &&
      a.bytes.map(_.toSeq) == b.bytes.map(_.toSeq)

  test("Entry encode/decode round-trips arbitrary partition writes") {
    check("entry-roundtrip", Prop.forAll(
        Gen.chooseNum(1, 3).flatMap(Gen.listOfN(_, write))) { writes =>
      val decoded = EntryFlat.decode(EntryFlat.encode(writes))
      assert(decoded.isRight, decoded)
      val e = decoded.toOption.get
      assert(e.deletes.isEmpty)
      assert(e.partitionWrites.size == writes.size)
      e.partitionWrites.zip(writes).foreach { case (got, want) =>
        assert(got.key == want.key)
        assert(got.tables.size == want.tables.size)
        got.tables.zip(want.tables).foreach { case (gt, wt) =>
          assert(gt.name == wt.name && gt.rowCount == wt.rowCount)
          assert(gt.columns.size == wt.columns.size)
          gt.columns.zip(wt.columns).foreach { case (gc, wc) =>
            assert(gc.name == wc.name)
            assert(gc.semanticType == wc.semanticType)
            assert(sameValues(gc.values.get, wc.values.get))
            // masks compare by semantics (trailing zero bytes are free)
            assert((0 until wt.rowCount).forall(r =>
              gc.isNull(r) == wc.isNull(r)))
          }
        }
      }
      true
    })
  }

  test("Entry decode never throws on arbitrary garbage") {
    check("garbage", Prop.forAll(Gen.chooseNum(0, 64).flatMap(n =>
        Gen.listOfN(n, Arbitrary.arbitrary[Byte]).map(_.toArray))) { junk =>
      EntryFlat.decode(junk) // Either, never an exception
      true
    })
  }

  private val rules: Gen[DatabaseRules] = for {
    n <- name
    parts <- Gen.chooseNum(0, 3).flatMap(k => Gen.listOfN(k,
      Gen.oneOf[graft.core.TemplatePart](
        Gen.const(graft.core.TemplatePart.Table),
        name.map(graft.core.TemplatePart.ColumnValue),
        Gen.oneOf("%Y-%m-%d", "%Y-%m", "%H")
          .map(graft.core.TemplatePart.TimeFormat))).map(_.flatMap(Some(_))))
    soft <- Gen.option(Gen.chooseNum(1L, 1L << 40))
    hard <- Gen.option(Gen.chooseNum(1L, 1L << 40))
    persist <- Arbitrary.arbitrary[Boolean]
    drop <- Arbitrary.arbitrary[Boolean]
    lateS <- Gen.chooseNum(1L, 86400L)
    rowsT <- Gen.chooseNum(1L, 1L << 30)
    ageS <- Gen.chooseNum(1L, 86400L)
    wb <- Gen.option(name.map("file:/tmp/" + _))
    shard <- Gen.option(for {
      nt <- Gen.chooseNum(0, 2)
      targets <- Gen.listOfN(nt,
        name.map(r => (Sharding.Matcher(r), 3)))
      ring <- Gen.option(for {
        it <- Arbitrary.arbitrary[Boolean]
        cols <- Gen.chooseNum(0, 2).flatMap(Gen.listOfN(_, name))
        shards <- Gen.chooseNum(1, 4).flatMap(k =>
          Gen.listOfN(k, Gen.chooseNum(0, 99)))
      } yield Sharding.HashRing(it, cols, shards.toIndexedSeq))
    } yield Sharding.ShardConfig(targets, ring))
  } yield DatabaseRules(n,
    if (parts.isEmpty) DatabaseRules.DefaultTemplate
    else graft.core.PartitionTemplate(parts),
    Lifecycle.Rules(lateArriveWindowMs = lateS * 1000,
      persistRowThreshold = rowsT, persistAgeThresholdMs = ageS * 1000,
      bufferSizeSoft = soft, bufferSizeHard = hard,
      persist = persist, dropNonPersisted = drop),
    wb, shard)

  test("DatabaseRules protobuf round-trips arbitrary rules") {
    check("rules-roundtrip", Prop.forAll(rules) { r =>
      val got = ManagementProto.decodeDatabaseRules(
        ManagementProto.encodeDatabaseRules(r))
      // retentionNs has no proto field (this database_rules.proto
      // version carries none); everything else round-trips exactly
      got == Right(r.copy(
        lifecycle = r.lifecycle.copy(retentionNs = None)))
    })
  }
}
