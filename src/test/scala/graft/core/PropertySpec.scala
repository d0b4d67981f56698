package graft.core

import graft.streaming.PackedRow
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the pure core: wire codecs round-trip,
  * rank is monotone, filters are consistent, hashes stay in range.
  * Generators run under fixed seeds so failures reproduce. */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], cases: Int = 200)(f: A => Unit): Unit =
    (0 until cases).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  private val cell: Gen[Option[String]] =
    Gen.option(Gen.listOf(Gen.alphaNumChar).map(_.mkString))

  test("PackedRow.of/slice round-trips any row of optional strings") {
    forAll(Gen.listOf(cell)) { cells =>
      val sliced = PackedRow.of(cells).slice
      assert(sliced.size == cells.size)
      sliced.zip(cells).foreach {
        case (Some(bytes), Some(s)) => assert(new String(bytes, "UTF-8") == s)
        case (None, None)           =>
        case other                  => fail(s"mismatch: $other")
      }
    }
  }

  private val ident: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  test("Vgtid JSON round-trips arbitrary shard/keyspace/gtid strings") {
    val shardGtid = for {
      ks <- ident; sh <- ident; host <- ident; seq <- Gen.choose(1L, Long.MaxValue / 2)
    } yield ShardGtid(ks, sh, s"MySQL56/$host:1-$seq")
    forAll(Gen.nonEmptyListOf(shardGtid)) { sgs =>
      val v = Vgtid(sgs.toVector)
      assert(Vgtid.of(v.json) == v)
    }
  }

  test("Vgtid JSON round-trips copy-phase lastpk payloads") {
    val pkRow = for {
      v <- Gen.nonEmptyListOf(Gen.numChar).map(_.mkString)
    } yield PkRow(Seq(v.length.toString),
      java.util.Base64.getEncoder.encodeToString(v.getBytes("UTF-8")))
    val tablePk = for {
      t <- ident; f <- ident; charset <- Gen.choose(0, 255)
      flags <- Gen.option(Gen.choose(0, 1 << 16)); row <- pkRow
    } yield TableLastPk(t, Seq(PkField(f, "INT64", charset, flags)), Seq(row))
    val shardGtid = for {
      sh <- ident; pks <- Gen.listOf(tablePk)
    } yield ShardGtid("ks", sh, "MySQL56/h:1-5", pks.toVector)
    forAll(Gen.nonEmptyListOf(shardGtid)) { sgs =>
      val v = Vgtid(sgs.toVector)
      assert(Vgtid.of(v.json) == v)
      assert(v.willTriggerVStreamCopy == sgs.exists(_.tablePKs.nonEmpty))
    }
  }

  test("copy-progress order: rank dominates, then lastpk, finished copy sorts last") {
    forAll(Gen.choose(1L, 100000L), Gen.choose(1L, 100000L)) { (a, b) =>
      def pos(seq: Long, pk: Option[Long]): ShardGtid =
        ShardGtid("ks", "0", s"MySQL56/h:1-$seq",
          pk.toSeq.map(v => TableLastPk("t",
            Seq(PkField("id", "INT64", 63, None)),
            Seq(PkRow(Seq(v.toString.length.toString),
              java.util.Base64.getEncoder.encodeToString(v.toString.getBytes))))))
      // rank dominates regardless of copy progress
      if (a != b) {
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        assert(CopyProgress.compare(pos(lo, Some(999999L)), pos(hi, None)) < 0)
      }
      // at equal rank, larger numeric lastpk is later; finished copy is latest
      if (a != b) {
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        assert(CopyProgress.compare(pos(1, Some(lo)), pos(1, Some(hi))) < 0)
      }
      assert(CopyProgress.compare(pos(1, None), pos(1, Some(a))) > 0)
      assert(CopyProgress.compare(pos(1, Some(a)), pos(1, Some(a))) == 0)
    }
  }

  test("rank is strictly monotone in the GTID sequence") {
    forAll(ident, Gen.choose(1L, 1000000L)) { (host, n) =>
      assert(Rank.of(s"MySQL56/$host:1-${n + 1}") > Rank.of(s"MySQL56/$host:1-$n"))
    }
  }

  test("rank of a multi-host gtid is the sum of per-host maxima") {
    forAll(Gen.choose(1L, 100000L), Gen.choose(1L, 100000L)) { (a, b) =>
      assert(Rank.of(s"MySQL56/h1:1-$a,h2:1-$b") == BigDecimal(a) + BigDecimal(b))
    }
  }

  test("epoch never decreases across a GTID transition") {
    forAll(ident, ident, Gen.choose(0L, 100L)) { (h1, h2, e) =>
      val next = EpochProvider.epochForGtid(e, s"MySQL56/$h1:1-5", s"MySQL56/$h2:1-9")
      assert(next >= e && next <= e + 1)
    }
  }

  test("system schemas are excluded no matter the filter config") {
    forAll(Gen.oneOf(TableFilter.SystemSchemas.toSeq), ident) { (sys, table) =>
      assert(!TableFilter.acceptAll.included(sys, table))
      assert(!TableFilter(Seq(".*"), Nil).included(sys, table))
    }
  }

  test("rolling hash stays within [0, 2^61-1)") {
    forAll(Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)) { s =>
      val h = graft.operators.TextOps.rollingHash(s)
      assert(h >= 0L && h < (1L << 61) - 1)
    }
  }

  test("enum/set definition parser round-trips escaped quotes") {
    val value: Gen[String] = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('\''))).map(_.mkString)
    forAll(Gen.nonEmptyListOf(value)) { values =>
      val defn = values.map(v => "'" + v.replace("'", "''") + "'").mkString("enum(", ",", ")")
      assert(GraftType.parseEnumOrSetValues(defn) == values)
    }
  }

  // ---- ShardLineage (A4) over arbitrary keyrange topologies ----------
  // Vitess shard names are hex keyrange bounds with open extremes
  // (reference ShardLineage.java:26-44,65-84: lexicographic bounds with
  // ±∞ sentinels). Fixed-width hex makes lexicographic == numeric, so an
  // independent INTEGER-interval oracle can check the string-interval
  // implementation over random reshard chains — not just the fixed
  // topology the cdc_reshard_epoch gate streams.

  private val KeyspaceEnd = 0x10000
  private def shardName(lo: Int, hi: Int, upperCase: Boolean): String = {
    def hex(n: Int) = { val h = f"$n%04x"; if (upperCase) h.toUpperCase else h }
    (if (lo == 0) "" else hex(lo)) + "-" + (if (hi == KeyspaceEnd) "" else hex(hi))
  }

  /** Random partition of the keyspace [0, 0x10000) into 1-5 keyranges. */
  private val genPartition: Gen[Vector[(Int, Int)]] = for {
    k <- Gen.choose(0, 4)
    cuts <- Gen.listOfN(k, Gen.choose(1, KeyspaceEnd - 1))
  } yield {
    val bounds = (0 +: cuts.distinct.sorted :+ KeyspaceEnd).toVector
    bounds.zip(bounds.tail)
  }

  test("epoch inheritance over random reshard chains = max overlapping parent + 1") {
    val genChain = for {
      g0 <- genPartition
      e0 <- Gen.listOfN(g0.size, Gen.choose(0L, 5L))
      reshards <- Gen.listOfN(3, genPartition)
      upperCase <- Gen.oneOf(true, false) // reference lowercases shard names
    } yield (g0.zip(e0), reshards, upperCase)
    forAll(genChain, cases = 300) { case (gen0, reshards, upperCase) =>
      var current: Vector[((Int, Int), Long)] = gen0
      // each reshard is an arbitrary repartition (splits AND merges in
      // one step); children must inherit max(overlapping parents) + 1
      reshards.foreach { next =>
        val parentMap = current.foldLeft(ShardEpochMap.empty) {
          case (m, ((lo, hi), e)) => m.put(shardName(lo, hi, upperCase), e)
        }
        current = next.map { case (lo, hi) =>
          val expected = current.collect {
            case ((plo, phi), e) if plo < hi && phi > lo => e
          }.max + 1 // partitions cover the keyspace: >=1 parent overlaps
          val got = ShardLineage.inheritedEpoch(shardName(lo, hi, upperCase), parentMap)
          assert(got == expected,
            s"child [$lo,$hi) expected $expected got $got from $parentMap")
          ((lo, hi), got)
        }
      }
    }
  }

  test("properlyContains matches the integer-interval oracle; non-keyranges never") {
    val genRange = for {
      lo <- Gen.choose(0, KeyspaceEnd - 1)
      hi <- Gen.choose(lo + 1, KeyspaceEnd)
    } yield (lo, hi)
    forAll(genRange, genRange, Gen.oneOf(true, false)) { case ((alo, ahi), (blo, bhi), uc) =>
      val expected = alo <= blo && bhi <= ahi && (alo, ahi) != (blo, bhi)
      val got = ShardLineage.properlyContains(
        shardName(alo, ahi, uc), shardName(blo, bhi, uc))
      assert(got == expected,
        s"[$alo,$ahi) contains [$blo,$bhi): expected $expected got $got")
      // never reflexive
      assert(!ShardLineage.properlyContains(shardName(alo, ahi, uc), shardName(alo, ahi, uc)))
    }
    // names without a keyrange shape cannot stand in a reshard lineage
    assert(!ShardLineage.properlyContains("s0", "s1"))
    assert(!ShardLineage.properlyContains("-", "s1"))
    assert(!ShardLineage.properlyContains("0", "1"))
    // the full range properly contains every strict sub-range
    assert(ShardLineage.properlyContains("-", "-80"))
    assert(ShardLineage.properlyContains("-", "80-"))
    assert(!ShardLineage.properlyContains("-80", "-"))
  }

  test("adjacent keyranges do not inherit; disjoint entries never affect the result") {
    val gen = for {
      lo <- Gen.choose(0, KeyspaceEnd - 3)
      mid <- Gen.choose(lo + 1, KeyspaceEnd - 2)
      hi <- Gen.choose(mid + 1, KeyspaceEnd - 1)
      e <- Gen.choose(0L, 9L)
    } yield (lo, mid, hi, e)
    forAll(gen) { case (lo, mid, hi, e) =>
      val left = shardName(lo, mid, upperCase = false)
      val right = shardName(mid, hi, upperCase = false)
      // [lo,mid) and [mid,hi) share only the boundary point — no overlap,
      // so neither is the other's parent (epoch seeds at -1 + 1 = 0)
      assert(ShardLineage.inheritedEpoch(left, ShardEpochMap.empty.put(right, e)) == 0L)
      assert(ShardLineage.inheritedEpoch(right, ShardEpochMap.empty.put(left, e)) == 0L)
      // a split child inherits from its parent alone: a hotter epoch on a
      // disjoint sibling range must not leak in
      val withNoise = ShardEpochMap.empty
        .put(shardName(lo, hi, upperCase = false), e)
        .put(shardName(hi, KeyspaceEnd, upperCase = false), e + 7)
      assert(ShardLineage.inheritedEpoch(left, withNoise) == e + 1)
    }
  }
}
