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
}
