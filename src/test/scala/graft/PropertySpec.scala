package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.catalyst.expressions.Literal

import graft.functions.RollingHash
import graft.operators.{MediaRecord, StubDecoder}

/** Property-based checks on the pure kernels (no Spark session needed —
  * the distributed paths are covered by the suite specs + DuckDB oracle).
  */
object PropertySpec extends Properties("graft.kernels") {

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  private def hashOf(s: String): Long =
    RollingHash(Literal(UTF8String.fromString(s)))
      .eval(null).asInstanceOf[Long]

  property("rolling hash equals the reference fold") =
    Prop.forAll(asciiText) { s =>
      val expected = {
        val bs = s.getBytes("UTF-8")
        var acc = if (bs.nonEmpty) (bs(0) & 0xff).toLong else 0L
        bs.drop(1).foreach(b => acc = (acc * 31 + (b & 0xff)) % RollingHash.Mod)
        acc
      }
      hashOf(s) == expected
    }

  property("rolling hash stays in [0, 2^31)") =
    Prop.forAll(asciiText) { s =>
      val v = hashOf(s)
      v >= 0 && v < RollingHash.Mod
    }

  property("rolling hash is order-sensitive (unlike set-based fingerprints)") =
    Prop.forAll(Gen.alphaLowerStr.suchThat(s => s.length >= 2 && s.toSet.size >= 2)) { s =>
      val rev = s.reverse
      // not a hard guarantee (collisions exist) but holds on alpha strings
      // short enough for the generator; equality would signal a broken fold
      s == rev || hashOf(s) != hashOf(rev)
    }

  private val payloadGen: Gen[Array[Byte]] =
    Gen.choose(0, 500).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127))
      .map(_.map(_.toByte).toArray))

  property("stub decoder frame count = ceil(bytes / frameSize)") =
    Prop.forAll(payloadGen) { p =>
      val f = new StubDecoder(64).decode(MediaRecord(1L, p))
      f.n_frames == (p.length + 63) / 64 && f.n_bytes == p.length
    }

  property("stub decoder mean byte bounded by [0, 255]") =
    Prop.forAll(payloadGen.suchThat(_.nonEmpty)) { p =>
      val f = new StubDecoder(64).decode(MediaRecord(1L, p))
      f.mean_byte >= 0.0 && f.mean_byte <= 255.0
    }

  property("UTF8String bytes round-trip (hash input representation)") =
    Prop.forAll(asciiText) { s =>
      UTF8String.fromString(s).getBytes.sameElements(s.getBytes("UTF-8"))
    }
}
