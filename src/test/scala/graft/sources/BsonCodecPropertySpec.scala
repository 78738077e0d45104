package graft.sources

import org.scalacheck.{Arbitrary, Gen, Properties}
import org.scalacheck.Prop.forAll

import BsonCodec._

/** Property attestation for the BSON codec (the ScramSpec/golden-vector
  * pattern's randomized sibling): any document tree over the modeled
  * type set survives encode → decode structurally, and the re-encoding
  * is byte-identical (field order is part of BSON document identity).
  */
object BsonCodecPropertySpec extends Properties("BsonCodec") {

  private val genName: Gen[String] = for {
    n <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, Gen.frequency(
      (8, Gen.alphaNumChar), (1, Gen.const('_')), (1, Gen.oneOf('é', '☃'))))
  } yield cs.mkString

  private val genLeaf: Gen[BsonValue] = Gen.oneOf(
    Gen.chooseNum(Double.MinValue, Double.MaxValue).map(BDouble.apply),
    // valid-unicode strings only (a lone surrogate is not UTF-8
    // encodable; NULs/control chars are fine in VALUES -- only names
    // are cstrings)
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('\u00e9',
      '\u2603', '\n', '\t', '\\', ' ', '\u0000')))
      .map(cs => BString(cs.mkString)),
    Gen.listOfN(24, Gen.oneOf("0123456789abcdef".toSeq))
      .map(cs => BObjectId(cs.mkString)),
    Arbitrary.arbitrary[Boolean].map(BBool.apply),
    Arbitrary.arbitrary[Long].map(BDateTime.apply),
    Gen.const(BNull),
    Arbitrary.arbitrary[Int].map(BInt32.apply),
    Arbitrary.arbitrary[Long].map(BInt64.apply),
    Arbitrary.arbitrary[Long].map(BTimestamp.apply),
    for {
      sub <- Gen.oneOf(0.toByte, 4.toByte, 0x80.toByte)
      bytes <- Gen.listOf(Arbitrary.arbitrary[Byte])
    } yield BBinary(sub, bytes.toArray))

  private def genValue(depth: Int): Gen[BsonValue] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      (6, genLeaf),
      (1, Gen.choose(0, 4).flatMap(n =>
        Gen.listOfN(n, genValue(depth - 1)).map(vs => BArray(vs.toVector)))),
      (1, genDoc(depth - 1).map(d => d: BsonValue)))

  private def genDoc(depth: Int): Gen[BDoc] = for {
    n <- Gen.choose(0, 6)
    names <- Gen.listOfN(n, genName)
    values <- Gen.listOfN(n, genValue(depth))
  } yield BDoc(names.zip(values).toVector)

  private def structurallyEqual(a: BsonValue, b: BsonValue): Boolean =
    (a, b) match {
      case (BBinary(s1, b1), BBinary(s2, b2)) => s1 == s2 && b1.toSeq == b2.toSeq
      case (BDoc(f1), BDoc(f2)) =>
        f1.length == f2.length && f1.zip(f2).forall {
          case ((n1, v1), (n2, v2)) => n1 == n2 && structurallyEqual(v1, v2)
        }
      case (BArray(i1), BArray(i2)) =>
        i1.length == i2.length &&
          i1.zip(i2).forall { case (x, y) => structurallyEqual(x, y) }
      case _ => a == b
    }

  property("encode→decode is structural identity") =
    forAll(genDoc(3)) { doc =>
      structurallyEqual(decode(encode(doc)), doc)
    }

  property("decode→re-encode is byte identity (order preserved)") =
    forAll(genDoc(3)) { doc =>
      val bytes = encode(doc)
      encode(decode(bytes)).toSeq == bytes.toSeq
    }

  property("reference-JSON rendering never throws and is valid-ish JSON") =
    forAll(genDoc(2)) { doc =>
      val s = toReferenceJson(doc)
      s.startsWith("{") && s.endsWith("}")
    }

  /** The CPython-repr double rendering (r17): round-trip exactness and
    * Python's layout invariants, over random finite bit patterns (a
    * 5005-value sweep against CPython itself read 0 mismatches when
    * the implementation landed; this keeps the invariants pinned
    * without a python binary).
    */
  private val genFiniteDouble: Gen[Double] =
    Arbitrary.arbitrary[Long].map(java.lang.Double.longBitsToDouble)
      .retryUntil(d => !d.isNaN && !d.isInfinite)

  property("repr doubles re-parse to identical bits (shortest round-trip)") =
    forAll(genFiniteDouble) { d =>
      val s = toReferenceJson(BDoc("d" -> BDouble(d)))
        .stripPrefix("""{"d":""").stripSuffix("}")
      // raw-bits compare: ±0.0 sign must survive the text form too
      java.lang.Double.doubleToRawLongBits(s.toDouble) ==
        java.lang.Double.doubleToRawLongBits(d)
    }

  property("repr doubles follow Python's layout rules") =
    forAll(genFiniteDouble) { d =>
      val s = toReferenceJson(BDoc("d" -> BDouble(d)))
        .stripPrefix("""{"d":""").stripSuffix("}")
      val body = s.stripPrefix("-")
      if (body.contains("e")) {
        // scientific: bare or dotted mantissa, signed >=2-digit exponent
        val Array(m, e) = body.split("e")
        (e.startsWith("+") || e.startsWith("-")) && e.length >= 3 &&
          !m.endsWith(".0") && m.takeWhile(_ != '.').length == 1 &&
          // Python uses scientific only outside [1e-4, 1e16)
          (math.abs(d) < 1e-4 || math.abs(d) >= 1e16)
      } else {
        // positional: always carries a decimal point
        body.contains(".") &&
          (d == 0.0 || (math.abs(d) >= 1e-4 && math.abs(d) < 1e16))
      }
    }
}
