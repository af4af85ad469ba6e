package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck invariants for the pure BPE core (the Scala twin of the
  * SQL merge fold — BpeTrainSpec pins the two equal on examples, these
  * pin the fold's algebra on random inputs).
  */
object BpeProps extends Properties("BpeTrain.merge") {

  private val symGen: Gen[String] = Gen.oneOf("a", "b", "c")
  private val symsGen: Gen[Vector[String]] =
    Gen.choose(0, 24).flatMap(n => Gen.listOfN(n, symGen)).map(_.toVector)
  private val ruleGen: Gen[(String, String)] =
    for { a <- symGen; b <- symGen } yield (a, b)

  property("merging preserves the character stream") =
    forAll(symsGen, ruleGen) { case (syms, (a, b)) =>
      BpeTrain.mergePass(syms, a, b).mkString == syms.mkString
    }

  property("a pass leaves no adjacent (a,b) occurrence behind") =
    forAll(symsGen, ruleGen) { case (syms, (a, b)) =>
      val out = BpeTrain.mergePass(syms, a, b)
      !(0 until out.length - 1).exists(i => out(i) == a && out(i + 1) == b)
    }

  property("a pass is idempotent") =
    forAll(symsGen, ruleGen) { case (syms, (a, b)) =>
      val once = BpeTrain.mergePass(syms, a, b)
      BpeTrain.mergePass(once, a, b) == once
    }

  property("a pass never grows the sequence and shrinks iff a pair matched") =
    forAll(symsGen, ruleGen) { case (syms, (a, b)) =>
      val had = (0 until syms.length - 1).exists(i => syms(i) == a && syms(i + 1) == b)
      val out = BpeTrain.mergePass(syms, a, b)
      if (had) out.length < syms.length else out == syms
    }

  private val wordGen: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
  private val ranksGen: Gen[Map[(String, String), Long]] =
    Gen.mapOf(for {
      a <- Gen.oneOf("a", "b", "c", "ab", "bc")
      b <- Gen.oneOf("a", "b", "c", "</w>")
      r <- Gen.choose(1L, 50L)
    } yield (a, b) -> r)

  property("encode length is within [1, chars + 1] and exact with no merges") =
    forAll(wordGen, ranksGen) { (w, ranks) =>
      val n = BpeTrain.encodeLen(w, ranks)
      n >= 1 && n <= w.length + 1 && BpeTrain.encodeLen(w, Map.empty) == w.length + 1
    }
}
