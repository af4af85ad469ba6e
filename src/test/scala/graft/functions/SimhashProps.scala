package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Properties for the single-buffer simhash aggregator: agreement with
  * an independent naive reference, and the merge laws partial
  * aggregation relies on (any split of the input through
  * reduce/merge must produce the same fingerprint).
  */
object SimhashProps extends Properties("SimhashAggregator") {

  private val bits = 60
  private def agg = new SimhashAggregator(bits)

  private val hexChars = "0123456789abcdef"
  private val hashGen: Gen[String] =
    Gen.listOfN(32, Gen.oneOf(hexChars.toSeq)).map(_.mkString)
  private val hashesGen: Gen[List[String]] = Gen.nonEmptyListOf(hashGen)

  /** Independent reference: per bit j, count ±1 over hash bit j. */
  private def reference(hashes: Seq[String]): Long = {
    val counters = new Array[Int](bits)
    hashes.foreach { h =>
      (0 until bits).foreach { j =>
        val v = Integer.parseInt(h.charAt(j / 4).toString, 16)
        counters(j) += (if (((v >> (j % 4)) & 1) == 1) 1 else -1)
      }
    }
    (0 until bits).foldLeft(0L)((fp, j) => if (counters(j) >= 0) fp | (1L << j) else fp)
  }

  property("agrees with the naive reference") = forAll(hashesGen) { hashes =>
    val buf = hashes.foldLeft(agg.zero)(agg.reduce)
    agg.finish(buf) == reference(hashes)
  }

  property("merge law: any split reduces to the same fingerprint") =
    forAll(hashesGen, Gen.choose(0, 100)) { (hashes, cut) =>
      val k = cut % (hashes.size + 1)
      val (l, r) = hashes.splitAt(k)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      agg.finish(merged) == agg.finish(hashes.foldLeft(agg.zero)(agg.reduce))
    }

  property("fingerprint stays within 60 bits") = forAll(hashesGen) { hashes =>
    val fp = agg.finish(hashes.foldLeft(agg.zero)(agg.reduce))
    fp >= 0L && fp < (1L << bits)
  }
}
