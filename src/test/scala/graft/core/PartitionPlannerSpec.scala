package graft.core

import org.scalatest.funsuite.AnyFunSuite
import PartitionPlanner._

/** Property-style tests with a fixed-seed generator (the scalatest ⇄
  * scalacheck bridge artifact is not in the offline cache, so
  * properties run as seeded loops — same coverage, deterministic).
  */
class PartitionPlannerSpec extends AnyFunSuite {

  private def randomParts(rnd: scala.util.Random): List[SourcePartition] = {
    val n = rnd.nextInt(40)
    List.tabulate(n)(i => SourcePartition(s"p${i}_${rnd.nextInt(1000)}", rnd.nextLong(1000000L)))
  }

  test("every partition lands in exactly one bin") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val parts = randomParts(rnd)
      val nBins = 1 + rnd.nextInt(16)
      val bins = binPack(parts, nBins)
      assert(bins.flatten.sortBy(_.name) == parts.sortBy(_.name))
    }
  }

  test("greedy LPT balance bound: max load <= avg + max item") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val parts = randomParts(rnd)
      if (parts.nonEmpty) {
        val nBins = 1 + rnd.nextInt(16)
        val loads = binPack(parts, nBins).map(_.map(_.rows).sum)
        val avg = parts.map(_.rows).sum.toDouble / nBins
        val maxItem = parts.map(_.rows).max
        assert(loads.max <= avg + maxItem + 1)
      }
    }
  }

  test("deterministic under input permutation") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 100) {
      val parts = randomParts(rnd)
      val nBins = 1 + rnd.nextInt(8)
      val shuffled = rnd.shuffle(parts)
      assert(binPack(parts, nBins) == binPack(shuffled, nBins))
    }
  }

  test("uses at most nBins and no empty bins") {
    val parts = (1 to 10).map(i => SourcePartition(s"p$i", i * 100L))
    assert(binPack(parts, 4).size == 4)
    assert(binPack(parts, 32).size == 10) // never more bins than partitions
    assert(binPack(parts, 32).forall(_.nonEmpty))
  }

  test("partition predicates quote and group names") {
    val parts = Seq(SourcePartition("P_2024", 10), SourcePartition("P_2025", 5), SourcePartition("O'HARE", 1))
    val preds = partitionPredicates(parts, 2, "part_name")
    assert(preds.length == 2)
    assert(preds.exists(_.contains("'P_2024'")))
    assert(preds.exists(_.contains("'O''HARE'"))) // quote doubling
  }

  test("hash split predicates are disjoint residue classes") {
    val preds = hashSplitPredicates("ora_hash(rowid)", 4)
    assert(preds.toSeq == (0 until 4).map(i => s"mod(ora_hash(rowid), 4) = $i"))
  }

  test("range split covers boundaries like Spark JDBC (open ends)") {
    val preds = rangeSplitPredicates("id", 0, 100, 4)
    assert(preds.head.contains("id < 25") && preds.head.contains("IS NULL"))
    assert(preds.last == "id >= 75")
    assert(preds.length == 4)
  }
}
