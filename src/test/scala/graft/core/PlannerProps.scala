package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import PartitionPlanner._

/** ScalaCheck property suites (run natively by sbt's ScalaCheck
  * framework; the scalatest bridge artifact is not in the offline
  * cache). Properties mirror SURVEY.md §5's plan: bin-packing balance
  * bounds, union-find invariants, shrink monotonicity.
  */
object BinPackProps extends Properties("PartitionPlanner.binPack") {

  private val partsGen: Gen[List[SourcePartition]] =
    Gen.choose(0, 60).flatMap { n =>
      Gen.listOfN(
        n,
        for {
          id <- Gen.choose(0, 1 << 20)
          r <- Gen.choose(0L, 1000000L)
        } yield SourcePartition(s"p$id", r)
      )
    }.map(_.zipWithIndex.map { case (p, i) => p.copy(name = s"${p.name}_$i") })

  property("partition of the input (no loss, no duplication)") =
    forAll(partsGen, Gen.choose(1, 16)) { (parts, n) =>
      binPack(parts, n).flatten.sortBy(_.name) == parts.sortBy(_.name)
    }

  property("LPT balance bound: max load <= avg + max item") =
    forAll(partsGen.suchThat(_.nonEmpty), Gen.choose(1, 16)) { (parts, n) =>
      val loads = binPack(parts, n).map(_.map(_.rows).sum)
      loads.max <= parts.map(_.rows).sum.toDouble / n + parts.map(_.rows).max + 1
    }

  property("bin count = min(nBins, #parts) and bins non-empty") =
    forAll(partsGen, Gen.choose(1, 16)) { (parts, n) =>
      val bins = binPack(parts, n)
      bins.size == math.min(n, parts.size) && bins.forall(_.nonEmpty)
    }

  property("permutation invariance") =
    forAll(partsGen, Gen.choose(1, 8), Gen.long) { (parts, n, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(parts)
      binPack(parts, n) == binPack(shuffled, n)
    }

  property("hash-split predicates are complete disjoint residues") =
    forAll(Gen.choose(1, 64)) { n =>
      val preds = hashSplitPredicates("h", n)
      preds.length == n && preds.distinct.length == n &&
      preds.zipWithIndex.forall { case (p, i) => p == s"mod(h, $n) = $i" }
    }
}

object UnionFindProps extends Properties("FkHarmonizer.groups") {
  import FkHarmonizer._

  private def ref(i: Int) = ColRef("s", s"t$i", "k")

  private val edgesGen: Gen[List[FkEdge]] =
    for {
      nNodes <- Gen.choose(2, 25)
      nEdges <- Gen.choose(1, 50)
      edges <- Gen.listOfN(
        nEdges,
        for {
          a <- Gen.choose(0, nNodes - 1)
          b <- Gen.choose(0, nNodes - 1)
          id <- Gen.choose(0, 1 << 20)
        } yield FkEdge(s"fk$id", ref(a), ref(b), enabled = false)
      )
    } yield edges

  property("components partition the touched nodes") = forAll(edgesGen) { edges =>
    val gs = groups(edges)
    val members = gs.values.flatten.toSeq
    val touched = edges.flatMap(e => Seq(e.child, e.parent)).distinct
    members.sortBy(_.table) == touched.sortBy(_.table) && members.distinct.size == members.size
  }

  property("every edge's endpoints share a component") = forAll(edgesGen) { edges =>
    val gs = groups(edges)
    def compOf(c: ColRef) = gs.find(_._2.contains(c)).map(_._1)
    edges.forall(e => compOf(e.child) == compOf(e.parent))
  }

  property("group id is the lexicographic minimum of its members") = forAll(edgesGen) { edges =>
    groups(edges).forall { case (gid, ms) =>
      ms.minBy(c => (c.schema, c.table, c.column)) == gid
    }
  }

  property("merge of decimals covers every member") =
    forAll(Gen.nonEmptyListOf(for {
      p <- Gen.choose(1, 36)
      s <- Gen.choose(0, 10).map(math.min(_, p))
    } yield DecimalSpec(p, s))) { specs =>
      mergeTargets(specs) match {
        case Some(DecimalSpec(p, s)) =>
          specs.forall(d => s >= d.scale && (p - s) >= math.min(d.precision - d.scale, 36 - s))
        case _ => false
      }
    }
}
