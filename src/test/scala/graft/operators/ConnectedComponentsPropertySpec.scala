package graft.operators

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based check of the distributed connected-components operator
  * against a driver-side union-find reference on random graphs. */
class ConnectedComponentsPropertySpec extends SparkSuite {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents == union-find on random graphs (20 seeds)") {
    val edgeGen = for {
      n <- Gen.choose(2, 60)          // node id space
      m <- Gen.choose(1, 120)         // edge count
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) suchThat (_ != a)
      } yield (math.min(a, b), math.max(a, b)))
    } yield es.distinct
    (1 to 20).foreach { i =>
      val edges = edgeGen(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Seq((0L, 1L)))
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(edges)
      assert(got === want, s"seed $i, edges $edges")
    }
  }

  test("starComponents == union-find on random graphs (10 seeds)") {
    val edgeGen = for {
      n <- Gen.choose(2, 60)
      m <- Gen.choose(1, 120)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) suchThat (_ != a)
      } yield (math.min(a, b), math.max(a, b)))
    } yield es.distinct
    (1 to 10).foreach { i =>
      val edges = edgeGen(Gen.Parameters.default, Seed(100L + i))
        .getOrElse(Seq((0L, 1L)))
      val got = Dedup.starComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === unionFind(edges), s"seed $i, edges $edges")
    }
  }

  test("starComponents: 96-node chain converges (min-label would need 96 rounds)") {
    val chain = (0L until 96L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = Dedup.starComponents(chain.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 96)
    assert(got.values.forall(_ == 0L))
  }

  test("starComponents == connectedComponents on the real jaccard edge set") {
    val edges = Dedup.ngramJaccard(spark, "/root/testdata/sf0.001")
      .select("id_a", "id_b")
    val a = Dedup.starComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
