package graft

import graft.ops.Triangles

/** Degree-ordered triangle counting: hand graphs where the answer is
  * derivable on paper, canonicalization of messy edge lists, and a
  * seeded random-graph brute-force equivalence (the oracle proves the
  * real-data path; this pins adversarial shapes).
  */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

  test("K4: four triangles, every node in three") {
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    assert(count(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("stars and chains have no triangles") {
    assert(count((1L to 9L).map(i => (0L, i))).isEmpty) // star: hub shape
    assert(count((0L until 9L).map(i => (i, i + 1))).isEmpty) // path
  }

  test("triangle + pendant: pendant node excluded") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(count(g) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("messy input: duplicates, reversed orientation, self-loops") {
    val g = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L), (2L, 2L))
    assert(count(g) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("seeded random graph matches the cubic brute force") {
    val rnd = new scala.util.Random(77)
    val n = 40
    val edges = for {
      a <- 0L until n; b <- (a + 1) until n if rnd.nextInt(5) == 0
    } yield (a, b.toLong)
    val es = edges.toSet
    val brute = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n)
      if (es((a, b)) && es((b, c)) && es((a, c))) {
        brute(a) += 1; brute(b) += 1; brute(c) += 1
      }
    assert(count(edges) == brute.toMap)
  }
}
