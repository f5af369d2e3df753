package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._

/** The equi-join form of subject matching ([[Subjects.matchKeysCol]])
  * must agree pair-for-pair with the token matcher [[Subjects.matches]]
  * over the full engine grammar — it replaced the project-token join +
  * matchesCol residual in both mux engines (the O(G) per-row candidate
  * cost, BASELINE.md round-14), so any divergence is silent mis- or
  * non-delivery. Ids are drawn from a tiny alphabet so prefix traps
  * ("c1" vs "c10"), cross-level collisions, and same-id-different-role
  * cases all occur. */
class SubjectEquiJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-subject-equijoin-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("matchKeysCol equi-join agrees with the token matcher on every (subject, filter) pair") {
    import spark.implicits._
    val ids = Seq("a", "aa", "a1", "a10", "b")
    // every publish-subject shape the fan-out emits
    val subjects = (for {
      p <- ids; c <- ids; so <- ids; o <- Seq("a", "a10")
    } yield Seq(
      Subjects.projectSubject(p),
      Subjects.collectionSubject(p, c),
      Subjects.objectSubject(p, c, so, o),
      Subjects.objectGroupSubject(p, c, so, o))).flatten.distinct
    // every filter shape queryFor compiles (exact + subtree at each level)
    val filters = (for { p <- ids; c <- ids; so <- Seq("a", "a10") } yield Seq(
      Subjects.queryFor(ResourceType.Project, p, Hierarchy(projectId = p), false),
      Subjects.queryFor(ResourceType.Project, p, Hierarchy(projectId = p), true),
      Subjects.queryFor(ResourceType.Collection, c,
        Hierarchy(projectId = p, collectionId = c), false),
      Subjects.queryFor(ResourceType.Collection, c,
        Hierarchy(projectId = p, collectionId = c), true),
      Subjects.queryFor(ResourceType.Object, "o1",
        Hierarchy(projectId = p, collectionId = c, sharedObjectId = so, objectId = "o1"), false),
      Subjects.queryFor(ResourceType.Object, "o1",
        Hierarchy(projectId = p, collectionId = c, sharedObjectId = so, objectId = "o1"), true),
      Subjects.queryFor(ResourceType.ObjectGroup, "g1",
        Hierarchy(projectId = p, collectionId = c, sharedObjectGroupId = so, objectGroupId = "g1"), false),
      Subjects.queryFor(ResourceType.ObjectGroup, "g1",
        Hierarchy(projectId = p, collectionId = c, sharedObjectGroupId = so, objectGroupId = "g1"), true)
    )).flatten.distinct

    val depths = filters.flatMap(Subjects.subtreeDepth).distinct.sorted
    assert(depths.nonEmpty && depths.size <= 6,
      s"engine grammar should yield a handful of subtree depths, got $depths")

    val subjectsDf = subjects.toDF("subject")
    val filtersDf = filters.toDF("joinKey")
    val viaJoin = subjectsDf
      .withColumn("joinKey", explode(Subjects.matchKeysCol(col("subject"), depths)))
      .join(broadcast(filtersDf), "joinKey")
      .select("subject", "joinKey")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

    val viaTokens = (for {
      s <- subjects; f <- filters if Subjects.matches(s, f)
    } yield (s, f)).toSet

    assert(viaJoin == viaTokens,
      s"equi-join diverges from token matcher: only-join=${(viaJoin -- viaTokens).take(5)} " +
        s"only-tokens=${(viaTokens -- viaJoin).take(5)}")
    // sanity: the corpus actually exercises both polarity classes
    assert(viaTokens.nonEmpty && viaTokens.size < subjects.size * filters.size)
  }
}
