package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core._

/** Golden tests reproducing the reference's own unit suite
  * (`/root/reference/src/utils/utils.rs:150-300`) string-for-string,
  * plus property tests over the subject algebra. */
class SubjectsSpec extends AnyFunSuite {

  /** Deterministic property-check driver over ScalaCheck Gens (the
    * scalatest-scalacheck bridge artifact is not on the offline
    * classpath; seeded sampling gives the same coverage reproducibly). */
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 200).foreach { i =>
      val p = Gen.Parameters.default
      f(ga.pureApply(p, Seed(i)), gb.pureApply(p, Seed(i + 10000)))
    }

  private def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])
                                (f: (A, B, C, D) => Unit): Unit =
    (1 to 200).foreach { i =>
      val p = Gen.Parameters.default
      f(ga.pureApply(p, Seed(i)), gb.pureApply(p, Seed(i + 10000)),
        gc.pureApply(p, Seed(i + 20000)), gd.pureApply(p, Seed(i + 30000)))
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  // utils.rs:181-193 (test_base_subject)
  test("base subjects match reference goldens") {
    assert(Subjects.baseSubject(Seq("project_id"), false) == "UPDATES.STORAGE._.project_id")
    assert(Subjects.baseSubject(Seq("project_id", "collection_id"), false)
      == "UPDATES.STORAGE._.project_id._.collection_id")
    assert(Subjects.baseSubject(
      Seq("project_id", "collection_id", "shared_object_id", "object_id"), false)
      == "UPDATES.STORAGE._.project_id._.collection_id._.OBJECT._.shared_object_id._.object_id")
    assert(Subjects.baseSubject(
      Seq("project_id", "collection_id", "shared_object_group_id", "object_group_id"), true)
      == "UPDATES.STORAGE._.project_id._.collection_id._.OBJECTGROUP._.shared_object_group_id._.object_group_id")
  }

  // utils.rs:241-263 (test_query_strings)
  test("query strings match reference goldens") {
    assert(Subjects.projectQuery("project_id", false) == "UPDATES.STORAGE._.project_id._")
    assert(Subjects.projectQuery("project_id", true) == "UPDATES.STORAGE._.project_id.>")
    assert(Subjects.collectionQuery("project_id", "collection_id", false)
      == "UPDATES.STORAGE._.project_id._.collection_id._")
    assert(Subjects.collectionQuery("project_id", "collection_id", true)
      == "UPDATES.STORAGE._.project_id._.collection_id.>")
    assert(Subjects.objectQuery("project_id", "collection_id", "shared_object_id", "object_id", false)
      == "UPDATES.STORAGE._.project_id._.collection_id._.OBJECT._.shared_object_id._.object_id._")
    assert(Subjects.objectQuery("project_id", "collection_id", "shared_object_id", "object_id", true)
      == "UPDATES.STORAGE._.project_id._.collection_id._.OBJECT._.shared_object_id._.object_id.>")
    assert(Subjects.objectGroupQuery("project_id", "collection_id",
      "shared_object_group_id", "object_group_id", false)
      == "UPDATES.STORAGE._.project_id._.collection_id._.OBJECTGROUP._.shared_object_group_id._.object_group_id._")
    assert(Subjects.objectGroupQuery("project_id", "collection_id",
      "shared_object_group_id", "object_group_id", true)
      == "UPDATES.STORAGE._.project_id._.collection_id._.OBJECTGROUP._.shared_object_group_id._.object_group_id.>")
  }

  // utils.rs:286-298 (test_subject_strings)
  test("publish subjects match reference goldens") {
    assert(Subjects.projectSubject("project_id") == "UPDATES.STORAGE._.project_id._")
    assert(Subjects.collectionSubject("project_id", "collection_id")
      == "UPDATES.STORAGE._.project_id._.collection_id._")
    assert(Subjects.objectSubject("project_id", "collection_id", "shared_object_id", "object_id")
      == "UPDATES.STORAGE._.project_id._.collection_id._.OBJECT._.shared_object_id._.object_id._")
    assert(Subjects.objectGroupSubject("project_id", "collection_id",
      "shared_object_group_id", "object_group_id")
      == "UPDATES.STORAGE._.project_id._.collection_id._.OBJECTGROUP._.shared_object_group_id._.object_group_id._")
  }

  // NATS token ids may not contain '.', '*', '>' or whitespace.
  private val idGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)

  test("a publish subject is always matched by its own exact query") {
    forAll(idGen, idGen) { (p, c) =>
      assert(Subjects.matches(Subjects.projectSubject(p), Subjects.projectQuery(p, false)))
      assert(Subjects.matches(Subjects.collectionSubject(p, c),
        Subjects.collectionQuery(p, c, false)))
    }
  }

  test("subtree queries match a superset of exact queries") {
    forAll(idGen, idGen, idGen, idGen) { (p, c, so, o) =>
      val subjects = Seq(
        Subjects.projectSubject(p),
        Subjects.collectionSubject(p, c),
        Subjects.objectSubject(p, c, so, o),
        Subjects.objectGroupSubject(p, c, so, o))
      val exact = subjects.count(Subjects.matches(_, Subjects.projectQuery(p, false)))
      val subtree = subjects.count(Subjects.matches(_, Subjects.projectQuery(p, true)))
      assert(subtree >= exact)
      // the subtree query sees every descendant incl. the project itself
      assert(subtree == subjects.size)
    }
  }

  test("exact queries are level-precise: project._ does not match descendants") {
    forAll(idGen, idGen) { (p, c) =>
      val q = Subjects.projectQuery(p, false)
      assert(Subjects.matches(Subjects.projectSubject(p), q))
      assert(!Subjects.matches(Subjects.collectionSubject(p, c), q))
    }
  }

  test("queries never match a different project's subjects") {
    forAll(idGen, idGen) { (p1, p2) =>
      whenever(p1 != p2 && !p1.startsWith(p2) && !p2.startsWith(p1)) {
        assert(!Subjects.matches(Subjects.projectSubject(p1), Subjects.projectQuery(p2, false)))
        assert(!Subjects.matches(Subjects.projectSubject(p1), Subjects.projectQuery(p2, true)))
      }
    }
  }

  test("wildcard regex translation agrees with the token matcher") {
    forAll(idGen, idGen, idGen, idGen) { (p, c, so, o) =>
      val subjects = Seq(
        Subjects.projectSubject(p), Subjects.collectionSubject(p, c),
        Subjects.objectSubject(p, c, so, o), Subjects.objectGroupSubject(p, c, so, o))
      val wildcardQueries = Seq(
        s"UPDATES.STORAGE._.*._",              // any project, exact level
        s"UPDATES.STORAGE._.$p._.*._",         // any collection of p
        s"UPDATES.STORAGE._.*.>",              // any project subtree
        s"UPDATES.*._.$p._")                   // mid-path wildcard
      for (su <- subjects; q <- wildcardQueries) {
        val viaTokens = Subjects.matches(su, q)
        val viaRegex = su.matches(Subjects.wildcardRegex(q))
        assert(viaTokens == viaRegex, s"mismatch subject=$su query=$q")
      }
    }
  }

  test("matchesLit agrees with the token matcher on generated cases") {
    forAll(idGen, idGen, idGen, idGen) { (p, c, so, o) =>
      val subjects = Seq(
        Subjects.projectSubject(p), Subjects.collectionSubject(p, c),
        Subjects.objectSubject(p, c, so, o), Subjects.objectGroupSubject(p, c, so, o))
      val queries = Seq(
        Subjects.projectQuery(p, false), Subjects.projectQuery(p, true),
        Subjects.collectionQuery(p, c, false), Subjects.collectionQuery(p, c, true))
      for (s <- subjects; q <- queries) {
        val tokenMatch = Subjects.matches(s, q)
        val litMatch =
          if (q.endsWith(".>")) s.startsWith(q.dropRight(1)) else s == q
        assert(tokenMatch == litMatch, s"mismatch for subject=$s query=$q")
      }
    }
  }
}
