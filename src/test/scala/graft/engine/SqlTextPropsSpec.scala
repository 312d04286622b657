package graft.engine

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the SQL string plumbing: quote-aware alias
  * rewriting and top-level splitting must hold for ARBITRARY
  * expression text, not just the shapes the unit specs happen to use —
  * a corrupted rewrite silently mutates user data in MERGE. (Plain
  * scalacheck generators driven from a loop; the scalatest bridge
  * artifact isn't part of the build.) */
class SqlTextPropsSpec extends AnyFunSuite {

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaNumChar, Gen.const('_'))).map(_.mkString)
  } yield s"$h$t"

  private val literalText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', '(', ')', '$', '*')))
      .map(_.mkString)

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("alias occurrences inside single-quoted literals are never rewritten") {
    for ((alias, lit) <- samples(ident).zip(samples(literalText))) {
      val s = s"concat('$lit $alias.x $lit', $alias.v)"
      val out = GraftSql.replaceAlias(s, alias, "t")
      assert(out == s"concat('$lit $alias.x $lit', t.v)", s"alias=$alias lit=$lit")
    }
  }

  test("rewrite only fires at identifier boundaries") {
    for (alias <- samples(ident)) {
      // prefixed identifiers and qualified tails stay intact
      val s = s"x$alias.a + $alias.b + q.$alias.c"
      val out = GraftSql.replaceAlias(s, alias, "t")
      assert(out == s"x$alias.a + t.b + q.$alias.c", s"alias=$alias")
    }
  }

  test("aliases with regex metacharacters are treated literally") {
    // a regex-based rewrite would throw or corrupt on these
    Seq("a$b", "x(1)", "v[0]", "p+q").foreach { alias =>
      val s = s"$alias.col + other.col"
      assert(GraftSql.replaceAlias(s, alias, "t") == "t.col + other.col")
    }
  }

  test("splitTopLevel never splits inside parens or quotes") {
    for (lit <- samples(literalText)) {
      val s = s"f(a, b), 'x, y $lit', g(h(c, d), e), z"
      val parts = GraftSql.splitTopLevel(s, ",")
      assert(parts == Seq("f(a, b)", s"'x, y $lit'", "g(h(c, d), e)", "z"), s"lit=$lit")
    }
  }
}
