package graft.text

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Byte-identity of the TidyTitle port vs a table-driven spec of the
  * reference behavior (CitationGraphs.go:1395-1430, :33-34, :1352-1378),
  * including the `<?>` entity quirks (SURVEY.md §2.8).
  */
class TidySpec extends SparkSpec {

  /** Deterministic property runner (no scalatestplus bridge offline):
    * 200 samples from `gen` off a fixed scalacheck seed. */
  def forAllSamples[A](gen: Gen[A], n: Int = 200)(check: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      check(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  // expected outputs hand-derived from the Go source, char by char
  val table: Seq[(String, String)] = Seq(
    ("  hello  ", "hello"),
    ("a &lt;b&gt; c", "a <b> c"),
    ("x &amp; y", "x & y"),
    ("&quot;q&quot;", "\"q\""),
    ("&apos;s", "'s"),
    // entity-of-entity: sequential replaces, no re-scan
    ("&amp;lt;", "&lt;"),
    // the &// quirks: EVERY match becomes literal <?>
    ("A &//x41; B", "A <?> B"),
    ("A &//X41; B", "A <?> B"),
    ("A &//65; B", "A <?> B"),
    ("&//x0; &//9;", "<?> <?>"),
    // non-matches stay verbatim
    ("&#x41; &#65;", "&#x41; &#65;"),
    ("&//xG1; &//x;", "&//xG1; &//x;"),
    ("&// 65;", "&// 65;"),
    // Go TrimSpace trims unicode whitespace Java's trim would keep
    (" x　", "x"),
    (" y ", "y"),
    // mixed
    (" &lt;&//x2603;&gt; ", "<<?>>"),
    ("", ""),
    ("   ", "")
  )

  test("TidyTitle byte-identity table") {
    table.foreach { case (in, want) =>
      assert(Tidy.tidyTitle(in) == want, s"input=${in.map(_.toInt).mkString(",")}")
    }
  }

  test("every &//hex / &//dec match is replaced by literal <?>") {
    val hexGen = for {
      x <- Gen.oneOf("x", "X")
      ds <- Gen.nonEmptyListOf(Gen.oneOf("0123456789abcdefABCDEF".toSeq))
    } yield s"&//$x${ds.mkString};"
    val decGen = Gen.nonEmptyListOf(Gen.oneOf("0123456789".toSeq))
      .map(ds => s"&//${ds.mkString};")
    val gen = for {
      ent <- Gen.oneOf(hexGen, decGen)
      pre <- Gen.alphaStr
      post <- Gen.alphaStr
    } yield (ent, pre, post)
    forAllSamples(gen) { case (ent, pre, post) =>
      assert(Tidy.tidyTitle(pre + ent + post) == pre + "<?>" + post)
    }
  }

  test("trim matches Go White_Space set, not Java trim") {
    assert(Tidy.goTrimSpace(" a ") == "a")
    assert(" a ".trim != "a") // documents why goTrimSpace exists
    assert(Tidy.goTrimSpace("  z ") == "z")
  }

  test("idempotence on entity-free text") {
    forAllSamples(Gen.asciiPrintableStr.map(_.filterNot(_ == '&'))) { s =>
      val once = Tidy.tidyTitle(s)
      assert(Tidy.tidyTitle(once) == once)
    }
  }

  test("comma escape round-trip") {
    assert(Tidy.unescapeComma(Tidy.escapeComma("a,b,c")) == "a,b,c")
    assert(Tidy.escapeComma("a,b") == "a[comma]b")
  }

  test("tidy_title UDF agrees with the scalar function") {
    import spark.implicits._
    val inputs = table.map(_._1).toDF("raw")
    val got = inputs.select(Tidy.tidy_title(org.apache.spark.sql.functions.col("raw")))
      .as[String].collect().toSeq
    assert(got == table.map(_._2))
  }
}
