package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Parity spec for the native [[graft.plans.ShingleSet]] expression: its
  * output must be BIT-IDENTICAL (as a set AND as a first-occurrence-order
  * sequence) to the higher-order-function chain it replaced
  * ([[graft.operators.Dedup.shingleSetHof]]) — including the whitespace
  * edge cases of `trim` (0x20 only) and Java `split("\s+", -1)` (leading/
  * trailing empty tokens). Inputs are whitespace-adversarial: every ASCII
  * \s character, runs, ends, multibyte text, empty and null strings. */
class ShingleSetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val wsChars = Seq(' ', '\t', '\n', '\u000B', '\f', '\r')
  private val tokenGen = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.const("日本語テキスト"), Gen.const("a"), Gen.const(""))
  private val sepGen =
    Gen.nonEmptyListOf(Gen.oneOf(wsChars)).map(_.take(3).mkString)
  private val textGen: Gen[String] = for {
    k <- Gen.choose(0, 12)
    toks <- Gen.listOfN(k, tokenGen)
    seps <- Gen.listOfN(k + 1, sepGen)
    lead <- Gen.oneOf("", " ", "\t", "  \t")
    trail <- Gen.oneOf("", " ", "\n", "\r ")
  } yield lead + seps.zip(toks :+ "").map { case (s, t) => t + s }.mkString + trail

  test("native shingle_set ≡ the HOF chain on whitespace-adversarial inputs") {
    val fixed = Seq[String](
      null, "", " ", "\t", "a", "a b c d e", "a b c d e f g",
      " a  b\tc d e f ", "\ta b c d e", "a b c d e\t",
      "x x x x x x x x", "a\u000Bb\fc\rd\ne f")
    val sampled = Gen.listOfN(300, textGen)
      .pureApply(Gen.Parameters.default, Seed(42L))
    val cases = fixed ++ sampled
    graft.plans.GraftFunctions.register(spark)
    val df = cases.toDF("text")
    for (n <- Seq(1, 2, 5)) {
      val got = df.select(
          graft.operators.Dedup.shingleSet($"text", n).as("native"),
          graft.operators.Dedup.shingleSetHof($"text", n).as("hof"))
        .collect()
      got.zip(cases).foreach { case (r, src) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n text=${Option(src).map(_.replace("\n", "\\n").replace("\t", "\\t"))}")
      }
    }
  }

  test("interpreted eval matches codegen for shingle_set") {
    // eval() and doGenCode share one static compute, but pin it anyway:
    // run the expression through a non-codegen context (literal fold)
    import graft.plans.ShingleSet
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val lit = Literal(UTF8String.fromString(" a b\tc d e f "),
      org.apache.spark.sql.types.StringType)
    val out = ShingleSet(lit, Literal(5)).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val strs = (0 until out.numElements()).map(out.getUTF8String(_).toString)
    assert(strs == Seq("a b c d e", "b c d e f"))
  }
}
