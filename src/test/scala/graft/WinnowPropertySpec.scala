package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.WinnowUtil

/** Property-based checks of the winnowing core (pure JVM — no Spark).
  * Runs under sbt's native ScalaCheck framework support.
  */
object WinnowPropertySpec extends Properties("WinnowUtil") {

  private val k = 12
  private val w = 8
  private val word = Gen.stringOfN(4, Gen.alphaLowerChar)
  private val text: Gen[String] =
    Gen.chooseNum(5, 60).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def fp(s: String): Set[Long] = {
    val arr = WinnowUtil.fingerprint(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
    arr.toLongArray().toSet
  }

  property("deterministic and non-empty for texts >= k chars") =
    Prop.forAll(text) { s =>
      s.length < k || { val a = fp(s); a == fp(s) && a.nonEmpty }
    }

  property("shared substring of length >= k+w-1 shares a fingerprint") = {
    val gen = for {
      shared <- Gen.stringOfN(k + w + 10, Gen.alphaLowerChar)
      p1 <- Gen.stringOfN(20, Gen.alphaLowerChar)
      p2 <- Gen.stringOfN(20, Gen.alphaLowerChar)
      s1 <- Gen.stringOfN(20, Gen.alphaLowerChar)
      s2 <- Gen.stringOfN(20, Gen.alphaLowerChar)
    } yield (s"$p1$shared$s1", s"$p2$shared$s2")
    Prop.forAll(gen) { case (d1, d2) => (fp(d1) & fp(d2)).nonEmpty }
  }

  property("every fingerprint is a real k-gram hash of the input") =
    Prop.forAll(text) { s =>
      s.length < k ||
        fp(s).subsetOf(WinnowUtil.rollingHashes(s.getBytes("UTF-8"), k).toSet)
    }

  property("rolling hashes equal direct polynomial hashes at every offset") =
    Prop.forAll(text) { s =>
      val bytes = s.getBytes("UTF-8")
      bytes.length < k || {
        val direct = (0 to bytes.length - k).map { i =>
          bytes.slice(i, i + k).foldLeft(0L)((h, b) => h * 257L + (b & 0xFF))
        }
        WinnowUtil.rollingHashes(bytes, k).toSeq == direct
      }
    }
}
