package graft

import graft.functions.RollingHash
import org.scalacheck.Gen

/** Property-based checks: generated inputs through the REAL Spark
  * expression paths (one batched DF evaluation per property, not one
  * session per case).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("rolling_hash codegen == reference for arbitrary unicode strings") {
    RollingHash.register(spark)
    val gen = Gen.listOfN(200, Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("δ", "ß", "中", "🙂", "\n", "\t", " ")).map(_.mkString),
      Gen.alphaNumStr))
    val strings = gen.sample.get.distinct
    val got = strings.toDF("s")
      .select($"s", RollingHash.rolling_hash($"s").as("h"))
      .as[(String, Long)].collect().toMap
    strings.foreach { s =>
      assert(got(s) === RollingHash.hashBytes(s.getBytes("UTF-8")), s"for ${s.take(40)}")
    }
  }

  test("minhash jaccard estimate tracks true jaccard on generated sets") {
    // pure-math property of the portable permutation family used in
    // Dedup.minhashPortable: E[match fraction] ≈ J
    def h(s: String, i: Long): Long = {
      val p = 2147483647L
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val x = java.lang.Long.parseLong(hex.substring(0, 15), 16) % p
      val y = java.lang.Long.parseLong(hex.substring(16, 31), 16) % p
      val ai = (i * 1103515245L + 12345L) % p
      (ai * x + y) % p
    }
    val base = (1 to 200).map(i => s"tok$i").toSet
    val overlaps = Iterator.continually(Gen.choose(0, 180).sample)
      .flatten.take(25).toSeq
    overlaps.foreach { overlap =>
      val other = base.take(overlap) ++ (1 to (200 - overlap)).map(i => s"alt$i")
      val trueJ = base.intersect(other).size.toDouble / base.union(other).size
      val perms = 0L until 64L
      val est = perms.count(i => base.map(h(_, i)).min == other.map(h(_, i)).min).toDouble / 64
      assert(math.abs(est - trueJ) < 0.25, s"overlap=$overlap est=$est true=$trueJ")
    }
  }
}
