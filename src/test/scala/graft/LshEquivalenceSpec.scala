package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Real correctness gates for the xxhash-based sketch operators the
  * DuckDB oracle can't replay (xxhash64 has no DuckDB twin): each is
  * checked against an exact, brute-force, or already-oracle-verified
  * reference ON THE SAME DATA at identical thresholds.
  */
class LshEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("simhash block join ≡ brute-force all-pairs hamming (pigeonhole exact)") {
    // any pair within hamming ≤ k must agree exactly on ≥1 of the
    // k+1 blocks, so the block join is EXACT, not approximate —
    // assert set equality against the quadratic reference
    val sigs = Dedup.simhashSignatures(spark, sf)
    val a = sigs.select($"doc_id".as("doc_a"), $"simhash".as("sig_a"))
    val b = sigs.select($"doc_id".as("doc_b"), $"simhash".as("sig_b"))
    val brute = a.join(b, $"doc_a" < $"doc_b")
      .withColumn("hamming", bit_count($"sig_a".bitwiseXOR($"sig_b")))
      .filter($"hamming" <= 3)
      .select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Long)].collect().toSet
    val blocked = Dedup.simhash(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(blocked === brute)
    assert(blocked.nonEmpty)
  }

  test("minhash LSH pairs ⊆ exact jaccard pairs, identical jaccard values") {
    val exact = Dedup.ngramJaccard(spark, sf, 0.6)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Dedup.minhashLsh(spark, sf, numPerm = 64, bands = 16,
      minJaccard = 0.6)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    // verification bounds false positives to zero, and every surviving
    // pair's jaccard must be the exact value
    assert(lsh.subsetOf(exact),
      s"false positives: ${lsh -- exact}")
    // xxhash64 is deterministic → recall is a FIXED number on this
    // corpus; 16 bands of r=4 catch ≥97% at J=0.8 in expectation
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("vector kernels reject wrong-typed arrays at analysis time") {
    graft.functions.VectorExprs.register(spark)
    import org.apache.spark.sql.functions._
    val doubles = spark.range(1).select(array(lit(0.1), lit(0.2)).as("v"))
    // array<double> through the float kernels would silently misread
    // 4 bytes of each 8-byte element — must fail analysis instead
    val e = intercept[Exception] {
      doubles.select(graft.functions.VectorExprs.vec_dot($"v", $"v")).collect()
    }
    assert(e.getMessage.contains("array<float>"), e.getMessage)
    val longs = spark.range(1).select(array(lit(1), lit(2)).as("v")) // array<int>
    val e2 = intercept[Exception] {
      longs.select(graft.functions.VectorExprs.vec_l2sq_long($"v", $"v")).collect()
    }
    assert(e2.getMessage.contains("array<bigint>"), e2.getMessage)
  }

  test("embedding LSH pairs ⊆ brute-force cosine pairs, measured recall") {
    graft.functions.VectorExprs.register(spark)
    val emb = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding",
        graft.functions.VectorExprs.vec_norm($"embedding").as("nrm"))
    val a = emb.select($"vec_id".as("vec_a"), $"embedding".as("ea"), $"nrm".as("na"))
    val b = emb.select($"vec_id".as("vec_b"), $"embedding".as("eb"), $"nrm".as("nb"))
    val brute = a.join(b, $"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b",
        round((graft.functions.VectorExprs.vec_dot($"ea", $"eb") /
          ($"na" * $"nb")).cast("decimal(18,12)"), 6)
          .cast("double").as("cos_sim"))
      .filter($"cos_sim" >= 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Similarity.embeddingNearDupLsh(spark, sf, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(brute), s"false positives: ${(lsh -- brute).take(3)}")
    // analytical recall at the 0.3 boundary: P(bit)=1−acos(0.3)/π≈0.6,
    // band r=4 ⇒ 1−(1−0.6⁴)⁴ ≈ 0.42 — the far-above-threshold pairs
    // collide with much higher probability; measured 0.45 here
    val recall = lsh.size.toDouble / brute.size
    assert(recall >= 0.4, s"recall $recall (${lsh.size}/${brute.size})")
    assert(lsh.nonEmpty)
  }
}
