package graft.ops

import graft.pipeline.SparkSuite
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSuite {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("minhash near-dup clusters agree with exact ngram pairs on strong duplicates") {
    import spark.implicits._
    // Construct controlled near-duplicates: base corpus + a few mutated copies.
    val base = docs.limit(20).select(col("doc_id"), col("text"))
    val dups = base.select(col("doc_id") + 10000, concat(col("text"), lit(" tail")).as("text"))
      .toDF("doc_id", "text")
    val corpus = base.unionAll(dups)
    val exact = Dedup.ngramJaccardPairs(corpus, 0.8).as[(Long, Long)].collect().toSet
    val clusters = Dedup.minhashClusters(corpus).as[(String, String)].collect()
      .groupBy(_._2).values.map(_.map(_._1.toLong).toSet).toSet
    // every exact high-jaccard pair must co-cluster
    exact.foreach { case (a, b) =>
      assert(clusters.exists(c => c.contains(a) && c.contains(b)), s"pair ($a,$b) not co-clustered")
    }
    assert(exact.nonEmpty, "controlled duplicates should produce exact pairs")
  }

  test("simhash: identical docs collide, mutated docs stay within small hamming") {
    import spark.implicits._
    val base = docs.limit(10).select(col("doc_id"), col("text"))
    val dups = base.select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val corpus = base.unionAll(dups)
    val pairs = Dedup.simhashPairs(corpus, maxHamming = 0).as[(Long, Long, Int)].collect()
    val expected = base.select("doc_id").as[Long].collect().toSet
    expected.foreach { id =>
      assert(pairs.exists(p => p._1 == id && p._2 == id + 10000), s"exact dup of $id not found")
    }
  }

  test("LSH top-k recall vs brute force") {
    import spark.implicits._
    val brute = Similarity.bruteTopK(embeddings, 16, 5).as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toSet
    val lsh = Similarity.lshTopK(embeddings, 16, 5).as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toSet
    // LSH is approximate: require it found a reasonable share of true
    // neighbors (random-hyperplane w/ 8 planes on near-orthogonal vectors is
    // a coarse filter; the point is the bucketed-join shape).
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall > 0.1, f"LSH recall $recall%.2f unreasonably low")
    assert(lsh.nonEmpty)
  }

  test("IVF top-k: recall vs brute force; full recall when probing all cells") {
    import spark.implicits._
    val brute = Similarity.bruteTopK(embeddings, 16, 5).as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toSet
    val ivf = Similarity.ivfTopK(embeddings, 16, 5).as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall > 0.1, f"IVF recall $recall%.2f unreasonably low")
    // probing every cell makes IVF exhaustive → identical to brute force
    val full = Similarity.ivfTopK(embeddings, 16, 5, nCells = 8, nProbe = 8)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    assert(full == brute, s"missing: ${brute -- full}, extra: ${full -- brute}")
  }

  test("rolling fingerprint equals the pure-Scala fnv1a over normalized text") {
    import spark.implicits._
    val got = TextAnalysis.rollingFingerprints(docs.limit(20)).as[(Long, Long)].collect().toMap
    val texts = docs.limit(20).select("doc_id", "text").as[(Long, String)].collect().toMap
    got.foreach { case (id, fp) =>
      val norm = texts(id).toLowerCase.replaceAll("\\s+", " ")
      assert(fp == graft.pipeline.Linking.fnv1a(norm), s"doc $id")
    }
    assert(got.size == 20)
  }

  test("multimodal feature extraction: schema, determinism, stub geometry") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(docs)).collect()
    assert(feats.length == docs.count())
    val f0 = feats.find(_.doc_id == 0).get
    assert(f0.kind == "image")
    assert(f0.thumb_w == 64 && f0.thumb_h > 0 && f0.thumb_h <= 64)
    // determinism
    val again = Multimodal.extractFeatures(Multimodal.syntheticMedia(docs)).collect()
    assert(feats.map(f => (f.doc_id, f.checksum)).toSet == again.map(f => (f.doc_id, f.checksum)).toSet)
  }

  test("deterministic per-stratum sampling: stable, k per stratum, hash-ordered") {
    import spark.implicits._
    val s1 = Sampling.deterministicTopKPerStratum(docs, "lang", 3)
      .as[(Long, String, Int)].collect().toSet
    val s2 = Sampling.deterministicTopKPerStratum(docs, "lang", 3)
      .as[(Long, String, Int)].collect().toSet
    assert(s1 == s2, "sample must be reproducible")
    val perLang = s1.groupBy(_._2)
    assert(perLang.values.forall(_.size <= 3) && perLang.values.exists(_.size == 3))
    // seeded Bernoulli path: deterministic under a fixed seed
    val langs = docs.select("lang").distinct().as[String].collect()
    val fr = langs.map(_ -> 0.2).toMap
    val b1 = Sampling.stratifiedFractions(docs, "lang", fr, seed = 42).count()
    val b2 = Sampling.stratifiedFractions(docs, "lang", fr, seed = 42).count()
    assert(b1 == b2 && b1 > 0 && b1 < docs.count())
  }

  test("frame sampling fans out video payloads deterministically") {
    val frames = Multimodal.sampleFrames(Multimodal.syntheticMedia(docs.limit(30))).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(f => f.doc_id % 3 == 2), "only video rows sampled") // kind 'video' = doc_id%3==2
    assert(frames.forall(f => f.frame_idx % 4 == 0 && f.offset == f.frame_idx * 256))
    val again = Multimodal.sampleFrames(Multimodal.syntheticMedia(docs.limit(30))).collect()
    assert(frames.map(f => (f.doc_id, f.frame_idx, f.frame_checksum)).toSet ==
      again.map(f => (f.doc_id, f.frame_idx, f.frame_checksum)).toSet)
  }
}
