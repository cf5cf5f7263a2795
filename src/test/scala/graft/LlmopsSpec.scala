package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.llmops._
import graft.ops.Tables

class LlmopsSpec extends SparkTestBase {

  test("PortableHash.charHash matches its SQL formula (reference value)") {
    import spark.implicits._
    // independently computed: g("ab") with m(i)=(i*i*2654435761+i*97)%P
    val p = 1000000007L
    def m(i: Long) = (i * i * 2654435761L + i * 97L) % p
    val expected = (97L * m(1) + 98L * m(2)) % p
    val got = Seq("ab").toDF("s")
      .select(PortableHash.charHash(col("s")).as("h")).head().getLong(0)
    assert(got == expected)
  }

  test("PortableHash.charHash is deterministic and spreads values") {
    import spark.implicits._
    val words = Seq("spark", "spark", "sparl", "kraps", "", "a")
    val hs = words.toDF("s").select(PortableHash.charHash(col("s"))).collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    assert(hs(0) == hs(1))          // deterministic
    assert(hs(0) != hs(2))          // single-char change moves the hash
    assert(hs(0) != hs(3))          // positional: anagram differs
  }

  test("exactDot equals an independently computed decimal dot product") {
    import spark.implicits._
    val a = Array(0.5f, -0.25f, 0.125f)
    val b = Array(1.0f, 2.0f, 4.0f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(PortableHash.exactDot(col("a"), col("b")).as("d"))
      .head().getDouble(0)
    assert(got == 0.5 - 0.5 + 0.5)
  }

  test("exact dedup output is a subset with distinct keys (property)") {
    val t = Tables(spark, sfDir)
    val out = Dedup.q40.run(spark, sfDir).collect()
    val inputIds = t.documents.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).forall(inputIds.contains)) // keep_id ⊆ input
    assert(out.map(_.getString(2)).distinct.length == out.length) // distinct md5
  }

  test("minhash LSH finds the planted near-duplicate pairs") {
    val pairs = Dedup.q41.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // full-signature matches (8/8 bands) must be true near-dups; at least
    // one planted pair exists in the fixture
    val strong = pairs.filter(_._3 >= 7)
    assert(strong.nonEmpty)
    val t = Tables(spark, sfDir)
    val texts = t.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    strong.foreach { case (a, b, _) =>
      val ta = texts(a).split(" ").toSet
      val tb = texts(b).split(" ").toSet
      val j = ta.intersect(tb).size.toDouble / ta.union(tb).size
      assert(j > 0.5, s"pair ($a,$b) bands>=7 but token jaccard $j")
    }
  }

  test("filter partition property: filter(p) + filter(!p) = all (scalacheck)") {
    val t = Tables(spark, sfDir)
    val total = t.orders.count()
    val prop = Prop.forAll(Gen.choose(0.0, 500000.0)) { threshold =>
      val p = col("o_totalprice") > threshold
      t.orders.filter(p).count() + t.orders.filter(!p).count() == total
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("Curation gate drops junk docs and dedup collapses clones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "a perfectly reasonable document with many words inside"),
      (2L, "en", "a perfectly reasonable document with many words inside"),
      (3L, "en", "short doc"),                       // < 5 words -> gated
      (4L, "en", "!!!! ???? ,,,, .... yes no ok !!"), // punct-heavy -> gated
      (5L, "en", "another fine document that easily passes the filters"))
      .toDF("doc_id", "lang", "text")
    val out = Curation.curate(docs).collect()
    val byId = out.map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(byId.keySet == Set(1L, 5L))  // 2 deduped into 1; 3,4 gated out
    assert(byId(1L) == 2)               // n_copies records the clone
    assert(byId(5L) == 1)
  }

  test("KMeans: Lloyd iterations reduce cost, deterministic, full coverage") {
    import graft.llmops.KMeans
    val emb = graft.ops.Tables(spark, sfDir).embeddings
    val k = 8
    val c0 = KMeans.fit(spark, emb, k, iters = 0)   // seed only
    val c2 = KMeans.fit(spark, emb, k, iters = 2)
    // Lloyd never increases the within-cluster cost
    val cost0 = KMeans.cost(emb, c0)
    val cost2 = KMeans.cost(emb, c2)
    assert(cost2 <= cost0 + 1e-9, s"cost $cost0 -> $cost2")
    // every vector lands in exactly one valid cell
    val assigned = KMeans.assign(emb, c2)
    assert(assigned.count() == emb.count())
    val cells = assigned.select("cell").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf((0L until k.toLong).toSet))
    // same inputs -> identical centroids (partitioning-independent)
    val c2b = KMeans.fit(spark, emb.repartition(7), k, iters = 2)
    c2.zip(c2b).foreach { case (a, b) =>
      assert(a.cell == b.cell)
      assert(a.centroid.sameElements(b.centroid))
    }
  }

  test("connected components: transitive chains collapse, singletons stay") {
    import spark.implicits._
    // chain 1-2-3 (edge 1-3 never emitted), pair 10-11, singleton 99
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (11L, 10L)).toDF("u", "v")
    val out = graft.llmops.Components.connectedComponents(nodes, edges)
      .orderBy(col("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("int8-quantized ANN recall vs the exact top-k") {
    val exact = graft.llmops.Similarity.q50.run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    val quant = graft.llmops.Similarity.q55.run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    assert(quant.keySet == exact.keySet)
    val recalls = exact.map { case (q, ex) =>
      (quant(q) & ex).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@8 = $mean%.3f")
    // The fixture vectors are RANDOM unit vectors — all pairwise dots
    // cluster near 0, so exact top-8 ranks are decided by gaps
    // comparable to the int8 quantization step (worst case for any
    // quantized index; measured 0.725 here). Real embedding corpora
    // have clustered structure and far larger top-k gaps. Assert the
    // measured floor holds; the determinism claim is the q55 oracle.
    assert(mean >= 0.6, f"int8 recall degraded: $mean%.3f")
  }

  test("Multimodal decode plumbing: partition-local batch produces typed features") {
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    val assets = Multimodal.assets(spark, sfDir)
    assert(shape(assets.schema) == shape(Multimodal.assetSchema))
    val feats = Multimodal.decodeFeatures(assets)
    assert(shape(feats.schema) == shape(Multimodal.featureSchema))
    val rows = feats.orderBy(col("asset_id")).limit(5).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getInt(1) >= 16 && r.getInt(1) < 80)   // width in stub range
      assert(r.getSeq[Float](4).length == 4)          // fixed feature shape
    }
    // deterministic stub: same payload -> same features
    val again = Multimodal.decodeFeatures(assets)
      .orderBy(col("asset_id")).limit(5).collect()
    assert(rows.map(_.toString) sameElements again.map(_.toString))
  }
}
