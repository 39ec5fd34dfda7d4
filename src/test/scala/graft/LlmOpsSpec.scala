package graft

import graft.operators.{AnnSuite, DedupSuite, MultimodalSuite, TextSuite}

class LlmOpsSpec extends SparkSpecBase {

  test("exact dedup finds exactly the injected duplicate groups") {
    val rows = DedupSuite.queries("dedup_exact")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("keep_id") % 10 == 0, "injected dups are the %10 doc copies")
      assert(r.getAs[Long]("n_copies") == 2L)
    }
  }

  test("minhash-lsh recovers the injected exact duplicates at jaccard 1.0") {
    val pairs = DedupSuite.queries("dedup_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
    val exact = pairs.filter { case (a, b, _) => b == a + 1000000L }
    assert(exact.nonEmpty, "every injected copy shares all shingles with its source")
    exact.foreach { case (_, _, j) => assert(j == 1.0) }
    pairs.foreach { case (_, _, j) => assert(j >= 0.7 && j <= 1.0) }
  }

  test("simhash pairs respect the hamming threshold and include exact dups at distance 0") {
    val rows = DedupSuite.queries("dedup_simhash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("hamming") <= 6))
    assert(rows.exists(r => r.getAs[Long]("doc_b") == r.getAs[Long]("doc_a") + 1000000L &&
      r.getAs[Int]("hamming") == 0))
  }

  test("brute-force ANN: 5 queries × top-5, cosines in [-1,1] and descending per query") {
    val rows = AnnSuite.queries("ann_bruteforce")(spark, sf).collect()
    assert(rows.length == 25)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val cos = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cos"))
      assert(cos.forall(c => c >= -1.0 && c <= 1.0))
      assert(cos.zip(cos.tail).forall { case (x, y) => x >= y })
    }
  }

  test("IVF ANN probes limited cells and overlaps brute-force results") {
    val ivf = AnnSuite.queries("ann_ivf")(spark, sf).collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("cell")).distinct.length <= 2, "nprobe=2")
      assert(rs.length <= 3)
    }
    val bf = AnnSuite.queries("ann_bruteforce")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val hits = ivf.count(r => bf.contains((r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))))
    assert(hits > 0, "IVF should recover some exact top-5 neighbors")
  }

  test("text quality/tokens: ratios bounded, counts consistent") {
    TextSuite.queries("text_quality")(spark, sf).collect().foreach { r =>
      val sr = r.getAs[Double]("stop_ratio")
      assert(sr >= 0 && sr <= 1)
      assert(r.getAs[Int]("n_stop") <= r.getAs[Int]("n_words"))
    }
    TextSuite.queries("text_tokens")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Int]("n_bpe_tokens") >= r.getAs[Int]("n_ws_tokens"),
        "BPE-ish tokens split at least as fine as whitespace")
    }
  }

  test("langid predicts a known language with en dominant on this corpus") {
    val rows = TextSuite.queries("text_langid")(spark, sf).collect()
    val preds = rows.map(_.getAs[String]("lang_pred"))
    assert(preds.toSet.subsetOf(Set("en", "de", "es", "fr", "zh", "unknown")))
    assert(preds.count(_ == "en") > rows.length / 2)
  }

  test("fingerprints are stable across runs and content-sensitive") {
    val a = TextSuite.queries("text_fingerprint")(spark, sf).collect()
    val b = TextSuite.queries("text_fingerprint")(spark, sf).collect()
    assert(a.map(_.toSeq).sameElements(b.map(_.toSeq)))
    assert(a.map(_.getAs[String]("fp_bow")).distinct.length > a.length / 2,
      "distinct docs should mostly get distinct fingerprints")
  }

  test("multimodal extract: byte plumbing is real") {
    val rows = MultimodalSuite.queries("mm_extract")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[Int]("first_byte") >= 0 && r.getAs[Int]("first_byte") < 256)
      assert(r.getAs[Long]("fake_label") == r.getAs[Long]("n_bytes") % 7)
      assert(Set("image", "audio").contains(r.getAs[String]("media_type")))
    }
  }
}
