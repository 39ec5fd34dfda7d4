package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnSuite, LlmExtra}

class LlmExtraSpec extends SparkSpecBase {

  test("every LlmExtra query returns rows") {
    LlmExtra.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("text_repetition fractions are valid and the gate matches them") {
    LlmExtra.queries("text_repetition")(spark, sf).collect().foreach { r =>
      val dw = r.getDouble(r.fieldIndex("dup_word_frac"))
      val tw = r.getDouble(r.fieldIndex("top_word_frac"))
      val db = r.getDouble(r.fieldIndex("dup_bigram_frac"))
      assert(dw >= 0.0 && dw < 1.0, s"dup_word_frac=$dw")
      assert(tw > 0.0 && tw <= 1.0, s"top_word_frac=$tw")
      assert(db >= 0.0 && db < 1.0, s"dup_bigram_frac=$db")
      assert(r.getBoolean(r.fieldIndex("repetitive")) ==
        (dw > 0.55 || tw > 0.12 || db > 0.1))
    }
  }

  test("text_repetition is a zero-shuffle projection") {
    val plan = LlmExtra.queries("text_repetition")(spark, sf)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the final presentation orderBy
    assert(plan.indexOf("Exchange") == plan.lastIndexOf("Exchange"),
      s"expected at most one exchange (the output sort):\n$plan")
  }

  test("text_token_shards conserves tokens and numbers shards contiguously") {
    val shards = LlmExtra.queries("text_token_shards")(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("tot")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    shards.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(rs.head.fieldIndex("shard_tokens"))).sum == docs(lang),
        s"$lang shard tokens must sum to the corpus total")
      val ids = rs.map(_.getLong(rs.head.fieldIndex("shard_id"))).sorted
      assert(ids.head == 0L && ids.sameElements(0L until ids.length),
        s"$lang shard ids must be contiguous from 0: ${ids.toSeq}")
    }
  }

  test("emb_quantize stays in int8 range with bounded reconstruction error") {
    LlmExtra.queries("emb_quantize")(spark, sf).collect().foreach { r =>
      val qMin = r.getLong(r.fieldIndex("q_min"))
      val qMax = r.getLong(r.fieldIndex("q_max"))
      val scale = r.getDouble(r.fieldIndex("scale6"))
      val err = r.getDouble(r.fieldIndex("max_err6"))
      assert(qMin >= -127L && qMax <= 127L, s"q range [$qMin,$qMax]")
      // round-half-up error is at most half a quantization step
      assert(err <= scale / 127.0 / 2.0 + 1e-6, s"err=$err scale=$scale")
    }
  }

  test("emb_health reports a consistent single-width healthy table") {
    val r = LlmExtra.queries("emb_health")(spark, sf).collect().head
    assert(r.getLong(r.fieldIndex("n_vectors")) ==
      graft.sources.Tables.embeddings(spark, sf).count())
    assert(r.getLong(r.fieldIndex("n_distinct_dims")) == 1L, "one embedding width")
    assert(r.getLong(r.fieldIndex("min_dim")) == r.getLong(r.fieldIndex("max_dim")))
    assert(r.getLong(r.fieldIndex("n_zero_vectors")) == 0L)
    val minN = r.getDouble(r.fieldIndex("min_norm2"))
    val maxN = r.getDouble(r.fieldIndex("max_norm2"))
    val mean = r.getDouble(r.fieldIndex("mean_norm2"))
    assert(minN > 0.0 && minN <= mean && mean <= maxN, s"$minN <= $mean <= $maxN")
  }

  test("text_rare_words flags exactly the docs holding below-threshold words") {
    val rows = LlmExtra.queries("text_rare_words")(spark, sf).collect()
    assert(rows.length > 0)
    val flagged = rows.filter(_.getBoolean(rows.head.fieldIndex("has_rare_words")))
      .map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "the corpus-relative gate must fire on this corpus")
    // recompute the expected set: words under a tenth of the mean count
    import org.apache.spark.sql.functions._
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
    val freq = toks.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val thr = freq.values.sum / (freq.size * 10)
    val expected = toks.collect()
      .filter(r => freq(r.getString(1)) < thr).map(_.getLong(0)).toSet
    assert(flagged == expected, s"flagged=$flagged expected=$expected")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_rare")) <= r.getLong(r.fieldIndex("n_tokens")))
      assert(r.getLong(r.fieldIndex("min_word_freq")) >= 1L)
    }
  }

  test("text_pii_scan finds exactly the planted PII and redacts every hit") {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val ssn = "\\d{3}-\\d{2}-\\d{4}".r
    val phone = "\\(\\d{3}\\) \\d{3}-\\d{4}".r
    val rows = LlmExtra.queries("text_pii_scan")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(r.fieldIndex("n_emails")) == (if (id % 5 == 0) 1L else 0L))
      assert(r.getLong(r.fieldIndex("n_ssns")) == (if (id % 7 == 0) 1L else 0L))
      assert(r.getLong(r.fieldIndex("n_phones")) == (if (id % 11 == 0) 1L else 0L))
      val red = r.getString(r.fieldIndex("redacted"))
      assert(email.findFirstIn(red).isEmpty, s"doc $id leaks an email: $red")
      assert(ssn.findFirstIn(red).isEmpty, s"doc $id leaks an ssn")
      assert(phone.findFirstIn(red).isEmpty, s"doc $id leaks a phone")
      assert((id % 5 == 0) == red.contains("<EMAIL>"))
      assert((id % 7 == 0) == red.contains("<SSN>"))
      assert((id % 11 == 0) == red.contains("<PHONE>"))
    }
  }

  test("layout_zorder buckets partition rows into 256-aligned rectangles") {
    val rows = LlmExtra.queries("layout_zorder")(spark, sf).collect()
    val total = graft.sources.Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "buckets must partition the table")
    // dropping the low 16 interleaved bits pins the top 8 bits of BOTH
    // dims: every bucket's min/max rectangle fits a 256-aligned tile —
    // exactly the bounded footer stats that make dual-dimension pruning
    // work
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("max_part")) - r.getLong(r.fieldIndex("min_part")) < 256L)
      assert(r.getLong(r.fieldIndex("max_supp")) - r.getLong(r.fieldIndex("min_supp")) < 256L)
    }
  }

  test("mix_weights blends natural and uniform shares with exact ppm arithmetic") {
    val rows = LlmExtra.queries("mix_weights")(spark, sf).collect()
    assert(rows.nonEmpty)
    val natSum = rows.map(_.getAs[Long]("natural_ppm")).sum
    // floor division loses < 1 ppm per domain
    assert(natSum <= 1000000L && natSum > 1000000L - rows.length)
    rows.foreach { r =>
      val (nat, uni, tgt, boost) = (r.getAs[Long]("natural_ppm"), r.getAs[Long]("uniform_ppm"),
        r.getAs[Long]("target_ppm"), r.getAs[Long]("boost_ppm"))
      assert(tgt == (nat + uni) / 2)
      // blending toward uniform up-samples the under-represented domains
      if (nat < uni) assert(boost >= 1000000L, s"under-represented domain must boost: $r")
      if (nat > uni + 1) assert(boost < 1000000L, s"over-represented domain must damp: $r")
    }
  }

  test("train_split_leakproof keeps every duplicate group inside one split") {
    val assigns = LlmExtra.splitAssignments(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val copies = assigns.keys.filter(_ >= 1000000L)
    assert(copies.nonEmpty)
    copies.foreach { id =>
      assert(assigns(id) == assigns(id - 1000000L),
        s"copy $id split ${assigns(id)} != source split ${assigns(id - 1000000L)}")
    }
    val agg = LlmExtra.queries("train_split_leakproof")(spark, sf).collect()
    assert(agg.map(_.getAs[Long]("n_docs")).sum == assigns.size.toLong)
    val bySplit = agg.groupBy(_.getAs[String]("split")).view
      .mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit.keySet == Set("train", "valid", "test"))
    // 90/5/5 hash split: train must dominate
    assert(bySplit("train") > bySplit("valid") && bySplit("train") > bySplit("test"))
  }

  test("text_vocab_coverage curve is monotone and consistent") {
    val rows = LlmExtra.queries("text_vocab_coverage")(spark, sf).collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(10L, 100L, 1000L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_top") == math.min(r.getAs[Long]("k"), r.getAs[Long]("n_vocab")))
      assert(r.getAs[Long]("coverage_ppm") <= 1000000L)
      assert(r.getAs[Long]("covered_tokens") <= r.getAs[Long]("total_tokens"))
    }
    val cov = rows.map(_.getAs[Long]("coverage_ppm"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b },
      "coverage must be non-decreasing in k")
  }

  test("recon_referential counts the injected embedding drift exactly") {
    val r = LlmExtra.queries("recon_referential")(spark, sf).collect().head
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    val e = graft.sources.Tables.embeddings(spark, sf)
    val lost = e.filter(col("vec_id") % 97 === 0).count()
    val phantom = e.filter(col("vec_id") % 101 === 0).count()
    assert(r.getAs[Long]("n_docs") == nDocs)
    assert(r.getAs[Long]("n_missing_vec") == lost)
    assert(r.getAs[Long]("n_orphan_vec") == phantom)
    assert(r.getAs[Long]("n_matched") == nDocs - lost)
    assert(r.getAs[Long]("n_matched") + r.getAs[Long]("n_missing_vec") == nDocs)
  }

  test("ann_lsh returns ranked exact-cosine rows that agree with brute force") {
    val lsh = LlmExtra.queries("ann_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(r.fieldIndex("cos")), r.getInt(r.fieldIndex("rk")))).toMap
    assert(lsh.nonEmpty)
    // per query: ranks contiguous from 1, cos non-increasing
    lsh.groupBy(_._1._1).foreach { case (q, m) =>
      val byRank = m.values.toSeq.sortBy(_._2)
      assert(byRank.map(_._2) == (1 to byRank.length), s"query $q ranks")
      assert(byRank.map(_._1).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"query $q cos must be non-increasing")
    }
    // the verified cosine for an (query, cand) pair equals brute force's
    val bf = AnnSuite.queries("ann_bruteforce")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(r.fieldIndex("cos"))).toMap
    val overlap = lsh.keys.filter(bf.contains)
    overlap.foreach(k => assert(lsh(k)._1 == bf(k), s"cos mismatch at $k"))
    // LSH is a candidate subset: its best hit can never beat brute force
    lsh.groupBy(_._1._1).foreach { case (q, m) =>
      val lshBest = m.values.maxBy(_._1)._1
      val bfBest = bf.collect { case ((bq, _), c) if bq == q => c }.max
      assert(lshBest <= bfBest, s"query $q: lsh $lshBest beat brute force $bfBest")
    }
  }

  test("emb_covariance_top: 20 strongest i<j pairs, ranked, value matches driver compute") {
    val rows = LlmExtra.queries("emb_covariance_top")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getAs[Long]("i") < r.getAs[Long]("j")))
    val mags = rows.map(r => math.abs(r.getAs[Long]("cov_e6")))
    assert(mags.sameElements(mags.sorted.reverse), "ranked by |cov| descending")
    // exact recompute of the top pair on the driver (same fixed-point rule)
    val top = rows.head
    val (ti, tj) = (top.getAs[Long]("i").toInt, top.getAs[Long]("j").toInt)
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 10000 + 0.5).toLong))
    val n = vecs.length.toLong
    val sxy = vecs.map(v => v(ti - 1) * v(tj - 1)).sum
    val sxi = vecs.map(_(ti - 1)).sum
    val sxj = vecs.map(_(tj - 1)).sum
    val expected = math.floor((n * sxy - sxi * sxj).toDouble / (n.toDouble * n * 1e8) * 1e6 + 0.5).toLong
    assert(top.getAs[Long]("cov_e6") == expected,
      s"top covariance ($ti,$tj): got ${top.getAs[Long]("cov_e6")}, expected $expected")
  }

  test("emb_centroid_drift: one row per label, cosine bounded, counts partition the table") {
    val rows = LlmExtra.queries("emb_centroid_drift")(spark, sf).collect()
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select("label").distinct().count()
    assert(rows.length == labels, "one drift row per label")
    val total = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum == total,
      "side counts must partition the table")
    rows.foreach { r =>
      val c = r.getAs[Double]("drift_cos")
      assert(c >= -1.000001 && c <= 1.000001, s"cosine out of range: $c")
    }
    // same-cohort sanity: drift of a side against itself is exactly 1
    // (the fixed-point pipeline must not lose identity)
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 2 === 0).limit(50)
    val m = e.select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(graft.functions.Portable.davg(col("col").cast("double")).as("m"))
    val self = m.groupBy("label")
      .agg(sum(floor(col("m") * col("m") * lit(1e8) + lit(0.5)).cast("long")).as("na_fp"))
      .collect()
    self.foreach(r => assert(r.getAs[Long]("na_fp") > 0))
  }

  test("emb_pca_power: exact match against a driver-side power iteration") {
    val rows = graft.operators.LlmExtra.queries("emb_pca_power")(spark, sf).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Long]("v_ppm")).toMap
    assert(rows.size == 64)

    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 10000 + 0.5).toLong).toArray)
    val n = vecs.length.toLong
    val sx = Array.tabulate(64)(k => vecs.map(_(k)).sum)
    // same closed form (including the double division) as the operator
    val cov = Array.tabulate(64, 64) { (i, j) =>
      val sxy = vecs.map(v => v(i) * v(j)).sum
      math.floor((n * sxy - sx(i) * sx(j)).toDouble /
        (n.toDouble * n.toDouble * 1e8) * 1e6 + 0.5).toLong
    }
    var v = Array.fill(64)(1000000L)
    for (_ <- 1 to 3) {
      val u = Array.tabulate(64)(i => (0 until 64).map(j => cov(i)(j) * v(j)).sum)
      val step = math.max(u.map(math.abs).max / 1000000L, 1L)
      v = u.map(_ / step)
    }
    (0 until 64).foreach { k =>
      assert(rows(k + 1L) == v(k), s"dim ${k + 1}: got ${rows(k + 1L)}, expected ${v(k)}")
    }
    // the fixed-point direction is non-degenerate
    assert(v.map(math.abs).max == 1000000L || v.map(math.abs).max >= 500000L)
  }
}
