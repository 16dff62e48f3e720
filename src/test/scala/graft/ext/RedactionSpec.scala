package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  test("scrub replaces every typed identifier with its placeholder, exactly") {
    val got = Seq(
      ("write to alice.b+spam@sub.example.co.uk today",
        "write to <EMAIL> today"),
      ("node 10.0.3.17 and 192.168.001.254 answered",
        "node <IP> and <IP> answered"),
      ("call 555-0199 or 555-0042.", "call <PHONE> or <PHONE>."),
      ("mixed a@b.io then 1.2.3.4 then 555-1234",
        "mixed <EMAIL> then <IP> then <PHONE>"),
      // negatives: version numbers, dates, bare 555 — untouched
      ("v1.2.3 on 2024-01-07 ext 555 and a@b (no tld)",
        "v1.2.3 on 2024-01-07 ext 555 and a@b (no tld)"),
      ("", "")
    ).toDF("raw", "expect")
      .select(col("expect"), Redaction.scrub(col("raw")).as("scrubbed"))
      .collect()
    got.foreach(r => assert(r.getString(1) === r.getString(0)))
  }

  test("scrub is idempotent and leaves zero residual") {
    val df = Seq("a@b.io 1.2.3.4 555-0000 plain").toDF("raw")
      .withColumn("s1", Redaction.scrub(col("raw")))
      .withColumn("s2", Redaction.scrub(col("s1")))
    val r = df.select(col("s1"), col("s2"),
      Redaction.residual(col("s1")).as("res")).head()
    assert(r.getString(0) === r.getString(1), "second scrub must be a no-op")
    assert(r.getInt(2) === 0)
  }

  test("ip boundaries: a 5-octet run is not silently half-claimed as PII text") {
    // \b-delimited quads: "1.2.3.4.5" matches on its first four octets —
    // over-redaction is the designed failure direction (never under-).
    val s = Seq("chain 1.2.3.4.5 end").toDF("raw")
      .select(Redaction.scrub(col("raw"))).as[String].head()
    assert(s.contains("<IP>") && !s.contains("1.2.3.4"))
  }

  test("pii ledger on the synthetic corpus: counts partition by residue, residual 0") {
    val dir = "/root/testdata/sf0.001"
    val rows = Redaction.piiRedact(spark, dir).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    rows.foreach { r =>
      val src = r.getString(0)
      val ids = docs.filter(_._2 == src).map(_._1)
      val emails = ids.count(i => math.floorMod(i, 3) == 0) +
        ids.count(i => math.floorMod(i, 12) == 0)
      assert(r.getAs[Long]("n_docs") === ids.length.toLong)
      assert(r.getAs[Long]("n_emails") === emails.toLong, s"emails for $src")
      assert(r.getAs[Long]("n_phones") === ids.count(i => math.floorMod(i, 3) == 1).toLong)
      assert(r.getAs[Long]("n_ips") === ids.count(i => math.floorMod(i, 3) == 2).toLong)
      assert(r.getAs[Long]("n_residual") === 0L, s"residual for $src")
    }
  }

  test("pii ledger on an empty corpus slice is empty, not a crash") {
    val n = Redaction.withInjectedPii(
      graft.Tables.documents(spark, "/root/testdata/sf0.001").where(lit(false)))
      .select(Redaction.scrub(col("aug"))).count()
    assert(n === 0L)
  }

  test("k-anonymity enforcement re-audits clean: every kept class has k >= 5") {
    val sf = "/root/testdata/sf0.001"
    val r = Redaction.kAnonEnforce(spark, sf).head()
    val kept = r.getAs[Long]("classes_after")
    // the enforced guarantee: survivors are k-anonymous, period
    assert(kept === 0L || r.getAs[Long]("k_min_after") >= 5L)
    // accounting: kept + suppressed classes = generalized classes, and
    // kept rows + suppressed rows = corpus rows
    val genClasses = r.getAs[Long]("n_classes_gen")
    assert(kept <= genClasses)
    val nDocs = graft.Tables.documents(spark, sf).count()
    // recompute kept-row mass independently at the chosen width
    val w = r.getAs[Long]("gen_width")
    val glb = if (w == 0) lit(0L) else expr(s"n_chars div $w")
    val classes = graft.Tables.documents(spark, sf)
      .groupBy(col("lang"), col("source"), glb.as("glb"))
      .agg(count(lit(1)).as("n"))
    assert(classes.count() === genClasses)
    val suppressed = classes.where(col("n") < 5)
      .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
    assert(suppressed === r.getAs[Long]("rows_suppressed"))
    assert(suppressed < nDocs, "enforcement must not suppress everything")
    // generalization is least-loss-first: any STRICTLY finer candidate
    // width (other than the chosen one) fails k >= 5
    if (w > 0) {
      val finer = Seq(256L, 512L, 1024L, 2048L, 4096L, 8192L).filter(_ < w)
      finer.foreach { fw =>
        val kmin = graft.Tables.documents(spark, sf)
          .groupBy(col("lang"), col("source"), expr(s"n_chars div $fw").as("glb"))
          .agg(count(lit(1)).as("n"))
          .agg(min(col("n"))).head().getLong(0)
        assert(kmin < 5L, s"width $fw would already satisfy k; chosen $w is not finest")
      }
    }
  }

  test("k-anonymized view: output re-audits k >= 5 and reconciles with the enforce report") {
    val sf = "/root/testdata/sf0.001"
    val report = Redaction.kAnonEnforce(spark, sf).head()
    val view = Redaction.kAnonView(spark, sf).persist()
    try {
      // re-audit the OUTPUT, not the report: every (lang, source, glb)
      // class present in the view carries at least k = 5 rows
      val kMin = view.groupBy(col("lang"), col("source"), col("glb"))
        .agg(count(lit(1)).as("n"))
        .agg(min(col("n"))).head().getLong(0)
      assert(kMin >= 5L, s"view leaked an under-k class (k_min = $kMin)")
      // suppression reconciles: corpus rows - view rows = the report's
      // rows_suppressed (the view drops EXACTLY the under-k residue)
      val nDocs = graft.Tables.documents(spark, sf).count()
      assert(nDocs - view.count() === report.getAs[Long]("rows_suppressed"))
      // the view generalized with the SAME width the enforce run chose:
      // every kept doc's glb recomputes from its n_chars at gen_width
      val w = report.getAs[Long]("gen_width")
      val glbOf = if (w == 0) lit(0L) else expr(s"n_chars div $w")
      val mismatched = view.join(
          graft.Tables.documents(spark, sf).select(col("doc_id"), glbOf.as("expect_glb")),
          "doc_id")
        .where(col("glb") =!= col("expect_glb")).count()
      assert(mismatched === 0L, "view glb must equal n_chars div gen_width")
      // and kept classes count matches the report's classes_after
      val viewClasses = view.select(col("lang"), col("source"), col("glb"))
        .distinct().count()
      assert(viewClasses === report.getAs[Long]("classes_after"))
    } finally view.unpersist()
  }

  test("incremental k-anon maintenance lands exactly where the from-scratch audit lands") {
    val sf = "/root/testdata/sf0.001"
    val inc = Redaction.kAnonIncr(spark, sf).head()
    val full = Redaction.kAnonEnforce(spark, sf).head()
    // merged (stored base classes + delta-shard classes) ≡ the full
    // corpus: the delta-sized update must choose the SAME width and see
    // the SAME class census a from-scratch audit over everything would
    assert(inc.getAs[Long]("width_after") === full.getAs[Long]("gen_width"))
    assert(inc.getAs[Long]("classes_merged") === full.getAs[Long]("classes_before"))
    // and the ingest genuinely moved the audit: the delta shard is ~10%
    // of the corpus, so some rows arrived and the stored table is a
    // strict subset census of the merged one
    assert(inc.getAs[Long]("n_delta_docs") > 0L)
    assert(inc.getAs[Long]("classes_base") <= inc.getAs[Long]("classes_merged"))
  }
}
