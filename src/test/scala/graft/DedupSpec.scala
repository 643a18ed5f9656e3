package graft

import graft.operators.{DedupOps, SimilarityOps, TextOps}

/** Crafted-corpus checks for the dedup family: known dup/near-dup/
  * distinct documents must land on the right side of each operator's
  * threshold, and the operators must agree with each other where their
  * semantics overlap. Runs the production queries end-to-end against a
  * temp parquet dir shaped like the driver fixtures. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** doc 0 == doc 1 (exact dup); doc 2 ~ doc 0 (one word changed);
    * doc 3 unrelated; doc 4 short. */
  private lazy val corpusDir: String = {
    val base = "the quick brown fox jumps over the lazy dog near the old river bank " +
      "while morning light filters through tall green trees onto the quiet path"
    val near = base.replace("quiet", "narrow")
    val docs = Seq(
      (0L, base, "en", "srcA", base.length.toLong),
      (1L, base, "en", "srcB", base.length.toLong),
      (2L, near, "en", "srcC", near.length.toLong),
      (3L, "completely different words about spark catalyst optimizer plans and shuffles here",
        "en", "srcD", 80L),
      (4L, "tiny doc", "en", "srcE", 8L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-spec").toString
    docs.write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup groups identical texts under one fingerprint") {
    // q30 duplicates even doc_ids internally; doc 0 == doc 1 on top of that
    val rows = DedupOps.q30ExactDedup(spark, corpusDir).collect()
    val byKeeper = rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
    // keeper 0 absorbs: doc0, doc0-dup(evens), doc1 => 3 copies
    assert(byKeeper(0L) === 3L)
    assert(!byKeeper.contains(1L)) // doc 1 deduped into keeper 0
    assert(byKeeper(3L) === 1L)    // odd, distinct: single copy
  }

  test("ngram jaccard: exact dup scores 1.0, near-dup high, distinct absent") {
    val pairs = DedupOps.q31NgramJaccard(spark, corpusDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(pairs((0L, 1L)) === 1.0)
    assert(pairs((0L, 2L)) > 0.7 && pairs((0L, 2L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("skew cap: boilerplate shingle stops generating candidates, results unchanged") {
    // 60 docs, every one opening with the same 6-token boilerplate
    // header (4 hyper-common shingles, df = 60 > the cap floor of 50)
    // and a 3-token unique tail — short enough that the common
    // shingles land INSIDE each doc's rarity-ordered prefix, so the
    // uncapped candidate join fans out all-pairs on the boilerplate
    // bucket. Docs 58/59 share their tail: the one TRUE near-dup pair,
    // reachable through rare (df=2) prefix shingles the cap keeps.
    val header = "terms of service apply to"
    val docs = (0 until 59).map { i =>
      (i.toLong, s"$header item u${i}a u${i}b u${i}c", "en", "src", 40L)
    } :+ (59L, s"$header item u58a u58b u58c", "en", "src", 40L)
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val uncapped = DedupOps.prefixCandidates(spark, dir, 0.5,
      Some(Long.MaxValue)).count()
    val capped = DedupOps.prefixCandidates(spark, dir, 0.5, None).count()
    // the boilerplate bucket alone contributes C(60,2) = 1770 pairs
    assert(uncapped >= 1770, s"fixture must be skewed (got $uncapped)")
    assert(capped < 60, s"cap must collapse the boilerplate fan-out (got $capped)")
    // ...and the FINAL result is identical: every capped-away candidate
    // fails the exact-Jaccard verify anyway (boilerplate-only overlap)
    val cappedPairs = DedupOps.q31NgramJaccard(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5)))
    assert(cappedPairs.map(_._1).toSeq === Seq((58L, 59L)))
    assert(cappedPairs.head._2 === 1.0)
  }

  test("minhash LSH finds the same high-jaccard pairs as the exact pass") {
    val exact = DedupOps.q31NgramJaccard(spark, corpusDir).collect()
      .filter(_.getDouble(5) >= 0.9).map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.q32MinHashLsh(spark, corpusDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical docs collide in every band — guaranteed recall at j=1.0;
    // the 0.97-jaccard near-dup is expected (not guaranteed) to collide
    assert(exact.filter(p => p == (0L, 1L)).subsetOf(lsh))
    assert(lsh.subsetOf(
      DedupOps.q31NgramJaccard(spark, corpusDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet))
  }

  test("simhash: identical docs have identical fingerprints (hamming 0)") {
    val rows = DedupOps.q33SimHash(spark, corpusDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number](2).longValue).toMap
    assert(rows((0L, 1L)) === 0L)
    // near-dup doc 2 within the hamming<=3 net of doc 0 or absent — but
    // never reported against the unrelated doc 3
    assert(!rows.keySet.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("dedup clusters: one row per paired doc, keeper = component min") {
    val pairs = DedupOps.q32MinHashLsh(spark, corpusDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val clusters = DedupOps.q34DedupClusters(spark, corpusDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // exactly the docs appearing in some pair are clustered
    assert(clusters.keySet === pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // paired docs always share a cluster (edge consistency)
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 === clusters(b)._1, s"pair ($a,$b) split") }
    // keeper is the cluster minimum, exactly one per cluster
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min === cid)
      assert(members.count(_._2._2) === 1)
      assert(members(cid)._2, s"cluster $cid keeper flag on wrong member")
    }
  }

  test("native simhash aggregate equals the declarative 61-column form") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val toks = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) AS bigint)").as("h"))
    val native = toks.groupBy("doc_id")
      .agg(expr("graft_simhash_agg(h)").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bitSums = (0 until 60).map(j => sum(expr(s"(h >> $j) & 1")).as(s"b$j"))
    val aggs = count(lit(1)).as("n") +: bitSums
    val declarative = toks.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(j =>
          when(col(s"b$j") * 2 > col("n"), shiftleft(lit(1L), j))
            .otherwise(lit(0L))).reduce(_ + _).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === declarative)
    assert(native.nonEmpty)
  }

  test("q31 plan: broadcast verify joins, no cartesian product anywhere") {
    val df = DedupOps.queries("q31_ngram_jaccard")(spark, sf)
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"array-verify joins should broadcast the shingle index:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no stage of the dedup pipeline may go all-pairs:\n$plan")
  }

  test("native graft_shingles == declarative window formulation, set-for-set") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    // degenerate + real texts in one fixture: empty, blank-with-tab,
    // sub-trigram, leading/trailing whitespace, repeated trigrams
    val docs = Seq[(Long, String)](
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "  Mixed CASE  tokens  here with   runs of spaces  "),
      (2L, "a b"),
      (3L, ""),
      (4L, "\t x y z \t"),
      (5L, "rep rep rep rep rep"),
    ).toDF("doc_id", "text")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val declarative = docs
      .select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "tok")))
      .withColumn("t1", lead("tok", 1).over(w))
      .withColumn("t2", lead("tok", 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(concat_ws(' ', tok, t1, t2)), 1, 15), 16, 10) AS bigint)")
          .as("shingle"))
      .groupBy("doc_id").agg(collect_set(col("shingle")).as("sarr"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val native = docs
      .select(col("doc_id"), expr("graft_shingles(text, 3)").as("sarr"))
      .filter(size(col("sarr")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(native === declarative)
  }

  test("graft_shingles fuzz: random hostile texts agree with the declarative form") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    // seeded generator over a hostile alphabet: space runs, tabs,
    // newlines, unicode letters (accents, CJK, sharp-s whose
    // lowercase/uppercase round-trips are asymmetric), digits, empty
    // and whitespace-only strings — the crawl-corpus reality the
    // 6-doc fixture can't enumerate
    val rnd = new scala.util.Random(42)
    val atoms = Vector("the", "Fox", "ÀÉÎ", "straße", "日本語", "x1",
      "a", "BB", "ß", "émU", " ", "  ", "\t", "\n", " ")
    def text(): String =
      Seq.fill(rnd.nextInt(25))(atoms(rnd.nextInt(atoms.length))).mkString("")
    val docs = (0L until 80L).map(i => (i, text())).toDF("doc_id", "text")
    for (n <- Seq(3, 5)) {
      val w = Window.partitionBy("doc_id").orderBy("pos")
      var declarative = docs
        .select(col("doc_id"),
          posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "tok")))
      val leads = (1 until n).map { k =>
        declarative = declarative.withColumn(s"t$k", lead("tok", k).over(w))
        col(s"t$k")
      }
      val expected = declarative
        .filter(col(s"t${n - 1}").isNotNull)
        .select(col("doc_id"),
          expr(s"cast(conv(substring(md5(concat_ws(' ', tok, ${
            (1 until n).map(k => s"t$k").mkString(", ")})), 1, 15), 16, 10) AS bigint)")
            .as("shingle"))
        .groupBy("doc_id").agg(collect_set(col("shingle")).as("sarr"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val native = docs
        .select(col("doc_id"), expr(s"graft_shingles(text, $n)").as("sarr"))
        .filter(size(col("sarr")) > 0)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      assert(native === expected, s"n=$n mismatch")
    }
  }

  test("sorted-overlap kernel: arrays arrive sorted, count == array_intersect") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    // the producer's invariant: graft_shingles output is ascending
    val arrs = Tables.load(spark, sf, "documents")
      .select(expr("graft_shingles(text, 3)").as("sarr"))
      .filter(size(col("sarr")) > 0)
    val unsorted = arrs
      .filter(expr("sarr != array_sort(sarr)")).count()
    assert(unsorted === 0, "shingler must emit ascending arrays")
    // and on those production arrays the two-pointer merge equals the
    // built-in intersection size, pair by pair
    val a = arrs.limit(40).withColumn("k", monotonically_increasing_id())
    val pairs = a.as("x").crossJoin(a.as("y"))
      .select(
        expr("graft_sorted_overlap(x.sarr, y.sarr)").as("fast"),
        size(array_intersect(col("x.sarr"), col("y.sarr"))).as("ref"))
    assert(pairs.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("sorted-overlap kernel: null element nulls the result (arbitrary-SQL safety)") {
    import org.apache.spark.sql.functions.expr
    graft.functions.GraftFunctions.register(spark)
    // session-registered and reachable from arbitrary SQL, where array
    // types admit null elements — getLong on a null slot must not
    // return garbage
    val r = spark.sql(
      """SELECT graft_sorted_overlap(array(1L, CAST(NULL AS BIGINT), 3L),
        |                            array(1L, 3L)) AS c,
        |       graft_sorted_overlap(array(1L, 3L), array(1L, 3L)) AS ok
        |""".stripMargin).head()
    assert(r.isNullAt(0), "null element must null the count")
    assert(r.getInt(1) === 2)
  }

  test("decontamination flags exactly the train docs sharing a 5-gram with eval") {
    val dir = java.nio.file.Files.createTempDirectory("graft-decon-spec").toString
    Seq(
      // eval doc (src5 is the held-out stratum): 7 tokens → 3 5-grams
      (0L, "alpha beta gamma delta epsilon zeta eta", "en", "src5", 39L),
      // train doc quoting eval's opening 5-gram verbatim: 9 tokens →
      // 5 5-grams, exactly 1 shared
      (1L, "alpha beta gamma delta epsilon unrelated words follow here",
        "en", "srcA", 58L),
      // train doc with no shared phrasing: absent from the output
      (2L, "nine completely different tokens about catalyst plans and shuffles",
        "en", "srcB", 66L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = DedupOps.q36Decontamination(spark, dir).collect()
    assert(rows.length === 1, "only the quoting doc is contaminated")
    assert(rows(0).getLong(0) === 1L)
    assert(rows(0).getLong(1) === 1L) // n_hits
    assert(rows(0).getLong(2) === 5L) // n_shingles
    assert(rows(0).getDouble(3) === 0.2)
  }

  test("fingerprint is whitespace-insensitive but content-sensitive") {
    val docs = Seq(
      (0L, "hello   world", "en", "s", 13L),
      (1L, " hello world ", "en", "s", 13L),
      (2L, "hello worlds", "en", "s", 12L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-fp").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val fps = TextOps.q24Fingerprint(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(0L) === fps(1L))
    assert(fps(0L) !== fps(2L))
  }
}
