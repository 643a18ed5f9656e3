package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import graft.operators.MultimodalOps

/** Multimodal plumbing: binary payload integrity, decode-stub batch
  * shape, and the column-pruning guarantee that makes payload tables
  * affordable to query at 100 TB. */
class MultimodalSpec extends SparkSpec {

  test("payload bytes round-trip the text exactly") {
    val m = MultimodalOps.mediaTable(spark, sf)
    val row = m.filter(m("media_id") === 0L).head()
    val bytes = row.getAs[Array[Byte]]("payload")
    val text = Tables.load(spark, sf, "documents")
      .filter("doc_id = 0").head().getAs[String]("text")
    assert(new String(bytes, "UTF-8") === text)
    assert(row.getAs[org.apache.spark.sql.Row]("meta")
      .getAs[String]("mime").startsWith("text/plain"))
  }

  test("decode stub is deterministic and preserves cardinality") {
    val m = MultimodalOps.mediaTable(spark, sf)
    val d1 = MultimodalOps.decodeStub(m).collect().sortBy(_.media_id)
    val d2 = MultimodalOps.decodeStub(m).collect().sortBy(_.media_id)
    assert(d1.length === m.count())
    assert(d1.toSeq === d2.toSeq) // bit-stable across runs
    d1.foreach { d => assert(d.n_pixels === d.width.toLong * d.height) }
  }

  test("feature query prunes the document scan to the needed columns") {
    // sparkPlan, not executedPlan: AQE wraps shuffling plans in an
    // AdaptiveSparkPlanExec whose leaves aren't expanded pre-execution
    val scan = MultimodalOps.q70MediaFeatures(spark, sf)
      .queryExecution.sparkPlan.collectLeaves().collectFirst {
        case f: FileSourceScanExec => f
      }.get
    val read = scan.requiredSchema.fieldNames.toSet
    assert(!read.contains("n_chars") && !read.contains("lang"),
      s"payload feature scan reads extra columns: $read")
  }

  test("frame sampling emits 4 frames per item") {
    val r = MultimodalOps.q71FrameSample(spark, sf).head()
    assert(r.getString(2).split(",").length === 4)
  }

  test("q136 aHash is invariant to a uniform +1 brightness shift") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val texts = Tables.load(spark, sf, "documents")
      .filter(length(col("text")) >= 60).limit(20)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    // all-printable-ASCII fixture (max 0x7e) ⇒ +1 stays a valid char
    val shifted = texts.map { case (id, t) =>
      (id, t.map(c => (c + 1).toChar)) }
    val orig = MultimodalOps.mediaAHash(
        texts.toSeq.toDF("media_id", "text"))
      .as[(Long, Long)].collect().toMap
    val shiftedFp = MultimodalOps.mediaAHash(
        shifted.toSeq.toDF("media_id", "text"))
      .as[(Long, Long)].collect().toMap
    assert(orig.nonEmpty && orig === shiftedFp,
      "blocked-mean aHash must not move under a uniform code shift")
  }

  test("q136 native graft_ahash == the declarative blocked-mean pipeline, bit for bit") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the grouped form the native expression replaced (and the shape
    // the DuckDB oracle still replays) — any drift in the expression's
    // arithmetic breaks this before it breaks a correctness round
    val m = MultimodalOps.neardupMediaItems(spark, sf)
    val chars = m
      .select(col("media_id"), length(col("text")).as("n"),
        posexplode(split(col("text"), "")).as(Seq("i", "c")))
      .filter(col("c") =!= "")
      .select(col("media_id"), expr("(i * 60) div n").as("b"),
        ascii(col("c")).cast("long").as("v"))
    val blocks = chars.groupBy("media_id", "b")
      .agg(expr("sum(v) div count(*)").as("bv"))
    val means = blocks.groupBy("media_id")
      .agg(expr("sum(bv) div 60").as("mu"))
    val grouped = blocks.join(means, "media_id")
      .groupBy("media_id")
      .agg(sum(when(col("bv") >= col("mu"),
        expr("shiftleft(1L, CAST(b AS INT))")).otherwise(0L)).as("ahash"))
      .as[(Long, Long)].collect().toMap
    val native = MultimodalOps.mediaAHash(m)
      .as[(Long, Long)].collect().toMap
    assert(native.nonEmpty && native === grouped)
  }

  test("graft_ahash empty-input contract: empty payload → NULL → the " +
      "row DROPS, matching the grouped form's no-row-to-explode " +
      "semantics (round-15 verdict #5)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val m = Seq((1L, ""), (2L, "x"), (3L, "a".repeat(80)))
      .toDF("media_id", "text")
    // the raw expression: NULL exactly on empty, a value otherwise
    val raw = m.select(col("media_id"), expr("graft_ahash(text)").as("h"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(raw(1L).isEmpty, "empty input must hash to NULL")
    assert(raw(2L).nonEmpty && raw(3L).nonEmpty)
    // boundary row-set equality with the grouped form: mediaAHash
    // emits exactly the media_ids the explode-based pipeline would
    val nativeIds = MultimodalOps.mediaAHash(m)
      .select("media_id").as[Long].collect().toSet
    val groupedIds = m
      .select(col("media_id"), posexplode(split(col("text"), ""))
        .as(Seq("i", "c")))
      .filter(col("c") =!= "")
      .select("media_id").distinct().as[Long].collect().toSet
    assert(nativeIds === groupedIds && !nativeIds.contains(1L))
  }

  test("q136 banding is lossless for the hamming<=3 cut") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val fp = MultimodalOps.mediaAHash(
        MultimodalOps.neardupMediaItems(spark, sf))
      .as[(Long, Long)].collect().sortBy(_._1)
    val brute = (for {
      i <- fp.indices.iterator; j <- (i + 1) until fp.length
      hd = java.lang.Long.bitCount(fp(i)._2 ^ fp(j)._2)
      if hd <= 3
    } yield (fp(i)._1, fp(j)._1, hd.toLong)).toSet
    val banded = MultimodalOps.q136MediaNeardup(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded === brute,
      s"banded pairs (${banded.size}) != brute-force pairs (${brute.size})")
  }

  test("q143 banding is lossless for the max-hamming<=3 cut") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val fp = MultimodalOps.frameAHash(
        MultimodalOps.temporalMediaItems(spark, sf))
      .as[(Long, Int, Long)].collect()
    val byItem = fp.groupBy(_._1).map { case (id, rs) =>
      id -> rs.sortBy(_._2).map(_._3) }
    val ids = byItem.keys.toArray.sorted
    val brute = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      hd = byItem(ids(i)).zip(byItem(ids(j)))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.max
      if hd <= 3
    } yield (ids(i), ids(j), hd.toLong)).toSet
    val banded = MultimodalOps.q143TemporalNeardup(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded === brute,
      s"banded pairs (${banded.size}) != brute-force pairs (${brute.size})")
  }

  test("q143 sequence fold: one replaced frame disqualifies an otherwise identical pair") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val t = Tables.load(spark, sf, "documents")
      .filter(length(col("text")) >= 240)
      .select("text").as[String].head()
    val q = t.length / 4
    // frames 0,1,3 bit-identical; frame 2 replaced wholesale — the
    // MAX fold must disqualify the pair (an any-frame or min fold
    // would confirm it)
    val replaced = t.substring(0, 2 * q) + "~" * q + t.substring(3 * q)
    val fp = MultimodalOps.frameAHash(
        Seq((0L, t), (1L, replaced)).toDF("media_id", "text"))
      .as[(Long, Int, Long)].collect()
    val a = fp.filter(_._1 == 0L).sortBy(_._2).map(_._3)
    val b = fp.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val hd = a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }
    assert(hd(0) == 0 && hd(1) == 0 && hd(3) == 0,
      s"untouched aligned frames moved: ${hd.toSeq}")
    assert(hd(2) > 3, s"replaced frame should exceed the cut: ${hd.toSeq}")
  }

  test("q143 confirms the per-frame noise variants against their originals") {
    import spark.implicits._
    val pairs = MultimodalOps.q143TemporalNeardup(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(pairs.forall(_._3 <= 3))
    val noiseIds = MultimodalOps.temporalMediaItems(spark, sf)
      .filter("media_id >= 4000000").select("media_id")
      .as[Long].collect().toSet
    assert(noiseIds.nonEmpty)
    val confirmedNoise = pairs.count { case (a, b, _) =>
      noiseIds.contains(b) && b - 4000000L == a }
    // a per-frame adjacent swap wiggles at most a few block means per
    // frame — most variants stay inside the per-frame Hamming cut;
    // the residue is the honest recall tradeoff (q136's contract,
    // applied per frame)
    assert(confirmedNoise >= (noiseIds.size * 6) / 10,
      s"only $confirmedNoise of ${noiseIds.size} noise variants confirmed")
  }

  test("q143 frame hashes are invariant to a uniform +1 shift of the whole video") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val texts = Tables.load(spark, sf, "documents")
      .filter(length(col("text")) >= 240).limit(10)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val shifted = texts.map { case (id, t) =>
      (id, t.map(c => (c + 1).toChar)) }
    val orig = MultimodalOps.frameAHash(texts.toSeq.toDF("media_id", "text"))
      .as[(Long, Int, Long)].collect().toSet
    val moved = MultimodalOps.frameAHash(shifted.toSeq.toDF("media_id", "text"))
      .as[(Long, Int, Long)].collect().toSet
    assert(orig.nonEmpty && orig === moved,
      "per-frame blocked-mean aHash must not move under a uniform code shift")
  }

  test("q136 confirms the local-noise variants against their originals") {
    import spark.implicits._
    val pairs = MultimodalOps.q136MediaNeardup(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(pairs.forall(_._3 <= 3))
    val noiseIds = MultimodalOps.neardupMediaItems(spark, sf)
      .filter("media_id >= 4000000").select("media_id")
      .as[Long].collect().toSet
    val confirmedNoise = pairs.count { case (a, b, _) =>
      noiseIds.contains(b) && b - 4000000L == a }
    // local noise barely moves block means — most variants confirm;
    // the residue (mu wobble on short payloads) is the honest recall
    // tradeoff documented on the operator
    assert(confirmedNoise >= (noiseIds.size * 6) / 10,
      s"only $confirmedNoise of ${noiseIds.size} noise variants confirmed")
  }
}
