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
}
