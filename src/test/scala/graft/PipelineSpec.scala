package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, Quality, Retention, TextOps}

/** End-to-end pipeline integration: the operators are graded one by one
  * elsewhere; this suite chains them the way a real curation run does —
  * curate (gate + near-dup retention) → materialize → constraint-check
  * the output → split → pack — and asserts the invariants that only
  * hold if the STAGES compose correctly, not just pass alone.
  */
class PipelineSpec extends SparkSpec {

  test("curate → check → split → pack composes with its invariants") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pipe").toString
    val (_, obs) = Retention.curateObserved(spark, sfTest,
      s"$dir/documents.parquet", maxRecordsPerFile = 200L)
    val nWritten = obs.get("n_written").asInstanceOf[Long]
    assert(nWritten > 0)

    // the curated output is itself a valid documents table: read it back
    // through the same Tables entry every operator uses
    val curated = Tables(spark, dir, "documents")
    assert(curated.count() == nWritten)

    // contract gate on the OUTPUT: key integrity and schema sanity must
    // survive the write
    val report = Quality.check(curated, Seq(
      Quality.NotNull("doc_id"), Quality.Unique("doc_id"),
      Quality.NotNull("text"),
      Quality.Satisfies("n_chars", col("n_chars") > 0, "positive_chars")))
    assert(Quality.passed(report), report.collect().mkString(", "))

    // retention invariant: the curated corpus has NO remaining near-dup
    // pair at the curation threshold. Survivors are per-cluster
    // canonicals; two surviving docs that still paired would have shared
    // a connected component and one of them would have been dropped.
    val residualPairs = DedupOps.ngramDedupAuto(spark, dir).count()
    assert(residualPairs == 0L,
      s"curated corpus still contains $residualPairs near-dup pairs")

    // the curated corpus flows into the split stage: deterministic,
    // exhaustive, disjoint
    val split = TextOps.splitAssign(spark, dir)
    val totals = split.groupBy().agg(sum($"n_docs")).head().getLong(0)
    assert(totals == nWritten, s"split covered $totals of $nWritten docs")

    // and into packing: per-doc offsets are a strictly increasing exact
    // prefix sum of the curated docs' token counts
    val packed = TextOps.packSequences(spark, dir)
      .select($"doc_id", $"n_tokens", $"start_off").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(packed.length == nWritten)
    packed.sliding(2).foreach {
      case Array((_, n1, o1), (_, _, o2)) => assert(o2 == o1 + n1)
      case _ => ()
    }
    // total tokens via the packing bookkeeping: last offset + last count
    val (_, lastN, lastOff) = packed.last
    val expectedTokens = curated
      .select(size(org.apache.spark.sql.functions.split($"text", " "))
        .cast("long").as("n")).agg(sum($"n")).head().getLong(0)
    assert(lastOff + lastN == expectedTokens)
  }
}
