package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe
import graft.operators.Dedup

/** End-to-end journey for the TRAINING-DATA layer — the LLM-pipeline
  * sibling of ReferenceJourneySpec: the oracle-gated stages composed
  * over each other's OUTPUTS (dedup keepers → token-unit chunk plan →
  * sequence packing), with the cross-stage unit-consistency invariants
  * a per-query gate cannot see. Every stage reuses the exact
  * expressions its standalone query gates (q24's canonical keeper
  * grain, q138's chunk geometry, q139's cut arithmetic), so a drift
  * between the composed pipeline and the gated parts fails here. */
class PipelineJourneySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val Cap = 512L

  test("dedup -> token chunks -> packed sequences composes with " +
       "consistent token accounting end-to-end") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" >= 0).select($"doc_id", $"text")
      .localCheckpoint()

    // stage 1: exact-dedup canonical keepers (q24's grain)
    val keepers = Dedup.exactGroups(docs, "doc_id", "text", prefixLen = 80)
      .select($"keep_id".as("doc_id"))
    val survivors = docs.join(keepers, "doc_id").localCheckpoint()
    val nDocs = docs.count()
    val nKept = survivors.count()
    assert(nKept > 0 && nKept <= nDocs)

    // stage 2: q138's token-unit chunk plan over the SURVIVORS
    val budget = survivors
      .select($"doc_id", Bpe.tokenCount($"text").as("n_tokens"))
      .filter($"n_tokens" > 0).localCheckpoint()
    val chunks = budget
      .select($"doc_id", $"n_tokens",
        posexplode(sequence(lit(0L),
          greatest($"n_tokens" - 11, lit(0L)), lit(40L))))
      .select($"doc_id", $"pos".cast("long").as("chunk_idx"),
        $"col".as("start_tok"),
        least(lit(50L), $"n_tokens" - $"col").as("n_tok"))
    // chunk coverage reaches each survivor's exact token count
    val coverage = chunks.groupBy($"doc_id")
      .agg(max($"start_tok" + $"n_tok").as("covered"))
      .join(budget, "doc_id")
      .filter($"covered" =!= $"n_tokens").count()
    assert(coverage == 0, "chunk plan must cover every survivor exactly")

    // stage 3: q139's packing over the same survivor token budget
    val ranked = graft.operators.Relational.globalCumsum(
      budget.withColumn("h", graft.queries.lcgHash($"doc_id")),
      Seq($"h", $"doc_id"), $"n_tokens", "cum")
    val spans = ranked
      .select($"doc_id", $"n_tokens", ($"cum" - $"n_tokens").as("st"), $"cum")
      .select($"doc_id", $"n_tokens", $"st",
        explode(sequence(call_function("div", $"st", lit(Cap)),
          call_function("div", $"cum" - 1, lit(Cap)))).as("seq_id"))
      .select($"doc_id", $"seq_id",
        (least($"st" + $"n_tokens", ($"seq_id" + 1) * Cap) -
          greatest($"st", $"seq_id" * Cap)).as("span_len"))
      .as[(Long, Long, Long)].collect()

    // unit consistency across all three stages: the packed stream's
    // total tokens == the chunk-budget total == Σ survivor tokenCount
    val budgetTotal = budget.agg(sum($"n_tokens")).head.getLong(0)
    assert(spans.map(_._3).sum == budgetTotal,
      "packed token total must equal the survivor budget total")
    // every packed doc is a survivor, and every budgeted survivor packs
    val budgetDocs = budget.select($"doc_id").as[Long].collect().toSet
    assert(spans.map(_._1).toSet == budgetDocs)
    // sequences fill to capacity except the last
    val bySeq = spans.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, tot) =>
      if (seq != lastSeq) assert(tot == Cap, s"sequence $seq holds $tot")
    }
    // dropped duplicates contribute nothing downstream
    val dropped = docs.select($"doc_id").as[Long].collect().toSet --
      survivors.select($"doc_id").as[Long].collect().toSet
    assert(spans.map(_._1).toSet.intersect(dropped).isEmpty)
  }
}
