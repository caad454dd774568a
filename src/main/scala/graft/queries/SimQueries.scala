package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Similarity search over the `embeddings` table: exact cosine top-k as
  * the baseline, sign-LSH bucketed ANN as the scale path. */
object SimQueries {
  type Q = (SparkSession, String) => DataFrame

  private def queriesSubset(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") % 20 === 0)

  val defs: Map[String, Q] = Map(
    // Exact brute-force cosine top-5 for a 5% query subset.
    "q28_cosine_topk" -> { (s, d) =>
      Similarity.bruteForceTopK(
        Tables.embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding", 5)
    },

    // Sign-LSH bucketed ANN top-5 (rows-only: xxhash64 planes have no
    // DuckDB twin). Same query subset, candidates from band buckets.
    "q29_ann_lsh_topk" -> { (s, d) =>
      Similarity.signLshTopK(
        Tables.embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding", 5)
    },

    // IVF ANN top-5: inverted-file cells with deterministic Lloyd
    // centroids, nprobe=4 of 16 (rows-only; SimilaritySpec asserts
    // recall vs exact and full-probe ≡ exact).
    "q51_ann_ivf_topk" -> { (s, d) =>
      Similarity.ivfTopK(
        Tables.embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding", 5)
    },

    // Embedding-cosine near-dup pairs (dense-vector dedup): exact
    // threshold join — the oracle-checked small-scale baseline and the
    // recall oracle for q70, the LSH-bucketed 100 TB variant.
    "q56_embed_neardup" -> { (s, d) =>
      Similarity.cosinePairs(Tables.embeddings(s, d), "vec_id", "embedding", 0.4)
    },

    // LSH-bucketed embedding near-dup — the 100 TB path: candidates
    // only from sign-LSH band buckets, exact ArrayCosine verify at the
    // same >= 0.4 threshold (rows-only: seeded hyperplanes have no
    // DuckDB twin; SimilaritySpec asserts recall vs q56's oracle-checked
    // pairs).
    "q70_embed_neardup_lsh" -> { (s, d) =>
      Similarity.cosinePairsLsh(Tables.embeddings(s, d), "vec_id", "embedding", 0.4)
    },

    // IVF-bucketed embedding near-dup — the LOW-threshold 100 TB path
    // (data-adaptive cells, constant occupancy, linear candidate
    // growth; see Similarity.cosinePairsLsh regime math). Rows-only;
    // SimilaritySpec asserts recall vs q56's oracle-checked pairs.
    "q72_embed_neardup_ivf" -> { (s, d) =>
      Similarity.cosinePairsIvf(Tables.embeddings(s, d), "vec_id", "embedding", 0.4)
    }
  )

  val oracles: Map[String, String] = Map(
    "q28_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id % 20 = 0),
        |p AS (SELECT q.vec_id AS q_id, e.vec_id AS n_id,
        |        round(list_cosine_similarity(q.v, e.v), 4) AS cos
        |      FROM q JOIN e ON q.vec_id <> e.vec_id)
        |SELECT q_id, n_id, cos, rn FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        |    ORDER BY cos DESC, n_id) AS BIGINT) AS rn FROM p)
        |WHERE rn <= 5""".stripMargin,

    "q56_embed_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 4) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.4""".stripMargin
  )
}
