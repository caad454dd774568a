package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

/** ANN quality checks: both approximate paths (sign-LSH, IVF) must
  * recover a healthy fraction of the exact top-k on the real embedding
  * fixture. */
class SimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private lazy val emb = Tables.embeddings(spark, dir)
  private lazy val queries = emb.filter(col("vec_id") % 20 === 0)

  private def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("q_id"), col("n_id")).as[(Long, Long)].collect().toSet

  private lazy val exact = topSet(
    Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))

  test("IVF recalls most exact neighbors with nprobe=4/16 cells") {
    val ivf = topSet(
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5))
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("IVF probing all cells equals exact search") {
    val full = topSet(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      5, cells = 8, nprobe = 8))
    assert(full == exact)
  }

  test("indexed IVF query over the persisted index equals the build+query pipeline") {
    val idx = java.nio.file.Files.createTempDirectory("ivfidx").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx,
      cells = 16, lloydIters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("q_id"), col("n_id"), col("cos"), col("rn"))
        .as[(Long, Long, Double, Long)].collect().toSet
    val indexed = rows(Similarity.ivfTopKIndexed(idx, emb, queries,
      "vec_id", "embedding", 5))
    val inflight = rows(Similarity.ivfTopK(emb, queries,
      "vec_id", "embedding", 5))
    assert(indexed.nonEmpty)
    // bit-deterministic build + exact parquet round-trip → identical
    // results, not merely similar ones
    assert(indexed == inflight)
  }

  test("recall@k and NDCG@k grade the IVF run correctly (q196/q197)") {
    val recall = graft.queries.SimQueries.defs("q196_ann_recall_at_k")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(recall.nonEmpty)
    // n_hit ∈ [0, n_exact]; the aggregate recall matches the raw sets
    recall.foreach { case (q, nExact, nHit) =>
      assert(nHit >= 0 && nHit <= nExact, s"q=$q hit=$nHit of $nExact")
    }
    val ivf = topSet(
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5))
    assert(recall.map(_._3).sum == (ivf & exact).size)
    val ndcg = graft.queries.SimQueries.defs("q197_ann_ndcg_at_k")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(ndcg.length == recall.length)
    // dcg ≤ idcg always; idcg for a full 5-list is Σ (6−i)·(60/i) = 522
    ndcg.foreach { case (q, dcg, idcg) =>
      assert(dcg >= 0 && dcg <= idcg, s"q=$q dcg=$dcg idcg=$idcg")
      assert(idcg == 522L, s"q=$q idcg=$idcg")
    }
    // a query whose ANN list equals its exact list scores a perfect
    // NDCG: with nprobe = cells the IVF run IS exact (pinned above),
    // so every query must hit dcg == idcg
    val perfect = {
      val ex = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 5)
      val full = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        5, cells = 8, nprobe = 8)
      val w = call_function("div", lit(60L), col("rn"))
      val rel = ex.select(col("q_id"), col("n_id"),
        (lit(6L) - col("rn")).as("rel"))
      full.select(col("q_id"), col("n_id"), w.as("w"))
        .join(rel, Seq("q_id", "n_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("rel"), lit(0L)) * col("w")).as("dcg"))
        .as[(Long, Long)].collect()
    }
    assert(perfect.nonEmpty && perfect.forall(_._2 == 522L))

    // MRR@k (q211): one row per query; rr = 60/first_hit_rank on the
    // same integer scale, 0 on a total miss; consistency with recall —
    // a query with any hit has rank in [1,5], a zero-hit query rank 0
    val mrr = graft.queries.SimQueries.defs("q211_ann_mrr_at_k")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(mrr.length == recall.length)
    val hitsByQ = recall.map(r => r._1 -> r._3).toMap
    mrr.foreach { case (q, fr, rr) =>
      if (hitsByQ(q) == 0L) assert(fr == 0L && rr == 0L, s"q=$q")
      else {
        assert(fr >= 1L && fr <= 5L, s"q=$q fr=$fr")
        assert(rr == 60L / fr, s"q=$q rr=$rr fr=$fr")
      }
    }

    // hard negatives (q215): exactly the ANN rows outside the exact
    // top-5 — per query, |ann| − n_hit of them, none overlapping exact
    val hard = graft.queries.SimQueries.defs("q215_hard_negatives")(spark, dir)
      .as[(Long, Long, Long)].collect()
    val annRows = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5)
      .select(col("q_id"), col("n_id")).as[(Long, Long)].collect()
    val annByQ = annRows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val hardByQ = hard.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      .withDefaultValue(0L)
    annByQ.foreach { case (q, n) =>
      assert(hardByQ(q) == n - hitsByQ(q), s"q=$q")
    }
    val exactSet = exact
    assert(hard.forall(h => !exactSet.contains((h._1, h._2))))
    assert(hard.forall(h => h._3 >= 1L && h._3 <= 5L))
  }

  test("incremental IVF append equals the one-shot assignment of the " +
       "unioned corpus (q252 substrate)") {
    val idxDir = java.nio.file.Files.createTempDirectory("ivfapp").toString
    val base = emb.filter(col("vec_id") % 5 =!= 4)
    val batch = emb.filter(col("vec_id") % 5 === 4)
    Similarity.buildIvfIndex(base, "vec_id", "embedding", idxDir,
      cells = 16, lloydIters = 2)
    Similarity.appendToIvfIndex(spark, idxDir, batch, "vec_id", "embedding")
    val appended = spark.read.parquet(s"$idxDir/assignments.parquet")
      .as[(Long, Long)].collect().toSet
    // one-shot: assign the FULL corpus against the same written
    // centroids — append must be row-identical (frozen quantizer)
    val cents = spark.read.parquet(s"$idxDir/centroids.parquet")
    val oneShot = Similarity.assignCells(
        emb.select(col("vec_id").as("n_id"),
          graft.functions.VectorFns.toDoubleArr(col("embedding")).as("cv")),
        cents, 1)
      .as[(Long, Long)].collect().toSet
    assert(appended == oneShot)
    assert(appended.map(_._1) == emb.select(col("vec_id")).as[Long]
      .collect().toSet)
    graft.Checkpoints.releaseAll(spark)
  }

  test("incremental IVF append equals one-shot assignment at cells>64 " +
       "(the hierarchical-router regime)") {
    val idxDir = java.nio.file.Files.createTempDirectory("ivfapph").toString
    val base = emb.filter(col("vec_id") % 5 =!= 4)
    val batch = emb.filter(col("vec_id") % 5 === 4)
    Similarity.buildIvfIndex(base, "vec_id", "embedding", idxDir,
      cells = 80, lloydIters = 2)
    // the sidecar records the build's mode (requested cells > threshold)
    assert(Similarity.readIvfMetaHierarchical(spark, idxDir).contains(true))
    Similarity.appendToIvfIndex(spark, idxDir, batch, "vec_id", "embedding")
    val appended = spark.read.parquet(s"$idxDir/assignments.parquet")
      .as[(Long, Long)].collect().toSet
    val cents = spark.read.parquet(s"$idxDir/centroids.parquet")
    val oneShot = Similarity.assignCellsHierarchical(
        emb.select(col("vec_id").as("n_id"),
          graft.functions.VectorFns.toDoubleArr(col("embedding")).as("cv")),
        cents, 1)
      .as[(Long, Long)].collect().toSet
    assert(appended == oneShot)
    assert(appended.map(_._1) == emb.select(col("vec_id")).as[Long]
      .collect().toSet)
    graft.Checkpoints.releaseAll(spark)
  }

  test("append keeps the build's hierarchical mode when Lloyd writes " +
       "fewer centroids than the requested cells") {
    // 40-vector corpus, cells=80: the seed limit(cells) writes ≤ 40
    // centroids, so a count(>64)-based branch would route the append
    // FLAT while the build routed HIERARCHICALLY — the divergence the
    // persisted sidecar exists to close.
    val idxDir = java.nio.file.Files.createTempDirectory("ivfappf").toString
    val base = emb.filter(col("vec_id") < 40)
    val batch = emb.filter(col("vec_id") >= 40 && col("vec_id") < 60)
    Similarity.buildIvfIndex(base, "vec_id", "embedding", idxDir,
      cells = 80, lloydIters = 2)
    val cents = spark.read.parquet(s"$idxDir/centroids.parquet")
    assert(cents.count() <= Similarity.HierCellThreshold,
      "fixture must land in the written<=threshold<requested corner")
    assert(Similarity.readIvfMetaHierarchical(spark, idxDir).contains(true))
    Similarity.appendToIvfIndex(spark, idxDir, batch, "vec_id", "embedding")
    val appended = spark.read.parquet(s"$idxDir/assignments.parquet")
      .as[(Long, Long)].collect().toSet
    def assignAll(df: org.apache.spark.sql.DataFrame,
                  hier: Boolean): Set[(Long, Long)] = {
      val c = df.select(col("vec_id").as("n_id"),
        graft.functions.VectorFns.toDoubleArr(col("embedding")).as("cv"))
      val a = if (hier) Similarity.assignCellsHierarchical(c, cents, 1)
              else Similarity.assignCells(c, cents, 1)
      a.as[(Long, Long)].collect().toSet
    }
    val union = emb.filter(col("vec_id") < 60)
    assert(appended == assignAll(union, hier = true))
    // on this fixture the flat and hierarchical routes genuinely
    // disagree for some vector (superProbe=4 of ~6 supers prunes real
    // candidates); if they ever coincide the mode assertion above
    // still pins the branch
    val flatUnion = assignAll(union, hier = false)
    info(s"flat-vs-hier divergence on union: ${
      (flatUnion diff appended).size} rows")
    graft.Checkpoints.releaseAll(spark)
  }

  test("sign-LSH ANN recall is monotone in the probe count (0/2/4)") {
    def recall(s: Set[(Long, Long)]) = (s & exact).size.toDouble / exact.size
    val r = Seq(0, 2, 4).map { p =>
      p -> recall(topSet(Similarity.signLshTopK(emb, queries, "vec_id",
        "embedding", 5, probes = p)))
    }
    info(s"recall by probes: $r")
    r.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
      assert(rb >= ra, s"probes=$pb recall $rb < probes=$pa recall $ra")
    }
    assert(r.last._2 >= 0.5, s"LSH ANN recall ${r.last._2}")
  }

  test("semanticDedup groups near-identical vectors under one minimal " +
       "canonical keeper and leaves the rest as singletons") {
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding", 0.4)
      .select(col("vec_id"), col("canonical_id"), col("n_members"),
        col("keep"))
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.length == emb.count(), "every input row comes back")
    val byGroup = out.groupBy(_._2)
    byGroup.foreach { case (canon, ms) =>
      // canonical id is the group's min member, kept exactly once
      assert(ms.map(_._1).min == canon, s"group $canon keeper not minimal")
      assert(ms.count(_._4) == 1 && ms.find(_._4).get._1 == canon,
        s"group $canon keep flags")
      assert(ms.forall(_._3 == ms.length), s"group $canon size column")
    }
    // the q72-verified near-dup pairs must land in one group: grouped
    // rows exist, and every pair the IVF path emits shares a canonical
    val pairs = Similarity.cosinePairsIvf(emb, "vec_id", "embedding", 0.4)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    val canonOf = out.map(r => r._1 -> r._2).toMap
    pairs.foreach { case (x, y) =>
      assert(canonOf(x) == canonOf(y), s"pair ($x,$y) split across groups")
    }
    // dropping keep=false removes exactly sum(group_size - 1)
    val dropped = out.count(!_._4)
    assert(dropped == byGroup.values.map(_.length - 1).sum)
  }

  test("randomProject keeps pairwise cosines close and recalls the " +
       "true near-dup pairs at a discounted threshold") {
    // what a 64->16 JL projection preserves — and what it can't:
    // STRONG similarities (the planted near-dups, cos >= 0.4) survive
    // the ~0.2 distortion; hairline top-5 distinctions in the nearly
    // uniform background do NOT (measured top-5 recall is ~0.06 — the
    // projection is a candidate-generation tool, not a ranking one)
    val proj = Similarity.randomProject(emb, "vec_id", "embedding", 16)
    val truePairs = Similarity.cosinePairs(emb, "vec_id", "embedding", 0.4)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(truePairs.nonEmpty)
    // project, then admit candidates at the DISCOUNTED threshold 0.1
    // (threshold minus the distortion budget) — the standard
    // project-then-verify candidate pattern
    val candPairs = Similarity.cosinePairs(proj, "vec_id", "proj", 0.1)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val recall = (candPairs & truePairs).size.toDouble / truePairs.size
    info(s"near-dup recall at projected threshold 0.1: $recall")
    assert(recall >= 0.8, s"JL near-dup recall $recall")
    // pairwise cosine distortion on a sample: mean absolute error
    // within the JL budget for k=16
    val sample = emb.filter(col("vec_id") < 60)
    val fullCos = Similarity.cosinePairs(sample, "vec_id", "embedding", -1.0)
      .select(col("id_a"), col("id_b"), col("cos"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3)
      .toMap
    val projCos = Similarity.cosinePairs(
        Similarity.randomProject(sample, "vec_id", "embedding", 16),
        "vec_id", "proj", -1.0)
      .select(col("id_a"), col("id_b"), col("cos"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3)
      .toMap
    val errs = fullCos.keys.map(k => math.abs(fullCos(k) - projCos(k)))
    val mae = errs.sum / errs.size
    info(s"pairwise cosine MAE after 64->16 projection: $mae")
    assert(mae < 0.25, s"JL distortion MAE $mae")
  }

  test("semanticDedupIndexed over the persisted dedup index equals the " +
       "in-flight form") {
    val idx = java.nio.file.Files.createTempDirectory("ivfdedupidx").toString
    Similarity.buildIvfDedupIndex(emb, "vec_id", "embedding", idx,
      targetCellSize = 256, nprobe = 2, lloydIters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("canonical_id"), col("n_members"),
        col("keep")).as[(Long, Long, Long, Boolean)].collect().toSet
    // pairs first: bit-deterministic build + exact parquet round-trip
    // → the indexed pair set IS the in-flight pair set
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a"), col("id_b"), col("cos"))
        .as[(Long, Long, Double)].collect().toSet
    val pi = pairSet(Similarity.cosinePairsIvfIndexed(idx, emb,
      "vec_id", "embedding", 0.4))
    assert(pi.nonEmpty)
    assert(pi == pairSet(Similarity.cosinePairsIvf(emb,
      "vec_id", "embedding", 0.4)))
    val indexed = rows(Similarity.semanticDedupIndexed(idx, emb,
      "vec_id", "embedding", 0.4))
    assert(indexed == rows(Similarity.semanticDedup(emb,
      "vec_id", "embedding", 0.4)))
  }

  test("cosinePairsLsh recalls the oracle-checked exact near-dup pairs") {
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val exactPairs = pairSet(
      Similarity.cosinePairs(emb, "vec_id", "embedding", 0.4))
    val lshPairs = pairSet(
      Similarity.cosinePairsLsh(emb, "vec_id", "embedding", 0.4))
    // precision is exact by construction (same verify threshold)
    assert((lshPairs -- exactPairs).isEmpty)
    val recall = (lshPairs & exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.8, s"LSH near-dup recall $recall of ${exactPairs.size}")
  }

  test("cosinePairsIvf recalls the oracle-checked exact near-dup pairs") {
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val exactPairs = pairSet(
      Similarity.cosinePairs(emb, "vec_id", "embedding", 0.4))
    val ivfPairs = pairSet(
      Similarity.cosinePairsIvf(emb, "vec_id", "embedding", 0.4))
    assert((ivfPairs -- exactPairs).isEmpty) // precision exact by construction
    val recall = (ivfPairs & exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.8, s"IVF near-dup recall $recall of ${exactPairs.size}")
  }

  test("hierarchical cell assignment probing all supers equals flat assignment") {
    import graft.functions.VectorFns
    val c = emb.select(col("vec_id").as("n_id"),
      VectorFns.toDoubleArr(col("embedding")).as("cv"))
    val centroids = c.orderBy(col("n_id")).limit(20)
      .select(monotonically_increasing_id().as("cell"), col("cv").as("ctr"))
      .cache()
    def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.as[(Long, Long)].collect().toSet
    val flat = asSet(Similarity.assignCells(c, centroids, 2))
    // superProbe >= number of supers (ceil(sqrt(20)) = 4-5) → exact
    val full = asSet(Similarity.assignCellsHierarchical(c, centroids, 2,
      superProbe = 20))
    assert(full == flat)
    // default probing still recovers most assignments
    val probed = asSet(Similarity.assignCellsHierarchical(c, centroids, 2))
    val overlap = (probed & flat).size.toDouble / flat.size
    assert(overlap >= 0.7, s"hierarchical assignment overlap $overlap")
    centroids.unpersist()
  }

  test("q178 IVF quality report: occupancies cover the corpus, cosine " +
       "mass is bounded, and per-cell means are healthy") {
    val rows = SparkEntry.queries("q178_ivf_quality")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    val n = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert(rows.map(_._2).sum == n, "every vector assigned exactly once")
    assert(rows.map(_._1).toSet.size == rows.length)
    rows.foreach { case (_, m, sc) =>
      assert(m >= 1)
      assert(sc <= 10000L * m && sc >= -10000L * m)
    }
    // members sit closer to their OWN centroid than random (mean > 0)
    assert(rows.map(_._3).sum > 0)
    graft.Checkpoints.releaseAll(spark)
  }

  test("collectedCentroids is bit-reproducible across executions") {
    // The q51/q72 oracle replay feeds centroids collected in one
    // execution into SQL checked against a SECOND execution's output —
    // valid only if Lloyd is bit-deterministic. Exact-integer
    // recentering makes it so (double avg would vary with shuffle
    // arrival order in its low bits); this gate catches any regression
    // back to order-dependent float accumulation.
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val a = Similarity.collectedCentroids(emb, "vec_id", "embedding", 16, 2)
    val b = Similarity.collectedCentroids(emb, "vec_id", "embedding", 16, 2)
    assert(a.size == 16)
    assert(a == b, "two Lloyd executions diverged bit-wise")
  }

  test("cosinePairs finds exactly the known identical/orthogonal pairs") {
    // v1 == v2 (cos 1), v3 orthogonal to both, v4 = -v1 (cos -1)
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(1f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f)), (4L, Array(-1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0)))
    // inclusive threshold: the three orthogonal pairs (1,3),(2,3),(3,4)
    // sit exactly at cos 0 and must survive minCos = 0.0
    val zero = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.0)
      .filter(col("cos") === 0.0).as[(Long, Long, Double)].collect()
    assert(zero.length == 3)
  }

  test("PQ codebooks are bit-reproducible and codes stay in range") {
    val a = Similarity.collectedPqCodebooks(emb, "vec_id", "embedding")
    val b = Similarity.collectedPqCodebooks(emb, "vec_id", "embedding")
    assert(a == b, "two PQ trainings diverged bit-wise")
    assert(a.map(_._1).distinct.sorted == Seq(0, 1, 2, 3))
    assert(a.forall { case (_, cell, ctr) => cell < 16 && ctr.size == 16 })
    val books = Similarity.pqTrain(emb, "vec_id", "embedding")
    val codes = Similarity
      .pqEncode(emb, "vec_id", "embedding", books, 4, 16)
      .select(col("code")).as[Long].collect()
    assert(codes.forall(c => c >= 0 && c < 16))
  }

  test("PQ asymmetric-distance top-k recalls a healthy fraction of the " +
       "exact inner-product top-k") {
    // PQ approximates the INNER PRODUCT (ADC tables hold sub-IPs), so
    // the reference is exact-IP top-5, not cosine top-5
    val ip = graft.functions.VectorFns.dot(col("qv"), col("cv"))
    val q = queries.select(col("vec_id").as("q_id"),
      graft.functions.VectorFns.toDoubleArr(col("embedding")).as("qv"))
    val c = emb.select(col("vec_id").as("n_id"),
      graft.functions.VectorFns.toDoubleArr(col("embedding")).as("cv"))
    val exactIp = topSet(graft.operators.Relational.topKPerGroup(
      q.crossJoin(c).filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"), round(ip, 4).as("s")),
      Seq(col("q_id")), Seq(col("s").desc, col("n_id")), 5))
    val pq = topSet(
      Similarity.pqTopK(emb, queries, "vec_id", "embedding", 5, m = 8, k = 64))
    val recall = (pq & exactIp).size.toDouble / exactIp.size
    // measured 0.944 at m=8/k=64/shortlist=50 on this fixture
    assert(recall >= 0.8, s"PQ recall $recall")

    // IVF+PQ: probing all cells with a corpus-wide shortlist removes
    // both approximations — the composition must EQUAL exact-IP top-k
    // (the full-probe ≡ exact discipline of the IVF family)
    val n = emb.count().toInt
    val full = topSet(Similarity.ivfPqTopK(emb, queries, "vec_id",
      "embedding", 5, cells = 8, nprobe = 8, shortlist = n + 1))
    assert(full == exactIp, "full-probe full-shortlist IVFPQ != exact-IP")
    // default routing (nprobe=4/16, shortlist=50) still recalls most
    val ivfpq = topSet(Similarity.ivfPqTopK(emb, queries, "vec_id",
      "embedding", 5))
    val composedRecall = (ivfpq & exactIp).size.toDouble / exactIp.size
    assert(composedRecall >= 0.4, s"IVFPQ recall $composedRecall")
  }

  test("SQ8 integer-dot top-k recalls the exact inner-product top-k " +
       "and a corpus-wide shortlist removes the approximation") {
    val sqDir = java.nio.file.Files.createTempDirectory("sqidx").toString
    Similarity.buildSqIndex(emb, "vec_id", "embedding", sqDir)
    // codes are SIGNED int8 around zero (symmetric quantization)
    val codes = spark.read.parquet(s"$sqDir/codes.parquet")
    val minMax = codes.select(explode(col("codes")).as("c"))
      .agg(min(col("c")), max(col("c"))).as[(Long, Long)].head()
    assert(minMax._1 >= -127L && minMax._2 <= 127L)
    assert(minMax._1 < 0L, "symmetric codes must use the negative range")
    // exact-IP reference (SQ approximates the inner product)
    val ip = graft.functions.VectorFns.dot(col("qv"), col("cv"))
    val q = queries.select(col("vec_id").as("q_id"),
      graft.functions.VectorFns.toDoubleArr(col("embedding")).as("qv"))
    val c = emb.select(col("vec_id").as("n_id"),
      graft.functions.VectorFns.toDoubleArr(col("embedding")).as("cv"))
    val exactIp = topSet(graft.operators.Relational.topKPerGroup(
      q.crossJoin(c).filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"), round(ip, 4).as("s")),
      Seq(col("q_id")), Seq(col("s").desc, col("n_id")), 5))
    val sq = topSet(Similarity.sqTopKIndexed(sqDir, emb, queries,
      "vec_id", "embedding", 5))
    val recall = (sq & exactIp).size.toDouble / exactIp.size
    // 8-bit per-dim quantization is far finer than PQ's 48-bit codes;
    // measured 1.0 on this fixture — assert a safe floor
    assert(recall >= 0.9, s"SQ8 recall $recall")
    // a corpus-wide shortlist makes the exact re-rank see everything
    // the integer scan ranked: result == exact-IP top-k by definition
    val n = emb.count().toInt
    val full = topSet(Similarity.sqTopKIndexed(sqDir, emb, queries,
      "vec_id", "embedding", 5, shortlist = n + 1))
    assert(full == exactIp, "full-shortlist SQ8 != exact-IP top-k")
  }

  test("indexed PQ / IVF+PQ queries over the persisted indexes equal " +
       "the build-per-query pipelines") {
    val pqDir = java.nio.file.Files.createTempDirectory("pqidx").toString
    val ivfDir = java.nio.file.Files.createTempDirectory("ivfidx2").toString
    Similarity.buildPqIndex(emb, "vec_id", "embedding", pqDir,
      m = 8, k = 64, lloydIters = 2)
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", ivfDir,
      cells = 16, lloydIters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("q_id"), col("n_id"), col("ip"), col("rn"))
        .as[(Long, Long, Double, Long)].collect().toSet
    // bit-deterministic training + exact parquet double round-trip →
    // IDENTICAL results (ranks included), not merely similar ones
    assert(rows(Similarity.pqTopKIndexed(pqDir, emb, queries,
        "vec_id", "embedding", 5, m = 8, k = 64)) ==
      rows(Similarity.pqTopK(emb, queries,
        "vec_id", "embedding", 5, m = 8, k = 64)))
    assert(rows(Similarity.ivfPqTopKIndexed(ivfDir, pqDir, emb, queries,
        "vec_id", "embedding", 5)) ==
      rows(Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", 5)))
  }

  test("q222 embedding drift: identical halves read cos 10000, negated " +
       "halves read -10000, share deltas exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q222").toString
    // label 0: the candidate half repeats the reference half exactly;
    // label 1: the candidate half is the reference NEGATED — the two
    // extreme verdicts of the drift monitor, hand-computable
    Seq((0L, Array(1f, 0f), 0), (1L, Array(1f, 0f), 0),
        (2L, Array(0f, 1f), 1), (3L, Array(0f, -1f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q222_embedding_drift")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 1L, 1L, 10000L, 0L)), s"label 0: ${got(0L)}")
    assert(got(1L) == ((1L, 1L, 1L, -10000L, 0L)), s"label 1: ${got(1L)}")
    graft.Checkpoints.releaseAll(spark)
  }

  test("q235 kNN label agreement: a planted mislabeled vector drags " +
       "exactly its own label's agreement, coherent clusters stay high") {
    val d = java.nio.file.Files.createTempDirectory("graft_q235").toString
    // cluster A (label 0): 6 near-identical vectors along (1, ~0);
    // cluster B (label 1): 5 along (~0, 1); vec 11 sits INSIDE B but
    // carries label 0 — the planted annotation error.
    val rows =
      (0 until 6).map(i => (i.toLong, Array(1f, i * 0.01f), 0)) ++
      (6 until 11).map(i => (i.toLong, Array((i - 6) * 0.01f, 1f), 1)) :+
      ((11L, Array(0.05f, 1f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val got = SparkEntry.queries("q235_knn_label_agreement")(spark, d)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // label 0: 6 coherent members agree 5/5 each, the mislabeled one
    // 0/5 → 30 of 35; label 1: each member's top-5 is its 4 true
    // peers + the impostor → 20 of 25
    assert(got(0L) == ((0L, 7L, 30L, 8571L)), s"label 0: ${got(0L)}")
    assert(got(1L) == ((1L, 5L, 20L, 8000L)), s"label 1: ${got(1L)}")
    graft.Checkpoints.releaseAll(spark)
  }

  test("q224 filtered ANN: every hit shares its query's label, equals " +
       "the label-restricted brute force, and plans a HASH join") {
    val res = SparkEntry.queries("q224_ann_filtered")(spark, dir)
    // the filter is an equi-key: the candidate join must be a hash
    // join on label, never a nested-loop sweep — that IS the filtered-
    // search scale story
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), "filter did not prune the join")
    val rows = res.select(col("q_id"), col("label"), col("n_id"), col("cos"))
      .as[(Long, Long, Long, Double)].collect()
    val labels = emb.select(col("vec_id"), col("label").cast("long"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (q, l, n, _) =>
      assert(labels(q) == l && labels(n) == l,
        s"query $q (label ${labels(q)}) got neighbor $n (label ${labels(n)})")
    }
    // per query: the same pairs the unfiltered exact ranking yields
    // when ITS corpus is restricted to the query's label
    val byLabel = labels.keys.groupBy(labels)
    for (ql <- byLabel.keys) {
      val restricted = topSet(Similarity.bruteForceTopK(
        emb.filter(col("label") === ql),
        queries.filter(col("label") === ql), "vec_id", "embedding", 5))
      val got = rows.filter(r => r._2 == ql).map(r => (r._1, r._3)).toSet
      assert(got == restricted, s"label $ql: $got != $restricted")
    }
    graft.Checkpoints.releaseAll(spark)
  }

  test("MMR re-rank prefers the diverse candidate over the near-duplicate") {
    // query 0 at (1,0,0); 1 and 2 are near-duplicates of each other at
    // cos≈0.9 to the query; 3 is equally relevant but on the mirrored
    // side (sim(1,3)≈0.62). Pure top-3 relevance would order 1,2,3 (2's
    // redundancy invisible); MMR must pick 1, then 3 (diverse), then 2.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.436f, 0f)),
      (2L, Array(0.9f, 0.437f, 0f)),
      (3L, Array(0.9f, -0.436f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(vecs, vecs.filter(col("vec_id") === 0),
        "vec_id", "embedding", nCand = 3, k = 3)
      .orderBy(col("round"))
      .select(col("round"), col("n_id"), col("maxsim"))
      .as[(Long, Long, Long)].collect().toList
    assert(got.map(_._2) == List(1L, 3L, 2L), s"pick order $got")
    assert(got.head._3 == 0L, "round 1 has an empty selected set")
    // the near-duplicate's redundancy is visible in its maxsim
    assert(got.last._3 > 9900, s"near-dup maxsim ${got.last._3}")
  }

  test("MMR on the real fixture: per-query scores non-increasing, picks distinct, round 1 = argmax rel") {
    val got = Similarity.mmrRerank(emb, queries, "vec_id", "embedding",
        nCand = 10, k = 5)
      .select(col("q_id"), col("round"), col("n_id"), col("rel"),
        col("score"))
      .as[(Long, Long, Long, Long, Long)].collect()
    val byQ = got.groupBy(_._1)
    // exactly k picks per query, all distinct
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 5, s"query $q has ${rows.length} picks")
      assert(rows.map(_._3).distinct.length == 5, s"query $q repeated a pick")
      // scores are non-increasing in round order: a candidate's maxsim
      // only grows as S grows and the pool only shrinks
      val scores = rows.sortBy(_._2).map(_._5)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q scores not monotone: ${scores.toList}")
      // round 1 is the plain relevance argmax (score = rel)
      val r1 = rows.minBy(_._2)
      assert(r1._5 == r1._4, s"query $q round-1 score != rel")
    }
    assert(byQ.nonEmpty)
  }

  test("k-center greedy picks farthest points in order on a hand fixture") {
    // seed = min id 0 at (1,0,0); 1 is its near-duplicate; 3 is the
    // antipode (distance 20000); 2 is orthogonal (distance 10000 to
    // both 0 and 3). Farthest-point order must be 0, 3, 2.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(1f, 0.001f, 0f)),
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(-1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterGreedy(vecs, "vec_id", "embedding", k = 3)
      .orderBy(col("round"))
      .as[(Long, Long, Long)].collect().toList
    assert(got == List((1L, 0L, 20000L), (2L, 3L, 20000L),
      (3L, 2L, 10000L)), s"got $got")
  }

  test("k-center greedy: exhaustion below k, distinct centers, non-increasing radii") {
    val three = Seq(
      (10L, Array(1f, 0f, 0f)), (11L, Array(0f, 1f, 0f)),
      (12L, Array(0f, 0f, 1f))).toDF("vec_id", "embedding")
    // only 3 points: k=8 must stop at 3 rows, not invent centers
    assert(Similarity.kCenterGreedy(three, "vec_id", "embedding", 8)
      .count() == 3)
    val got = Similarity.kCenterGreedy(emb, "vec_id", "embedding", k = 8)
      .orderBy(col("round")).as[(Long, Long, Long)].collect().toList
    assert(got.length == 8)
    assert(got.map(_._2).distinct.length == 8, "centers repeat")
    // the coverage-radius curve is the k-center objective: adding a
    // center can only shrink every point's min distance
    val radii = got.tail.map(_._3) // round 1 is the 20000 sentinel
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"radii not monotone: $radii")
    assert(got.head._3 == 20000L)
  }
}
