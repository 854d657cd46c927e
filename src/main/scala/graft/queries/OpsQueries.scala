package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{
  AnnIndexStore, Bpe, Chunking, Classifier, Clusters, Contamination,
  CorpusFilters, Dedup, Embeddings, KMeans, Multimodal, Packing, Pca, Profile,
  Redact, Relevance, RepSignals, Sampling, Similarity, SubstrDedup, TextOps,
  Web}

/** Scale-extension operator pack: dedup / similarity / text analysis /
  * multimodal over the `documents` and `embeddings` tables, each with
  * an exactly-replicating DuckDB oracle (the portable integer hashes
  * and strict left-to-right double folds in graft.ops exist precisely
  * so these oracles can be bit-exact).
  */
object OpsQueries {

  /** (nPlanes, probeBits) operating points for the q_ann_recall
    * curve: the round-6 default (6,1) — the measured knee, ~50% top-5
    * recall at ~1.7× the (8,1) candidates — plus the narrower-bucket
    * (8,1) and no-multiprobe (8,0) cheap ends. Shared by the Spark
    * query and its oracle so both emit the same rows;
    * Similarity.pickOperatingPoint selects from this curve given a
    * recall target.
    */
  val AnnRecallSettings: Seq[(Int, Int)] = Seq((6, 1), (8, 0), (8, 1))

  /** Materialize a (small — top-k × queries rows) result off its
    * temp-directory inputs and delete the directory: bench medians
    * (3+ runs) plus adjudication re-runs of the index-lifecycle
    * queries would otherwise accumulate one full index copy per
    * invocation across a sweep. `localCheckpoint` is the documented
    * bounded hand-off here — it pins the k×10 result rows in the
    * block manager so the returned frame no longer reads the files
    * being deleted.
    */
  private def materializeAndDelete(
      df: DataFrame, dir: java.nio.file.Path): DataFrame = {
    // plan-audit escape hatch: a localCheckpoint collapses the plan to
    // a bare RDD scan, which would make PlanSpec's global
    // CartesianProduct/BNL/partitionless-window gates vacuous for the
    // lifecycle queries. PlanSpec sets this conf to keep the lazy
    // probe plan (and its temp inputs — the audit session accepts the
    // leak) visible; every production path keeps the default.
    if (df.sparkSession.conf
      .getOption("spark.graft.materializeLifecycleResults")
      .contains("false")) return df
    val out = df.localCheckpoint(true)
    val p = new org.apache.hadoop.fs.Path(dir.toString)
    p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
      .delete(p, true)
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exactByContentHash(Tables.documents(s, d), "doc_id", "text")),

    "q_dedup_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text")),

    // Asymmetric containment pairs — the subset-duplicate catcher
    // Jaccard structurally misses (see Dedup.containmentPairs). Lower
    // threshold than the 0.5 Jaccard default because containment of
    // the smaller side concentrates near 1 for true subsets.
    "q_containment" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
        thresholdNum = 3, thresholdDen = 5)),

    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minHashLshPairs(Tables.documents(s, d), "doc_id", "text")),

    // b-bit minwise (Li-König): the 2-byte-per-doc sketch verify —
    // agreement counts + the R̂ = 2A − 1 estimate per LSH candidate
    // pair, priced next to q_dedup_minhash's exact verification.
    "q_minhash_bbit" -> ((s, d) =>
      Dedup.bbitMinwisePairs(Tables.documents(s, d), "doc_id", "text")),

    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simHashes(Tables.documents(s, d), "doc_id", "text")),

    // MEASURED agreement of the MinHash+LSH scale path with the exact
    // inverted-index Jaccard pairs: one row — exact pairs, LSH pairs,
    // and their overlap. The two paths differ by design (banding
    // recall loss vs the posting-list df cut), and this query prices
    // that difference instead of asserting it away.
    "q_minhash_recall" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // each pair pipeline feeds its own count AND the overlap join:
      // persist the slim pair frames so the shingle→signature→verify
      // lineages evaluate once per path, not twice (the q_ann_recall
      // sharing; ContextCleaner frees them when unreferenced)
      val ex = Dedup.jaccardPairs(docs, "doc_id", "text")
        .select("doc_id_a", "doc_id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mh = Dedup.minHashLshPairs(docs, "doc_id", "text")
        .select("doc_id_a", "doc_id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ex.agg(count(lit(1)).as("n_exact"))
        .crossJoin(mh.agg(count(lit(1)).as("n_minhash")))
        .crossJoin(ex.join(mh, Seq("doc_id_a", "doc_id_b"))
          .agg(count(lit(1)).as("n_common")))
    }),

    // Exact Hamming-≤3 pair join via pigeonhole banding — candidates
    // from 4×8-bit band agreement, verified by popcount (no misses).
    "q_simhash_pairs" -> ((s, d) =>
      Dedup.simHashPairs(Tables.documents(s, d), "doc_id", "text")),

    // Incremental dedup: the doc_id%5==0 slice plays the incoming
    // batch, deduped against STORED signatures of the rest — corpus
    // text is never re-scanned (see Dedup.minHashLshIncremental).
    "q_dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0L)
      val batch = docs.filter(pmod(col("doc_id"), lit(5L)) === 0L)
      Dedup.minHashLshIncremental(batch, "doc_id", "text",
        Dedup.signatures(corpus, "doc_id", "text"))
    }),

    // EXACT thresholded similarity join via lossless prefix filtering
    // (AP-SS) — the oracle is the O(n²) brute force, which the prefix
    // join must reproduce verbatim (see Dedup.allPairsJaccard).
    "q_simjoin_exact" -> ((s, d) =>
      Dedup.allPairsJaccard(Tables.documents(s, d), "doc_id", "text")),

    // Pair evidence is transitive in intent — the keep-list must group
    // by connected component, not by pair, or a chain A~B~C keeps two
    // of three docs.
    "q_dedup_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Clusters.dedupClusters(docs, "doc_id",
        Dedup.minHashLshPairs(docs, "doc_id", "text"), "doc_id_a", "doc_id_b")
    }),

    // Duplicate-family telemetry on those clusters: how many families
    // of each size — the "is the corpus a few huge templates or many
    // small dupes" readout that decides the scrub strategy. Two hash
    // aggs over the cluster assignment.
    "q_cluster_sizes" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Clusters.dedupClusters(docs, "doc_id",
        Dedup.minHashLshPairs(docs, "doc_id", "text"),
        "doc_id_a", "doc_id_b")
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
    }),

    "q_ann_cosine" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        e.select(col("vec_id").as("nid"), col("embedding").as("nv")),
        k = 5)
    }),

    // Embedding-quality measurement as 1-NN classification: held-out
    // vectors (id < 50) classified by their nearest train neighbor's
    // label, reported as a confusion matrix — the standard "do these
    // embeddings carry the label signal" probe. Composes the exact
    // brute-force scorer (the ground-truth anchor; the LSH/IVF paths
    // are the scale twins) with two broadcast label joins.
    "q_knn_classify" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val test = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val train = e.filter(col("vec_id") >= 50)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val lblTest = e.select(col("vec_id").as("qid"),
        col("label").cast("long").as("label_true"))
      val lblTrain = e.select(col("vec_id").as("nid"),
        col("label").cast("long").as("label_pred"))
      Similarity.bruteForceTopK(test, train, k = 1)
        .join(lblTest, "qid").join(lblTrain, "nid")
        .groupBy(col("label_true"), col("label_pred"))
        .agg(count(lit(1)).as("n"))
    }),

    // The SCALE path for the same question: hyperplane-LSH bucket join
    // with 1-bit multiprobe instead of a corpus scan per query. The
    // hyperplanes are seedless integer hashes, so the oracle replicates
    // the bucketing (and therefore the exact candidate set) bit-for-bit.
    "q_ann_lsh" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.lshTopK(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        e.select(col("vec_id").as("nid"), col("embedding").as("nv")),
        k = 5)
    }),

    // MEASURED recall of the LSH scale path against the exact brute
    // twin — one row per (nPlanes, probeBits) setting, so users read
    // the recall-vs-candidate-count curve and price the tradeoff
    // instead of getting a single take-it-or-leave-it operating
    // point. Both paths are seedless-deterministic, so recall itself
    // is oracle-reproducible.
    "q_ann_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      // brute feeds one join per setting, and each setting's candidate
      // frame feeds BOTH its top-k rank and its count: persist the
      // slim projections once instead of evaluating the cross-join /
      // bucket-join pipelines per consumer (ContextCleaner frees them
      // once the returned frame is unreferenced)
      val brute = Similarity.bruteForceTopK(q, c, k = 5).select("qid", "nid")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      AnnRecallSettings.map { case (np, pb) =>
        val cand = Similarity.lshCandidates(q, c, nPlanes = np, probeBits = pb)
          .select(col("qid"), col("nid"), col("cos"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val lsh = Similarity.topKFromCandidates(cand, k = 5)
          .select(col("qid"), col("nid"), lit(1L).as("hit"))
        brute.join(lsh, Seq("qid", "nid"), "left")
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
          .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
          .select(
            lit(np.toLong).as("n_planes"), lit(pb.toLong).as("probe_bits"),
            col("n_true"), col("n_hits"), col("n_candidates"))
      }.reduce(_.unionAll(_))
    }),

    // Cross-path operating-point pick: LSH points, full-scan PQ at
    // two codebook budgets, and the exact scan compete on ONE curve
    // (path, n_true, n_hits, n_candidates, bits_per_vec); each recall
    // target gets the cheapest qualifying path — fewest candidates
    // scored, then smallest per-vector storage. Integer-percent
    // targets keep the comparison exact cross-multiplication. The
    // residual/IVFPQ paths join the same curve in the spec (their
    // combined oracle would stack every ANN generator in one DuckDB
    // process); including the exact path keeps every target
    // satisfiable, so the row count is fixed.
    "q_ann_path_pick" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      // feeds one join per path: persist (ContextCleaner frees it
      // once the returned frame is unreferenced)
      val brute = Similarity.bruteForceTopK(q, c, k = 5).select("qid", "nid")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nc = c.agg(count(lit(1)).as("ncorpus"))
      def recallOf(approx: DataFrame): DataFrame =
        brute.join(approx.select(col("qid"), col("nid"), lit(1L).as("hit")),
          Seq("qid", "nid"), "left")
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      val lshRows = AnnRecallSettings.map { case (np, pb) =>
        // one persisted slim candidate frame per setting feeds both
        // the top-k rank and the candidate count (q_ann_recall's
        // sharing — the bucket-join pipeline evaluates once, not twice)
        val cand = Similarity.lshCandidates(q, c, nPlanes = np, probeBits = pb)
          .select(col("qid"), col("nid"), col("cos"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        recallOf(Similarity.topKFromCandidates(cand, k = 5))
          .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
          .select(lit(s"lsh_${np}_$pb").as("path"), col("n_true"),
            col("n_hits"), col("n_candidates"),
            lit(2048L).as("bits_per_vec"))
      }
      // second PQ budget point is ksub=64 (24 bits/vec), NOT the
      // graded pq8: stacking the 256-codeword generator into this
      // oracle pushed its DuckDB process past the proven RSS envelope
      // (1302 MB vs q_ann_pq8_recall's 1004); pq8 keeps its own rows
      // and joins the full curve in the Pareto spec
      val pqRows = Seq(("pq", 8, 12L), ("pq64", 64, 24L)).map {
        case (name, ksub, bits) =>
          recallOf(Similarity.pqTopK(q, c, k = 5, dim = 64, m = 4, ksub = ksub))
            .crossJoin(nc)
            .select(lit(name).as("path"), col("n_true"), col("n_hits"),
              (col("ncorpus") * 10L - 10L).as("n_candidates"),
              lit(bits).as("bits_per_vec"))
      }
      val bruteRow = brute.agg(count(lit(1)).as("n_true"))
        .crossJoin(nc)
        .select(lit("brute").as("path"), col("n_true"),
          col("n_true").as("n_hits"),
          (col("ncorpus") * 10L - 10L).as("n_candidates"),
          lit(2048L).as("bits_per_vec"))
      Similarity.pickAnnPathRows(
        (lshRows ++ pqRows :+ bruteRow).reduce(_.unionAll(_)),
        Seq(20, 40, 60, 80, 100))
    }),

    // The coarse-quantizer scale path: IVF posting lists from a
    // deterministic codebook; a query touches nProbe lists, not the
    // corpus. Assignment + probes + ranks replicate exactly because
    // every cosine is the same sequential double fold on both engines.
    "q_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopK(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        e.select(col("vec_id").as("nid"), col("embedding").as("nv")),
        k = 5)
    }),

    // The memory-bound scale path: PQ codes (4×3 bits per vector here
    // vs 64 floats) scored by ADC table lookups. Encoder argmin, the
    // sorted table pivots, and the explicit left-associated m-term
    // adds are all fixed-order folds, so ranks replicate exactly.
    "q_ann_pq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.pqTopK(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        e.select(col("vec_id").as("nid"), col("embedding").as("nv")),
        k = 5, dim = 64)
    }),

    // IVF lists pruning the PQ scan (FAISS IVFADC minus residuals):
    // candidates come from a cid equi-join on the probed lists, then
    // the same ADC scoring — the composed 100 TB path.
    "q_ann_ivfpq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfPqTopK(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        e.select(col("vec_id").as("nid"), col("embedding").as("nv")),
        k = 5, dim = 64)
    }),

    // PQ recall priced against the exact top-5, the q_ann_recall
    // discipline: quantization loss as data, not vibes.
    "q_ann_pq_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val brute = Similarity.bruteForceTopK(q, c, k = 5).select("qid", "nid")
      val pq = Similarity.pqTopK(q, c, k = 5, dim = 64)
        .select(col("qid"), col("nid"), lit(1L).as("hit"))
      brute.join(pq, Seq("qid", "nid"), "left")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
    }),

    // Residual encoding (full FAISS IVFADC): PQ quantizes v − centroid
    // instead of v, so the same 12-bit budget approximates a much
    // smaller vector — same broadcast-ADC plan shape, better recall.
    "q_ann_ivfpq_res" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfPqResidualTopK(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        e.select(col("vec_id").as("nid"), col("embedding").as("nv")),
        k = 5, dim = 64)
    }),

    // Build/probe split: the index artifacts (coarse centroids,
    // trained residual sub-codebooks, PQ codes) are persisted ONCE
    // per corpus and this row only PROBES them — the amortized
    // operating point a real deployment runs at (build once, probe
    // thousands of times). The first invocation builds the artifact
    // (marker-gated, crash-safe); every later one loads. Ranks are
    // hash-identical to the fused q_ann_ivfpq_res — the parquet
    // round-trip is bit-exact — so it shares that oracle, while
    // q_ann_ivfpq_res stays as the build-priced row.
    "q_ann_ivfpq_probe" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val idx = AnnIndexStore.ensureIvfPqResidual(s,
        AnnIndexStore.cachePathFor(s"$d/embeddings.parquet", 64, 4, 8, 16),
        e.select(col("vec_id").as("nid"), col("embedding").as("nv")),
        dim = 64)
      Similarity.ivfPqResidualProbe(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        idx, k = 5, dim = 64)
    }),

    // FAISS-style incremental add: the index is built (and its
    // codebooks trained) on the 80% base split only; the 20%
    // "arrivals" are encoded against the FROZEN centroids and
    // sub-codebooks and appended — the continuous-ingest path, where
    // per-batch cost is one narrow encode over the arrivals, never
    // the corpus. The probe then runs over the grown index. The
    // oracle trains on the same base split while encoding/probing
    // the whole corpus (ivfPqResidualSqlGen filters), so the
    // frozen-codebook append is hash-pinned end to end.
    "q_ann_index_append" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val base = e.filter(col("vec_id") % 10 < 8)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val arrivals = e.filter(col("vec_id") % 10 >= 8)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val grown = Similarity.appendToIndex(
        Similarity.buildIvfPqResidualIndex(base, dim = 64),
        arrivals, dim = 64)
      Similarity.ivfPqResidualProbe(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        grown, k = 5, dim = 64)
    }),

    // The continuous-ingest machinery end to end, driver-graded: the
    // index is built on the 80% base split, the arrivals land as TWO
    // streaming micro-batches through the exactly-once staged publish
    // (each one crash-REPLAYED — a duplicate insert would break the
    // hash), the fragmented codes table is compacted in place, and
    // the probe runs through an IndexHandle that must pick the
    // appended-then-compacted codes up without a manual reload.
    // Ranks are pinned to the same frozen-codebook oracle as
    // q_ann_index_append: ingest ≡ appendToIndex ≡ the union encode,
    // and compaction/reload must be invisible to the ranking.
    "q_ann_ingest_compact_probe" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val base = e.filter(col("vec_id") % 10 < 8)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"))
      def arrivals(sel: Column) = e.filter(col("vec_id") % 10 >= 8 && sel)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"))
      // the base index is the amortized artifact (built once per
      // corpus through the cache); each invocation CLONES it into a
      // fresh mutable copy before ingesting — the staging-clone shape
      // a real deployment uses, and it keeps this row priced on the
      // ingest+compact+probe machinery instead of re-paying the
      // (already-priced, q_ann_ivfpq_res) build every run
      val basePath = AnnIndexStore.cachePathFor(
        s"$d/embeddings.parquet", 64, 4, 8, 16, variant = "base80")
      AnnIndexStore.ensureIvfPqResidual(s, basePath, base, dim = 64)
      val dir = java.nio.file.Files.createTempDirectory("graft_q_icp")
      val path = dir.resolve("ix").toString
      val cp = dir.resolve("cp").toString
      val conf = s.sessionState.newHadoopConf()
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(basePath),
        fs, new org.apache.hadoop.fs.Path(path), false, conf)
      val handle = AnnIndexStore.openHandle(s, path)
      handle.current() // pre-ingest load: the reload path must fire below
      val b1 = arrivals(col("vec_id") % 20 < 10)
      val b2 = arrivals(col("vec_id") % 20 >= 10)
      AnnIndexStore.ingestVectorsBatch(s, path, cp, 0L, b1, dim = 64)
      AnnIndexStore.ingestVectorsBatch(s, path, cp, 0L, b1, dim = 64) // replay
      AnnIndexStore.ingestVectorsBatch(s, path, cp, 1L, b2, dim = 64)
      AnnIndexStore.ingestVectorsBatch(s, path, cp, 1L, b2, dim = 64) // replay
      AnnIndexStore.compactCodes(s, path, Some(cp))
      materializeAndDelete(Similarity.ivfPqResidualProbe(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        handle.current(), k = 5, dim = 64), dir)
    }),

    // The STALENESS arc of the index lifecycle, driver-graded: the
    // base-split index absorbs the arrival cohort through one
    // exactly-once micro-batch, the drift trigger fires (on this
    // corpus the arrival cohort's quantized mean sits nowhere near
    // the base mean — exact-integer cosine ≪ 0.98 — so the trigger
    // path is deterministic), and the lock-guarded atomic rebuild
    // re-trains codebooks and re-encodes the FULL corpus in place.
    // The probe runs through the same IndexHandle that served the
    // pre-rebuild artifact — it must pick up all three replaced
    // tables together, never a mixed artifact. Post-rebuild ranks
    // are hash-pinned to the full-corpus fused oracle
    // (ivfPqResidualSql): a rebuild IS a fresh full build, so this
    // row shares q_ann_ivfpq_res's oracle while pricing the
    // ingest→detect→rebuild→probe arc end to end (deliberately
    // rebuild-priced, like q_ann_index_append is build-priced; the
    // amortized twin stays q_ann_ivfpq_probe).
    "q_ann_drift_rebuild" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val base = e.filter(col("vec_id") % 10 < 8)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val arrivals = e.filter(col("vec_id") % 10 >= 8)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val corpus = e.select(col("vec_id").as("nid"),
        col("embedding").as("nv"))
      val basePath = AnnIndexStore.cachePathFor(
        s"$d/embeddings.parquet", 64, 4, 8, 16, variant = "base80")
      AnnIndexStore.ensureIvfPqResidual(s, basePath, base, dim = 64)
      val dir = java.nio.file.Files.createTempDirectory("graft_q_drift")
      val path = dir.resolve("ix").toString
      val cp = dir.resolve("cp").toString
      val conf = s.sessionState.newHadoopConf()
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(basePath),
        fs, new org.apache.hadoop.fs.Path(path), false, conf)
      val handle = AnnIndexStore.openHandle(s, path)
      handle.current() // pre-rebuild load: the reload must fire below
      AnnIndexStore.ingestVectorsBatch(s, path, cp, 0L, arrivals, dim = 64)
      val rebuilt = AnnIndexStore.rebuildIfDrifted(s, path, corpus,
        col("nid") % 10 >= 8, dim = 64, minCos = 0.98)
      require(rebuilt, "the arrival cohort must trigger the drift rebuild")
      materializeAndDelete(Similarity.ivfPqResidualProbe(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        handle.current(), k = 5, dim = 64), dir)
    }),

    // The SERVING-layout probe, driver-graded: the same full-corpus
    // index published through savePartitioned (codes partitioned by
    // coarse centroid), so the probe's cid join becomes a dynamic
    // partition-pruning filter on the scan — the probe reads
    // ~nProbe/nCentroids of the codes bytes instead of all of them,
    // the 100 TB difference between scanning the corpus per probe
    // batch and scanning only the probed buckets (DPP presence is
    // spec-pinned). Ranks are layout-invariant, so the row shares the
    // fused full-corpus oracle; the artifact is tmpdir-cached like
    // the flat probe twin, so steady-state cost is probe-only.
    "q_ann_probe_pruned" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val idx = AnnIndexStore.ensureIvfPqResidualPartitioned(s,
        AnnIndexStore.cachePathFor(s"$d/embeddings.parquet",
          64, 4, 8, 16, variant = "cidpart"),
        e.select(col("vec_id").as("nid"), col("embedding").as("nv")),
        dim = 64)
      Similarity.ivfPqResidualProbe(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        idx, k = 5, dim = 64)
    }),

    // The ASYNC staleness arc, driver-graded: same drift trigger, but
    // the retrain runs on the DriftMaintainer's maintenance thread —
    // the 100 TB shape, where an hours-long rebuild must not stall
    // ingest. The build is gated on a latch so the arc is
    // deterministic: batch 0 (the %10==8 drifted cohort) triggers the
    // rebuild; batch 1 (%10==9) commits WHILE the retrain holds the
    // gate, landing in the maintainer's pending buffer; the drain
    // re-encodes it against the fresh codebooks inside the atomic
    // publish. Final index ≡ codebooks trained on vec_id%10<9 with
    // the whole corpus encoded — the same frozen-codebook algebra as
    // q_ann_index_append, so the oracle is ivfPqResidualSqlGen over
    // the 90% split. Deliberately rebuild-priced, like its sync twin;
    // the trigger is deterministic on this corpus (exact-integer
    // cohort cosine ≤ 0.18 at every SF, far under the 0.98 bar).
    "q_ann_drift_rebuild_async" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val base = e.filter(col("vec_id") % 10 < 8)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val cohortA = e.filter(col("vec_id") % 10 === 8)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val cohortB = e.filter(col("vec_id") % 10 === 9)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val basePath = AnnIndexStore.cachePathFor(
        s"$d/embeddings.parquet", 64, 4, 8, 16, variant = "base80")
      AnnIndexStore.ensureIvfPqResidual(s, basePath, base, dim = 64)
      val dir = java.nio.file.Files.createTempDirectory("graft_q_adrift")
      val path = dir.resolve("ix").toString
      val cp = dir.resolve("cp").toString
      val conf = s.sessionState.newHadoopConf()
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(basePath),
        fs, new org.apache.hadoop.fs.Path(path), false, conf)
      val handle = AnnIndexStore.openHandle(s, path)
      handle.current() // pre-rebuild load: the reload must fire below
      val started = new java.util.concurrent.CountDownLatch(1)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val maintainer = new AnnIndexStore.DriftMaintainer(s, path,
        dim = 64, buildFn = Some { c =>
          started.countDown()
          require(gate.await(120, java.util.concurrent.TimeUnit.SECONDS),
            "async drift arc: the ingest side never released the gate")
          Similarity.buildIvfPqResidualIndex(c, 64, 4, 8, 16)
        })
      maintainer.ingestBatch(cp, 0L, cohortA)
      require(maintainer.maybeRebuildAsync(
        base.unionByName(cohortA), col("nid") % 10 === 8),
        "the drifted cohort must trigger the async rebuild")
      require(started.await(120, java.util.concurrent.TimeUnit.SECONDS),
        "the maintenance thread never reached the retrain")
      // commits while the retrain is in flight -> pending buffer
      maintainer.ingestBatch(cp, 1L, cohortB)
      gate.countDown()
      require(maintainer.awaitIdle(600000), "async rebuild never finished")
      require(maintainer.failure.isEmpty,
        s"async rebuild failed: ${maintainer.failure}")
      materializeAndDelete(Similarity.ivfPqResidualProbe(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        handle.current(), k = 5, dim = 64), dir)
    }),

    // The 8-bit PQ operating point: ksub=256 sub-codebooks at m=4
    // (4 bytes/vector — the production ADC budget; the 2-bit default
    // is the honest toy). Same seed-grid discipline and plan shape,
    // 32× the codebook, measured at roughly twice the default's
    // recall on the synthetics — the budget→recall curve as data.
    "q_ann_pq8" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.pqTopK(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        e.select(col("vec_id").as("nid"), col("embedding").as("nv")),
        k = 5, dim = 64, m = 4, ksub = 256)
    }),

    // ...and its recall bill against the same exact top-5.
    "q_ann_pq8_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val brute = Similarity.bruteForceTopK(q, c, k = 5).select("qid", "nid")
      val pq = Similarity.pqTopK(q, c, k = 5, dim = 64, m = 4, ksub = 256)
        .select(col("qid"), col("nid"), lit(1L).as("hit"))
      brute.join(pq, Seq("qid", "nid"), "left")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
    }),

    // Residual-IVFPQ recall: the trained-codebook default priced
    // against the same exact top-5. Read next to q_ann_ivfpq_recall
    // it shows what training the residual sub-quantizers buys over
    // quantizing raw vectors with the same 12-bit budget.
    "q_ann_ivfpq_res_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val brute = Similarity.bruteForceTopK(q, c, k = 5).select("qid", "nid")
      // probes the persisted index (identical ranks to the fused
      // build+probe — oracle-pinned): the recall row must not re-pay
      // the index build the probe row already amortizes
      val idx = AnnIndexStore.ensureIvfPqResidual(s,
        AnnIndexStore.cachePathFor(s"$d/embeddings.parquet", 64, 4, 8, 16),
        c, dim = 64)
      val r = Similarity.ivfPqResidualProbe(q, idx, k = 5, dim = 64)
        .select(col("qid"), col("nid"), lit(1L).as("hit"))
      brute.join(r, Seq("qid", "nid"), "left")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
    }),

    // IVFPQ recall: quantization loss PLUS the probe bound, priced
    // against the same exact top-5 — read next to q_ann_pq_recall it
    // separates the two costs.
    "q_ann_ivfpq_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val brute = Similarity.bruteForceTopK(q, c, k = 5).select("qid", "nid")
      val ivfpq = Similarity.ivfPqTopK(q, c, k = 5, dim = 64)
        .select(col("qid"), col("nid"), lit(1L).as("hit"))
      brute.join(ivfpq, Seq("qid", "nid"), "left")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
    }),

    // The PQ encoder surfaced alone: per-vector sub-codes, long form.
    "q_pq_codes" -> ((s, d) =>
      Similarity.pqCodes(
        Tables.embeddings(s, d)
          .select(col("vec_id").as("nid"), col("embedding").as("nv")),
        dim = 64)._2
        .select(col("nid").as("vec_id"),
          posexplode(col("codes")).as(Seq("sm", "code")))
        .select(col("vec_id"), col("sm").cast("long").as("sm"),
          col("code").cast("long").as("code"))),

    // The SAME codes from the shuffle-free literal encoder (codebook
    // collected at index-build time, rides the plan as literals, zero
    // exchanges, streaming-safe) — deliberately checked against the
    // IDENTICAL oracle as q_pq_codes: two physical encoders, one hash.
    "q_pq_codes_lit" -> ((s, d) => {
      val corpus = Tables.embeddings(s, d)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val cb = Similarity.collectSubCodebook(
        Similarity.pqCodes(corpus, dim = 64)._1)
      corpus.select(col("nid").as("vec_id"),
        posexplode(Similarity.pqEncodeColumn(col("nv"), cb, dim = 64, m = 4))
          .as(Seq("sm", "code")))
        .select(col("vec_id"), col("sm").cast("long").as("sm"),
          col("code").cast("long").as("code"))
    }),

    // Exact Gram + covariance matrix over the leading 16 embedding
    // dims: per-row upper-triangle explode (no self-join), one hash
    // aggregation over 136 cells, fixed-point products so the matrix
    // hash-verifies (graft.ops.Embeddings.gramMatrix).
    "q_gram" -> ((s, d) =>
      Embeddings.gramMatrix(Tables.embeddings(s, d), "embedding",
        dims = 16)),

    // Per-label quantized centroids: floor(x·1024) longs summed
    // exactly, divided back in fixed order — bit-deterministic under
    // any partitioning, unlike a float mean (library path
    // Embeddings.meanCentroids carries the production float variant).
    "q_embed_centroid" -> ((s, d) =>
      Embeddings.quantizedCentroids(
        Tables.embeddings(s, d), "label", "embedding")),

    // Trained coarse quantizer for the IVF path: two Lloyd rounds from
    // the lowest-id seeds, cosine assignment and quantized-mean update
    // both bit-deterministic, so the full training loop (not just one
    // pass) hash-matches the unrolled oracle.
    "q_kmeans_codebook" -> ((s, d) =>
      KMeans.kmeansCodebook(
        Tables.embeddings(s, d), "vec_id", "embedding", k = 8, iters = 2)),

    // SemDeDup: coarse-quantizer clusters bound the candidate pairs,
    // near-dups (cos ≥ 0.45, the q_dedup_embedding threshold) are
    // dropped keep-lowest-id WITHIN each cluster.
    "q_dedup_semantic" -> ((s, d) =>
      Similarity.semanticDedup(
        Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding").as("v")),
        threshold = 0.45)
        .select(col("id").as("vec_id"), col("cid"))),

    // Leakage-safe splits: the group key is the exact-dedup cluster
    // representative (min doc_id per normalized-content digest), so
    // byte-duplicate documents can never straddle train/val/test.
    "q_split_groups" -> ((s, d) => {
      val g = Tables.documents(s, d).select(
        col("doc_id"),
        md5(TextOps.normalize(col("text")).cast("binary")).as("dg"))
      val reps = g.groupBy("dg").agg(min(col("doc_id")).as("grp"))
      g.join(reps, "dg")
        .select(col("doc_id"), col("grp"),
          Sampling.splitLabel(col("grp"), numTrain = 8, numVal = 1, den = 10)
            .as("split"))
    }),

    // tokenize ONCE into a column, then derive every metric from it —
    // the interpreted split+filter walk is the expensive part and
    // Catalyst doesn't deduplicate HOF subtrees across projections.
    "q_text_quality" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), TextOps.words(col("text")).as("ws"))
        .select(
          col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          TextOps.totalWordChars(col("text")).as("n_word_chars"),
          TextOps.punctCount(col("text")).as("n_punct"),
          TextOps.stopwordHits(col("ws"), TextOps.StopwordProfiles.head._2)
            .as("n_stopwords_en"))
        .select(
          col("doc_id"), col("n_words"), col("n_word_chars"),
          col("n_punct"), col("n_stopwords_en"),
          when(col("n_words") >= 30 && col("n_stopwords_en") * 10L >= col("n_words"),
            lit("high"))
            .when(col("n_words") >= 10, lit("medium"))
            .otherwise(lit("low")).as("quality"))),

    // Two-phase on purpose: scores land as attributes before the
    // argmax CASE chain references them ~5× each — the collapsed form
    // re-evaluated the full tokenize+score subtree per reference
    // (measured 5.8s → ~0.3s at sf0.1).
    "q_lang_id" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"), col("lang"),
          TextOps.stopwordProfileScores(col("text")).as("sw_scores"),
          TextOps.trigramProfileScores(col("text")).as("tg_scores"))
        .select(
          col("doc_id"),
          TextOps.argmaxLabel(col("sw_scores"), TextOps.StopwordProfiles.map(_._1))
            .as("pred_lang"),
          TextOps.argmaxLabel(col("tg_scores"), TextOps.TrigramProfiles.map(_._1))
            .as("pred_lang_ngram"),
          col("lang").as("labeled_lang"))),

    // The synthetic corpus carries no real PII, so the query injects
    // deterministic doc_id-derived PII into every document on BOTH
    // engines first — the scrub regexes are then genuinely exercised
    // by the hash compare, not vacuously matched on untouched text.
    "q_pii_scrub" -> ((s, d) => {
      val aug = concat(
        coalesce(col("text"), lit("")),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com call +1-415-555-"),
        lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
        lit(" visit https://example.com/u/"), col("doc_id").cast("string"))
      Tables.documents(s, d).select(
        col("doc_id"),
        Redact.emailCount(aug).as("n_emails"),
        Redact.urlCount(aug).as("n_urls"),
        Redact.phoneCount(aug).as("n_phones"),
        Redact.scrub(aug).as("scrubbed"))
    }),

    // Hashed-BoW linear quality classifier (fastText model shape,
    // deterministic pseudo-weights — see graft.ops.Classifier).
    "q_quality_classifier" -> ((s, d) =>
      Classifier.score(Tables.documents(s, d), "doc_id", "text")),

    // Domain-level web curation: deterministic synthetic URLs (the
    // corpus has no url column — same injection discipline as
    // q_pii_scrub), blocklist anti-join, then per-domain stats with an
    // integer ppm corpus share.
    "q_web_domains" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val withUrl = docs.select(col("doc_id"), col("n_chars"), syntheticUrl.as("url"))
      val blocked = Seq("example-0.com", "example-3.org").toDF("domain")
      Web.domainStats(
        Web.filterBlockedDomains(withUrl, "url", blocked), "url", "n_chars")
    }),

    // Per-domain anti-concentration cap (keep ≤ 20 lowest doc_ids per
    // registered domain) over the same synthetic URL injection.
    "q_domain_cap" -> ((s, d) => {
      val withUrl = Tables.documents(s, d)
        .select(col("doc_id"), syntheticUrl.as("url"))
      Web.capPerDomain(withUrl, "url", "doc_id", 20)
        .select(col("doc_id"), col("domain"))
    }),

    // C4-style corpus-global line dedup over deterministic 12-word
    // lines (the corpus text has no newlines — injected with the same
    // discipline as q_pii_scrub; planted duplicate documents make the
    // shared lines real).
    "q_line_dedup" -> ((s, d) => {
      val ws = TextOps.words(col("text"))
      val lined = Tables.documents(s, d).select(col("doc_id"),
        when(size(ws) === 0, lit(""))
          .otherwise(array_join(
            transform(
              sequence(lit(0), floor((size(ws) + lit(11)) / lit(12.0)).cast("int") - 1),
              i => array_join(slice(ws, i * 12 + 1, lit(12)), " ")),
            "\n")).as("text"))
      Dedup.lineDedup(lined, "doc_id", "text")
    }),

    // Distributed BPE merge learning, 3 rounds (see graft.ops.Bpe).
    "q_bpe_merges" -> ((s, d) =>
      Bpe.learnMerges(Tables.documents(s, d), "text", 3)),

    // Tokenizer APPLY: learn 3 merges, then encode the corpus with
    // them and report the resulting token frequency spectrum. The
    // merge table rides into the encode plan as literals (3-row
    // head(), the same O(1)-row driver action learnMerges itself
    // uses per round).
    "q_bpe_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.learnMerges(docs, "text", 3)
        .orderBy(col("round")).head(3)
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.encodeTokens(docs, "text", merges)
    }),

    // Per-vector symmetric int8 quantization (4× embedding storage
    // compression), exploded to scalar rows for the hash compare
    // (see Embeddings.quantizeInt8 — wholly per-row arithmetic).
    "q_embed_quantize" -> ((s, d) =>
      Embeddings.quantizeInt8(Tables.embeddings(s, d), "vec_id", "embedding")
        .select(col("vec_id"), col("scale_fp"),
          posexplode(col("qvec")).as(Seq("pos", "q")))
        .select(col("vec_id"), col("scale_fp"),
          col("pos").cast("long").as("pos"), col("q"))),

    // χ² contingency grid: is language correlated with quality
    // bucket? Full a×b grid with exact integer evidence, one float
    // division per cell (see Profile.chiSquareCells).
    "q_chisq" -> ((s, d) =>
      Profile.chiSquareCells(
        Tables.documents(s, d).select(
          coalesce(col("lang"), lit("und")).as("lang"),
          TextOps.qualityBucket(col("text")).as("quality")),
        "lang", "quality")),

    // Distribution-drift monitor: the SAME χ² grid over (time period
    // × event type) — did the event-type mix shift between the
    // halves of the month? The monitoring read-out a pipeline runs
    // per ingest window; exact integer evidence, Σ chi_term is the
    // drift statistic.
    "q_drift_chisq" -> ((s, d) =>
      Profile.chiSquareCells(
        Tables.events(s, d).select(
          when(to_date(col("ts")) < lit("2024-01-16").cast("date"), "w1")
            .otherwise("w2").as("period"),
          col("event_type")),
        "period", "event_type")),

    // Top principal direction of the embedding cloud: 3 rounds of
    // quantized-integer power iteration (see graft.ops.Pca — exact
    // decimal sums, truncating renormalization, bit-stable).
    "q_pca_power" -> ((s, d) =>
      Pca.powerIterationTop(Tables.embeddings(s, d), "embedding", 3, 64)),

    // ANALYZE-style one-pass per-column statistics over a
    // deterministically-typed projection of orders (see
    // graft.ops.Profile).
    "q_stats_collect" -> ((s, d) => {
      val t = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").as("o_price_dec"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_date_str"))
      Profile.tableStats(t, t.columns.toSeq)
    }),

    "q_sample_hash" -> ((s, d) =>
      Sampling.hashSample(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", num = 1, den = 5)),

    // Quality-weighted subsample: longer (higher-weight) docs survive
    // at proportionally higher rates; max-weight docs at 1/2.
    "q_sample_weighted" -> ((s, d) =>
      Sampling.weightedHashSample(
        Tables.documents(s, d).select(
          col("doc_id"), TextOps.wordCount(col("text")).as("w")),
        "doc_id", "w", num = 1, den = 2)),

    "q_sample_stratified" -> ((s, d) =>
      Sampling.stratifiedHashSample(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        rates = Map("de" -> (1, 2), "es" -> (1, 4)),
        defaultRate = (1, 10))),

    "q_rep_signals" -> ((s, d) =>
      RepSignals.repetitionSignals(Tables.documents(s, d), "doc_id", "text")),

    // DSIR-flavored importance scores for data selection: per-doc sum
    // of integer log-likelihood ratios (bit-length ilog2 — no float
    // log) between a target source slice and the raw corpus; corpus
    // tokenized once, vocabulary-sized ratio join (see
    // CorpusFilters.dsirScores).
    "q_dsir_scores" -> ((s, d) =>
      CorpusFilters.dsirScores(Tables.documents(s, d), "doc_id", "text",
        col("source").isin("src0", "src1", "src2", "src3"))),

    "q_length_band" -> ((s, d) =>
      CorpusFilters.lengthPercentileBand(
        Tables.documents(s, d), "doc_id", "text")),

    "q_text_normalize" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextOps.normalize(col("text")).as("norm_text"),
        md5(TextOps.normalize(col("text")).cast("binary")).as("norm_digest"))),

    // Benchmark decontamination: doc_id % 97 == 0 plays the eval set;
    // every other doc reports its distinct-shingle overlap with it.
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Contamination.contaminationReport(
        docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0L),
        docs.filter(pmod(col("doc_id"), lit(97L)) === 0L),
        "doc_id", "text")
    }),

    "q_passage_dedup" -> ((s, d) =>
      Dedup.passageDupStats(Tables.documents(s, d), "doc_id", "text")),

    // ExactSubstr-style duplicated spans: content-defined md5-nibble
    // anchors over 30-char windows, digests seen in ≥2 docs, merged
    // into maximal per-doc [start, end) islands (see SubstrDedup).
    "q_substr_spans" -> ((s, d) =>
      SubstrDedup.dupSpans(Tables.documents(s, d), "doc_id", "text", k = 30)),

    // Per-document duplicated-substring load from the same anchors:
    // span count, covered chars, witnessing anchors.
    "q_substr_dedup" -> ((s, d) =>
      SubstrDedup.dupStats(Tables.documents(s, d), "doc_id", "text", k = 30)),

    // The removal step: every document with its duplicated spans cut
    // out (docs without spans pass through untouched).
    "q_substr_scrub" -> ((s, d) =>
      SubstrDedup.scrubSpans(Tables.documents(s, d), "doc_id", "text", k = 30)),

    "q_ngram_counts" -> ((s, d) =>
      Relevance.ngramTopK(Tables.documents(s, d), "text", n = 2, k = 50)),

    // Bigram collocations by LIFT (the engine-portable PMI reading:
    // exact counts, one closing division, no cross-engine log) — see
    // graft.ops.Relevance.collocations.
    "q_collocations" -> ((s, d) =>
      Relevance.collocations(Tables.documents(s, d), "text", minCount = 10L)),

    "q_entropy" -> ((s, d) =>
      Relevance.tokenEntropy(Tables.documents(s, d), "doc_id", "text")),

    "q_lm_score" -> ((s, d) =>
      Relevance.lmScore(Tables.documents(s, d), "doc_id", "text")),

    "q_tfidf" -> ((s, d) =>
      Relevance.tfIdfTopK(Tables.documents(s, d), "doc_id", "text", k = 3)),

    "q_vocab_topk" -> ((s, d) =>
      Relevance.vocabulary(Tables.documents(s, d), "doc_id", "text", k = 50)),

    "q_freq_spectrum" -> ((s, d) =>
      Relevance.frequencySpectrum(Tables.documents(s, d), "doc_id", "text")),

    // Inverted-index build: df + bounded posting-list heads per term
    // via the TopKRows aggregator (min-k ids, map-side combine — no
    // unbounded collect_list through the shuffle).
    "q_posting_lists" -> ((s, d) =>
      Relevance.postingLists(Tables.documents(s, d), "doc_id", "text", headK = 8)),

    "q_bm25" -> ((s, d) =>
      Relevance.bm25(Tables.documents(s, d), "doc_id", "text", Bm25Query)),

    "q_token_count" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextOps.wordCount(col("text")).as("n_ws_tokens"),
        TextOps.regexTokenCount(col("text")).as("n_re_tokens"),
        TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens"))),

    // Top-20 RAKE keywords over the corpus: stopword/punctuation
    // phrase spans, fixed-point deg/freq word scores, exact integer
    // phrase scores — ranking hash-verifies cross-engine.
    "q_rake" -> ((s, d) =>
      graft.ops.Rake.keywords(Tables.documents(s, d), "text", topK = 20)),

    // Flesch reading-ease per document from exact integer counts:
    // whitespace words, regex sentence segments, vowel-group
    // syllables — one codegen'd pass, one closing double expression.
    "q_readability" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextOps.wordCount(col("text")).as("n_words"),
        TextOps.sentenceCount(col("text")).as("n_sents"),
        TextOps.vowelGroupCount(col("text")).as("n_syll"))
        .withColumn("flesch", expr(TextOps.FleschExpr))),

    // Corpus token-budget report — the "how many tokens do I actually
    // have, and where" rollup every training-mix decision starts from:
    // per source, docs, whitespace tokens, BPE-ish tokens, and the
    // integer-ppm share of the corpus token mass. One column-pruned
    // pass, the total arrives by 1-row broadcast.
    "q_token_budget" -> ((s, d) => {
      val per = Tables.documents(s, d).select(
        col("source"),
        TextOps.wordCount(col("text")).as("nt"),
        TextOps.bpeTokenCount(coalesce(col("text"), lit(""))).as("nb"))
      val tot = per.agg(sum(col("nt")).as("__tot"))
      per.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
          sum(col("nb")).as("n_bpe_tokens"))
        .crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_bpe_tokens"),
          expr("n_tokens * 1000000 div __tot").as("token_share_ppm"))
    }),

    // End-to-end curation in ONE pass: every per-doc signal (token
    // count, quality bucket, normalized digest) is a narrow
    // single-pass projection, normalized-dedup is one window min on
    // the digest, and the quality gate is a filter — the whole
    // pipeline is a single exchange over the corpus. Integration
    // evidence that the curation ops COMPOSE without extra scans.
    "q_curate" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, d)
        .select(
          col("doc_id"), col("source"),
          TextOps.wordCount(col("text")).as("n_tokens"),
          TextOps.qualityBucket(col("text")).as("quality"),
          md5(TextOps.normalize(col("text")).cast("binary")).as("nd"))
        .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(col("nd"))))
        .filter(col("doc_id") === col("keeper") && col("quality") =!= "low")
        .select(col("doc_id"), col("source"), col("n_tokens"), col("quality"))
    }),

    // Target-mixture rebalancing over the source column (weights
    // cycle 1..4): deterministic downsample-only mixing, thresholds
    // derived in-plan and broadcast back (see Sampling.mixToTarget).
    "q_mix_sources" -> ((s, d) =>
      Sampling.mixToTarget(Tables.documents(s, d), "doc_id", "source",
        MixWeights.toMap)
        .select(col("doc_id"), col("source"))),

    // Temperature flattening at α=1/2 (√-proportional domain mass,
    // smallest domain kept whole) — deterministic because IEEE sqrt
    // and division are exactly rounded (see Sampling.temperatureMixSqrt).
    "q_mix_temperature" -> ((s, d) =>
      Sampling.temperatureMixSqrt(Tables.documents(s, d), "doc_id", "source")
        .select(col("doc_id"), col("source"))),

    // Quality-aware dedup keeper: per near-dup cluster keep the doc
    // maximizing (word count, then lowest id) instead of blindly the
    // lowest id — the "keep the best copy" form of q_dedup_clusters.
    "q_dedup_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Clusters.dedupClustersKeepBest(docs, "doc_id",
        TextOps.wordCount(col("text")),
        Dedup.minHashLshPairs(docs, "doc_id", "text"), "doc_id_a", "doc_id_b")
    }),

    // Count-min heavy hitters: a 4×32 mergeable sketch over the word
    // stream + the exact top-20 twin IN the same query — fixed affine
    // hashes make sketch contents and collision noise bit-replicable,
    // so this sketch is fully hash-verified cross-engine (unlike
    // HLL/KLL whose internals are engine-private).
    "q_cms_topk" -> ((s, d) => {
      import graft.functions.CmsSketch
      val W = 32
      val D = 4
      val toks = Tables.documents(s, d)
        .select(explode(TextOps.words(col("text"))).as("w"))
        .select(col("w"), TextOps.wordHash(col("w")).as("v"))
      val sketch = toks.agg(CmsSketch.cmsSketch(W, D)(col("v")).as("sk"))
      val cand = toks.groupBy(col("w"))
        .agg(count(lit(1)).as("c"), first(col("v")).as("v"))
        .orderBy(col("c").desc, col("w")).limit(20)
      val ests = (0 until D).map { r =>
        val (a, b) = CmsSketch.RowAB(r)
        element_at(col("sk"),
          (lit(r * W) +
            (lit(a) * pmod(col("v"), lit(CmsSketch.P)) + lit(b)) % lit(CmsSketch.P)
              % lit(W.toLong)).cast("int") + 1)
      }
      cand.crossJoin(broadcast(sketch))
        .select(col("w").as("word"), col("c").as("n_exact"),
          least(ests: _*).as("n_est"))
    }),

    // GPT-style sequence packing: per-bucket token-stream concat,
    // split at 512-token boundaries (see graft.ops.Packing).
    "q_pack_sequences" -> ((s, d) =>
      Packing.packSequences(Tables.documents(s, d), "doc_id", "text")),

    // Sliding 50-token windows at stride 30 with a coverage-clamped
    // final chunk — LLM context prep; shuffle-free Generate chain
    // (see graft.ops.Chunking).
    "q_doc_chunks" -> ((s, d) =>
      Chunking.tokenWindows(Tables.documents(s, d), "doc_id", "text")),

    "q_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))),

    "q_multimodal_meta" -> ((s, d) => {
      val m = Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text")
      m.select(
        col("media_id"),
        col("meta.format").as("format"),
        col("meta.n_bytes").as("n_bytes"),
        sha2(col("payload"), 256).as("digest"))
    }),

    // Decode pipeline end-to-end (binary payload → per-partition batch
    // decode → typed features). The decode stub is deterministic in the
    // payload bytes, so the oracle replicates it — float arithmetic is
    // done in FLOAT on both engines, then widened to double (exact).
    // Feature components are emitted as scalar columns: the compare
    // canonicalizes scalars, not nested lists.
    "q_multimodal_decode" -> ((s, d) => {
      val m = Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text")
      val dec = Multimodal.decodeFeatures(s, m)
      val featureCols = (0 until 8).map(i =>
        element_at(col("feature"), i + 1).cast("double").as(s"f$i"))
      dec.select(Seq(
        col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_bytes")) ++ featureCols: _*)
    }),

    // Perceptual image fingerprint (64-bit aHash as two unsigned
    // halves): REAL integer-luma grid hash for image payloads, the
    // byte-cell stub for text — the image near-dup key; pairs compose
    // with the SimHash banding machinery (see
    // Multimodal.perceptualHash).
    "q_image_phash" -> ((s, d) =>
      Multimodal.perceptualHash(s,
        Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text"))),

    // Image near-dup PAIRS on the perceptual hash: pigeonhole 16-bit
    // bands (exact recall to Hamming 3) + popcount verify — the
    // multimodal twin of q_simhash_pairs.
    "q_phash_pairs" -> ((s, d) => {
      val ph = Multimodal.perceptualHash(s,
        Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text"))
      Dedup.hammingPairs64(ph, "media_id", "ahash_lo", "ahash_hi",
        maxDist = 3)
        .select(col("id_a").as("media_id_a"),
          col("id_b").as("media_id_b"), col("dist"))
    }),

    // ... and the duplicate-image CLUSTERS those pairs induce
    // (connected components, lowest-id canonical keeper).
    "q_phash_clusters" -> ((s, d) => {
      val ph = Multimodal.perceptualHash(s,
        Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text"))
      val pairs = Dedup.hammingPairs64(ph, "media_id", "ahash_lo",
        "ahash_hi", maxDist = 3)
      graft.ops.Clusters.dedupClusters(ph, "media_id", pairs,
        "id_a", "id_b")
    }),

    // Frame-sampling pipeline: one row per sampled frame slice, the
    // explode shape a video pipeline needs; same oracle discipline.
    "q_multimodal_frames" -> ((s, d) => {
      val m = Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text")
      val fr = Multimodal.sampleFrames(s, m)
      val featureCols = (0 until 8).map(i =>
        element_at(col("frame_feature"), i + 1).cast("double").as(s"f$i"))
      fr.select(Seq(
        col("media_id"),
        col("frame_idx").cast("long").as("frame_idx")) ++ featureCols: _*)
    }),

    // Audio pipeline: real PCM WAV payloads decode through
    // javax.sound.sampled into (rate, channels, frames) + an 8-window
    // RMS loudness envelope; the text corpus takes the deterministic
    // stub the oracle replicates. Same batched per-partition shape as
    // the image decode.
    "q_multimodal_audio" -> ((s, d) => {
      val m = Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text")
      val au = Multimodal.decodeAudio(s, m)
      val featureCols = (0 until 8).map(i =>
        element_at(col("loudness"), i + 1).cast("double").as(s"f$i"))
      au.select(Seq(
        col("media_id"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("channels").cast("long").as("channels"),
        col("n_samples")) ++ featureCols: _*)
    }),

    // Clip segmentation: one row per fixed-size span with its RMS —
    // the audio mirror of q_multimodal_frames' explode shape.
    "q_multimodal_clips" -> ((s, d) => {
      val m = Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text")
      Multimodal.sampleClips(s, m)
        .select(
          col("media_id"),
          col("clip_idx").cast("long").as("clip_idx"),
          col("n_samples"),
          col("rms").cast("double").as("rms"))
    }),

    // Resize pipeline: bounded thumb payload regardless of input size.
    // The stride stub is deterministic (integer stride, 0-based byte
    // picks), so the oracle replicates the exact arithmetic; the thumb
    // is compared as its ASCII text plus its byte count.
    "q_multimodal_resize" -> ((s, d) => {
      val m = Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text")
      val rs = Multimodal.resize(s, m, targetW = 16, targetH = 16)
      rs.select(
        col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        octet_length(col("thumb")).cast("long").as("n_thumb"),
        col("thumb").cast("string").as("thumb_text"))
    })
  )

  /** Mixture weights for q_mix_sources, shared by query and oracle. */
  private val MixWeights: Seq[(String, Long)] =
    (0 until 20).map(i => s"src$i" -> ((i % 4) + 1).toLong)

  /** Deterministic synthetic URL for the web-curation queries (the
    * corpus has no url column — injected like q_pii_scrub's PII).
    */
  private def syntheticUrl: org.apache.spark.sql.Column = concat(
    lit("https://"), coalesce(col("source"), lit("x")),
    pmod(col("doc_id"), lit(23L)).cast("string"),
    lit(".example-"), pmod(col("doc_id"), lit(7L)).cast("string"), lit("."),
    when(pmod(col("doc_id"), lit(3L)) === 0L, "com")
      .when(pmod(col("doc_id"), lit(3L)) === 1L, "org").otherwise("net"),
    lit("/"), coalesce(col("lang"), lit("und")),
    lit("/"), col("doc_id").cast("string"))

  /** DuckDB twin of [[syntheticUrl]] + registered-domain extraction. */
  private val urlDomainSql: String =
    """u AS (SELECT doc_id, n_chars,
           'https://' || COALESCE(source, 'x') || CAST(doc_id % 23 AS VARCHAR)
             || '.example-' || CAST(doc_id % 7 AS VARCHAR) || '.'
             || (CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END)
             || '/' || COALESCE(lang, 'und') || '/' || CAST(doc_id AS VARCHAR) AS url
           FROM documents),
         d AS (SELECT doc_id, n_chars, sp[-2] || '.' || sp[-1] AS domain
               FROM (SELECT doc_id, n_chars,
                       string_split(lower(split_part(url, '/', 3)), '.') sp FROM u))"""

  // --- oracle SQL (shared fragments + generated long forms) -----------

  /** Whitespace tokens, empties dropped. */
  private val ws = "list_filter(string_split(COALESCE(text, ''), ' '), w -> w <> '')"

  /** Portable word hash (mirrors TextOps.wordHash), BIGINT. */
  private def wh(w: String): String =
    s"(length($w)*10007 + ord(substr($w,1,1))*101 + ord(substr($w,-1,1)))"

  private val shingleStrings =
    "list_distinct(list_transform(range(1, len(ws)-1), " +
      "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))"

  private val shingleHashes =
    s"list_distinct(list_transform(range(1, len(ws)-1), " +
      s"i -> ((${wh("ws[i]")}*31 + ${wh("ws[i+1]")})*31 + ${wh("ws[i+2]")}) % 2147483647))"

  private val toksBase =
    s"""toks AS (SELECT doc_id, $ws AS ws FROM documents),
        base AS (SELECT doc_id, ws FROM toks WHERE len(ws) >= 3)"""

  /** Replicates jaccardPairs' DEFAULT path including the posting-list
    * cut: shingles with df > DefaultMaxShingleDf leave the universe,
    * and per-doc set sizes are recomputed over the survivors (at the
    * test SFs no shingle reaches the cut, but the oracle must encode
    * the same semantics at ANY scale, not just coincide at this one).
    */
  private def jaccardSql: String =
    s"""WITH $toksBase,
        sh AS (SELECT doc_id, $shingleStrings AS ss FROM base),
        ex AS MATERIALIZED (SELECT doc_id, unnest(ss) AS s FROM sh),
        kept AS MATERIALIZED (SELECT doc_id, s FROM ex
                 WHERE s IN (SELECT s FROM ex GROUP BY s
                             HAVING count(*) <= ${Dedup.DefaultMaxShingleDf})),
        sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
        pairs AS (SELECT a.doc_id ida, b.doc_id idb, count(*) AS shared
                  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        sized AS (SELECT p.ida, p.idb, p.shared, sa.n na, sb.n nb FROM pairs p
                  JOIN sizes sa ON sa.doc_id = p.ida
                  JOIN sizes sb ON sb.doc_id = p.idb)
        SELECT ida AS doc_id_a, idb AS doc_id_b FROM sized
        WHERE 2*shared >= (na + nb - shared)"""

  /** jaccardSql's pipeline with the asymmetric containment test
    * (den·shared ≥ num·min(na,nb)) and the evidence columns kept.
    */
  private def containmentSql: String =
    s"""WITH $toksBase,
        sh AS (SELECT doc_id, $shingleStrings AS ss FROM base),
        ex AS MATERIALIZED (SELECT doc_id, unnest(ss) AS s FROM sh),
        kept AS MATERIALIZED (SELECT doc_id, s FROM ex
                 WHERE s IN (SELECT s FROM ex GROUP BY s
                             HAVING count(*) <= ${Dedup.DefaultMaxShingleDf})),
        sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
        pairs AS (SELECT a.doc_id ida, b.doc_id idb, count(*) AS shared
                  FROM kept a JOIN kept b
                    ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        sized AS (SELECT p.ida, p.idb, p.shared, sa.n na, sb.n nb
                  FROM pairs p
                  JOIN sizes sa ON sa.doc_id = p.ida
                  JOIN sizes sb ON sb.doc_id = p.idb)
        SELECT ida AS doc_id_a, idb AS doc_id_b,
          CAST(shared AS BIGINT) AS shared,
          CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb
        FROM sized WHERE 5*shared >= 3*least(na, nb)"""

  /** `candFilter`: extra AND-condition on the LSH candidate pairs —
    * used by the incremental variant to keep only batch-involving
    * pairs.
    */
  private def minhashSql(candFilter: String = ""): String = {
    val sigTerms = Dedup.MinHashAB.map { case (a, b) =>
      s"list_aggregate(list_transform(hs, " +
        s"h -> ($a*CAST(h AS BIGINT) + $b) % ${Dedup.MinHashP}), 'min')"
    }.mkString("[", ",\n          ", "]")
    val bandRows = (0 until Dedup.Bands).map { b =>
      val key = (1 to Dedup.RowsPerBand)
        .map(r => s"CAST(sig[${b * Dedup.RowsPerBand + r}] AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band, $key AS bkey FROM sig"
    }.mkString("\n          UNION ALL ")
    s"""WITH $toksBase,
        sh AS MATERIALIZED (SELECT doc_id, $shingleHashes AS hs FROM base),
        sig AS MATERIALIZED (SELECT doc_id, $sigTerms AS sig FROM sh),
        bands AS MATERIALIZED ($bandRows),
        cand AS (SELECT DISTINCT a.doc_id ida, b.doc_id idb FROM bands a
                 JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                   AND a.doc_id < b.doc_id $candFilter),
        ver AS (SELECT ida, idb,
                  len(list_intersect(sa.hs, sb.hs)) AS shared,
                  len(sa.hs) AS na, len(sb.hs) AS nb
                FROM cand JOIN sh sa ON sa.doc_id = ida JOIN sh sb ON sb.doc_id = idb)
        SELECT ida AS doc_id_a, idb AS doc_id_b FROM ver
        WHERE 2*shared >= (na + nb - shared)"""
  }

  /** b-bit minwise twin: the minhashSql signature pipeline, lowest
    * bit of each of the 16 minhashes packed into one integer,
    * agreement = 16 − popcount(xor), estimator token-shared via
    * [[graft.ops.Dedup.BbitEstExpr]].
    */
  private def bbitSql: String = {
    val sigTerms = Dedup.MinHashAB.map { case (a, b) =>
      s"list_aggregate(list_transform(hs, " +
        s"h -> ($a*CAST(h AS BIGINT) + $b) % ${Dedup.MinHashP}), 'min')"
    }.mkString("[", ",\n          ", "]")
    val bandRows = (0 until Dedup.Bands).map { b =>
      val key = (1 to Dedup.RowsPerBand)
        .map(r => s"CAST(sig[${b * Dedup.RowsPerBand + r}] AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band, $key AS bkey FROM sig"
    }.mkString("\n          UNION ALL ")
    val bitsSum = Dedup.MinHashAB.indices
      .map(j => s"(sig[${j + 1}] % 2) * ${1L << j}")
      .mkString(" + ")
    s"""WITH $toksBase,
        sh AS MATERIALIZED (SELECT doc_id, $shingleHashes AS hs FROM base),
        sig AS MATERIALIZED (SELECT doc_id, $sigTerms AS sig FROM sh),
        bits AS MATERIALIZED (SELECT doc_id, $bitsSum AS bits FROM sig),
        bands AS MATERIALIZED ($bandRows),
        cand AS (SELECT DISTINCT a.doc_id ida, b.doc_id idb FROM bands a
                 JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                   AND a.doc_id < b.doc_id),
        m AS (SELECT ida, idb,
                CAST(16 - bit_count(xor(ba.bits, bb.bits)) AS BIGINT)
                  AS n_match
              FROM cand JOIN bits ba ON ba.doc_id = ida
                        JOIN bits bb ON bb.doc_id = idb)
        SELECT ida AS doc_id_a, idb AS doc_id_b, n_match,
          ${Dedup.BbitEstExpr} AS resemblance_est
        FROM m"""
  }

  private def simhashSql: String = {
    val bits = (0 until 32).map { b =>
      s"(CASE WHEN list_sum(list_transform(ws, w -> ((${wh("w")} >> $b) & 1)*2 - 1)) > 0 " +
        s"THEN (CAST(1 AS BIGINT) << $b) ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, $ws AS ws FROM documents),
        sh AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM toks)
        SELECT doc_id, simhash, simhash >> 16 AS simhash_bucket FROM sh"""
  }

  /** Pigeonhole-banded Hamming-pair twin: same 4×8-bit band keys, same
    * popcount verify, DISTINCT for multi-band agreements.
    */
  private def simhashPairsSql: String = {
    val bits = (0 until 32).map { b =>
      s"(CASE WHEN list_sum(list_transform(ws, w -> ((${wh("w")} >> $b) & 1)*2 - 1)) > 0 " +
        s"THEN (CAST(1 AS BIGINT) << $b) ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, $ws AS ws FROM documents),
        sh AS (SELECT doc_id, CAST($bits AS BIGINT) AS sh FROM toks),
        bands AS (SELECT doc_id, sh, b, (sh >> (8*b)) & 255 AS key
                  FROM sh, (VALUES (0), (1), (2), (3)) t(b)),
        cand AS (SELECT DISTINCT a.doc_id ida, b.doc_id idb, a.sh sa, b.sh sb
                 FROM bands a JOIN bands b
                 ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
        SELECT ida AS doc_id_a, idb AS doc_id_b,
               CAST(bit_count(xor(sa, sb)) AS BIGINT) AS dist
        FROM cand WHERE bit_count(xor(sa, sb)) <= 3"""
  }

  /** Shared 3-round unrolled BPE CTE chain (see graft.ops.Bpe):
    * vocab-weighted adjacent-pair counts, deterministic (n DESC, pair)
    * argmax, and the sentinel-string replace merge — Java and DuckDB
    * `replace` share left-to-right non-rescanning continuation, so the
    * greedy merge is bit-identical. Ends at `s3`, the vocab with all
    * three merges applied; `b1..b3` hold the chosen merges.
    */
  private def bpeCtes: String = {
    def pairsOf(s: String, p: String, c: String, b: String) =
      s"""$p AS (SELECT wc, unnest(list_transform(range(1, len(sym)),
             i -> sym[i] || ' ' || sym[i+1])) AS pair
           FROM (SELECT wc, string_split(trim(seq), ' ') AS sym FROM $s)),
          $c AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM $p GROUP BY 1),
          $b AS (SELECT pair, n FROM $c ORDER BY n DESC, pair LIMIT 1)"""
    def mergeStep(prev: String, b: String, next: String) =
      s"""$next AS (SELECT wc, replace(seq,
            ' ' || (SELECT pair FROM $b) || ' ',
            ' ' || replace((SELECT pair FROM $b), ' ', '') || ' ') AS seq
          FROM $prev)"""
    s"""w0 AS (SELECT unnest($ws) AS w FROM documents),
        v AS (SELECT w, count(*) AS wc FROM w0 GROUP BY 1),
        s0 AS (SELECT wc, ' ' || array_to_string(list_transform(range(1, length(w)+1),
                 i -> substr(w, i, 1)), ' ') || ' ' AS seq FROM v),
        ${pairsOf("s0", "p1", "c1", "b1")},
        ${mergeStep("s0", "b1", "s1")},
        ${pairsOf("s1", "p2", "c2", "b2")},
        ${mergeStep("s1", "b2", "s2")},
        ${pairsOf("s2", "p3", "c3", "b3")},
        ${mergeStep("s2", "b3", "s3")}"""
  }

  private def bpeMergesSql: String = {
    def out(r: Int, b: String) =
      s"""SELECT CAST($r AS BIGINT) AS round,
          string_split(pair, ' ')[1] AS lhs, string_split(pair, ' ')[2] AS rhs,
          replace(pair, ' ', '') AS merged, n AS n_occurrences FROM $b"""
    s"""WITH $bpeCtes
        ${out(1, "b1")} UNION ALL ${out(2, "b2")} UNION ALL ${out(3, "b3")}"""
  }

  /** Token spectrum after the three learned merges are applied. */
  private def bpeEncodeSql: String =
    s"""WITH $bpeCtes
        SELECT sym AS token, CAST(sum(wc) AS BIGINT) AS n_occurrences
        FROM (SELECT wc, unnest(string_split(trim(seq), ' ')) AS sym FROM s3)
        WHERE sym <> '' GROUP BY 1"""

  /** Full-grid χ² twin of [[graft.ops.Profile.chiSquareCells]] over
    * lang × quality bucket: HUGEINT squared numerator, one double
    * division per cell.
    */
  private def chiSqSql: String =
    s"""WITH s AS (SELECT COALESCE(lang, 'und') AS a,
           CASE WHEN len($ws) >= 30
                 AND len(list_filter($ws, w -> w IN ($stopEn)))*10 >= len($ws)
                THEN 'high'
                WHEN len($ws) >= 10 THEN 'medium' ELSE 'low' END AS b
         FROM documents),
        cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS obs
                  FROM s GROUP BY 1, 2),
        r AS (SELECT a, CAST(sum(obs) AS BIGINT) AS row_total
              FROM cells GROUP BY 1),
        c AS (SELECT b, CAST(sum(obs) AS BIGINT) AS col_total
              FROM cells GROUP BY 1),
        t AS (SELECT CAST(sum(obs) AS BIGINT) AS n_total FROM cells)
       SELECT r.a AS a, c.b AS b,
         CAST(COALESCE(obs, 0) AS BIGINT) AS obs,
         row_total, col_total, n_total,
         CAST(CAST(n_total*COALESCE(obs, 0) - row_total*col_total AS HUGEINT)
              * (n_total*COALESCE(obs, 0) - row_total*col_total) AS DOUBLE)
           / CAST(n_total*row_total*col_total AS DOUBLE) AS chi_term
       FROM r CROSS JOIN c CROSS JOIN t
       LEFT JOIN cells ON cells.a = r.a AND cells.b = c.b"""

  /** chiSqSql's grid over (month-half period × event type). */
  private def driftChiSqSql: String =
    s"""WITH s AS (SELECT
           CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                THEN 'w1' ELSE 'w2' END AS a,
           event_type AS b
         FROM events),
        cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS obs
                  FROM s GROUP BY 1, 2),
        r AS (SELECT a, CAST(sum(obs) AS BIGINT) AS row_total
              FROM cells GROUP BY 1),
        c AS (SELECT b, CAST(sum(obs) AS BIGINT) AS col_total
              FROM cells GROUP BY 1),
        t AS (SELECT CAST(sum(obs) AS BIGINT) AS n_total FROM cells)
       SELECT r.a AS a, c.b AS b,
         CAST(COALESCE(obs, 0) AS BIGINT) AS obs,
         row_total, col_total, n_total,
         CAST(CAST(n_total*COALESCE(obs, 0) - row_total*col_total AS HUGEINT)
              * (n_total*COALESCE(obs, 0) - row_total*col_total) AS DOUBLE)
           / CAST(n_total*row_total*col_total AS DOUBLE) AS chi_term
       FROM r CROSS JOIN c CROSS JOIN t
       LEFT JOIN cells ON cells.a = r.a AND cells.b = c.b"""

  /** 3-round unrolled quantized power-iteration twin of
    * [[graft.ops.Pca.powerIterationTop]]: BIGINT per-row dots,
    * HUGEINT component sums, truncating `//` renormalization by the
    * max |component| — each step exactly the engine's arithmetic.
    */
  private def pcaPowerSql: String = {
    val dim = 64
    def round(r: Int, prevVl: String) =
      s"""u$r AS (SELECT t.k - 1 AS k,
             CAST(sum(rr.d * rr.xq[t.k]) AS HUGEINT) AS u
           FROM (SELECT xq,
                   CAST(list_sum(list_transform(range(1, ${dim + 1}),
                     i -> xq[i] * vl[i])) AS BIGINT) AS d
                 FROM rows, $prevVl) rr,
                range(1, ${dim + 1}) t(k)
           GROUP BY 1),
          m$r AS (SELECT max(abs(u)) AS mx FROM u$r),
          v$r AS (SELECT k, CAST((u * 1048576) // mx AS BIGINT) AS vq
                  FROM u$r, m$r),
          vl$r AS (SELECT list(vq ORDER BY k) AS vl FROM v$r)"""
    s"""WITH rows AS (SELECT list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS xq
           FROM embeddings),
        vl0 AS (SELECT list_transform(range(1, ${dim + 1}),
             i -> CAST(1048576 AS BIGINT)) AS vl),
        ${round(1, "vl0")},
        ${round(2, "vl1")},
        ${round(3, "vl2")}
        SELECT k, vq FROM v3"""
  }

  /** Per-column UNION ALL twin of [[graft.ops.Profile.tableStats]]
    * over the deterministically-typed orders projection.
    */
  private def statsSql: String = {
    val proj =
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
           CAST(o_totalprice AS DECIMAL(18,2)) AS o_price_dec,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date_str
         FROM orders"""
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "o_price_dec", "o_date_str")
    val perCol = cols.map { c =>
      s"""SELECT '$c' AS column_name,
            CAST(count(*) AS BIGINT) AS n_rows,
            CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
            CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
            CAST(min($c) AS VARCHAR) AS min_str,
            CAST(max($c) AS VARCHAR) AS max_str,
            CAST(sum(COALESCE(length(CAST($c AS VARCHAR)), 0)) AS BIGINT)
              AS total_strlen
          FROM t"""
    }.mkString(" UNION ALL ")
    s"WITH t AS ($proj) $perCol"
  }

  private def annSql: String = {
    val dot = (1 to 64)
      .map(i => s"CAST(qv[$i] AS DOUBLE)*CAST(nv[$i] AS DOUBLE)").mkString(" + ")
    val qn = (1 to 64)
      .map(i => s"CAST(qv[$i] AS DOUBLE)*CAST(qv[$i] AS DOUBLE)").mkString(" + ")
    val nn = (1 to 64)
      .map(i => s"CAST(nv[$i] AS DOUBLE)*CAST(nv[$i] AS DOUBLE)").mkString(" + ")
    s"""WITH q AS (SELECT vec_id qid, embedding qv FROM embeddings WHERE vec_id < 10),
        c AS (SELECT vec_id nid, embedding nv FROM embeddings),
        s AS (SELECT qid, nid, ($dot) / (sqrt($qn) * sqrt($nn)) AS cos
              FROM c, q WHERE nid <> qid)
        SELECT qid, nid, CAST(rn AS BIGINT) AS rank FROM
          (SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) rn FROM s) t
        WHERE rn <= 5"""
  }

  /** 1-NN confusion matrix over the disjoint test/train id split —
    * annSql's scorer with k = 1 plus the two label joins.
    */
  private def knnClassifySql: String = {
    val dot = (1 to 64)
      .map(i => s"CAST(qv[$i] AS DOUBLE)*CAST(nv[$i] AS DOUBLE)").mkString(" + ")
    val qn = (1 to 64)
      .map(i => s"CAST(qv[$i] AS DOUBLE)*CAST(qv[$i] AS DOUBLE)").mkString(" + ")
    val nn = (1 to 64)
      .map(i => s"CAST(nv[$i] AS DOUBLE)*CAST(nv[$i] AS DOUBLE)").mkString(" + ")
    s"""WITH q AS (SELECT vec_id qid, embedding qv FROM embeddings
                   WHERE vec_id < 50),
        c AS (SELECT vec_id nid, embedding nv FROM embeddings
              WHERE vec_id >= 50),
        s AS (SELECT qid, nid, ($dot) / (sqrt($qn) * sqrt($nn)) AS cos
              FROM c, q),
        r AS (SELECT qid, nid, ROW_NUMBER() OVER (
                PARTITION BY qid ORDER BY cos DESC, nid) rn FROM s),
        nn AS (SELECT qid, nid FROM r WHERE rn <= 1),
        j AS (SELECT CAST(a.label AS BIGINT) AS label_true,
                     CAST(b.label AS BIGINT) AS label_pred
              FROM nn JOIN embeddings a ON a.vec_id = nn.qid
                      JOIN embeddings b ON b.vec_id = nn.nid)
        SELECT label_true, label_pred, CAST(count(*) AS BIGINT) AS n
        FROM j GROUP BY 1, 2"""
  }

  /** LSH candidate CTEs for a set of (nPlanes, probeBits) settings:
    * each candidate set is (qid, nid, cos) pairs whose buckets differ
    * in ≤ probeBits sign bits — the exact candidate set of
    * `Similarity.lshCandidates`. The ~25 KB unrolled hyperplane
    * expression is emitted ONCE per distinct plane count (a shared
    * bucketed-embeddings CTE feeds both join sides and every setting
    * at that count), and each candidate set is MATERIALIZED — the
    * recall/path-pick oracles read each set twice (top-k and count),
    * and re-inlining the full join per read stacked the checker's
    * allocator (the r8 driver OOM'd on exactly these rows). Same
    * join predicate, same left-to-right cos fold → identical doubles.
    * Returns (cteBlock, settingName) where the block has NO trailing
    * comma and settingName(np, pb) is the candidate CTE's name.
    */
  private def annLshCandCtes(
      settings: Seq[(Int, Int)]): (String, (Int, Int) => String) = {
    val dot = (1 to 64)
      .map(i => s"CAST(q.v[$i] AS DOUBLE)*CAST(c.v[$i] AS DOUBLE)").mkString(" + ")
    val qn = (1 to 64)
      .map(i => s"CAST(q.v[$i] AS DOUBLE)*CAST(q.v[$i] AS DOUBLE)").mkString(" + ")
    val nn = (1 to 64)
      .map(i => s"CAST(c.v[$i] AS DOUBLE)*CAST(c.v[$i] AS DOUBLE)").mkString(" + ")
    val embCtes = settings.map(_._1).distinct.sorted.map { np =>
      val bucket = graft.functions.VectorExpressions.bucketSql("embedding", np, 64)
      s"""emb$np AS MATERIALIZED (
            SELECT vec_id id, embedding v, $bucket AS bk FROM embeddings)"""
    }
    def cand(np: Int, pb: Int) = s"cand_${np}_$pb"
    val candCtes = settings.map { case (np, pb) =>
      s"""${cand(np, pb)} AS MATERIALIZED (
            SELECT q.id qid, c.id nid, ($dot) / (sqrt($qn) * sqrt($nn)) AS cos
            FROM emb$np c JOIN emb$np q
              ON q.id < 10 AND bit_count(xor(q.bk, c.bk)) <= $pb
                 AND c.id <> q.id)"""
    }
    ((embCtes ++ candCtes).mkString(",\n        "), cand)
  }

  private def annLshSql: String = {
    val (ctes, cand) =
      annLshCandCtes(Seq((graft.ops.Similarity.DefaultPlanes, 1)))
    s"""WITH $ctes
        SELECT qid, nid, CAST(rn AS BIGINT) AS rank FROM
          (SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) rn
           FROM ${cand(graft.ops.Similarity.DefaultPlanes, 1)}) t
        WHERE rn <= 5"""
  }

  /** Recall-curve twin: per (nPlanes, probeBits) setting, total brute
    * top-5 pairs, how many the LSH path recovered, and the candidate
    * count that bought that recall.
    */
  /** Cross-path operating-point pick: the measured curve of every
    * path in q_ann_path_pick — 3 LSH points (annRecallSql's rows,
    * re-labeled), full-scan PQ at 12 and 32 bits/vector, and the
    * exact scan — then the cheapest row meeting each integer-percent
    * target (fewest candidates, then bits, then path).
    */
  private def annPathPickSql: String = {
    val (lshCtes, cand) = annLshCandCtes(AnnRecallSettings)
    val lshRows = AnnRecallSettings.map { case (np, pb) =>
      s"""SELECT 'lsh_${np}_$pb' AS path,
            (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_true,
            (SELECT CAST(count(*) AS BIGINT) FROM b JOIN
              (SELECT qid, nid FROM
                (SELECT qid, nid, ROW_NUMBER() OVER
                   (PARTITION BY qid ORDER BY cos DESC, nid) rn
                 FROM ${cand(np, pb)}) t$np$pb
               WHERE rn <= 5) l$np$pb USING (qid, nid)) AS n_hits,
            (SELECT CAST(count(*) AS BIGINT)
             FROM ${cand(np, pb)}) AS n_candidates,
            CAST(2048 AS BIGINT) AS bits_per_vec"""
    }
    s"""WITH b AS MATERIALIZED ($annSql),
        $lshCtes,
        p1 AS MATERIALIZED ($pqSql),
        p2 AS MATERIALIZED ($pq64Sql),
        ncx AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
        curve AS MATERIALIZED (
          ${lshRows.mkString(" UNION ALL ")}
          UNION ALL SELECT 'pq',
            (SELECT CAST(count(*) AS BIGINT) FROM b),
            (SELECT CAST(count(*) AS BIGINT) FROM b JOIN p1 USING (qid, nid)),
            (SELECT n*10 - 10 FROM ncx), CAST(12 AS BIGINT)
          UNION ALL SELECT 'pq64',
            (SELECT CAST(count(*) AS BIGINT) FROM b),
            (SELECT CAST(count(*) AS BIGINT) FROM b JOIN p2 USING (qid, nid)),
            (SELECT n*10 - 10 FROM ncx), CAST(24 AS BIGINT)
          UNION ALL SELECT 'brute',
            (SELECT CAST(count(*) AS BIGINT) FROM b),
            (SELECT CAST(count(*) AS BIGINT) FROM b),
            (SELECT n*10 - 10 FROM ncx), CAST(2048 AS BIGINT)),
        tgt(target_pct) AS (VALUES (CAST(20 AS BIGINT)), (CAST(40 AS BIGINT)),
          (CAST(60 AS BIGINT)), (CAST(80 AS BIGINT)), (CAST(100 AS BIGINT)))
        SELECT target_pct, path, n_candidates, bits_per_vec FROM (
          SELECT tgt.target_pct, cv.path, cv.n_candidates, cv.bits_per_vec,
            ROW_NUMBER() OVER (PARTITION BY tgt.target_pct
              ORDER BY cv.n_candidates, cv.bits_per_vec, cv.path) rn
          FROM tgt JOIN curve cv ON cv.n_hits*100 >= tgt.target_pct * cv.n_true) x
        WHERE rn = 1"""
  }

  private def annRecallSql: String = {
    val (lshCtes, cand) = annLshCandCtes(AnnRecallSettings)
    val settings = AnnRecallSettings.map { case (np, pb) =>
      s"""SELECT CAST($np AS BIGINT) AS n_planes, CAST($pb AS BIGINT) AS probe_bits,
            (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_true,
            (SELECT CAST(count(*) AS BIGINT) FROM b JOIN
              (SELECT qid, nid, CAST(rn AS BIGINT) AS rank FROM
                (SELECT qid, nid, ROW_NUMBER() OVER
                   (PARTITION BY qid ORDER BY cos DESC, nid) rn
                 FROM ${cand(np, pb)}) t$np$pb
               WHERE rn <= 5) l$np$pb USING (qid, nid)) AS n_hits,
            (SELECT CAST(count(*) AS BIGINT)
             FROM ${cand(np, pb)}) AS n_candidates"""
    }
    s"""WITH b AS MATERIALIZED ($annSql),
        $lshCtes ${settings.mkString(" UNION ALL ")}"""
  }

  /** IVF twin: same deterministic codebook (lowest 16 ids), same
    * argmax-by-(cos DESC, cid) assignment, same nProbe=4 probe set,
    * same exact rank within candidate lists.
    */
  private def ivfSql: String = {
    def dc(a: String, b: String) = (1 to 64)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)").mkString(" + ")
    s"""WITH cent AS MATERIALIZED (
          SELECT vec_id cid, embedding cv FROM embeddings
          ORDER BY vec_id LIMIT 16),
        c AS MATERIALIZED (SELECT vec_id nid, embedding nv FROM embeddings),
        q AS MATERIALIZED (
          SELECT vec_id qid, embedding qv FROM embeddings WHERE vec_id < 10),
        asn AS (SELECT nid, cid FROM (
          SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
            ORDER BY cosv DESC, cid) rn
          FROM (SELECT nid, cid, (${dc("nv", "cv")}) /
                  (sqrt(${dc("nv", "nv")}) * sqrt(${dc("cv", "cv")})) AS cosv
                FROM c, cent) u) t WHERE rn = 1),
        probes AS (SELECT qid, cid FROM (
          SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY cosv DESC, cid) rn
          FROM (SELECT qid, cid, (${dc("qv", "cv")}) /
                  (sqrt(${dc("qv", "qv")}) * sqrt(${dc("cv", "cv")})) AS cosv
                FROM q, cent) u) t WHERE rn <= 4),
        s AS (SELECT qid, nid, (${dc("qv", "nv")}) /
                (sqrt(${dc("qv", "qv")}) * sqrt(${dc("nv", "nv")})) AS cos
              FROM c JOIN asn USING (nid) JOIN probes USING (cid) JOIN q USING (qid)
              WHERE nid <> qid)
        SELECT qid, nid, CAST(rn AS BIGINT) AS rank FROM
          (SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) rn FROM s) t
        WHERE rn <= 5"""
  }

  /** PQ twins ([[graft.ops.Similarity.pqCodes]]/[[Similarity.pqTopK]]):
    * the seed-grid sub-codebook, per-subspace squared-L2 argmin
    * (`‖c‖² − 2·v·c`, same fold order, ties to the lowest code), and —
    * for the top-k — the ADC score rebuilt with the same
    * left-associated m-term adds, so every rank comparison sees
    * bit-identical doubles.
    */
  private def pqCtes(m: Int, ksub: Int, dim: Int): String = {
    val sub = dim / m
    def dcm(a: String, b: String, mi: Int) = (1 to sub)
      .map(j => s"CAST($a[${mi * sub + j}] AS DOUBLE)*CAST($b[${mi * sub + j}] AS DOUBLE)")
      .mkString(" + ")
    def caseM(f: Int => String) =
      "CASE s.m " + (0 until m).map(mi => s"WHEN $mi THEN (${f(mi)})").mkString(" ") + " END"
    val cmp = caseM(mi =>
      s"(${dcm("s.cv", "s.cv", mi)}) - 2.0*(${dcm("c.nv", "s.cv", mi)})")
    // the argmin window reads a pre-computed scalar key over a narrow
    // (nid, m, code, cmpv) projection: DuckDB's window operator
    // materializes its whole input, and carrying the two 64-float
    // lists through the ksub=256 sort measured 1.1 GB RSS vs 196 MB
    // narrow — same doubles, same fold order, identical ranks
    s"""seeds AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code,
                         embedding AS cv
                  FROM (SELECT vec_id, embedding FROM embeddings
                        ORDER BY vec_id LIMIT $ksub)),
        sub AS (SELECT CAST(t.mm AS INTEGER) AS m, code, cv
                FROM seeds CROSS JOIN range(0, $m) t(mm)),
        c AS (SELECT vec_id AS nid, embedding AS nv FROM embeddings),
        codes AS (SELECT nid, m, code FROM (
          SELECT nid, m, code,
            ROW_NUMBER() OVER (PARTITION BY nid, m
              ORDER BY cmpv ASC, code ASC) AS rn
          FROM (SELECT c.nid, s.m, s.code, ($cmp) AS cmpv
                FROM c CROSS JOIN sub s) u) t WHERE rn = 1)"""
  }

  private def pqCodesSql: String =
    s"""WITH ${pqCtes(4, 8, 64)}
        SELECT nid AS vec_id, CAST(m AS BIGINT) AS sm,
               CAST(code AS BIGINT) AS code
        FROM codes"""

  /** Shared body of the PQ top-k twins: the qd ADC tables, the sc
    * pivot (fed candidates by `candFrom`/`candWhere`), and the ranked
    * select with the explicit left-associated add chains.
    */
  private def pqScoreSql(
      m: Int, ksub: Int, dim: Int, k: Int,
      extraCtes: String, candFrom: String, candWhere: String): String = {
    val sub = dim / m
    def dcm(a: String, b: String, mi: Int) = (1 to sub)
      .map(j => s"CAST($a[${mi * sub + j}] AS DOUBLE)*CAST($b[${mi * sub + j}] AS DOUBLE)")
      .mkString(" + ")
    def caseM(f: Int => String) =
      "CASE s.m " + (0 until m).map(mi => s"WHEN $mi THEN (${f(mi)})").mkString(" ") + " END"
    val dv = caseM(mi => dcm("q.qv", "s.cv", mi))
    val cn2 = caseM(mi => dcm("s.cv", "s.cv", mi))
    val qq = (1 to dim)
      .map(i => s"CAST(qv[$i] AS DOUBLE)*CAST(qv[$i] AS DOUBLE)").mkString(" + ")
    def pivots(src: String, pre: String) = (0 until m)
      .map(mi => s"MAX(CASE WHEN qd.m = $mi THEN qd.$src END) AS $pre$mi")
      .mkString(",\n               ")
    def sumTerms(pre: String) = (0 until m)
      .map(mi => s"$pre$mi").reduce((a, b) => s"($a + $b)")
    s"""WITH ${pqCtes(m, ksub, dim)},
        q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
              WHERE vec_id < 10),$extraCtes
        qd AS (SELECT q.qid, s.m, s.code, ($dv) AS dv, ($cn2) AS cn2,
                      sqrt($qq) AS qnorm
               FROM q CROSS JOIN sub s),
        sc AS (SELECT qd.qid, codes.nid, MAX(qd.qnorm) AS qnorm,
               ${pivots("dv", "d")},
               ${pivots("cn2", "n")}
               FROM $candFrom
               WHERE $candWhere
               GROUP BY qd.qid, codes.nid)
        SELECT qid, nid, rank FROM (
          SELECT qid, nid, CAST(ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY ${sumTerms("d")} / (qnorm * sqrt(${sumTerms("n")}))
              DESC, nid ASC) AS BIGINT) AS rank
          FROM sc) t
        WHERE rank <= $k"""
  }

  private def pqSql: String =
    pqScoreSql(4, 8, 64, 5,
      extraCtes = "",
      candFrom = "codes JOIN qd ON codes.m = qd.m AND codes.code = qd.code",
      candWhere = "codes.nid <> qd.qid")

  /** The 8-bit operating point: same generator at ksub = 256. */
  private def pq8Sql: String =
    pqScoreSql(4, 256, 64, 5,
      extraCtes = "",
      candFrom = "codes JOIN qd ON codes.m = qd.m AND codes.code = qd.code",
      candWhere = "codes.nid <> qd.qid")

  /** The 24-bit point the path-pick curve prices (see the q_ann_path_pick
    * comment for why not ksub = 256 there).
    */
  private def pq64Sql: String =
    pqScoreSql(4, 64, 64, 5,
      extraCtes = "",
      candFrom = "codes JOIN qd ON codes.m = qd.m AND codes.code = qd.code",
      candWhere = "codes.nid <> qd.qid")

  /** IVF+PQ twin: the ivfSql coarse quantizer (lowest-16 codebook,
    * argmax-cosine lists, 4 probes) bounding which code rows each
    * query ADC-scores.
    */
  private def ivfPqSql: String = {
    def dc(a: String, b: String) = (1 to 64)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)").mkString(" + ")
    val ivfCtes = s"""
        cent AS (SELECT vec_id cid, embedding cv FROM embeddings
                 ORDER BY vec_id LIMIT 16),
        asn AS (SELECT nid, cid FROM (
          SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
            ORDER BY cosv DESC, cid) rn
          FROM (SELECT nid, cid, (${dc("nv", "cv")}) /
                  (sqrt(${dc("nv", "nv")}) * sqrt(${dc("cv", "cv")})) AS cosv
                FROM c, cent) u) t WHERE rn = 1),
        probes AS (SELECT qid, cid FROM (
          SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY cosv DESC, cid) rn
          FROM (SELECT qid, cid, (${dc("qv", "cv")}) /
                  (sqrt(${dc("qv", "qv")}) * sqrt(${dc("cv", "cv")})) AS cosv
                FROM q, cent) u) t WHERE rn <= 4),"""
    pqScoreSql(4, 8, 64, 5,
      extraCtes = ivfCtes,
      candFrom = """codes
               JOIN asn ON asn.nid = codes.nid
               JOIN probes ON probes.cid = asn.cid
               JOIN qd ON qd.m = codes.m AND qd.code = codes.code
                      AND qd.qid = probes.qid""",
      candWhere = "codes.nid <> probes.qid")
  }

  /** PQ recall twin: exact top-5 pairs vs how many the ADC ranking
    * recovered — brute CTE joined to the PQ CTE result.
    */
  private def pqRecallSql: String =
    s"""WITH b AS MATERIALIZED ($annSql), p AS MATERIALIZED ($pqSql)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_true,
               (SELECT CAST(count(*) AS BIGINT)
                FROM b JOIN p USING (qid, nid)) AS n_hits"""

  /** Residual IVFPQ twin ([[graft.ops.Similarity.ivfPqResidualTopK]]):
    * the ivfSql coarse quantizer, residual corpus `(nv[i] − cv[i])` in
    * FLOAT (the IEEE-exact `zip_with` mirror), the TRAINED residual
    * sub-codebook — two squared-L2 Lloyd rounds per subspace
    * ([[graft.ops.KMeans.kmeansCodebookL2]]: seeded by the 8
    * lowest-id residual slices, `‖c‖² − 2·v·c` argmin assignment with
    * ties to the lowest cid, floor(x·1024) quantized-mean updates,
    * empty clusters carried forward), partitioned by `m` so one chain
    * trains all four codebooks — and the ADC score rebuilt term by
    * term, `(pdot + Σdv) / (qnorm · √((‖cv‖² + 2·Σcdv) + Σ‖r‖²))`,
    * with the same parenthesization the Spark expression tree
    * produces.
    *
    * Multi-referenced CTEs are MATERIALIZED: DuckDB inlines plain
    * CTEs per reference, and the unrolled-fold expression trees
    * multiply out and have OOM'd the checker under memory pressure;
    * materialized the whole pipeline runs in ~2 s. (The engine's
    * seed-grid fallback never fires on this data — every subspace
    * trains a full 8-codeword book — so the oracle encodes only the
    * trained path.)
    */
  private def ivfPqResidualSql: String = ivfPqResidualSqlGen("", "")

  /** The residual-IVFPQ generator, parameterized for the
    * incremental-append twin: `centWhere` filters which rows may
    * become coarse centroids (SQL over `vec_id`, empty = all) and
    * `trainWhere` filters the residual rows the sub-codebooks train
    * on (SQL over `r.nid`, empty = all). The shipped q_ann_ivfpq_res
    * passes ("", "") — the full-corpus build; q_ann_index_append
    * trains on the base split only while encoding/probing the whole
    * corpus, exactly the frozen-codebook `Similarity.appendToIndex`
    * semantics.
    */
  private def ivfPqResidualSqlGen(
      centWhere: String, trainWhere: String): String = {
    val (k, dim, m, ksub, nCent, nProbe, iters, scale) =
      (5, 64, 4, 8, 16, 4, 2, 1024L)
    val centFilter = if (centWhere.isEmpty) "" else s"WHERE $centWhere "
    val trainFilter = if (trainWhere.isEmpty) "" else s" WHERE $trainWhere"
    val sub = dim / m
    def fullDc(a: String, b: String) = (1 to dim)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)").mkString(" + ")
    // 16-element dot of two LIST(FLOAT) slices (the per-subspace fold)
    def dc16(a: String, b: String) = (1 to sub)
      .map(j => s"CAST($a[$j] AS DOUBLE)*CAST($b[$j] AS DOUBLE)").mkString(" + ")
    // dot of a full-vector column's m-th slice with the trained scv
    def dcmFull(a: String, mi: Int) = (1 to sub).map { j =>
      val i = mi * sub + j
      s"CAST($a[$i] AS DOUBLE)*CAST(s.scv[$j] AS DOUBLE)"
    }.mkString(" + ")
    // dot of the residual slice (FLOAT subtraction, the zip_with
    // mirror) with the trained scv
    def dcmRes(mi: Int) = (1 to sub).map { j =>
      val i = mi * sub + j
      s"CAST((r.nv[$i] - r.cv[$i]) AS DOUBLE)*CAST(s.scv[$j] AS DOUBLE)"
    }.mkString(" + ")
    def caseM(f: Int => String) =
      "CASE s.m " + (0 until m).map(mi => s"WHEN $mi THEN (${f(mi)})").mkString(" ") + " END"
    val cmp = s"s.cn2 - 2.0*(${caseM(dcmRes)})"
    val dv = caseM(mi => dcmFull("q.qv", mi))
    val cdv = caseM(mi => dcmFull("ct.cv", mi))
    // one Lloyd round over the per-subspace training slices, the
    // kmeansSql shape with (m) added to every key
    def round(r: Int, prev: String): String =
      s"""ra$r AS (SELECT m, id, cid FROM (
            SELECT m, id, cid, ROW_NUMBER() OVER (
              PARTITION BY m, id ORDER BY cmpv ASC, cid) rn
            FROM (SELECT tr.m, tr.id, ce.cid, ((${dc16("ce.cv", "ce.cv")})
                    - 2.0*(${dc16("tr.v", "ce.cv")})) AS cmpv
                  FROM train tr JOIN $prev ce ON ce.m = tr.m) u) t
          WHERE rn = 1),
          ru$r AS (SELECT m, cid, pos,
              CAST((CAST(sum(qq) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / $scale
                AS FLOAT) AS x
            FROM (SELECT a.m, a.cid, i AS pos,
                    CAST(floor(CAST(tr.v[i + 1] AS DOUBLE) * $scale) AS BIGINT) AS qq
                  FROM train tr JOIN ra$r a ON a.m = tr.m AND a.id = tr.id
                  CROSS JOIN range(0, $sub) t(i))
            GROUP BY m, cid, pos),
          rcent$r AS MATERIALIZED (SELECT se.m, se.cid,
              CASE WHEN count(u.x) = 0 THEN any_value(se.cv)
                   ELSE list(u.x ORDER BY u.pos) END AS cv
            FROM $prev se LEFT JOIN ru$r u ON u.m = se.m AND u.cid = se.cid
            GROUP BY se.m, se.cid)"""
    val rounds = (1 to iters)
      .map(r => round(r, if (r == 1) "rseeds" else s"rcent${r - 1}"))
      .mkString(",\n        ")
    s"""WITH cent AS (SELECT vec_id cid, embedding cv FROM embeddings
                      ${centFilter}ORDER BY vec_id LIMIT $nCent),
        c AS (SELECT vec_id nid, embedding nv FROM embeddings),
        q AS (SELECT vec_id qid, embedding qv FROM embeddings WHERE vec_id < 10),
        asn AS MATERIALIZED (SELECT nid, cid FROM (
          SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
            ORDER BY cosv DESC, cid) rn
          FROM (SELECT nid, cid, (${fullDc("nv", "cv")}) /
                  (sqrt(${fullDc("nv", "nv")}) * sqrt(${fullDc("cv", "cv")})) AS cosv
                FROM c, cent) u) t WHERE rn = 1),
        res AS MATERIALIZED (SELECT c.nid, a.cid, c.nv, ct.cv
                FROM c JOIN asn a ON a.nid = c.nid
                       JOIN cent ct ON ct.cid = a.cid),
        train AS MATERIALIZED (
          SELECT CAST(t.mm AS INTEGER) AS m, r.nid AS id,
            list_transform(range(1, ${sub + 1}),
              j -> CAST(r.nv[t.mm*$sub + j] - r.cv[t.mm*$sub + j] AS FLOAT)) AS v
          FROM res r CROSS JOIN range(0, $m) t(mm)$trainFilter),
        rseeds AS MATERIALIZED (SELECT m,
            CAST(ROW_NUMBER() OVER (PARTITION BY m ORDER BY id) AS BIGINT) - 1
              AS cid, v AS cv
          FROM (SELECT m, id, v, ROW_NUMBER() OVER (
                  PARTITION BY m ORDER BY id) rn FROM train) t
          WHERE rn <= $ksub),
        $rounds,
        sub AS MATERIALIZED (SELECT m, CAST(cid AS INTEGER) AS code,
            cv AS scv, (${dc16("cv", "cv")}) AS cn2
          FROM rcent$iters),
        codes AS MATERIALIZED (SELECT nid, m, code FROM (
          SELECT nid, m, code,
            ROW_NUMBER() OVER (PARTITION BY nid, m
              ORDER BY cmpv ASC, code ASC) AS rn
          FROM (SELECT r.nid, s.m, s.code, ($cmp) AS cmpv
                FROM res r CROSS JOIN sub s) u) t WHERE rn = 1),
        probes AS MATERIALIZED (SELECT qid, cid, pdot FROM (
          SELECT qid, cid, pdot,
            ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY cosv DESC, cid) rn
          FROM (SELECT q.qid, cent.cid, (${fullDc("qv", "cv")}) AS pdot,
                  (${fullDc("qv", "cv")}) /
                    (sqrt(${fullDc("qv", "qv")}) * sqrt(${fullDc("cv", "cv")})) AS cosv
                FROM q, cent) u) t WHERE rn <= $nProbe),
        qd AS MATERIALIZED (SELECT q.qid, s.m, s.code, ($dv) AS dv, s.cn2 AS cn2,
                      sqrt(${fullDc("qv", "qv")}) AS qnorm
               FROM q CROSS JOIN sub s),
        cw AS MATERIALIZED (SELECT ct.cid, s.m, s.code, ($cdv) AS cdv,
                      (${fullDc("ct.cv", "ct.cv")}) AS cn2cv
               FROM cent ct CROSS JOIN sub s),
        sc AS (SELECT qd.qid, codes.nid,
               MAX(qd.qnorm) AS qnorm, MAX(probes.pdot) AS pdot,
               MAX(cw.cn2cv) AS cn2cv,
               ${resPivots("qd", "dv", "d")},
               ${resPivots("qd", "cn2", "n")},
               ${resPivots("cw", "cdv", "e")}
               FROM codes
               JOIN asn ON asn.nid = codes.nid
               JOIN probes ON probes.cid = asn.cid
               JOIN qd ON qd.m = codes.m AND qd.code = codes.code
                      AND qd.qid = probes.qid
               JOIN cw ON cw.cid = asn.cid AND cw.m = codes.m
                      AND cw.code = codes.code
               WHERE codes.nid <> probes.qid
               GROUP BY qd.qid, codes.nid)
        SELECT qid, nid, rank FROM (
          SELECT qid, nid, CAST(ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY (pdot + ${resSum(m, "d")}) /
              (qnorm * sqrt((cn2cv + 2.0*${resSum(m, "e")})
                + ${resSum(m, "n")}))
              DESC, nid ASC) AS BIGINT) AS rank
          FROM sc) t
        WHERE rank <= $k"""
  }

  /** Pivot/add-chain fragments for [[ivfPqResidualSql]]'s sc CTE. */
  private def resPivots(src: String, fld: String, pre: String): String =
    (0 until 4)
      .map(mi => s"MAX(CASE WHEN $src.m = $mi THEN $src.$fld END) AS $pre$mi")
      .mkString(",\n               ")

  private def resSum(m: Int, pre: String): String =
    (0 until m).map(mi => s"$pre$mi").reduce((a, b) => s"($a + $b)")

  /** Same bill for the composed IVF+PQ path. */
  private def ivfPqRecallSql: String =
    s"""WITH b AS MATERIALIZED ($annSql), p AS MATERIALIZED ($ivfPqSql)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_true,
               (SELECT CAST(count(*) AS BIGINT)
                FROM b JOIN p USING (qid, nid)) AS n_hits"""

  /** SemDeDup twin: the ivfSql codebook + assignment, then the greedy
    * keep-lowest-id rule as a NOT-EXISTS over within-cluster pairs at
    * the exact cosine threshold.
    */
  private def semanticDedupSql: String = {
    def dc(a: String, b: String) = (1 to 64)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)").mkString(" + ")
    s"""WITH cent AS MATERIALIZED (
          SELECT vec_id cid, embedding cv FROM embeddings
          ORDER BY vec_id LIMIT 16),
        c AS MATERIALIZED (SELECT vec_id nid, embedding nv FROM embeddings),
        asn AS (SELECT nid, cid FROM (
          SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
            ORDER BY cosv DESC, cid) rn
          FROM (SELECT nid, cid, (${dc("nv", "cv")}) /
                  (sqrt(${dc("nv", "nv")}) * sqrt(${dc("cv", "cv")})) AS cosv
                FROM c, cent) u) t WHERE rn = 1),
        m AS MATERIALIZED (SELECT nid, cid, nv FROM c JOIN asn USING (nid)),
        dropped AS (SELECT DISTINCT b.nid AS nid
          FROM m a JOIN m b ON a.cid = b.cid AND a.nid < b.nid
          WHERE (${dc("a.nv", "b.nv")}) /
            (sqrt(${dc("a.nv", "a.nv")}) * sqrt(${dc("b.nv", "b.nv")})) >= 0.45)
        SELECT nid AS vec_id, cid FROM m
        WHERE nid NOT IN (SELECT nid FROM dropped)"""
  }

  /** Leakage-safe split twin: min-doc_id group representative per
    * normalized-content md5, split label from the same portable
    * sampling hash of the representative.
    */
  private def splitGroupsSql: String = {
    val norm = """trim(regexp_replace(regexp_replace(lower(COALESCE(text, '')),
           '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"""
    val h = s"(((grp * ${Sampling.HashA}) % ${Sampling.HashP}) % 10)"
    s"""WITH g AS (SELECT doc_id, md5($norm) AS dg FROM documents),
        r AS (SELECT dg, min(doc_id) AS grp FROM g GROUP BY dg)
        SELECT doc_id, grp,
          CASE WHEN $h < 8 THEN 'train'
               WHEN $h < 9 THEN 'validation'
               ELSE 'test' END AS split
        FROM g JOIN r USING (dg)"""
  }

  /** Quantized-centroid twin: identical floor(x·1024) quantization,
    * exact long sums, same fixed-order double divisions; pos 0-based
    * on both engines.
    */
  /** Unrolled Lloyd iterations replicating [[graft.ops.KMeans]]:
    * assignment = ROW_NUMBER over the same left-to-right cosine fold
    * (ties to lowest cid), update = quantized per-dimension means
    * rounded once to FLOAT, empty clusters carried forward with n=0.
    */
  private def kmeansSql: String = {
    val (k, iters, dim, scale) = (8, 2, 64, 1024L)
    def dc(a: String, b: String) = (1 to dim)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)").mkString(" + ")
    def round(r: Int, prevCent: String): String =
      s"""a$r AS (SELECT id, cid FROM (
            SELECT id, cid, ROW_NUMBER() OVER (PARTITION BY id
              ORDER BY (${dc("v", "cv")}) /
                (sqrt(${dc("v", "v")}) * sqrt(${dc("cv", "cv")})) DESC, cid) rn
            FROM c, $prevCent) t WHERE rn = 1),
          u$r AS (SELECT cid, pos,
              CAST((CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / $scale
                AS FLOAT) AS x,
              count(*) AS n
            FROM (SELECT cid, i AS pos,
                    CAST(floor(CAST(v[i + 1] AS DOUBLE) * $scale) AS BIGINT) AS q
                  FROM c JOIN a$r USING (id) CROSS JOIN range(0, $dim) t(i))
            GROUP BY cid, pos),
          cent$r AS MATERIALIZED (SELECT s.cid,
              CASE WHEN count(u.x) = 0 THEN any_value(s.cv)
                   ELSE list(u.x ORDER BY u.pos) END AS cv,
              COALESCE(max(u.n), 0) AS n
            FROM $prevCent s LEFT JOIN u$r u USING (cid) GROUP BY s.cid)"""
    val rounds = (1 to iters)
      .map(r => round(r, if (r == 1) "seeds" else s"cent${r - 1}"))
      .mkString(",\n          ")
    s"""WITH seeds AS MATERIALIZED (
          SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cv
          FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $k)),
        c AS MATERIALIZED (SELECT vec_id AS id, embedding AS v FROM embeddings),
        $rounds
        SELECT cid, CAST(i AS BIGINT) AS pos,
          CAST(cv[i + 1] AS DOUBLE) AS centroid, n
        FROM cent$iters CROSS JOIN range(0, $dim) t(i)"""
  }

  private def embedCentroidSql: String =
    s"""WITH comp AS (
          SELECT label AS grp, i AS pos,
            CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1024) AS BIGINT) AS q
          FROM embeddings CROSS JOIN range(0, 64) t(i))
        SELECT grp, CAST(pos AS BIGINT) AS pos,
          (CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / 1024 AS centroid,
          count(*) AS n
        FROM comp GROUP BY grp, pos"""

  private val stopEn = TextOps.StopwordProfiles.head._2.map(s => s"'$s'").mkString(", ")

  private def langScores: String =
    TextOps.StopwordProfiles.map { case (lang, sws) =>
      val list = sws.map(s => s"'$s'").mkString(", ")
      s"CAST(len(list_filter(ws, w -> w IN ($list))) AS BIGINT) AS s_$lang"
    }.mkString(",\n          ")


  private def ngramScores: String =
    TextOps.TrigramProfiles.map { case (lang, ts) =>
      val terms = ts.map { t =>
        val esc = t.replace("'", "''")
        // COALESCE mirrors langIdNgram's coalesce(text, '') — a NULL
        // text must score 0 ('und'), not NULL-propagate to the ELSE arm
        s"CAST((length(COALESCE(text, '')) " +
          s"- length(replace(COALESCE(text, ''), '$esc', ''))) / 3 AS BIGINT)"
      }.mkString(" + ")
      s"($terms) AS t_$lang"
    }.mkString(",\n          ")

  private def ngramCase: String = {
    val langs = TextOps.TrigramProfiles.map(_._1)
    val zero = langs.map(l => s"t_$l = 0").mkString(" AND ")
    val whens = langs.zipWithIndex.dropRight(1).map { case (l, i) =>
      val conds = langs.drop(i + 1).map(o => s"t_$l >= t_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    s"CASE WHEN $zero THEN 'und' $whens ELSE '${langs.last}' END"
  }

  /** PII-scrub twin: identical augmented text, identical pattern
    * constants (interpolated from Redact so they can't drift), 'g'
    * flag because DuckDB's regexp_replace is first-match-only by
    * default while Spark's replaces all.
    */
  private def piiScrubSql: String = {
    val aug =
      """COALESCE(text, '') || ' contact user' || CAST(doc_id AS VARCHAR) ||
         '@mail.example.com call +1-415-555-' ||
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         ' visit https://example.com/u/' || CAST(doc_id AS VARCHAR)"""
    s"""WITH aug AS (SELECT doc_id, $aug AS t FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t, '${Redact.EmailRe}')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(t, '${Redact.UrlRe}')) AS BIGINT) AS n_urls,
          CAST(len(regexp_extract_all(t, '${Redact.PhoneRe}')) AS BIGINT) AS n_phones,
          regexp_replace(regexp_replace(regexp_replace(t,
            '${Redact.EmailRe}', '<EMAIL>', 'g'),
            '${Redact.UrlRe}', '<URL>', 'g'),
            '${Redact.PhoneRe}', '<PHONE>', 'g') AS scrubbed
        FROM aug"""
  }

  private val sampleHash =
    s"((doc_id * ${Sampling.HashA}) % ${Sampling.HashP})"

  private def sampleHashSql: String =
    s"SELECT doc_id, lang FROM documents WHERE $sampleHash % 5 < 1"

  private def sampleStratifiedSql: String =
    s"""SELECT doc_id, lang FROM documents
        WHERE CASE WHEN lang = 'de' THEN $sampleHash % 2 < 1
                   WHEN lang = 'es' THEN $sampleHash % 4 < 1
                   ELSE $sampleHash % 10 < 1 END"""

  /** Repetition-signal twin: same two explode→count passes; fractions
    * are integer counts divided in double with zero denominators
    * pinned to 0.0 (not NULL/Inf) on both engines.
    */
  private def repSignalsSql: String =
    s"""WITH toks AS (SELECT doc_id, $ws AS ws FROM documents),
        wcnt AS (SELECT doc_id, g, count(*) AS cnt
                 FROM (SELECT doc_id, unnest(ws) AS g FROM toks) GROUP BY 1, 2),
        wstat AS (SELECT doc_id, max(cnt) AS top_word_n,
                    COALESCE(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS dup_word_occ
                  FROM wcnt GROUP BY doc_id),
        bg AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                 i -> ws[i] || ' ' || ws[i+1])) AS g
               FROM toks WHERE len(ws) >= 2),
        bcnt AS (SELECT doc_id, g, count(*) AS cnt FROM bg GROUP BY 1, 2),
        bstat AS (SELECT doc_id, max(cnt) AS top_bigram_n,
                    COALESCE(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS dup_bigram_occ,
                    sum(cnt) AS n_bigrams
                  FROM bcnt GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(len(t.ws) AS BIGINT) AS n_words,
               CAST(COALESCE(w.top_word_n, 0) AS BIGINT) AS top_word_n,
               CASE WHEN len(t.ws) = 0 THEN 0.0
                    ELSE CAST(COALESCE(w.dup_word_occ, 0) AS DOUBLE) / CAST(len(t.ws) AS DOUBLE)
               END AS dup_word_frac,
               CAST(COALESCE(b.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
               CASE WHEN COALESCE(b.n_bigrams, 0) = 0 THEN 0.0
                    ELSE CAST(COALESCE(b.dup_bigram_occ, 0) AS DOUBLE) /
                         CAST(COALESCE(b.n_bigrams, 0) AS DOUBLE)
               END AS dup_bigram_frac
        FROM toks t LEFT JOIN wstat w USING (doc_id) LEFT JOIN bstat b USING (doc_id)"""

  /** Length-band twin: same distinct-length cumulative distribution,
    * same integer cross-multiplied boundary rule (cum·den ≥ p·n).
    */
  private def lengthBandSql: String =
    s"""WITH lens AS (SELECT doc_id, CAST(len($ws) AS BIGINT) AS dl FROM documents),
        dist AS (SELECT dl, count(*) AS cnt FROM lens GROUP BY dl),
        cum AS (SELECT dl, sum(cnt) OVER (ORDER BY dl
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM dist),
        tot AS (SELECT count(*) AS n FROM lens),
        bounds AS (SELECT min(CASE WHEN cum*100 >= n*5 THEN dl END) AS lo,
                          min(CASE WHEN cum*100 >= n*95 THEN dl END) AS hi
                   FROM cum, tot)
        SELECT doc_id, dl FROM lens, bounds WHERE dl >= lo AND dl <= hi"""

  private def textNormalizeSql: String =
    """SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(COALESCE(text, '')),
           '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
         md5(trim(regexp_replace(regexp_replace(lower(COALESCE(text, '')),
           '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_digest
       FROM documents"""

  /** Fixed BM25 probe query (terms present in the synthetic corpus). */
  val Bm25Query: Seq[String] = Seq("spark", "query", "join")

  /** TF-IDF top-k twin. Rank order is the integer triple
    * (tf DESC, df ASC, term ASC) — floats are value columns only, so a
    * last-ulp ln() difference between engines can't flip a rank
    * boundary; %.10g canonicalization absorbs it in the score.
    */
  private def tfidfSql: String =
    s"""WITH toks AS (SELECT doc_id, $ws AS ws FROM documents),
        ex AS (SELECT doc_id, unnest(ws) AS term FROM toks),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        ranked AS (SELECT t.doc_id, t.term, t.tf, d.df,
                     row_number() OVER (PARTITION BY t.doc_id
                       ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS rk
                   FROM tf t JOIN dfreq d USING (term))
        SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
               CAST(tf AS DOUBLE) *
                 ln(CAST((SELECT n FROM n) AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf
        FROM ranked WHERE rk <= 3"""

  /** BM25 twin: same association order as Relevance.bm25 — one
    * single-row conditional sum per query term, added in fixed query
    * order, corpus ratios from exact integer sums divided in double.
    */
  private def bm25Sql: String = {
    val k1 = "1.2"
    val terms = Bm25Query
    val condSums = terms.map(t =>
      s"SUM(CASE WHEN term = '$t' THEN s END) AS s_$t").mkString(",\n               ")
    val total = terms.map(t => s"COALESCE(p.s_$t, 0.0)").reduceLeft((a, b) => s"($a + $b)")
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (SELECT doc_id, $ws AS ws FROM documents),
        lens AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM toks),
        corpus AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM lens),
        ex AS (SELECT doc_id, unnest(ws) AS term FROM toks),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM ex
               WHERE term IN ($inList) GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        scored AS (SELECT t.doc_id, t.term,
                     ln(1.0 + ((CAST(c.n AS DOUBLE) - CAST(d.df AS DOUBLE)) + 0.5) /
                              (CAST(d.df AS DOUBLE) + 0.5)) *
                     (CAST(t.tf AS DOUBLE) * 2.2) /
                     (CAST(t.tf AS DOUBLE) + $k1 * (0.25 + 0.75 *
                        CAST(l.dl AS DOUBLE) /
                        (CAST(c.sumdl AS DOUBLE) / CAST(c.n AS DOUBLE)))) AS s
                   FROM tf t JOIN dfreq d USING (term)
                   JOIN lens l USING (doc_id) CROSS JOIN corpus c),
        per AS (SELECT doc_id, $condSums FROM scored GROUP BY doc_id)
        SELECT l.doc_id, COALESCE($total, 0.0) AS bm25
        FROM lens l LEFT JOIN per p USING (doc_id)"""
  }

  /** Min-id-per-component via a transitive-closure recursive CTE over
    * the same LSH pair list minhashSql emits — the closure is the
    * declarative twin of the engine's min-label propagation fixpoint.
    */
  private def clustersSql: String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (${minhashSql()}),
        edges AS MATERIALIZED (SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
                  UNION ALL SELECT doc_id_b, doc_id_a FROM pairs),
        reach(node, root) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node),
        comp AS (SELECT node, MIN(root) AS comp FROM reach GROUP BY node)
        SELECT d.doc_id,
               COALESCE(c.comp, d.doc_id) AS cluster_id,
               CAST(d.doc_id = COALESCE(c.comp, d.doc_id) AS BIGINT) AS is_keeper
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id"""

  /** Keep-best twin: clustersSql's closure, but the keeper per
    * component is argmax by (whitespace word count, then lowest id).
    */
  private def keepBestSql: String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (${minhashSql()}),
        edges AS MATERIALIZED (SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
                  UNION ALL SELECT doc_id_b, doc_id_a FROM pairs),
        reach(node, root) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node),
        comp AS (SELECT node, MIN(root) AS comp FROM reach GROUP BY node),
        members AS (
          SELECT d.doc_id,
                 COALESCE(c.comp, d.doc_id) AS cluster_id,
                 CAST(len(list_filter(string_split(COALESCE(d.text, ''), ' '),
                   w -> w <> '')) AS BIGINT) AS score
          FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
        best AS (
          SELECT cluster_id, doc_id AS keeper FROM (
            SELECT cluster_id, doc_id, ROW_NUMBER() OVER
              (PARTITION BY cluster_id ORDER BY score DESC, doc_id ASC) rn
            FROM members) t WHERE rn = 1)
        SELECT m.doc_id, m.cluster_id, m.score,
               CAST(m.doc_id = b.keeper AS BIGINT) AS is_keeper
        FROM members m JOIN best b USING (cluster_id)"""

  /** Temperature-mix twin: identical fixed-point √ threshold. */
  private def mixTemperatureSql: String =
    s"""WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        mn AS (SELECT min(n) AS nmin FROM cnt),
        thr AS (SELECT source,
                  CAST(floor(1048576.0 *
                    sqrt(CAST(nmin AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT) AS t
                FROM cnt, mn)
        SELECT d.doc_id, d.source
        FROM documents d JOIN thr USING (source)
        WHERE ((d.doc_id * 2654435761 + 0) % 2147483647) % 1048576 < thr.t"""

  /** Decontamination twin: identical shingling on both roles, the
    * probe side distinct so the join count is the distinct overlap.
    */
  private def decontaminateSql: String =
    s"""WITH $toksBase,
        sh AS (SELECT doc_id, $shingleStrings AS ss FROM base),
        ex AS (SELECT doc_id, unnest(ss) AS s FROM sh),
        probe AS (SELECT DISTINCT s FROM ex WHERE doc_id % 97 = 0),
        hits AS (SELECT e.doc_id, count(*) AS n FROM ex e JOIN probe p ON e.s = p.s
                 WHERE e.doc_id % 97 <> 0 GROUP BY e.doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared_shingles,
               CAST(COALESCE(h.n, 0) > 0 AS BIGINT) AS is_contaminated
        FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
        WHERE d.doc_id % 97 <> 0"""

  /** Passage-dup twin: same non-overlapping 16-word windows (full
    * windows only), same md5-of-passage digests.
    */
  private def passageDedupSql: String =
    s"""WITH toks AS (SELECT doc_id, $ws AS ws FROM documents),
        pass AS (SELECT doc_id,
                   unnest(list_transform(range(0, len(ws) // 16),
                     i -> array_to_string(list_slice(ws, i*16 + 1, i*16 + 16), ' ')))
                   AS passage
                 FROM toks WHERE len(ws) >= 16),
        ph AS (SELECT doc_id, md5(passage) AS ph FROM pass),
        nd AS (SELECT ph, count(DISTINCT doc_id) AS nd FROM ph GROUP BY ph),
        per AS (SELECT p.doc_id, count(*) AS n_passages,
                  sum(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS n_dup
                FROM ph p JOIN nd d USING (ph) GROUP BY p.doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(per.n_passages, 0) AS BIGINT) AS n_passages,
               CAST(COALESCE(per.n_dup, 0) AS BIGINT) AS n_dup_passages
        FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id"""

  /** Shared CTE chain for the ExactSubstr twins: window digests at
    * every position, 1/16 md5-nibble anchor cut, cross-doc digest
    * filter, island merge via the running max-end window. All-integer
    * span arithmetic, so both engines agree bit-for-bit.
    */
  private def substrSpansCte: String =
    s"""WITH w AS (SELECT doc_id, CAST(t.k AS BIGINT) AS pos,
                     md5(substr(text, CAST(t.k AS INTEGER), 30)) AS dg
                   FROM documents, range(1, 1024) t(k)
                   WHERE t.k + 29 <= len(text)),
        a AS (SELECT * FROM w WHERE substr(dg, 1, 1) = '0'),
        dup AS (SELECT dg FROM a GROUP BY dg
                HAVING count(DISTINCT doc_id) >= 2),
        h AS (SELECT a.doc_id, a.pos FROM a JOIN dup USING (dg)),
        m AS (SELECT doc_id, pos,
                max(pos + 30) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS prev_end
              FROM h),
        isl AS (SELECT doc_id, pos,
                  sum(CASE WHEN prev_end IS NULL OR pos > prev_end
                      THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id ORDER BY pos) AS island
                FROM m),
        sp AS (SELECT doc_id, island,
                 min(pos) AS span_start, max(pos) + 30 AS span_end,
                 count(*) AS n_anchors
               FROM isl GROUP BY doc_id, island)"""

  private def substrSpansSql: String =
    s"""$substrSpansCte
        SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
               CAST(span_end AS BIGINT) AS span_end,
               CAST(n_anchors AS BIGINT) AS n_anchors
        FROM sp"""

  private def substrDedupSql: String =
    s"""$substrSpansCte
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(span_end - span_start) AS BIGINT) AS dup_chars,
               CAST(sum(n_anchors) AS BIGINT) AS n_dup_anchors
        FROM sp GROUP BY doc_id"""

  private def substrScrubSql: String =
    s"""$substrSpansCte,
        tail AS (SELECT doc_id, max(span_end) AS gs FROM sp GROUP BY doc_id),
        gaps AS (SELECT doc_id,
                   COALESCE(lag(span_end) OVER (PARTITION BY doc_id
                     ORDER BY span_start), 1) AS gs,
                   span_start AS ge
                 FROM sp
                 UNION ALL
                 SELECT doc_id, gs, NULL FROM tail),
        segs AS (SELECT g.doc_id, d.text, g.gs,
                   COALESCE(g.ge, len(d.text) + 1) AS ge
                 FROM gaps g JOIN documents d ON d.doc_id = g.doc_id),
        scrub AS (SELECT doc_id,
                    string_agg(substr(text, CAST(gs AS INTEGER),
                      CAST(ge - gs AS INTEGER)), '' ORDER BY gs) AS scrubbed
                  FROM segs GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(s.scrubbed, d.text) AS scrubbed
        FROM documents d LEFT JOIN scrub s ON s.doc_id = d.doc_id"""

  private def ngramCountsSql: String =
    s"""WITH toks AS (SELECT $ws AS ws FROM documents),
        g AS (SELECT unnest(list_transform(range(1, len(ws)),
                i -> ws[i] || ' ' || ws[i+1])) AS ngram
              FROM toks WHERE len(ws) >= 2)
        SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM g GROUP BY ngram
        ORDER BY n_occurrences DESC, ngram ASC LIMIT 50"""

  /** Collocations twin: same bigram counts, marginals re-aggregated
    * from the counts frame, lift as the identical (a·b)/(c·d) double
    * expression — no log, so no libm ulp exposure.
    */
  private def collocationsSql: String =
    s"""WITH toks AS (SELECT $ws AS ws FROM documents),
        bg AS (SELECT unnest(list_transform(range(1, len(ws)),
                 i -> ws[i] || ' ' || ws[i+1])) AS bigram
               FROM toks WHERE len(ws) >= 2),
        c AS (SELECT bigram, count(*) AS c_xy,
                split_part(bigram, ' ', 1) AS w1,
                split_part(bigram, ' ', 2) AS w2
              FROM bg GROUP BY bigram),
        l AS (SELECT w1, sum(c_xy) AS cl FROM c GROUP BY w1),
        r AS (SELECT w2, sum(c_xy) AS cr FROM c GROUP BY w2),
        t AS (SELECT sum(c_xy) AS nb FROM c)
        SELECT c.bigram, c.c_xy,
          (CAST(c.c_xy AS DOUBLE) * CAST(t.nb AS DOUBLE)) /
            (CAST(l.cl AS DOUBLE) * CAST(r.cr AS DOUBLE)) AS lift
        FROM c JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN t
        WHERE c.c_xy >= 10"""

  /** Entropy twin: the Σ c·ln c fold runs over counts ordered by term
    * (list(... ORDER BY term)), prepend-0 left fold — the exact
    * operation order of the engine's sorted-struct aggregate, so the
    * double agrees to the ulp the %.10g canon absorbs.
    */
  private def entropySql: String =
    s"""WITH toks AS (SELECT doc_id, $ws AS ws FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS c
               FROM (SELECT doc_id, unnest(ws) AS term FROM toks) GROUP BY 1, 2),
        agg AS (SELECT doc_id,
                  CAST(sum(c) AS BIGINT) AS n_tokens,
                  CAST(count(*) AS BIGINT) AS n_distinct,
                  list(CAST(c AS DOUBLE) ORDER BY term) AS cs
                FROM tf GROUP BY doc_id),
        res AS (SELECT doc_id, n_tokens, n_distinct,
                  ln(CAST(n_tokens AS DOUBLE)) -
                    list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(cs, x -> x * ln(x))), (a, b) -> a + b)
                    / CAST(n_tokens AS DOUBLE) AS h
                FROM agg)
        SELECT d.doc_id,
               COALESCE(r.n_tokens, 0) AS n_tokens,
               COALESCE(r.n_distinct, 0) AS n_distinct_tokens,
               COALESCE(r.h, 0.0) AS entropy_nats
        FROM documents d LEFT JOIN res r ON r.doc_id = d.doc_id"""

  /** LM-score twin: same self-estimated bigram/prefix counts, the
    * per-doc Σ ln(cb/cp) folded over bigrams ordered by (w1, w2) —
    * ties are identical values, so the fold matches the engine's
    * sorted-struct aggregate bit-for-bit up to the ln ulp.
    */
  private def lmScoreSql: String =
    s"""WITH toks AS (SELECT doc_id, $ws AS ws FROM documents),
        bi AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                 i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS b
               FROM toks WHERE len(ws) >= 2),
        bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bi),
        cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
        cp AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cp FROM cb GROUP BY 1),
        sc AS (SELECT doc_id, g.w1, g.w2,
                 ln(CAST(c.cb AS DOUBLE) / CAST(p.cp AS DOUBLE)) AS lp
               FROM bg g JOIN cb c ON g.w1 = c.w1 AND g.w2 = c.w2
               JOIN cp p ON g.w1 = p.w1),
        agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                  list(lp ORDER BY w1, w2) AS ls
                FROM sc GROUP BY doc_id),
        res AS (SELECT doc_id, n_bigrams,
                  list_reduce(list_prepend(CAST(0 AS DOUBLE), ls), (a, b) -> a + b)
                    / CAST(n_bigrams AS DOUBLE) AS alp
                FROM agg)
        SELECT d.doc_id,
               COALESCE(r.n_bigrams, 0) AS n_bigrams,
               COALESCE(r.alp, 0.0) AS avg_logprob
        FROM documents d LEFT JOIN res r ON r.doc_id = d.doc_id"""

  private def langCase: String = {
    val langs = TextOps.StopwordProfiles.map(_._1)
    val zero = langs.map(l => s"s_$l = 0").mkString(" AND ")
    val whens = langs.zipWithIndex.dropRight(1).map { case (l, i) =>
      val conds = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    s"CASE WHEN $zero THEN 'und' $whens ELSE '${langs.last}' END"
  }

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
         FROM documents GROUP BY md5(text)""",
    "q_dedup_jaccard" -> jaccardSql,
    "q_containment" -> containmentSql,
    "q_dedup_minhash" -> minhashSql(),
    "q_minhash_bbit" -> bbitSql,
    "q_minhash_recall" ->
      s"""WITH e AS MATERIALIZED (${jaccardSql}),
          m AS MATERIALIZED (${minhashSql()})
          SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_exact,
                 CAST((SELECT count(*) FROM m) AS BIGINT) AS n_minhash,
                 CAST((SELECT count(*) FROM e JOIN m USING (doc_id_a, doc_id_b))
                   AS BIGINT) AS n_common""",
    // identical signature pipeline; only batch-involving candidates
    // survive (corpus-internal pairs are ingest-time knowledge)
    "q_dedup_incremental" ->
      minhashSql("AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)"),
    // brute force on the same hash sets — deliberately NOT the prefix
    // algorithm, so the filter's losslessness is what's being checked
    "q_simjoin_exact" ->
      s"""WITH $toksBase,
          sh AS (SELECT doc_id, $shingleHashes AS hs FROM base),
          p AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                  CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS shared,
                  CAST(len(a.hs) AS BIGINT) AS na, CAST(len(b.hs) AS BIGINT) AS nb
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
          SELECT doc_id_a, doc_id_b, shared, na + nb - shared AS n_union
          FROM p WHERE 10*shared >= 7*(na + nb - shared)""",
    "q_dedup_clusters" -> clustersSql,
    "q_cluster_sizes" ->
      s"""SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
          FROM (SELECT cluster_id, CAST(count(*) AS BIGINT)
                  AS cluster_size
                FROM ($clustersSql) c GROUP BY 1) s
          GROUP BY 1""",
    "q_dedup_keep_best" -> keepBestSql,
    "q_mix_temperature" -> mixTemperatureSql,
    "q_pii_scrub" -> piiScrubSql,
    "q_quality_classifier" ->
      s"""WITH toks AS (SELECT doc_id, $ws AS ws FROM documents)
          SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
            CAST(COALESCE(list_sum(list_transform(ws,
              w -> (((${wh("w")} % 4096) * 2654435761) % 2003) - 1001)), 0)
              AS BIGINT) AS score_fp,
            CAST(CASE WHEN COALESCE(list_sum(list_transform(ws,
              w -> (((${wh("w")} % 4096) * 2654435761) % 2003) - 1001)), 0) >= 0
              THEN 1 ELSE 0 END AS BIGINT) AS keep
          FROM toks""",
    "q_web_domains" ->
      s"""WITH $urlDomainSql,
         f AS (SELECT * FROM d
               WHERE domain NOT IN ('example-0.com', 'example-3.org')),
         t AS (SELECT count(*) AS n FROM f)
         SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS n_chars,
                CAST((count(*) * 1000000) // (SELECT n FROM t) AS BIGINT) AS share_ppm
         FROM f GROUP BY domain""",
    "q_domain_cap" ->
      s"""WITH $urlDomainSql,
         r AS (SELECT doc_id, domain,
                 ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
               FROM d)
         SELECT doc_id, domain FROM r WHERE rn <= 20""",
    "q_line_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $ws AS ws FROM documents),
         lined AS (SELECT doc_id, CASE WHEN len(ws) = 0 THEN ''
             ELSE array_to_string(list_transform(
                    range(0, CAST(ceil(len(ws) / 12.0) AS BIGINT)),
                    i -> array_to_string(ws[i*12+1 : i*12+12], ' ')), chr(10))
             END AS text FROM toks),
         l AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM (
             SELECT doc_id, unnest(list_transform(range(1, len(ln)+1),
               i -> {'pos': i, 'line': ln[i]})) AS u
             FROM (SELECT doc_id, string_split(text, chr(10)) AS ln FROM lined))),
         e AS (SELECT doc_id, pos, line,
                 ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
               FROM l)
         SELECT doc_id,
           CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, chr(10)
                               ORDER BY pos), '') AS clean_text
         FROM e GROUP BY doc_id""",
    "q_bpe_merges" -> bpeMergesSql,
    "q_bpe_encode" -> bpeEncodeSql,
    "q_stats_collect" -> statsSql,
    "q_chisq" -> chiSqSql,
    "q_drift_chisq" -> driftChiSqSql,
    "q_pca_power" -> pcaPowerSql,
    "q_embed_quantize" ->
      """SELECT vec_id,
           CAST(floor(mx * 1048576) AS BIGINT) AS scale_fp,
           t.k - 1 AS pos,
           CAST(CASE WHEN mx = 0 THEN 0
                ELSE floor(CAST(embedding[t.k] AS DOUBLE) * 127 / mx + 0.5)
                END AS BIGINT) AS q
         FROM (SELECT vec_id, embedding,
                 list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) AS mx
               FROM embeddings) e,
              range(1, 65) t(k)""",
    // the float component widens to DOUBLE before the fixed-point
    // floor on BOTH engines (float arithmetic would diverge); the
    // upper triangle comes from a bounded self-join here — the
    // operator itself never joins
    "q_gram" ->
      """WITH q AS (SELECT vec_id, r.i AS i,
              CAST(floor(CAST(embedding[r.i + 1] AS DOUBLE) * 1000.0)
                AS DECIMAL(18,0)) AS x
            FROM embeddings, range(16) r(i)),
          p AS (SELECT a.i AS i, b.i AS j, a.x AS xi, b.x AS xj
            FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.i >= a.i),
          s AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n,
              sum(xi*xj) AS gq, sum(xi) AS si, sum(xj) AS sj
            FROM p GROUP BY 1, 2)
          SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, n,
            CAST(gq AS DOUBLE) AS gram_q,
            (CAST(gq AS DOUBLE)/CAST(n AS DOUBLE)
              - (CAST(si AS DOUBLE)/CAST(n AS DOUBLE))
                *(CAST(sj AS DOUBLE)/CAST(n AS DOUBLE)))
            /(CAST(1000 AS DOUBLE)*CAST(1000 AS DOUBLE)) AS cov
          FROM s""",

    "q_sample_hash" -> sampleHashSql,
    "q_sample_weighted" ->
      s"""WITH w AS (SELECT doc_id, CAST(len($ws) AS BIGINT) AS w FROM documents),
          mx AS (SELECT max(w) AS maxw FROM w)
          SELECT doc_id, w FROM w, mx
          WHERE maxw > 0 AND ($sampleHash % ${1L << 20}) * maxw * 2 < w * ${1L << 20} * 1""",
    "q_sample_stratified" -> sampleStratifiedSql,
    "q_rep_signals" -> repSignalsSql,
    "q_length_band" -> lengthBandSql,
    "q_dsir_scores" ->
      s"""WITH wd AS (SELECT doc_id, source, unnest($ws) AS w
                      FROM documents),
          cr AS (SELECT w, CAST(count(*) AS BIGINT) AS cr
                 FROM wd GROUP BY w),
          ct AS (SELECT w, CAST(count(*) AS BIGINT) AS ct FROM wd
                 WHERE source IN ('src0','src1','src2','src3') GROUP BY w),
          r AS (SELECT cr.w,
                  CAST(length(bin(COALESCE(ct.ct, 0) + 1)) -
                       length(bin(cr.cr + 1)) AS BIGINT) AS r
                FROM cr LEFT JOIN ct ON ct.w = cr.w),
          s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                  CAST(sum(r.r) AS BIGINT) AS score_fp
                FROM wd JOIN r ON r.w = wd.w GROUP BY doc_id)
          SELECT doc_id, n_tokens, score_fp,
            CAST(floor(1000.0 * score_fp / n_tokens) AS BIGINT)
              AS score_per_kt
          FROM s""",
    "q_text_normalize" -> textNormalizeSql,
    "q_vocab_topk" ->
      s"""WITH toks AS (SELECT doc_id, $ws AS ws FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf
                 FROM (SELECT doc_id, unnest(ws) AS term FROM toks) GROUP BY 1, 2)
          SELECT term, CAST(sum(tf) AS BIGINT) AS n_occurrences, count(*) AS n_docs
          FROM tf GROUP BY term
          ORDER BY n_occurrences DESC, term ASC LIMIT 50""",
    "q_freq_spectrum" ->
      s"""WITH toks AS (SELECT doc_id, $ws AS ws FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf
                 FROM (SELECT doc_id, unnest(ws) AS term FROM toks) GROUP BY 1, 2),
          dfreq AS (SELECT term, count(*) AS n_docs FROM tf GROUP BY term)
          SELECT n_docs, count(*) AS n_terms FROM dfreq GROUP BY n_docs""",
    "q_posting_lists" ->
      s"""WITH post AS (SELECT DISTINCT doc_id, term
            FROM (SELECT doc_id, unnest($ws) AS term FROM documents))
          SELECT term, count(*) AS n_docs,
            array_to_string((list(doc_id ORDER BY doc_id))[1:8], ',') AS doc_heads
          FROM post GROUP BY term""",
    "q_decontaminate" -> decontaminateSql,
    "q_passage_dedup" -> passageDedupSql,
    "q_substr_spans" -> substrSpansSql,
    "q_substr_dedup" -> substrDedupSql,
    "q_substr_scrub" -> substrScrubSql,
    "q_ngram_counts" -> ngramCountsSql,
    "q_collocations" -> collocationsSql,
    "q_entropy" -> entropySql,
    "q_lm_score" -> lmScoreSql,
    "q_tfidf" -> tfidfSql,
    "q_bm25" -> bm25Sql,
    "q_dedup_simhash" -> simhashSql,
    "q_simhash_pairs" -> simhashPairsSql,
    "q_ann_cosine" -> annSql,
    "q_knn_classify" -> knnClassifySql,
    "q_ann_lsh" -> annLshSql,
    "q_ann_recall" -> annRecallSql,
    "q_ann_path_pick" -> annPathPickSql,
    "q_ann_ivf" -> ivfSql,
    "q_ann_pq" -> pqSql,
    "q_ann_pq8" -> pq8Sql,
    "q_ann_pq8_recall" ->
      s"""WITH b AS MATERIALIZED ($annSql), p AS MATERIALIZED ($pq8Sql)
          SELECT (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_true,
                 (SELECT CAST(count(*) AS BIGINT)
                  FROM b JOIN p USING (qid, nid)) AS n_hits""",
    "q_ann_ivfpq" -> ivfPqSql,
    "q_ann_pq_recall" -> pqRecallSql,
    "q_ann_ivfpq_recall" -> ivfPqRecallSql,
    "q_ann_ivfpq_res" -> ivfPqResidualSql,
    "q_ann_ivfpq_probe" -> ivfPqResidualSql,
    // the partitioned serving layout changes bytes-read, never ranks:
    // the DPP-pruned probe shares the fused full-corpus oracle
    "q_ann_probe_pruned" -> ivfPqResidualSql,
    "q_ann_index_append" ->
      ivfPqResidualSqlGen("vec_id % 10 < 8", "r.nid % 10 < 8"),
    // ingest ≡ appendToIndex ≡ the frozen-codebook union encode, and
    // compaction + handle reload must not move a single rank — so the
    // row shares the append twin verbatim
    "q_ann_ingest_compact_probe" ->
      ivfPqResidualSqlGen("vec_id % 10 < 8", "r.nid % 10 < 8"),
    // a drift rebuild re-trains on the FULL corpus: the post-rebuild
    // probe is hash-identical to the fused full-corpus build+probe
    "q_ann_drift_rebuild" -> ivfPqResidualSql,
    // the async arc retrains on the 90% snapshot (base + the drifted
    // %10==8 cohort) while the rebuild-window batch (%10==9) is
    // drained through the frozen fresh codebooks — train-on-subset,
    // encode-everything, the q_ann_index_append algebra at 90/10
    "q_ann_drift_rebuild_async" ->
      ivfPqResidualSqlGen("vec_id % 10 < 9", "r.nid % 10 < 9"),
    "q_ann_ivfpq_res_recall" ->
      s"""WITH b AS MATERIALIZED ($annSql), p AS MATERIALIZED ($ivfPqResidualSql)
          SELECT (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_true,
                 (SELECT CAST(count(*) AS BIGINT)
                  FROM b JOIN p USING (qid, nid)) AS n_hits""",
    "q_pq_codes" -> pqCodesSql,
    "q_pq_codes_lit" -> pqCodesSql,
    "q_embed_centroid" -> embedCentroidSql,
    "q_kmeans_codebook" -> kmeansSql,
    "q_dedup_semantic" -> semanticDedupSql,
    "q_split_groups" -> splitGroupsSql,
    "q_text_quality" ->
      s"""WITH toks AS (SELECT doc_id, text, $ws AS ws FROM documents)
          SELECT doc_id,
            CAST(len(ws) AS BIGINT) AS n_words,
            CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT)
              AS n_word_chars,
            CAST(len(regexp_extract_all(text, '[.,!?;:]', 0)) AS BIGINT) AS n_punct,
            CAST(len(list_filter(ws, w -> w IN ($stopEn))) AS BIGINT) AS n_stopwords_en,
            CASE WHEN len(ws) >= 30
                  AND len(list_filter(ws, w -> w IN ($stopEn)))*10 >= len(ws) THEN 'high'
                 WHEN len(ws) >= 10 THEN 'medium' ELSE 'low' END AS quality
          FROM toks""",
    "q_lang_id" ->
      s"""WITH toks AS (SELECT doc_id, lang, text, $ws AS ws FROM documents),
          scored AS (SELECT doc_id, lang, $langScores,
          $ngramScores FROM toks)
          SELECT doc_id, $langCase AS pred_lang, $ngramCase AS pred_lang_ngram,
                 lang AS labeled_lang FROM scored""",
    "q_curate" ->
      s"""WITH s AS (SELECT doc_id, source,
            CAST(len($ws) AS BIGINT) AS n_tokens,
            CASE WHEN len($ws) >= 30
                  AND len(list_filter($ws, w -> w IN ($stopEn)))*10 >= len($ws)
                 THEN 'high'
                 WHEN len($ws) >= 10 THEN 'medium' ELSE 'low' END AS quality,
            md5(trim(regexp_replace(regexp_replace(lower(COALESCE(text, '')),
              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS nd
          FROM documents),
          k AS (SELECT *, min(doc_id) OVER (PARTITION BY nd) AS keeper FROM s)
          SELECT doc_id, source, n_tokens, quality FROM k
          WHERE doc_id = keeper AND quality <> 'low'""",

    // same integer derivation: T = min floor(n*W/w), t_c = floor(w*T/W),
    // fixed-point threshold floor(t_c*2^20/n_c)
    "q_mix_sources" -> {
      val values = MixWeights.sortBy(_._1)
        .map { case (s, wt) => s"('$s', $wt)" }.mkString(", ")
      val w = MixWeights.map(_._2).sum
      val d = 1L << 20
      s"""WITH w AS (SELECT * FROM (VALUES $values) AS v(src, wt)),
          c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
          cw AS (SELECT c.source, n, wt FROM c JOIN w ON c.source = w.src
                 WHERE wt > 0),
          t AS (SELECT min(n * $w // wt) AS tt FROM cw),
          thr AS (SELECT source, ((wt * tt // $w) * $d) // n AS thr FROM cw, t)
          SELECT d.doc_id, d.source FROM documents d
          JOIN thr ON d.source = thr.source
          WHERE (doc_id * ${graft.ops.Sampling.HashA}) %
                ${graft.ops.Sampling.HashP} % $d < thr"""
    },

    // the full sketch replicated relationally: per-row bucket sums
    // over the exact word counts ARE the CMS counters
    "q_cms_topk" -> {
      val W = 32
      val P = graft.functions.CmsSketch.P
      def bkt(r: Int, v: String): String = {
        val (a, b) = graft.functions.CmsSketch.RowAB(r)
        s"((($a * ($v % $P) + $b) % $P) % $W)"
      }
      val rows = (0 until 4).map(r =>
        s"b$r AS (SELECT ${bkt(r, "v")} AS bkt, sum(c) AS s FROM wc GROUP BY 1)")
        .mkString(",\n          ")
      val joins = (0 until 4).map(r =>
        s"JOIN b$r s$r ON ${bkt(r, "cand.v")} = s$r.bkt").mkString("\n          ")
      s"""WITH tk AS (SELECT unnest($ws) AS w FROM documents),
          h AS (SELECT w, ${wh("w")} AS v FROM tk),
          wc AS (SELECT w, any_value(v) AS v, count(*) AS c FROM h GROUP BY w),
          $rows,
          cand AS (SELECT w, v, c FROM wc ORDER BY c DESC, w LIMIT 20)
          SELECT cand.w AS word, CAST(c AS BIGINT) AS n_exact,
            CAST(least(s0.s, s1.s, s2.s, s3.s) AS BIGINT) AS n_est
          FROM cand
          $joins"""
    },

    // same cumsum-and-split arithmetic over the (bucket, id) order
    "q_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($ws) AS BIGINT) AS n,
            doc_id % 16 AS bucket FROM documents),
          c AS (SELECT *, CAST(COALESCE(sum(n) OVER (PARTITION BY bucket
                  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
                  1 PRECEDING), 0) AS BIGINT) AS cum
                FROM t),
          f AS (SELECT * FROM c WHERE n > 0),
          e AS (SELECT bucket, doc_id, n, cum,
                  unnest(range(cum // 512, (cum + n - 1) // 512 + 1)) AS seq_id
                FROM f)
          SELECT bucket, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
            greatest(cum, seq_id * 512) - cum AS doc_offset,
            least(cum + n, (seq_id + 1) * 512) - greatest(cum, seq_id * 512)
              AS n_tokens
          FROM e""",

    // same start arithmetic: regular starts 1+i·30, final start
    // clamped to f+1 so coverage is total and full-width
    "q_doc_chunks" ->
      s"""WITH w AS (SELECT doc_id, $ws AS ws FROM documents),
          n AS (SELECT doc_id, ws, greatest(len(ws) - 50, 0) AS f FROM w),
          k AS (SELECT *, (f + 29) // 30 AS k FROM n),
          c AS (SELECT doc_id, ws, f, k, unnest(range(0, k + 1)) AS chunk_id FROM k),
          s AS (SELECT doc_id, chunk_id,
                  CASE WHEN chunk_id < k THEN 1 + chunk_id*30 ELSE f + 1 END AS st, ws
                FROM c)
          SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
                 CAST(len(list_slice(ws, st, st + 49)) AS BIGINT) AS n_tokens,
                 array_to_string(list_slice(ws, st, st + 49), ' ') AS chunk_text
          FROM s""",
    "q_token_count" ->
      s"""SELECT doc_id,
            CAST(len($ws) AS BIGINT) AS n_ws_tokens,
            CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS BIGINT) AS n_re_tokens,
            CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+', 0))
              AS BIGINT) AS n_bpe_tokens
          FROM documents""",

    // same phrase split (regexp_replace needs 'g': Spark replaces all
    // matches, DuckDB only the first without it); integer deg/freq
    // scores via floor division — positive operands, so // == div
    "q_rake" -> {
      val stopRe = "\\b(" + graft.ops.Rake.Stopwords.mkString("|") + ")\\b"
      s"""WITH t AS (SELECT regexp_replace(regexp_replace(
              lower(COALESCE(text, '')), '[^a-z ]+', '|', 'g'),
              '$stopRe', '|', 'g') AS s
            FROM documents),
          p0 AS (SELECT trim(ph) AS phrase
            FROM t, unnest(string_split(t.s, '|')) AS u(ph)),
          p AS MATERIALIZED (SELECT phrase FROM p0 WHERE phrase <> ''),
          occ AS (SELECT wd,
              CAST(len(list_filter(string_split(p.phrase, ' '),
                w -> w <> '')) AS BIGINT) AS nw
            FROM p, unnest(string_split(p.phrase, ' ')) AS u2(wd)
            WHERE wd <> ''),
          ws AS (SELECT wd, CAST(count(*) AS BIGINT) AS freq,
              CAST(sum(nw) AS BIGINT) AS deg FROM occ GROUP BY wd),
          wsc AS (SELECT wd, (1000 * deg) // freq AS s1000 FROM ws),
          pd AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n
            FROM p GROUP BY phrase),
          pw AS (SELECT pd.phrase, pd.n, wd
            FROM pd, unnest(string_split(pd.phrase, ' ')) AS u3(wd)
            WHERE wd <> ''),
          sc AS (SELECT phrase, n, CAST(sum(s1000) AS BIGINT) AS score1000
            FROM pw JOIN wsc USING (wd) GROUP BY 1, 2)
          SELECT phrase, n, score1000 FROM sc
          ORDER BY score1000 DESC, phrase LIMIT 20"""
    },

    // integer counts, then the Flesch expression shared with
    // TextOps.FleschExpr token for token
    "q_readability" ->
      s"""WITH m AS (SELECT doc_id,
              CAST(len($ws) AS BIGINT) AS n_words,
              CAST(len(list_filter(regexp_split_to_array(
                COALESCE(text, ''), '[.!?]+'), w -> trim(w) <> ''))
                AS BIGINT) AS n_sents,
              CAST(len(regexp_extract_all(lower(COALESCE(text, '')),
                '[aeiouy]+', 0)) AS BIGINT) AS n_syll
            FROM documents)
          SELECT doc_id, n_words, n_sents, n_syll,
            ${graft.ops.TextOps.FleschExpr} AS flesch
          FROM m""",
    "q_token_budget" ->
      s"""WITH per AS (SELECT source,
              CAST(len($ws) AS BIGINT) AS nt,
              CAST(len(regexp_extract_all(COALESCE(text, ''),
                ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+', 0)) AS BIGINT) AS nb
            FROM documents),
          tot AS (SELECT sum(nt) AS t FROM per)
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(nt) AS BIGINT) AS n_tokens,
                 CAST(sum(nb) AS BIGINT) AS n_bpe_tokens,
                 CAST((sum(nt) * 1000000) // (SELECT t FROM tot) AS BIGINT)
                   AS token_share_ppm
          FROM per GROUP BY source""",
    "q_fingerprint" ->
      s"""SELECT doc_id,
            list_reduce(
              list_prepend(CAST(0 AS BIGINT), list_transform($ws, w -> CAST(${wh("w")} AS BIGINT))),
              (acc, x) -> (acc*31 + x) % 1000000007) AS fp
          FROM documents""",
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'text/plain' AS format,
         octet_length(CAST(text AS BLOB)) AS n_bytes,
         sha256(text) AS digest
         FROM documents""",
    "q_multimodal_decode" -> multimodalDecodeSql,
    "q_image_phash" -> imagePhashSql,
    "q_phash_pairs" ->
      s"""WITH $phashPairsCtes
          SELECT media_id_a, media_id_b, dist FROM pr WHERE dist <= 3""",
    "q_phash_clusters" ->
      s"""WITH RECURSIVE $phashPairsCtes,
          pairs AS (SELECT media_id_a, media_id_b FROM pr
                    WHERE dist <= 3),
          edges AS (SELECT media_id_a AS a, media_id_b AS b FROM pairs
                    UNION ALL SELECT media_id_b, media_id_a FROM pairs),
          reach(node, root) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node),
          comp AS (SELECT node, MIN(root) AS comp FROM reach GROUP BY node)
          SELECT p.media_id,
            COALESCE(c.comp, p.media_id) AS cluster_id,
            CAST(p.media_id = COALESCE(c.comp, p.media_id) AS BIGINT)
              AS is_keeper
          FROM ph p LEFT JOIN comp c ON c.node = p.media_id""",
    "q_multimodal_frames" -> multimodalFramesSql,
    "q_multimodal_resize" -> multimodalResizeSql,
    "q_multimodal_audio" -> multimodalAudioSql,
    "q_multimodal_clips" -> multimodalClipsSql
  )

  /** Shared phash-pair CTE chain: the stub aHash per document, the
    * 4×16-bit pigeonhole bands, and the popcount-verified candidate
    * pairs (`pr(media_id_a, media_id_b, dist)`).
    */
  private def phashPairsCtes: String =
    s"""ph AS MATERIALIZED ($imagePhashSql),
          bands AS MATERIALIZED (
            SELECT media_id, ahash_lo AS lo, ahash_hi AS hi, u.b AS b,
              CASE u.b WHEN 0 THEN ahash_lo & 65535
                       WHEN 1 THEN (ahash_lo >> 16) & 65535
                       WHEN 2 THEN ahash_hi & 65535
                       ELSE (ahash_hi >> 16) & 65535 END AS bkey
            FROM ph, (SELECT unnest([0, 1, 2, 3]) AS b) u),
          pr AS (SELECT DISTINCT b1.media_id AS media_id_a,
              b2.media_id AS media_id_b,
              CAST(bit_count(xor(b1.lo, b2.lo))
                   + bit_count(xor(b1.hi, b2.hi)) AS BIGINT) AS dist
            FROM bands b1 JOIN bands b2
              ON b1.b = b2.b AND b1.bkey = b2.bkey
            WHERE b1.media_id < b2.media_id)"""

  /** Stub-path aHash twin: cell i = byte (i mod n), integer grand
    * mean, mean-threshold bits packed into two unsigned halves —
    * replicates Multimodal.stubAHash over the ASCII payload.
    */
  private def imagePhashSql: String = {
    val vs = (0 until 64).map(i =>
      s"CASE WHEN n = 0 THEN 0 ELSE ord(substr(text, ($i % n)+1, 1)) END AS v$i")
    val sum = (0 until 64).map(i => s"v$i").mkString(" + ")
    val lo = (0 until 32)
      .map(i => s"CASE WHEN v$i > mean THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    val hi = (32 until 64)
      .map(i => s"CASE WHEN v$i > mean THEN ${1L << (i - 32)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH b AS (SELECT doc_id AS media_id, text, length(text) AS n
                   FROM documents),
        v AS (SELECT media_id, n, ${vs.mkString(", ")} FROM b),
        m AS (SELECT *, ($sum) // 64 AS mean FROM v)
        SELECT media_id, CAST($lo AS BIGINT) AS ahash_lo,
          CAST($hi AS BIGINT) AS ahash_hi
        FROM m"""
  }

  /** Byte i (0-based) of the ASCII payload as FLOAT/255 widened to
    * double — the oracle twin of the decode stub's
    * `payload(i % n).toFloat / 255f` (test corpora are ASCII, so
    * character position == byte position).
    */
  private def byteFeature(pos: String): String =
    s"CAST(CAST(ord(substr(text, CAST($pos AS INT) + 1, 1)) AS FLOAT) " +
      s"/ CAST(255 AS FLOAT) AS DOUBLE)"

  private def multimodalDecodeSql: String = {
    val fs = (0 until 8)
      .map(i => s"${byteFeature(s"$i % n")} AS f$i").mkString(",\n            ")
    s"""WITH b AS (SELECT doc_id AS media_id, text,
              octet_length(CAST(text AS BLOB)) AS n FROM documents)
        SELECT media_id,
            CAST(64 + n % 512 AS BIGINT) AS width,
            CAST(64 + (n*7) % 512 AS BIGINT) AS height,
            CAST(n AS BIGINT) AS n_bytes,
            $fs
        FROM b"""
  }

  /** Resize twin: same integer stride (n // budget) and 0-based byte
    * picks as Multimodal.resize's stub, thumb reassembled as text.
    * Budget fixed at 16×16 = 256 to match the query's target dims.
    *
    * ASCII bound (shared with the decode/frames twins): the engine
    * strides BYTES of the UTF-8 payload while substr() here strides
    * CHARACTERS — identical only while byte position == character
    * position, which holds for the seeded corpus (verified
    * ASCII-only). A multi-byte corpus would need the oracle to index
    * the BLOB by byte instead.
    */
  private def multimodalResizeSql: String =
    s"""WITH b AS (SELECT doc_id AS media_id, COALESCE(text, '') AS text,
              octet_length(CAST(COALESCE(text, '') AS BLOB)) AS n FROM documents),
        s AS (SELECT media_id, text, n, n // 256 AS stride FROM b)
        SELECT media_id,
               CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
               CAST(CASE WHEN n <= 256 THEN n ELSE 256 END AS BIGINT) AS n_thumb,
               CASE WHEN n <= 256 THEN text
                    ELSE array_to_string(list_transform(range(0, 256),
                      i -> substr(text, CAST(i*stride AS INT) + 1, 1)), '')
               END AS thumb_text
        FROM s"""

  /** Audio-stub twin: the text corpus carries no WAV payloads, so
    * every row takes the stub's arithmetic (same ASCII bound as the
    * other multimodal twins). The REAL decode path is covered by the
    * WAV-bytes specs in MultimodalSpec.
    */
  private def multimodalAudioSql: String = {
    val fs = (0 until 8)
      .map(i => s"${byteFeature(s"($i * 5) % n")} AS f$i").mkString(",\n            ")
    s"""WITH b AS (SELECT doc_id AS media_id, text,
              octet_length(CAST(text AS BLOB)) AS n FROM documents)
        SELECT media_id,
            CAST(8000 + n % 8000 AS BIGINT) AS sample_rate,
            CAST(1 + n % 2 AS BIGINT) AS channels,
            CAST(n AS BIGINT) AS n_samples,
            $fs
        FROM b"""
  }

  /** Clip-stub twin: whole 64-byte slices (floor), RMS from an exact
    * integer sum of squares with a single float rounding — the one
    * arithmetic shape double/float replicate bit-for-bit across
    * engines. Real WAV segmentation is spec-covered.
    */
  private def multimodalClipsSql: String =
    s"""WITH b AS (SELECT doc_id AS media_id, text,
              octet_length(CAST(text AS BLOB)) AS n FROM documents),
        c AS (SELECT media_id, text,
              CAST(unnest(range(0, n // 64)) AS BIGINT) AS clip_idx FROM b),
        s AS (SELECT media_id, clip_idx,
              list_sum(list_transform(range(0, 64), i ->
                CAST(ord(substr(text, CAST(clip_idx*64 + i AS INT) + 1, 1))
                  AS BIGINT) *
                CAST(ord(substr(text, CAST(clip_idx*64 + i AS INT) + 1, 1))
                  AS BIGINT))) AS ssum
              FROM c)
        SELECT media_id, clip_idx, CAST(64 AS BIGINT) AS n_samples,
               CAST(CAST(sqrt(CAST(ssum AS DOUBLE) / (65025.0 * 64))
                 AS FLOAT) AS DOUBLE) AS rms
        FROM s"""

  private def multimodalFramesSql: String = {
    val fs = (0 until 8)
      .map(i => s"${byteFeature(s"frame_idx*64 + $i")} AS f$i").mkString(",\n            ")
    s"""WITH b AS (SELECT doc_id AS media_id, text,
              octet_length(CAST(text AS BLOB)) AS n FROM documents),
        fr AS (SELECT media_id, text,
              CAST(unnest(range(0, n // 64, 2)) AS BIGINT) AS frame_idx FROM b)
        SELECT media_id, frame_idx, $fs
        FROM fr"""
  }
}
